"""k-core peeling (operators/kcore.py), taxonomy rollup
(operators/rollup.py), entity salience (operators/salience.py)."""

import pytest

from kg_microbe_spark.operators.kcore import kcore
from kg_microbe_spark.operators.rollup import rollup_counts
from kg_microbe_spark.operators.salience import entity_salience


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_kcore_peels_chain_keeps_clique_and_cycle(spark):
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(i, i + 1) for i in range(10, 16)]
    cycle = [(20, 21), (21, 22), (22, 23), (23, 20)]
    noise = [(5, 0), (11, 10), (24, 24)]  # pendant, reversed dup, self-loop
    out = {
        (r.node, r.degree)
        for r in kcore(
            _edges(spark, clique + chain + cycle + noise), k=2, rounds=4
        ).collect()
    }
    assert out == {(n, 4) for n in range(5)} | {(n, 2) for n in (20, 21, 22, 23)}


def test_kcore_k3_keeps_only_clique(spark):
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cycle = [(20, 21), (21, 22), (22, 23), (23, 20)]
    out = {r.node for r in kcore(_edges(spark, clique + cycle), k=3, rounds=3).collect()}
    assert out == set(range(5))


def test_kcore_validates():
    with pytest.raises(ValueError):
        kcore(None, k=0, rounds=1)
    with pytest.raises(ValueError):
        kcore(None, k=1, rounds=0)


def test_rollup_sums_subtree_including_self(spark):
    #      r
    #    a   b
    #  c  d
    closure = spark.createDataFrame(
        [
            ("a", "r"), ("b", "r"), ("c", "r"), ("d", "r"),
            ("c", "a"), ("d", "a"),
        ],
        "subject string, object string",
    )
    counts = spark.createDataFrame(
        [("c", 3), ("d", 4), ("b", 5), ("zzz", 7)], "node string, n int"
    )
    out = {
        r.node: (r.n_self, r.n_rolled)
        for r in rollup_counts(
            counts, closure, desc_col="subject", anc_col="object"
        ).collect()
    }
    assert out["r"] == (0, 12)
    assert out["a"] == (0, 7)
    assert out["b"] == (5, 5)
    assert out["c"] == (3, 3)
    # counted node outside the taxonomy still appears, rolls only itself
    assert out["zzz"] == (7, 7)
    assert set(out) == {"r", "a", "b", "c", "d", "zzz"}


def test_salience_flags_and_score(spark):
    mentions = spark.createDataFrame(
        [
            # u1: X in title (offset 2 < title_len 10), 3 mentions
            ("u1", "X", 2, 10),
            ("u1", "X", 50, 10),
            ("u1", "X", 900, 10),
            # u1: Y first in lead (offset 120 < 10+200), 1 mention
            ("u1", "Y", 120, 10),
            # u1: Z deep in the body
            ("u1", "Z", 5000, 10),
        ],
        "url string, curie string, start int, title_len int",
    )
    out = {r.curie: r for r in entity_salience(mentions).collect()}
    x, y, z = out["X"], out["Y"], out["Z"]
    assert (x.in_title, x.in_lead, x.n_mentions, x.salience) == (1, 1, 3, 9)
    assert (y.in_title, y.in_lead, y.salience) == (0, 1, 3)
    assert (z.in_title, z.in_lead, z.salience) == (0, 0, 1)
    assert x.first_offset == 2


def test_salience_freq_cap(spark):
    mentions = spark.createDataFrame(
        [("u", "E", 1000 + i, 5) for i in range(40)],
        "url string, curie string, start int, title_len int",
    )
    row = entity_salience(mentions, freq_cap=10).collect()[0]
    assert row.n_mentions == 40 and row.salience == 10
