"""skipgram_pairs, weighted A-ES sampling, ROLLUP/pivot surfaces."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.sampling import weighted_group_sample
from kg_microbe_spark.operators.stats import dimensional_rollup, pivot_table
from kg_microbe_spark.operators.walks import skipgram_pairs


# ------------------------------------------------------------- skip-gram
def test_skipgram_window_and_counts(spark):
    # one walk: a b c d ; window 2
    rows = [("s", 0, i, n) for i, n in enumerate("abcd")]
    walks = spark.createDataFrame(rows, "start string, walk int, step int, node string")
    out = {(r.center, r.context): r.n_pairs for r in skipgram_pairs(walks, window=2).collect()}
    # a sees b (d1) and c (d2) — not d (d3)
    assert out[("a", "b")] == 1 and out[("a", "c")] == 1
    assert ("a", "d") not in out
    # symmetric emission
    assert out[("b", "a")] == 1
    # b sees a, c, d
    assert out[("b", "d")] == 1


def test_skipgram_aggregates_across_walks(spark):
    rows = [("s", w, i, n) for w in (0, 1) for i, n in enumerate("ab")]
    walks = spark.createDataFrame(rows, "start string, walk int, step int, node string")
    out = {(r.center, r.context): r.n_pairs for r in skipgram_pairs(walks, window=1).collect()}
    assert out[("a", "b")] == 2  # once per walk


def test_skipgram_never_crosses_walks(spark):
    rows = [("s", 0, 0, "a"), ("s", 1, 1, "b")]
    walks = spark.createDataFrame(rows, "start string, walk int, step int, node string")
    assert skipgram_pairs(walks, window=3).count() == 0


# ------------------------------------------------------------- A-ES sampling
def _es_score(key: str, w: float) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    u = (h + 1) / float(1 << 60)
    return math.log(u) / w


def test_weighted_sample_matches_reference_selection(spark):
    rows = [(f"k{i}", float(1 + i % 5), "g") for i in range(40)]
    df = spark.createDataFrame(rows, "id string, w double, grp string")
    got = sorted(
        r.id for r in weighted_group_sample(df, "id", "w", "grp", k=7).collect()
    )
    expected = sorted(
        sorted((kid for kid, w, _ in rows), key=lambda kid: (-_es_score(kid, float(1 + int(kid[1:]) % 5)), kid))[:7]
    )
    assert got == expected


def test_weighted_sample_excludes_nonpositive_and_respects_k(spark):
    rows = [("a", 1.0, "g"), ("b", 0.0, "g"), ("c", -2.0, "g"), ("d", 1.0, "g")]
    df = spark.createDataFrame(rows, "id string, w double, grp string")
    got = {r.id for r in weighted_group_sample(df, "id", "w", "grp", k=10).collect()}
    assert got == {"a", "d"}


def test_weighted_sample_heavily_favors_large_weights(spark):
    # 200 strata; in each, one item with weight 1000 vs 9 with weight 0.01
    rows = []
    for g in range(200):
        rows.append((f"h{g}", 1000.0, f"g{g}"))
        rows += [(f"l{g}_{i}", 0.01, f"g{g}") for i in range(9)]
    df = spark.createDataFrame(rows, "id string, w double, grp string")
    picked = [r.id for r in weighted_group_sample(df, "id", "w", "grp", k=1).collect()]
    heavy = sum(1 for p in picked if p.startswith("h"))
    assert heavy >= 195  # P(light wins a stratum) ≈ 0 at this weight ratio


# ------------------------------------------------------------- ROLLUP
def test_rollup_levels_and_subtotals(spark):
    rows = [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)]
    df = spark.createDataFrame(rows, "d1 string, d2 string, v int")
    out = dimensional_rollup(df, ["d1", "d2"], "v").collect()
    by = {(r.d1, r.d2): r for r in out}
    assert by[("a", "x")].total == 1 and by[("a", "x")].grouping_level == 0
    assert by[("a", None)].total == 3 and by[("a", None)].grouping_level == 1
    assert by[(None, None)].total == 7 and by[(None, None)].grouping_level == 3
    assert by[(None, None)].n == 3
    # ROLLUP (not CUBE): no (None, 'x') slice
    assert (None, "x") not in by


# ------------------------------------------------------------- pivot
def test_pivot_counts_and_zero_fill(spark):
    rows = [("u1", "en"), ("u1", "en"), ("u1", "de"), ("u2", "en")]
    df = spark.createDataFrame(rows, "key string, lang string")
    out = {r.key: r for r in pivot_table(df, "key", "lang", ["en", "de", "fr"]).collect()}
    assert (out["u1"].en, out["u1"].de, out["u1"].fr) == (2, 1, 0)
    assert (out["u2"].en, out["u2"].de, out["u2"].fr) == (1, 0, 0)


def test_pivot_ignores_unpinned_values(spark):
    rows = [("u1", "en"), ("u1", "zz")]
    df = spark.createDataFrame(rows, "key string, lang string")
    out = pivot_table(df, "key", "lang", ["en"]).collect()[0]
    assert out.en == 1 and len(out.asDict()) == 2  # key + en only
