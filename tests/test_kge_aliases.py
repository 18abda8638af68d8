"""TransE energy scoring (operators/kge.py) and alias chain
resolution (operators/aliases.py)."""

import pytest

from kg_microbe_spark.operators.aliases import resolve_aliases
from kg_microbe_spark.operators.kge import transe_energy


def test_transe_energy_exact_small(spark):
    ent = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 1.0]), (3, [0.5, 0.0])],
        "id bigint, vec array<double>",
    )
    rel = spark.createDataFrame(
        [("r0", [1.0, 0.0]), ("r1", [0.0, 0.5])], "id string, vec array<double>"
    )
    triples = spark.createDataFrame(
        [(1, "r0", 2), (2, "r1", 3), (1, "r0", 9)],  # 9 unresolvable
        "h bigint, r string, t bigint",
    )
    out = {(r.h, r.r, r.t): r.energy for r in
           transe_energy(triples, ent, rel, dim=2).collect()}
    # |0+1-1| + |1+0-1| = 0 → perfect triple
    assert out[(1, "r0", 2)] == pytest.approx(0.0)
    # |1+0-0.5| + |1+0.5-0| = 0.5 + 1.5 = 2.0
    assert out[(2, "r1", 3)] == pytest.approx(2.0)
    assert (1, "r0", 9) not in out and len(out) == 2


def test_transe_energy_float32_deterministic(spark):
    ent = spark.createDataFrame(
        [(i, [0.1 * (i + j) for j in range(4)]) for i in range(3)],
        "id bigint, vec array<float>",
    )
    rel = spark.createDataFrame([(0, [0.05] * 4)], "id bigint, vec array<float>")
    triples = spark.createDataFrame([(0, 0, 2)], "h bigint, r bigint, t bigint")
    a = transe_energy(triples, ent, rel, dim=4).collect()[0].energy
    b = transe_energy(triples, ent, rel, dim=4).collect()[0].energy
    assert a == b and a == pytest.approx(0.6, abs=1e-6)


def test_resolve_aliases_chain_depths(spark):
    # chain p4→p3→p2→p1→p0 plus a terminal-only alias and a side branch
    redirects = spark.createDataFrame(
        [("p4", "p3"), ("p3", "p2"), ("p2", "p1"), ("p1", "p0"),
         ("q1", "p2"), ("z1", "z0")],
        "src string, dst string",
    )
    out = {r.alias: r.canonical for r in resolve_aliases(redirects, rounds=3).collect()}
    assert out == {
        "p4": "p0", "p3": "p0", "p2": "p0", "p1": "p0",
        "q1": "p0", "z1": "z0",
    }


def test_resolve_aliases_depth_bound_and_cycle(spark):
    # depth-5 chain needs 2^rounds ≥ 5 → rounds=2 under-resolves
    chain = [(f"c{i}", f"c{i-1}") for i in range(1, 6)]
    shallow = {r.alias: r.canonical
               for r in resolve_aliases(spark.createDataFrame(chain, "src string, dst string"), rounds=2).collect()}
    assert shallow["c5"] == "c1"  # 4 hops of 5 — not terminal, detectable
    deep = {r.alias: r.canonical
            for r in resolve_aliases(spark.createDataFrame(chain, "src string, dst string"), rounds=3).collect()}
    assert deep["c5"] == "c0"
    # cycle never resolves but also never crashes; result stays in-cycle
    cyc = {r.alias: r.canonical
           for r in resolve_aliases(
               spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string"),
               rounds=3).collect()}
    assert set(cyc.values()) <= {"a", "b"}


def test_resolve_aliases_rejects_non_functional(spark):
    bad = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="not functional"):
        resolve_aliases(bad)
