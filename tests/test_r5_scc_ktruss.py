"""SCC labels and k-truss pruning."""

import pytest

from kg_microbe_spark.operators.components import scc_labels
from kg_microbe_spark.operators.triangles import (
    edge_triangle_support,
    ktruss_prune,
)


def test_scc_cycles_chains_and_pairs(spark):
    edges = [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),  # 3-cycle
        ("n1", "n2"), ("n2", "n3"),                 # chain
        ("x", "y"), ("y", "x"),                     # 2-cycle
        ("t", "c1"),                                 # into the cycle
        ("s", "s"),                                  # self loop
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.id: r.scc for r in scc_labels(e, "src", "dst").collect()}
    assert out["c1"] == out["c2"] == out["c3"] == "c1"
    assert out["x"] == out["y"] == "x"
    # non-cycle nodes are singleton SCCs labelled by themselves
    for n in ("n1", "n2", "n3", "t", "s"):
        assert out[n] == n


SHARED_EDGE = [
    ("a", "b"), ("a", "c"), ("b", "c"),  # triangle abc
    ("b", "d"), ("c", "d"),              # triangle bcd shares bc
]


def test_edge_support_shared_edge(spark):
    e = spark.createDataFrame(SHARED_EDGE, "src string, dst string")
    sup = {(r.a, r.b): r.support for r in edge_triangle_support(e, "src", "dst").collect()}
    assert sup[("b", "c")] == 2
    for pair in (("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")):
        assert sup[pair] == 1


def test_edge_support_zero_for_dangling(spark):
    e = spark.createDataFrame(
        SHARED_EDGE + [("d", "e")], "src string, dst string"
    )
    sup = {(r.a, r.b): r.support for r in edge_triangle_support(e, "src", "dst").collect()}
    assert sup[("d", "e")] == 0


def test_ktruss_rounds(spark):
    e = spark.createDataFrame(SHARED_EDGE, "src string, dst string")
    # k=4 needs support >= 2: round 1 keeps only bc; round 2 kills it
    r1 = {(r.a, r.b) for r in ktruss_prune(e, "src", "dst", k=4, rounds=1).collect()}
    assert r1 == {("b", "c")}
    assert ktruss_prune(e, "src", "dst", k=4, rounds=2).count() == 0
    # k=3 (support >= 1): the two-triangle bowtie is already a fixpoint
    r3 = {(r.a, r.b) for r in ktruss_prune(e, "src", "dst", k=3, rounds=2).collect()}
    assert len(r3) == 5


def test_ktruss_validation(spark):
    e = spark.createDataFrame(SHARED_EDGE, "src string, dst string")
    with pytest.raises(ValueError):
        ktruss_prune(e, "src", "dst", k=2)
    with pytest.raises(ValueError):
        ktruss_prune(e, "src", "dst", k=4, rounds=0)
