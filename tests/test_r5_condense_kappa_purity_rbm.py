"""Graph condensation, Cohen's kappa, cluster purity, reciprocal best match."""

import pytest

from kg_microbe_spark.operators.alignment import reciprocal_best_match
from kg_microbe_spark.operators.components import condense_graph, scc_labels
from kg_microbe_spark.operators.evaluation import cluster_purity, cohens_kappa


def test_condense_after_scc(spark):
    edges = [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),   # SCC {c1,c2,c3}
        ("d1", "d2"), ("d2", "d1"),                  # SCC {d1,d2}
        ("c1", "d1"), ("c2", "d2"),                  # two cross edges
        ("d1", "e"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    labels = scc_labels(e, "src", "dst")
    out = {
        (r.src_label, r.dst_label): r.n_edges
        for r in condense_graph(e, labels).collect()
    }
    # condensed DAG: c-block -> d-block (multiplicity 2), d-block -> e
    assert out == {("c1", "d1"): 2, ("d1", "e"): 1}


def test_condense_drops_unlabelled(spark):
    e = spark.createDataFrame([("a", "b"), ("a", "z")], "src string, dst string")
    labels = spark.createDataFrame(
        [("a", "ga"), ("b", "gb")], "id string, label string"
    )
    out = condense_graph(e, labels).collect()
    assert len(out) == 1 and out[0].n_edges == 1


def test_cohens_kappa_exact(spark):
    # 10 items, 2 labels; a: 6 yes / 4 no, b: 5 yes / 5 no, agree = 7
    # pe_s = 6*5 + 4*5 = 50; kappa = (7*10 - 50)/(100 - 50) = 0.4
    a_rows = [(i, "y" if i < 6 else "n") for i in range(10)]
    b_rows = [(i, "y" if (i < 4 or i in (6, 7)) else "n") for i in range(10)]
    # agreement: y-y on 0..3 (4), n-n on 8,9 (2) -> recount below
    a = spark.createDataFrame(a_rows, "id int, label string")
    b = spark.createDataFrame(b_rows, "id int, label string")
    agree = sum(1 for (i, x), (_, y) in zip(a_rows, b_rows) if x == y)
    na = {"y": 6, "n": 4}
    nb = {"y": 6, "n": 4}
    nb = {
        "y": sum(1 for _, y in b_rows if y == "y"),
        "n": sum(1 for _, y in b_rows if y == "n"),
    }
    pe_s = na["y"] * nb["y"] + na["n"] * nb["n"]
    r = cohens_kappa(a, b).collect()[0]
    assert r.n_items == 10
    assert r.observed_agreement == pytest.approx(agree / 10, abs=1e-6)
    assert r.expected_agreement == pytest.approx(pe_s / 100, abs=1e-6)
    assert r.kappa == pytest.approx(
        (agree * 10 - pe_s) / (100 - pe_s), abs=1e-6
    )


def test_cohens_kappa_perfect_and_inner_join(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (99, "x")], "id int, label string"
    )
    b = spark.createDataFrame([(1, "x"), (2, "y")], "id int, label string")
    r = cohens_kappa(a, b).collect()[0]
    assert r.n_items == 2 and r.kappa == 1.0


def test_cluster_purity(spark):
    # clusters: {1,2,3} (2 X + 1 Y), {4,5} (2 Y); classes X={1,2}, Y={3,4,5}
    p = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k1"), (4, "k2"), (5, "k2")],
        "id int, cluster string",
    )
    g = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y"), (4, "Y"), (5, "Y")],
        "id int, class_ string",
    )
    r = cluster_purity(p, g).collect()[0]
    assert r.n_items == 5
    assert r.purity == pytest.approx((2 + 2) / 5, abs=1e-6)
    # inverse: X best covered by k1 (2), Y best by k2 (2)
    assert r.inverse_purity == pytest.approx((2 + 2) / 5, abs=1e-6)


def test_reciprocal_best_match(spark):
    rows = [
        ("l1", "r1", 0.9), ("l1", "r2", 0.5),
        ("l2", "r1", 0.8),  # l2's best is r1, but r1 prefers l1
        ("l2", "r2", 0.6),
        ("l3", "r3", 0.4),
    ]
    s = spark.createDataFrame(rows, "l string, r string, sc double")
    out = {(x.l, x.r): x.sc for x in reciprocal_best_match(s, "l", "r", "sc").collect()}
    # l1<->r1 mutual; l3<->r3 mutual (only candidates); l2 unmatched
    # (its best r1 prefers l1, and r2's best left is l2 BUT l2's best is r1)
    assert out == {("l1", "r1"): 0.9, ("l3", "r3"): 0.4}


def test_rbm_tie_breaks_to_smaller_partner(spark):
    rows = [("l1", "rA", 1.0), ("l1", "rB", 1.0), ("l2", "rB", 1.0)]
    s = spark.createDataFrame(rows, "l string, r string, sc double")
    out = {(x.l, x.r) for x in reciprocal_best_match(s, "l", "r", "sc").collect()}
    # l1 ties rA/rB -> rA; rA's only left is l1 -> mutual.
    # rB's lefts tie l1/l2 -> l1, but l1 chose rA -> rB unmatched.
    assert out == {("l1", "rA")}
