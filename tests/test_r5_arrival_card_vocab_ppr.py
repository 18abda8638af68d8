"""Inter-arrival stats, predicate cardinality, functional violations,
vocab coverage, personalized PageRank."""

import pytest

from kg_microbe_spark.operators.heavyhitters import vocab_coverage
from kg_microbe_spark.operators.pagerank import personalized_pagerank
from kg_microbe_spark.operators.temporal import inter_arrival_stats
from kg_microbe_spark.operators.validation import (
    functional_violations,
    predicate_cardinality,
)


def _ts(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts string").selectExpr(
        "user_id", "cast(ts as timestamp) ts"
    )


def test_inter_arrival_hand_computed(spark):
    df = _ts(spark, [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:01"),
        (1, "2024-01-01 00:00:04"),
    ])
    r = inter_arrival_stats(df, "user_id", "ts").collect()[0]
    assert (r.n_events, r.n_gaps) == (3, 2)
    assert r.min_gap_us == 1_000_000 and r.max_gap_us == 3_000_000
    assert r.mean_gap_s == 2.0


def test_inter_arrival_single_event_nulls(spark):
    df = _ts(spark, [(1, "2024-01-01 00:00:00")])
    r = inter_arrival_stats(df, "user_id", "ts").collect()[0]
    assert r.n_gaps == 0 and r.min_gap_us is None and r.mean_gap_s is None


def test_inter_arrival_ties_zero_gap(spark):
    df = _ts(spark, [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:02"),
    ])
    r = inter_arrival_stats(df, "user_id", "ts").collect()[0]
    assert r.min_gap_us == 0 and r.max_gap_us == 2_000_000
    assert r.mean_gap_s == 1.0


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string"
    )


def test_cardinality_all_classes(spark):
    rows = (
        [(f"a{i}", "p11", f"b{i}") for i in range(3)]
        + [(f"s{i}", "pn1", "g0") for i in range(3)]
        + [("h0", "p1n", f"t{i}") for i in range(3)]
        + [("x0", "pnn", "y0"), ("x0", "pnn", "y1"), ("x1", "pnn", "y0")]
    )
    out = {r.predicate: r.cardinality
           for r in predicate_cardinality(_edges(spark, rows)).collect()}
    assert out == {"p11": "1-1", "pn1": "N-1", "p1n": "1-N", "pnn": "N-N"}


def test_cardinality_uses_distinct_edges(spark):
    rows = [("a", "p", "b"), ("a", "p", "b")]
    r = predicate_cardinality(_edges(spark, rows)).collect()[0]
    assert r.n_edges == 1 and r.cardinality == "1-1"


def test_functional_violations_flags_only_declared(spark):
    rows = [
        ("s1", "f", "o1"), ("s1", "f", "o2"),   # violation
        ("s2", "f", "o1"),                        # clean
        ("s1", "free", "o1"), ("s1", "free", "o2"),  # not declared
    ]
    out = functional_violations(_edges(spark, rows), ["f"]).collect()
    assert len(out) == 1
    assert out[0].subject == "s1" and out[0].n_objects == 2


def test_functional_violations_rejects_empty(spark):
    with pytest.raises(ValueError):
        functional_violations(_edges(spark, [("a", "p", "b")]), [])


def test_vocab_coverage_curve(spark):
    # counts: the=4, aa=2, bb=1, cc=1 → total 8
    rows = [("the the the the aa aa bb cc",)]
    df = spark.createDataFrame(rows, "text string")
    out = {r.k: r for r in vocab_coverage(df, "text", [1, 2, 10]).collect()}
    assert out[1].covered == 4 and out[1].coverage == 0.5
    assert out[2].covered == 6 and out[2].coverage == 0.75
    # k beyond vocab clamps to the full vocabulary
    assert out[10].n_types == 4 and out[10].coverage == 1.0


def test_vocab_coverage_tie_break_on_token(spark):
    rows = [("bb aa",)]  # both count 1 → 'aa' ranks first
    df = spark.createDataFrame(rows, "text string")
    out = {r.k: r for r in vocab_coverage(df, "text", [1]).collect()}
    assert out[1].covered == 1 and out[1].coverage == 0.5


def test_vocab_coverage_rejects_bad_k(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        vocab_coverage(df, "text", [0])


def test_ppr_concentrates_on_seed_neighborhood(spark):
    # star out of seed s: s→a, s→b; far node f→g untouched by teleport
    edges = [("s", "a"), ("s", "b"), ("f", "g")]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "seed string")
    out = {r.id: r.rank for r in
           personalized_pagerank(e, "src", "dst", seeds, "seed",
                                 iterations=2).collect()}
    # teleport only to s; a,b receive d·(r_s/2); f,g get nothing
    assert out["s"] > out["a"] > 0
    assert abs(out["a"] - out["b"]) < 1e-15
    assert out["f"] == 0.0 and out["g"] == 0.0


def test_ppr_hand_computed_two_nodes(spark):
    # s→a only; r0 = (1, 0); r1 = (0.15, 0.85); r2 = (0.15, 0.85·0.15+... )
    e = spark.createDataFrame([("s", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "seed string")
    out = {r.id: r.rank for r in
           personalized_pagerank(e, "s" "rc", "dst", seeds, "seed",
                                 iterations=1).collect()}
    assert abs(out["s"] - 0.15) < 1e-12
    assert abs(out["a"] - 0.85) < 1e-12


def test_ppr_rejects_bad_params(spark):
    e = spark.createDataFrame([("s", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "seed string")
    with pytest.raises(ValueError):
        personalized_pagerank(e, "src", "dst", seeds, "seed", iterations=0)
    with pytest.raises(ValueError):
        personalized_pagerank(e, "src", "dst", seeds, "seed", damping=1.0)
