"""SSSP, Resnik similarity, int8 quantization, ranking metrics, RRF."""

import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.evaluation import ranking_metrics
from kg_microbe_spark.operators.fusion import rrf_fuse
from kg_microbe_spark.operators.ontosim import resnik_similarity
from kg_microbe_spark.operators.paths import shortest_paths
from kg_microbe_spark.operators.quantization import quantize_embeddings


# ---------------------------------------------------------------- SSSP
def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_sssp_prefers_cheap_two_hop(spark):
    # direct a->c costs 10; a->b->c costs 3 — relaxation must find 3
    e = _edges(spark, [("a", "c", 10), ("a", "b", 1), ("b", "c", 2)])
    src = spark.createDataFrame([("a",)], "id string")
    d = {r.id: r.dist for r in shortest_paths(e, "src", "dst", "w", src, rounds=3).collect()}
    assert d == {"a": 0, "b": 1, "c": 3}


def test_sssp_round_bound_is_hop_bound(spark):
    # chain a->b->c->d: 1 round reaches b only, 3 rounds reach d
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)])
    src = spark.createDataFrame([("a",)], "id string")
    one = {r.id for r in shortest_paths(e, "src", "dst", "w", src, rounds=1).collect()}
    assert one == {"a", "b"}
    three = {r.id: r.dist for r in shortest_paths(e, "src", "dst", "w", src, rounds=3).collect()}
    assert three["d"] == 3


def test_sssp_multi_source_nearest(spark):
    e = _edges(spark, [("s1", "m", 5), ("s2", "m", 2)])
    src = spark.createDataFrame([("s1",), ("s2",)], "id string")
    d = {r.id: r.dist for r in shortest_paths(e, "src", "dst", "w", src, rounds=2).collect()}
    assert d["m"] == 2  # distance from the NEAREST source


def test_sssp_unreached_absent(spark):
    e = _edges(spark, [("a", "b", 1), ("x", "y", 1)])
    src = spark.createDataFrame([("a",)], "id string")
    ids = {r.id for r in shortest_paths(e, "src", "dst", "w", src, rounds=4).collect()}
    assert "x" not in ids and "y" not in ids


# ---------------------------------------------------------------- Resnik
@pytest.fixture()
def tree_closure(spark):
    #        root
    #        /  \
    #       a    b
    #      / \    \
    #     c   d    e
    anc = [
        ("root", "root"),
        ("a", "a"), ("a", "root"),
        ("b", "b"), ("b", "root"),
        ("c", "c"), ("c", "a"), ("c", "root"),
        ("d", "d"), ("d", "a"), ("d", "root"),
        ("e", "e"), ("e", "b"), ("e", "root"),
    ]
    return spark.createDataFrame(anc, "term string, ancestor string")


def test_resnik_siblings_meet_at_parent(spark, tree_closure):
    pairs = spark.createDataFrame([("c", "d")], "term_a string, term_b string")
    row = resnik_similarity(pairs, tree_closure).collect()[0]
    # MICA(c, d) = a; IC(a) = ln(6/3)
    assert row.mica == "a"
    assert row.ic_x1e6 == math.floor(1e6 * math.log(6 / 3))


def test_resnik_cross_subtree_hits_root_ic_zero(spark, tree_closure):
    pairs = spark.createDataFrame([("c", "e")], "term_a string, term_b string")
    row = resnik_similarity(pairs, tree_closure).collect()[0]
    assert row.mica == "root" and row.ic_x1e6 == 0 and row.resnik == 0.0


def test_resnik_self_pair_uses_own_ic(spark, tree_closure):
    pairs = spark.createDataFrame([("c", "c")], "term_a string, term_b string")
    row = resnik_similarity(pairs, tree_closure).collect()[0]
    # MICA(c, c) = c itself; IC(c) = ln(6/1)
    assert row.mica == "c"
    assert row.ic_x1e6 == math.floor(1e6 * math.log(6.0))


# ---------------------------------------------------------------- quantization
def test_quantize_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    r1 = out[1]
    assert r1.scale == pytest.approx(1.0 / 127.0)
    assert r1.q == [127, -64, 32, 0]  # round(−0.5/scale) = round(−63.5) → −64
    assert r1.mse < (r1.scale / 2) ** 2  # error bounded by half a step
    r2 = out[2]
    assert r2.scale == 0.0 and r2.q == [0, 0, 0, 0] and r2.mse == 0.0


def test_quantize_clamps_extremes(spark):
    df = spark.createDataFrame(
        [(1, [100.0, -100.0, 1.0])], "vec_id int, embedding array<float>"
    )
    r = quantize_embeddings(df, "vec_id", "embedding").collect()[0]
    assert max(r.q) == 127 and min(r.q) == -127


# ---------------------------------------------------------------- ranking metrics
def test_ranking_metrics_exact(spark):
    cand = spark.createDataFrame(
        [
            ("q1", "a", 3.0), ("q1", "g", 2.0), ("q1", "b", 1.0),   # gold rank 2
            ("q2", "g", 9.0), ("q2", "x", 1.0),                      # gold rank 1
            ("q3", "x", 1.0), ("q3", "y", 0.5),                      # gold absent
        ],
        "query_id string, candidate_id string, score double",
    )
    gold = spark.createDataFrame(
        [("q1", "g"), ("q2", "g"), ("q3", "g")], "query_id string, gold_id string"
    )
    row = ranking_metrics(cand, gold, ks=(1, 3)).collect()[0]
    assert (row.n_queries, row.n_ranked) == (3, 2)
    assert row.mrr == pytest.approx((0.5 + 1.0) / 2, abs=1e-6)
    assert row.hits_1 == pytest.approx(0.5, abs=1e-6)
    assert row.hits_3 == pytest.approx(1.0, abs=1e-6)


def test_ranking_metrics_tie_breaks_on_candidate_id(spark):
    # gold "b" ties with "a" at score 5 — "a" < "b" wins → gold rank 2
    cand = spark.createDataFrame(
        [("q", "a", 5.0), ("q", "b", 5.0)],
        "query_id string, candidate_id string, score double",
    )
    gold = spark.createDataFrame([("q", "b")], "query_id string, gold_id string")
    row = ranking_metrics(cand, gold, ks=(1,)).collect()[0]
    assert row.mrr == pytest.approx(0.5, abs=1e-6)
    assert row.hits_1 == 0.0


# ---------------------------------------------------------------- RRF
def test_rrf_consensus_beats_single_first_place(spark):
    rows = [
        ("r1", "q", "d1", 1), ("r1", "q", "d2", 2),
        ("r2", "q", "d2", 1), ("r2", "q", "d3", 2),
        ("r3", "q", "d2", 2), ("r3", "q", "d3", 1),
    ]
    df = spark.createDataFrame(rows, "ranker string, query_id string, doc_id string, rank int")
    out = rrf_fuse(df, k=60, top_n=3).collect()
    by_rank = {r.fused_rank: r for r in out}
    assert by_rank[1].doc_id == "d2" and by_rank[1].n_rankers == 3
    # d2: rank 2 in r1, rank 1 in r2, rank 2 in r3
    expected = math.floor(1e9 / 62) + math.floor(1e9 / 61) + math.floor(1e9 / 62)
    assert by_rank[1].rrf_x1e9 == expected


def test_rrf_top_n_and_deterministic_ties(spark):
    rows = [("r1", "q", d, i + 1) for i, d in enumerate("abcde")] + [
        ("r2", "q", d, i + 1) for i, d in enumerate("abcde")
    ]
    df = spark.createDataFrame(rows, "ranker string, query_id string, doc_id string, rank int")
    out = rrf_fuse(df, k=60, top_n=2).collect()
    assert len(out) == 2
    assert [r.doc_id for r in sorted(out, key=lambda r: r.fused_rank)] == ["a", "b"]
