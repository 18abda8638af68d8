"""Burst z-scores, link reciprocity, crawl frontier, KMV sketch, k-means."""

import math

import pytest

from kg_microbe_spark.operators.linkgraph import (
    crawl_frontier_schedule,
    link_reciprocity,
)
from kg_microbe_spark.operators.similarity import kmeans_assign
from kg_microbe_spark.operators.stats import kmv_distinct
from kg_microbe_spark.operators.temporal import burst_zscores


def test_burst_zscore_hand_computed(spark):
    # user 1: bucket counts [1, 1, 4] → μ=2, var=(1+1+16)/3−4=2
    rows = [
        (1, "2024-01-01 00:30:00"),
        (1, "2024-01-01 01:30:00"),
        (1, "2024-01-01 02:00:00"),
        (1, "2024-01-01 02:10:00"),
        (1, "2024-01-01 02:20:00"),
        (1, "2024-01-01 02:30:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").selectExpr(
        "user_id", "cast(ts as timestamp) ts"
    )
    out = {r.bucket: r for r in burst_zscores(df, "user_id", "ts", 3600).collect()}
    assert len(out) == 3
    zs = sorted(round(r.zscore, 6) for r in out.values())
    exp = sorted(round((c - 2.0) / math.sqrt(2.0), 6) for c in (1, 1, 4))
    assert zs == exp


def test_burst_single_bucket_and_zero_variance(spark):
    rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:00"),
            (2, "2024-01-01 01:00:00")]
    df = spark.createDataFrame(rows, "user_id int, ts string").selectExpr(
        "user_id", "cast(ts as timestamp) ts"
    )
    out = burst_zscores(df, "user_id", "ts", 3600).collect()
    assert all(r.zscore == 0.0 for r in out)  # m=1 and var=0 guards


def test_burst_rejects_bad_bucket(spark):
    df = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "user_id int, ts string")
    with pytest.raises(ValueError):
        burst_zscores(df, "user_id", "ts", 0)


def test_reciprocity_full_and_none(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r for r in link_reciprocity(e, "src", "dst").collect()}
    assert out["a"].out_deg == 2 and out["a"].n_reciprocal == 1
    assert out["a"].reciprocity == 0.5
    assert out["b"].reciprocity == 1.0
    assert out["c"].out_deg == 0 and out["c"].reciprocity == 0.0


def test_reciprocity_self_loops_and_dups_ignored(spark):
    edges = [("a", "a"), ("a", "b"), ("a", "b")]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r for r in link_reciprocity(e, "src", "dst").collect()}
    assert out["a"].out_deg == 1 and out["a"].in_deg == 0


def test_frontier_round_capping(spark):
    rows = [(f"u{i}", "h", 10 - i) for i in range(7)] + [("x", "h2", 5)]
    df = spark.createDataFrame(rows, "url string, host string, priority int")
    out = crawl_frontier_schedule(df, "url", "host", "priority", 3).collect()
    by_url = {r.url: r for r in out}
    # u0 has top priority → rank 1, round 1; u6 rank 7 → round 3
    assert by_url["u0"].rank_in_host == 1 and by_url["u0"].fetch_round == 1
    assert by_url["u6"].fetch_round == 3
    rounds = {}
    for r in out:
        if r.host == "h":
            rounds.setdefault(r.fetch_round, 0)
            rounds[r.fetch_round] += 1
    assert all(v <= 3 for v in rounds.values())
    assert by_url["x"].fetch_round == 1


def test_frontier_deterministic_tie_break(spark):
    rows = [("b", "h", 1), ("a", "h", 1)]
    df = spark.createDataFrame(rows, "url string, host string, priority int")
    out = {r.url: r.rank_in_host for r in
           crawl_frontier_schedule(df, "url", "host", "priority", 1).collect()}
    assert out == {"a": 1, "b": 2}


def test_frontier_rejects_bad_slots(spark):
    df = spark.createDataFrame([("a", "h", 1)], "url string, host string, priority int")
    with pytest.raises(ValueError):
        crawl_frontier_schedule(df, "url", "host", "priority", 0)


def test_kmv_exact_below_capacity(spark):
    rows = [("g", f"v{i}") for i in range(5)] + [("g", "v0")]
    df = spark.createDataFrame(rows, "grp string, val string")
    r = kmv_distinct(df, "grp", "val", k=16).collect()[0]
    assert r.n_kept == 5 and r.est_distinct == 5.0


def test_kmv_estimate_within_tolerance(spark):
    # 500 distinct values, k=64 → relative error ~1/sqrt(k-1) ≈ 13%
    rows = [("g", f"value-{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, val string")
    r = kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert r.n_kept == 64
    assert 500 * 0.6 < r.est_distinct < 500 * 1.4


def test_kmv_rejects_bad_k(spark):
    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    with pytest.raises(ValueError):
        kmv_distinct(df, "grp", "val", k=1)


def test_kmeans_assigns_nearest_with_tie_break(spark):
    pts = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0]), (12, [0.5, 0.5])],
        "vec_id int, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "cid int, cvec array<float>",
    )
    out = {r.vec_id: r for r in
           kmeans_assign(pts, "vec_id", "embedding", cents, "cid", "cvec").collect()}
    assert out[10].cluster_id == 0 and out[10].dist2_int == 0
    assert out[11].cluster_id == 1
    assert out[12].cluster_id == 0  # equidistant → smaller cid wins


def test_kmeans_dist_is_integerized_l2(spark):
    pts = spark.createDataFrame(
        [(1, [3.0, 4.0])], "vec_id int, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cid int, cvec array<float>"
    )
    r = kmeans_assign(pts, "vec_id", "embedding", cents, "cid", "cvec").collect()[0]
    assert r.dist2_int == 9_000_000_000 + 16_000_000_000
