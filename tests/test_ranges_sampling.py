"""Interval join (operators/ranges.py) + deterministic hash sampling
(operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F

from kg_microbe_spark.operators.ranges import interval_join
from kg_microbe_spark.operators.sampling import RESOLUTION, hash_bucket, hash_sample, hash_split


def _naive_interval_join(points, intervals):
    out = set()
    for pid, p in points:
        for lo, hi, tag in intervals:
            if lo <= p < hi:
                out.add((pid, tag))
    return out


def test_interval_join_matches_naive(spark):
    points = [(i, float(i * 3 % 47)) for i in range(60)]
    intervals = [
        (0.0, 10.0, "a"),
        (5.0, 25.0, "b"),   # overlaps a
        (25.0, 25.0, "e"),  # empty: matches nothing
        (30.0, 31.0, "c"),  # narrower than any sane bucket width
        (40.0, 47.0, "d"),
    ]
    pdf = spark.createDataFrame(points, "pid long, p double")
    idf = spark.createDataFrame(intervals, "lo double, hi double, tag string")
    for width in (None, 1.0, 10.0, 100.0):
        got = {
            (r.pid, r.tag)
            for r in interval_join(pdf, idf, "p", "lo", "hi", ["tag"], bucket_width=width).collect()
        }
        assert got == _naive_interval_join(points, intervals), f"width={width}"


def test_interval_join_boundary_exclusive(spark):
    # hi exactly on a bucket boundary must not claim the next bucket
    pdf = spark.createDataFrame([(1, 10.0), (2, 9.999)], "pid long, p double")
    idf = spark.createDataFrame([(0.0, 10.0, "x")], "lo double, hi double, tag string")
    got = {(r.pid, r.tag) for r in interval_join(pdf, idf, "p", "lo", "hi", ["tag"], 10.0).collect()}
    assert got == {(2, "x")}


def test_interval_join_shuffle_free_when_broadcast(spark):
    pdf = spark.createDataFrame([(1, 5.0)], "pid long, p double")
    idf = spark.createDataFrame([(0.0, 10.0, "x")], "lo double, hi double, tag string")
    plan = (
        interval_join(pdf, idf, "p", "lo", "hi", ["tag"], 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # broadcast equi-join on the bucket: no Exchange on the points side,
    # and crucially NOT a BroadcastNestedLoopJoin (what a raw range
    # predicate would plan)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def _py_bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % RESOLUTION


def test_hash_bucket_matches_python_md5(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(200)], "k string")
    got = {r.k: r.b for r in df.withColumn("b", hash_bucket(F.col("k"))).collect()}
    for i in range(200):
        assert got[f"k{i}"] == _py_bucket(f"k{i}")


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame([(f"url{i}",) for i in range(1000)], "url string")
    a = {r.url: r.split for r in hash_split(df, "url").collect()}
    b = {r.url: r.split for r in hash_split(df.repartition(13), "url").collect()}
    assert a == b  # stable under repartitioning
    # ratios near 80/10/10 (binomial tolerance at n=1000)
    from collections import Counter

    c = Counter(a.values())
    assert 740 <= c["train"] <= 860 and 60 <= c["val"] <= 140 and 60 <= c["test"] <= 140, c
    # every label derives from the python-side md5 boundary arithmetic
    for url, split in list(a.items())[:50]:
        bkt = _py_bucket(url)
        expect = "train" if bkt < 8000 else ("val" if bkt < 9000 else "test")
        assert split == expect


def test_hash_sample_subset_semantics(spark):
    df = spark.createDataFrame([(f"d{i}",) for i in range(500)], "k string")
    s30 = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    s60 = {r.k for r in hash_sample(df, "k", 0.6).collect()}
    assert s30 <= s60  # nested: growing the fraction only ADDS keys
    assert s30 == {f"d{i}" for i in range(500) if _py_bucket(f"d{i}") < 3000}
