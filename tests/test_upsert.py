"""upsert_latest (operators/merge.py): latest-wins SCD-1 compaction."""

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.merge import upsert_latest


def test_upsert_basic(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 20), (4, "d", 20)], "k long, v string, ver long"
    )
    got = {(r.k, r.v, r.ver) for r in upsert_latest(base, updates, ["k"], "ver").collect()}
    assert got == {(1, "a", 10), (2, "b2", 20), (3, "c", 10), (4, "d", 20)}


def test_upsert_updates_win_version_ties(spark):
    base = spark.createDataFrame([(1, "old", 10)], "k long, v string, ver long")
    updates = spark.createDataFrame([(1, "new", 10)], "k long, v string, ver long")
    got = upsert_latest(base, updates, ["k"], "ver").collect()
    assert [(r.k, r.v) for r in got] == [(1, "new")]


def test_upsert_stale_update_ignored(spark):
    base = spark.createDataFrame([(1, "cur", 20)], "k long, v string, ver long")
    updates = spark.createDataFrame([(1, "stale", 10)], "k long, v string, ver long")
    got = upsert_latest(base, updates, ["k"], "ver").collect()
    assert [(r.k, r.v, r.ver) for r in got] == [(1, "cur", 20)]


def test_upsert_deterministic_under_repartition(spark):
    base = spark.createDataFrame(
        [(i % 7, f"b{i}", i % 3) for i in range(300)], "k long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(i % 7, f"u{i}", i % 3) for i in range(300)], "k long, v string, ver long"
    )
    a = sorted(map(tuple, upsert_latest(base, updates, ["k"], "ver").collect()))
    b = sorted(
        map(
            tuple,
            upsert_latest(base.repartition(13), updates.repartition(3), ["k"], "ver").collect(),
        )
    )
    assert a == b


def test_upsert_schema_mismatch_raises(spark):
    base = spark.createDataFrame([(1, "a", 1)], "k long, v string, ver long")
    bad = spark.createDataFrame([(1, 1)], "k long, ver long")
    with pytest.raises(ValueError, match="schemas differ"):
        upsert_latest(base, bad, ["k"], "ver")


def test_upsert_plan_is_partial_agg(spark):
    base = spark.createDataFrame([(1, "a", 1)], "k long, v string, ver long")
    updates = spark.createDataFrame([(1, "b", 2)], "k long, v string, ver long")
    plan = (
        upsert_latest(base, updates, ["k"], "ver")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max_by" in plan, plan  # map-side combine absorbs hub keys
