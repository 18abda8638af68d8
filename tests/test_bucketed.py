"""Bucketed tables (sources/bucketed.py): shuffle-free co-located joins."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.sources.bucketed import drop_table, safe_table_name, write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark):
    base = tempfile.mkdtemp(prefix="bucketed_test_")
    app = spark.sparkContext.applicationId
    left = spark.createDataFrame(
        [(i % 20, i, float(i)) for i in range(500)], "k long, row_id long, v double"
    )
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(20)], "k long, name string")
    ln = write_bucketed_table(left, f"t_left_{app}", f"{base}/left", ["k"], 4)
    rn = write_bucketed_table(right, f"t_right_{app}", f"{base}/right", ["k"], 4)
    yield ln, rn, left, right
    drop_table(spark, ln)
    drop_table(spark, rn)
    shutil.rmtree(base, ignore_errors=True)


def test_bucketed_join_zero_exchange(spark, bucketed_pair):
    ln, rn, left, right = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ln).join(spark.table(rn), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        # (SMJ still sorts within each bucket: Spark only trusts sortBy
        # metadata when a bucket is a single file, and a multi-partition
        # write produces several files per bucket. The Exchange — the
        # cluster-wide data movement — is what bucketing removes.)
        # and the answer is the plain join's answer
        got = {(r.row_id, r.name) for r in joined.collect()}
        want = {(r.row_id, r.name) for r in left.join(right, on="k").collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_zero_exchange(spark, bucketed_pair):
    ln, _, left, _ = bucketed_pair
    agg = spark.table(ln).groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"groupBy on the bucket key must not shuffle:\n{plan}"
    got = {(r.k, r.s) for r in agg.collect()}
    want = {(r.k, r.s) for r in left.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want


def test_mismatched_bucket_counts_still_correct(spark, bucketed_pair):
    # correctness never depends on co-location: a 4-bucket ⋈ 2-bucket join
    # falls back to shuffling but returns the same rows
    ln, _, left, right = bucketed_pair
    base = tempfile.mkdtemp(prefix="bucketed_mismatch_")
    app = spark.sparkContext.applicationId
    rn2 = write_bucketed_table(right, f"t_right2_{app}", f"{base}/right2", ["k"], 2)
    try:
        got = {(r.row_id, r.name) for r in spark.table(ln).join(spark.table(rn2), on="k").collect()}
        want = {(r.row_id, r.name) for r in left.join(right, on="k").collect()}
        assert got == want
    finally:
        drop_table(spark, rn2)
        shutil.rmtree(base, ignore_errors=True)


def test_safe_table_name():
    assert safe_table_name("local-1755443-app.7") == "local_1755443_app_7"
