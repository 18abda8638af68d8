"""Explicit-salting operator (north rule: 'explicit salting, AQE skew-join
splitting, and repartition-by-range')."""

import time

from pyspark.sql import functions as F

from kg_microbe_spark.operators.salting import salted_collect_set


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_equals_naive(spark):
    rows = [(k % 5, f"v{k % 13}") for k in range(500)] + [(9, "only")]
    df = spark.createDataFrame(rows, "k int, v string")
    for parts in (1, 4):
        got = {
            r.k: (list(r.vals), r.n)
            for r in salted_collect_set(
                df.repartition(parts), ["k"], "v", "vals", salt_buckets=7, count_col="n"
            ).collect()
        }
        want = {
            r.k: (sorted(r.vals), r.n)
            for r in df.groupBy("k")
            .agg(F.collect_set("v").alias("vals"), F.count("*").alias("n"))
            .collect()
        }
        assert got == want


def test_salted_no_count(spark):
    df = spark.createDataFrame([(1, "b"), (1, "a"), (2, "a")], "k int, v string")
    out = salted_collect_set(df, ["k"], "v", "vals", salt_buckets=3)
    assert out.columns == ["k", "vals"]
    assert {r.k: list(r.vals) for r in out.collect()} == {1: ["a", "b"], 2: ["a"]}


def test_salted_hot_key_two_phase(spark):
    """ONE key with 10^6 rows (5k distinct values): the plan must salt
    (pmod of the value hash) and both aggregate phases must exist; the
    run completes in bounded time with the exact sorted value set."""
    n = 1_000_000
    df = spark.range(n).select(
        F.lit("hub").alias("k"),
        F.concat(F.lit("v"), F.lpad((F.col("id") % 5000).cast("string"), 5, "0")).alias("v"),
    )
    out = salted_collect_set(df, ["k"], "v", "vals", salt_buckets=16, count_col="n")
    plan = _plan(out)
    assert "pmod" in plan, "salt expression missing from plan"
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") + plan.count(
        "SortAggregate"
    ) >= 2, "two-phase salted aggregation expected"
    t0 = time.time()
    rows = out.collect()
    wall = time.time() - t0
    assert len(rows) == 1
    assert rows[0].n == n
    assert len(rows[0].vals) == 5000
    assert list(rows[0].vals) == sorted(rows[0].vals)
    assert wall < 60, f"hot-key salted collect took {wall:.1f}s"
