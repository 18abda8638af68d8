"""Incremental closure maintenance (operators/closure.py
incremental_closure): delta-only output, equivalence with full
recompute, multi-delta-edge chains."""

from pyspark.sql import functions as F

from kg_microbe_spark.operators.closure import (
    incremental_closure,
    transitive_closure,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in pairs],
        "subject string, predicate string, object string",
    )


def _closed(spark, pairs):
    return transitive_closure(_edges(spark, pairs), "p").select(
        "subject", "object"
    )


def _pairs(df):
    return {(r.subject, r.object) for r in df.collect()}


def test_incremental_matches_full_recompute(spark):
    base = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")]
    delta = [("c", "x"), ("q", "a")]
    c = _closed(spark, base)
    new = incremental_closure(
        c, spark.createDataFrame(delta, "subject string, object string")
    )
    full = _pairs(_closed(spark, base + delta))
    assert _pairs(new) == full - _pairs(c)
    # the bridge pair exists and the delta-only property holds
    assert ("a", "z") in _pairs(new) and ("a", "c") not in _pairs(new)


def test_incremental_multi_delta_chain(spark):
    # two delta edges chained THROUGH a base segment: d1 into b-chain,
    # base chain, d2 out — requires the fixpoint on D', not one pass
    base = [("m", "n")]
    delta = [("k", "m"), ("n", "o"), ("o", "p")]
    c = _closed(spark, base)
    new = _pairs(
        incremental_closure(
            c, spark.createDataFrame(delta, "subject string, object string")
        )
    )
    assert ("k", "p") in new and ("m", "p") in new and ("k", "n") in new
    assert new == _pairs(_closed(spark, base + delta)) - _pairs(c)


def test_incremental_duplicate_delta_yields_nothing(spark):
    base = [("a", "b"), ("b", "c")]
    c = _closed(spark, base)
    dup = spark.createDataFrame([("a", "b")], "subject string, object string")
    assert _pairs(incremental_closure(c, dup)) == set()


def test_incremental_empty_base(spark):
    c = spark.createDataFrame([], "subject string, object string")
    delta = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "subject string, object string"
    )
    assert _pairs(incremental_closure(c, delta)) == {
        ("a", "b"), ("b", "c"), ("a", "c"),
    }
