"""B-cubed clustering evaluation and one-pass column profiling."""

import pytest

from kg_microbe_spark.operators.evaluation import bcubed_scores
from kg_microbe_spark.operators.stats import profile_columns


def _frames(spark, pred_rows, gold_rows):
    p = spark.createDataFrame(pred_rows, "id int, cluster string")
    g = spark.createDataFrame(gold_rows, "id int, class_ string")
    return p, g


def test_bcubed_perfect(spark):
    p, g = _frames(
        spark,
        [(1, "a"), (2, "a"), (3, "b")],
        [(1, "x"), (2, "x"), (3, "y")],
    )
    r = bcubed_scores(p, g).collect()[0]
    assert r.n_items == 3
    assert r.precision == 1.0 and r.recall == 1.0 and r.f1 == 1.0


def test_bcubed_single_cluster_textbook(spark):
    # gold: class X = {1..5}, Y = {6,7}; predicted: everything together.
    # B3P = (5*(5/7) + 2*(2/7))/7 = 29/49; B3R = 1
    p, g = _frames(
        spark,
        [(i, "all") for i in range(1, 8)],
        [(i, "X") for i in range(1, 6)] + [(6, "Y"), (7, "Y")],
    )
    r = bcubed_scores(p, g).collect()[0]
    assert r.precision == pytest.approx(29 / 49, abs=1e-5)
    assert r.recall == pytest.approx(1.0, abs=1e-6)
    pr = 29 / 49
    assert r.f1 == pytest.approx(2 * pr / (pr + 1), abs=1e-5)


def test_bcubed_inner_join_universe(spark):
    # id 9 predicted but not gold-labelled -> drops from every term
    p, g = _frames(
        spark,
        [(1, "a"), (2, "a"), (9, "a")],
        [(1, "x"), (2, "x")],
    )
    r = bcubed_scores(p, g).collect()[0]
    assert r.n_items == 2 and r.precision == 1.0 and r.recall == 1.0


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(2, "b"), (10, "a"), (None, "a"), (2, None)],
        "x int, s string",
    )
    rows = {r.column: r for r in profile_columns(df, ["x", "s"]).collect()}
    x = rows["x"]
    assert x.n_rows == 4 and x.n_nulls == 1 and x.n_distinct == 2
    # numeric ordering BEFORE stringify: max is "10", not "2"
    assert x.min_value == "2" and x.max_value == "10"
    s = rows["s"]
    assert s.n_nulls == 1 and s.n_distinct == 2
    assert s.min_value == "a" and s.max_value == "b"
    with pytest.raises(ValueError):
        profile_columns(df, [])
