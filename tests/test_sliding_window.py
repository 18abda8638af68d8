"""sliding_window_agg (operators/temporal.py) vs python replication and
vs Spark's native F.window."""

import datetime

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.temporal import sliding_window_agg


def _rows(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=s), ["a", "b"][i % 2])
        for i, s in enumerate([0, 1, 299, 300, 301, 600, 899, 900, 1799])
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, k string"), rows


def _py_windows(rows, w, s):
    out = {}
    for _, ts, k in rows:
        ep = int(ts.timestamp())
        g = (ep // s) * s
        for j in range(w // s):
            start = g - j * s
            out[(start, k)] = out.get((start, k), 0) + 1
    return out


def test_sliding_matches_python(spark):
    df, rows = _rows(spark)
    for w, s in ((600, 300), (900, 300), (300, 300)):
        got = {
            (r.window_start_epoch, r.k): r.n_rows
            for r in sliding_window_agg(df, "ts", w, s, ["k"]).collect()
        }
        assert got == _py_windows(rows, w, s), (w, s)
        # end column
        one = sliding_window_agg(df, "ts", w, s, ["k"]).first()
        assert one.window_end_epoch - one.window_start_epoch == w


def test_sliding_matches_native_f_window(spark):
    df, _ = _rows(spark)
    ours = {
        (r.window_start_epoch, r.n_rows)
        for r in sliding_window_agg(df, "ts", 600, 300).collect()
    }
    native = {
        (int(r.window.start.timestamp()), r.n)
        for r in df.groupBy(F.window("ts", "600 seconds", "300 seconds"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert ours == native


def test_sliding_validation(spark):
    df, _ = _rows(spark)
    with pytest.raises(ValueError, match="multiple"):
        sliding_window_agg(df, "ts", 700, 300)
    with pytest.raises(ValueError, match="≥ 1s"):
        sliding_window_agg(df, "ts", 0, 1)
