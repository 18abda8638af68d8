"""native_session_window (operators/temporal.py) — boundary convention,
parity with the shipped lag-form sessionize on the same input."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kg_microbe_spark.operators.temporal import native_session_window, sessionize

BASE = datetime(2024, 1, 1)


def _events():
    rows = []
    # user 1: 3 events inside one session, then a touching-boundary event
    # exactly gap later (must EXTEND), then a > gap silence (new session)
    offs = [0, 100, 550, 550 + 600, 550 + 600 + 601]
    rows += [(1, BASE + timedelta(seconds=s)) for s in offs]
    # user 2: single event
    rows += [(2, BASE,)]
    # user 3: duplicate timestamps
    rows += [(3, BASE), (3, BASE), (3, BASE + timedelta(seconds=700))]
    return rows


def test_native_session_boundary_and_counts(spark):
    df = spark.createDataFrame(_events(), "u long, ts timestamp")
    got = {
        (r.u, r.session_start): (r.session_end, r.n_rows)
        for r in native_session_window(df, ["u"], "ts", 600).collect()
    }
    # user 1: first session covers offsets 0..1150 (touching event merged),
    # end = 1150 + 600; second session is the lone event at 1751
    s1_end, s1_n = got[(1, BASE)]
    assert s1_n == 4
    assert s1_end == BASE + timedelta(seconds=1150 + 600)
    s2_start = BASE + timedelta(seconds=1751)
    assert got[(1, s2_start)] == (s2_start + timedelta(seconds=600), 1)
    assert got[(2, BASE)] == (BASE + timedelta(seconds=600), 1)
    assert got[(3, BASE)][1] == 2
    assert got[(3, BASE + timedelta(seconds=700))][1] == 1


def test_native_matches_lag_form_sessionize(spark):
    df = spark.createDataFrame(_events(), "u long, ts timestamp")
    native = {
        (r.u, r.session_start, r.n_rows)
        for r in native_session_window(df, ["u"], "ts", 600).collect()
    }
    lagform = {
        (r.u, r.session_start, r.n_rows)
        for r in sessionize(df, ["u"], "ts", 600.0)
        .groupBy("u", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert native == lagform
