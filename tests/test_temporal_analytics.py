"""Unit tests for the round-5 event-analytics operators
(coalesce_intervals, event_funnel, retention_cohorts,
markov_transitions) on constructed fixtures with known answers."""

from __future__ import annotations

import datetime as dt

from kg_microbe_spark.operators.temporal import (
    coalesce_intervals,
    event_funnel,
    markov_transitions,
    retention_cohorts,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_coalesce_intervals_merges_overlap_and_adjacency(spark):
    rows = [
        # key "a": [1,5] overlaps [4,9]; [9,12] touches (start == prior end)
        ("a", 1, 5),
        ("a", 4, 9),
        ("a", 9, 12),
        ("a", 20, 25),  # separate island
        # key "b": contained interval never splits the island
        ("b", 0, 100),
        ("b", 10, 20),
        ("b", 150, 160),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r["k"], r["island_start"]): (r["island_end"], r["n_intervals"])
        for r in coalesce_intervals(df, "k", "s", "e").collect()
    }
    assert got == {
        ("a", 1): (12, 3),
        ("a", 20): (25, 1),
        ("b", 0): (100, 2),
        ("b", 150): (160, 1),
    }


def test_coalesce_intervals_tie_rows_are_order_invariant(spark):
    rows = [("k", 5, 8), ("k", 5, 8), ("k", 5, 6)]
    df = spark.createDataFrame(rows, "k string, s long, e long").repartition(3)
    out = coalesce_intervals(df, "k", "s", "e").collect()
    assert len(out) == 1 and out[0]["n_intervals"] == 3
    assert (out[0]["island_start"], out[0]["island_end"]) == (5, 8)


def test_event_funnel_strict_order_and_first_qualifying(spark):
    rows = [
        # u1 completes all three in order
        (1, _ts(0), "A"), (1, _ts(1), "B"), (1, _ts(2), "C"),
        # u2 does B BEFORE its first A -> stops at step 1
        (2, _ts(5), "B"), (2, _ts(6), "A"),
        # u3: C between first A and first-qualifying B does NOT count;
        # first-qualifying semantics: t_B = min B after t_A, C must be
        # after THAT B — here C at minute 12 > B at 11 -> completes.
        (3, _ts(10), "A"), (3, _ts(11), "B"), (3, _ts(12), "C"),
        # u4: C before qualifying B -> reaches step 2 only
        (4, _ts(20), "A"), (4, _ts(22), "B"), (4, _ts(21), "C"),
        # u5 never signs up
        (5, _ts(30), "B"), (5, _ts(31), "C"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
    got = {
        r["step_name"]: r["n_users"]
        for r in event_funnel(df, "u", "ts", "t", ["A", "B", "C"]).collect()
    }
    assert got == {"A": 4, "B": 3, "C": 2}


def test_retention_cohorts_offsets(spark):
    day = 86400
    rows = [
        # u1 first in bucket 0, active buckets 0 and 2
        (1, dt.datetime.fromtimestamp(10, dt.timezone.utc)),
        (1, dt.datetime.fromtimestamp(2 * day + 5, dt.timezone.utc)),
        # u2 first in bucket 1 only
        (2, dt.datetime.fromtimestamp(day + 50, dt.timezone.utc)),
        # u3 first bucket 0, active 0, 1
        (3, dt.datetime.fromtimestamp(20, dt.timezone.utc)),
        (3, dt.datetime.fromtimestamp(day + 20, dt.timezone.utc)),
        (3, dt.datetime.fromtimestamp(day + 21, dt.timezone.utc)),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (r["cohort_bucket"], r["bucket_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "ts", bucket_seconds=day).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_markov_transitions_counts_and_probs(spark):
    rows = [
        (1, _ts(0), "x", 10),
        (1, _ts(1), "y", 11),
        (1, _ts(2), "x", 12),
        (1, _ts(3), "y", 13),
        (2, _ts(0), "x", 20),
        (2, _ts(1), "x", 21),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string, eid long")
    got = {
        (r["prev_state"], r["next_state"]): (r["n_transitions"], r["p"])
        for r in markov_transitions(df, "u", "ts", "s", "eid").collect()
    }
    # prev x: x->y twice, x->x once; prev y: y->x once
    assert got == {
        ("x", "y"): (2, round(2 / 3, 6)),
        ("x", "x"): (1, round(1 / 3, 6)),
        ("y", "x"): (1, 1.0),
    }


def test_markov_transitions_tiebreaker_makes_pairing_deterministic(spark):
    t0 = _ts(0)
    rows = [(1, t0, "a", 1), (1, t0, "b", 2), (1, t0, "c", 3)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string, eid long")
    got = {
        (r["prev_state"], r["next_state"])
        for r in markov_transitions(df, "u", "ts", "s", "eid").collect()
    }
    assert got == {("a", "b"), ("b", "c")}
