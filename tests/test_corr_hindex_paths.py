"""Unit tests for numeric_correlations, h_index_per_key, path_ngrams,
and longest_prefix_match on constructed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kg_microbe_spark.operators.prefix_match import longest_prefix_match
from kg_microbe_spark.operators.stats import h_index_per_key, numeric_correlations
from kg_microbe_spark.operators.temporal import path_ngrams


def test_numeric_correlations_perfect_and_inverse(spark):
    rows = [(i, 2 * i + 3, 10 - i, 7) for i in range(20)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    out = {
        (r["col_a"], r["col_b"]): r["r"]
        for r in numeric_correlations(
            df,
            [
                ("a", F.col("a")),
                ("b", F.col("b")),
                ("c", F.col("c")),
                ("d", F.col("d")),
            ],
        ).collect()
    }
    assert out[("a", "b")] == 1.0       # perfectly linear
    assert out[("a", "c")] == -1.0      # perfectly inverse
    assert out[("a", "d")] is None      # constant column -> NULL
    assert out[("b", "c")] == -1.0
    assert len(out) == 6


def test_h_index_per_key_textbook_cases(spark):
    rows = (
        # key "a": values 10,8,5,4,3 -> h=4
        [("a", v) for v in (10, 8, 5, 4, 3)]
        # key "b": 3,3,3 -> h=3 (ties at the boundary)
        + [("b", 3), ("b", 3), ("b", 3)]
        # key "c": all zeros -> h=0
        + [("c", 0), ("c", 0)]
        # key "d": single paper with 100 -> h=1
        + [("d", 100)]
    )
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: r["h_index"] for r in h_index_per_key(df, "k", "v").collect()}
    assert got == {"a": 4, "b": 3, "c": 0, "d": 1}


def test_path_ngrams_windows_do_not_cross_keys(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, ts(0), "a", 1), (1, ts(1), "b", 2), (1, ts(2), "c", 3),
        (1, ts(3), "a", 4),
        (2, ts(0), "b", 5), (2, ts(1), "c", 6), (2, ts(2), "a", 7),
        (3, ts(0), "x", 8),  # too short for any trigram
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string, eid long")
    got = {
        r["path"]: r["n_occurrences"]
        for r in path_ngrams(df, "u", "ts", "s", "eid", n=3, top_k=10).collect()
    }
    # user 1 contributes a>b>c and b>c>a; user 2 contributes b>c>a
    assert got == {"b>c>a": 2, "a>b>c": 1}


def test_path_ngrams_topk_deterministic_tiebreak(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, seq in [(1, "abz"), (2, "aby")]:
        for i, s in enumerate(seq):
            rows.append((u, t0 + dt.timedelta(minutes=i), s, eid))
            eid += 1
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string, eid long")
    got = path_ngrams(df, "u", "ts", "s", "eid", n=3, top_k=1).collect()
    assert [(r["path"], r["n_occurrences"]) for r in got] == [("a>b>y", 1)]


def test_longest_prefix_match_specificity_and_null(spark):
    facts = spark.createDataFrame(
        [("/a/b/c",), ("/a/x",), ("/z/q",), ("/a/b/c",)], "url string"
    )
    rules = spark.createDataFrame(
        [("/a/", "shallow"), ("/a/b/", "deep")], "prefix string, action string"
    )
    out = longest_prefix_match(facts, "url", rules, "prefix").collect()
    got = sorted((r["url"], r["matched_prefix"], r["action"]) for r in out)
    # duplicate fact rows keep their multiplicity; /z/q stays unmatched
    assert got == [
        ("/a/b/c", "/a/b/", "deep"),
        ("/a/b/c", "/a/b/", "deep"),
        ("/a/x", "/a/", "shallow"),
        ("/z/q", None, None),
    ]


def test_longest_prefix_match_explicit_lengths_filter(spark):
    facts = spark.createDataFrame([("/abc",), ("/a",)], "url string")
    rules = spark.createDataFrame([("/abc", "hit")], "prefix string, action string")
    out = {
        r["url"]: r["action"]
        for r in longest_prefix_match(
            facts, "url", rules, "prefix", rule_lengths=[4]
        ).collect()
    }
    # "/a" is shorter than every rule length -> probe filtered, NULL match
    assert out == {"/abc": "hit", "/a": None}
