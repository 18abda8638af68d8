"""Tests for the quantitative binning operator (metatraits.py:1536-1608
semantics) and the F8 JSON dot-path operator (bacdive.py:1012-1057)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_spark.operators.binning import (
    classify_binned,
    parse_range_midpoint_col,
    parse_unit_col,
    parse_value_col,
    range_table,
)
from kg_microbe_spark.operators.json_path import explode_json_path, json_path_values


def _parse_all(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        parse_value_col(F.col("s")).alias("v"),
        parse_range_midpoint_col(F.col("s")).alias("mid"),
        parse_unit_col(F.col("s")).alias("u"),
    ).collect()
    return [(r.v, r.mid, r.u) for r in rows]


def test_parse_quantitative_values(spark):
    got = _parse_all(
        spark,
        ["37.5 C", "10-20 %", "  -5 pH", "7", "unknown", "", "3.5-4.5", "12 g/L extra",
         "-10--5 C", "-2.5-4 C"],
    )
    assert got[0] == (37.5, 37.5, "C")
    assert got[1] == (10.0, 15.0, "%")          # range → midpoint, unit past the range
    assert got[2] == (-5.0, -5.0, "pH")
    assert got[3] == (7.0, 7.0, "")
    assert got[4] == (None, None, None)          # unparseable → NULLs (fail open)
    assert got[5] == (None, None, None)
    assert got[6] == (3.5, 4.0, "")
    assert got[7] == (12.0, 12.0, "g/L extra")
    assert got[8] == (-10.0, -7.5, "C")          # sub-zero range: signed hi → midpoint
    assert got[9] == (-2.5, 0.75, "C")           # negative lo, positive hi


def test_classify_binned_half_open_and_fail_open(spark):
    ranges = range_table(spark, [(0.0, 15.0, "low"), (15.0, 45.0, "mid"), (45.0, 100.0, "high")])
    df = spark.createDataFrame(
        [(0.0,), (14.999,), (15.0,), (44.999,), (45.0,), (99.0,), (150.0,), (None,)],
        "v double",
    )
    got = {r.v: r.bin_label for r in classify_binned(df, "v", ranges).collect()}
    assert got[0.0] == "low" and got[14.999] == "low"
    assert got[15.0] == "mid" and got[44.999] == "mid"     # half-open boundaries
    assert got[45.0] == "high" and got[99.0] == "high"
    assert got[150.0] is None and got[None] is None        # out-of-range / NULL fail open


def test_classify_binned_is_broadcast(spark):
    ranges = range_table(spark, [(0.0, 50.0, "x")])
    df = spark.createDataFrame([(1.0,)], "v double")
    plan = classify_binned(df, "v", ranges)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # tiny range table never shuffles the fact side


def test_json_path_scalar_list_and_missing(spark):
    docs = [
        '{"a": {"b": [1, 2, 3]}}',
        '{"a": {"b": 7}}',
        '{"a": {}}',
        '{"other": 1}',
        None,
    ]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    got = [r.vs for r in df.select(json_path_values(F.col("j"), "a.b", "bigint").alias("vs")).collect()]
    assert got == [[1, 2, 3], [7], [], [], []]


def test_json_path_string_scalars_and_object_leaves(spark):
    # get_json_object returns scalars UNQUOTED: a from_json round-trip on a
    # string leaf is malformed JSON and silently yields [] — the operator
    # must return the scalar itself (reference default elem_type is string).
    docs = [
        '{"a": {"b": "hello"}}',
        '{"a": {"b": ["x", "y"]}}',
        '{"a": {"b": 5}}',
        '{"a": {"b": {"nested": 1}}}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    got = [r.vs for r in df.select(json_path_values(F.col("j"), "a.b").alias("vs")).collect()]
    assert got[0] == ["hello"]       # string scalar survives (ADVICE r2 fix)
    assert got[1] == ["x", "y"]
    assert got[2] == ["5"]           # numeric scalar as default string type
    assert got[3] == []              # object leaf is non-scalar → skipped like the reference


def test_json_path_bracket_leading_string_scalar_out_of_contract(spark):
    """ADVICE r3 documentation test: scalars arrive UNQUOTED from
    get_json_object, so a string leaf whose value itself begins with '['
    or '{' is indistinguishable from an array/object node and is
    dispatched as one — OUT OF CONTRACT (the reference also keys on leaf
    shape). This test pins the current (accepted) behavior so a future
    change is a conscious one."""
    docs = [
        '{"a": {"b": "[x"}}',   # bracket-leading string → array dispatch → malformed → []
        '{"a": {"b": "{y"}}',   # brace-leading string → object dispatch → skipped → []
        '{"a": {"b": "plain"}}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    got = [r.vs for r in df.select(json_path_values(F.col("j"), "a.b").alias("vs")).collect()]
    assert got == [[], [], ["plain"]]


def test_json_path_list_of_objects_via_star(spark):
    # the reference's list-at-intermediate-level case: samples is a list of
    # dicts → caller writes [*] where the reference's dot-path hits a list
    df = spark.createDataFrame(
        [('{"isolation": {"samples": [{"ph": 6.5}, {"ph": 7.0}, {"nope": 1}]}}',)], "j string"
    )
    got = df.select(json_path_values(F.col("j"), "isolation.samples[*].ph", "double").alias("vs")).collect()
    assert got[0].vs == [6.5, 7.0]  # non-matching elements are filtered like the reference


def test_explode_json_path(spark):
    df = spark.createDataFrame([('{"a": [10, 20]}',), ('{"a": []}',)], "j string")
    got = sorted(r.v for r in explode_json_path(df, "j", "a", "v", "bigint").collect())
    assert got == [10, 20]  # empty lists yield no rows (reference returns [])
