"""Compaction planning (operators/compaction.py): next-fit-decreasing
packing semantics, oversized files, group totals, guards."""

import pytest

from kg_microbe_spark.operators.compaction import compaction_plan


def _plan(spark, rows, target):
    df = spark.createDataFrame(rows, "part string, file_id int, size_bytes long")
    out = compaction_plan(df, target_bytes=target)
    return {
        r["file_id"]: (r["compaction_group"], r["group_bytes"], r["n_files"])
        for r in out.collect()
    }


def test_next_fit_decreasing_packing(spark):
    # target 100: sizes sorted desc = 70, 40, 30, 20 -> csum 70,110,140,160
    # -> groups 1, 2, 2, 2.
    got = _plan(
        spark,
        [("p", 1, 40), ("p", 2, 70), ("p", 3, 20), ("p", 4, 30)],
        target=100,
    )
    assert got == {
        2: (1, 70, 1),
        1: (2, 90, 3),
        3: (2, 90, 3),
        4: (2, 90, 3),
    }


def test_oversized_file_spans_groups_alone(spark):
    # A 250-byte file against target 100 lands alone (csum 250 -> group 3);
    # the next file starts csum 280 -> group 3 as well only if it fits the
    # tail — next-fit semantics: group = ((csum-1) div target) + 1.
    got = _plan(spark, [("p", 1, 250), ("p", 2, 30)], target=100)
    # exact tuples (ADVICE r5: the or-fallback made the strict half
    # vacuous): csum 250 and 280 share ((csum-1) div 100)+1 == 3, so both
    # files form one 280-byte 2-file group.
    assert got[1] == (3, 280, 2)
    assert got[2] == (3, 280, 2)


def test_partitions_plan_independently(spark):
    got = _plan(
        spark,
        [("a", 1, 60), ("a", 2, 60), ("b", 3, 60), ("b", 4, 60)],
        target=100,
    )
    assert got[1][0] == 1 and got[2][0] == 2
    assert got[3][0] == 1 and got[4][0] == 2


def test_target_guard():
    with pytest.raises(ValueError):
        compaction_plan(None, target_bytes=0)
