"""Blocked edit-distance pairs (operators/editjoin.py)."""

import pytest

from kg_microbe_spark.operators.editjoin import blocked_edit_distance_pairs


def test_editjoin_finds_typo_pairs(spark):
    names = spark.createDataFrame(
        [
            ("n1", "lactobacillus"),
            ("n2", "lactobacilus"),   # deletion, dist 1
            ("n3", "Lactobacillus "), # case/trim twin of n1, dist 0
            ("n4", "streptococcus"),  # different block
            ("n5", "lactococcus"),    # same block, dist 4 — above cut
        ],
        "id string, name string",
    )
    out = {
        (r.id_a, r.id_b): r.distance
        for r in blocked_edit_distance_pairs(names, "id", "name").collect()
    }
    assert out == {("n1", "n2"): 1, ("n1", "n3"): 0, ("n2", "n3"): 1}


def test_editjoin_block_guard_and_prefix(spark):
    names = spark.createDataFrame(
        [(f"x{i}", f"aa{i:03d}") for i in range(10)] + [("y1", "zz1"), ("y2", "zz2")],
        "id string, name string",
    )
    # the 'aa' block (10 names) exceeds cap 5 → dropped; 'zz' survives
    out = blocked_edit_distance_pairs(
        names, "id", "name", max_distance=1, max_block_size=5
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {("y1", "y2")}
    # names shorter than the prefix never block
    short = spark.createDataFrame([("s", "a"), ("t", "b")], "id string, name string")
    assert blocked_edit_distance_pairs(short, "id", "name").collect() == []
    with pytest.raises(ValueError):
        blocked_edit_distance_pairs(names, "id", "name", max_distance=0)


def test_editjoin_length_prefilter_consistent(spark):
    # length gap 2 > max_distance 1 — excluded even though same block
    names = spark.createDataFrame(
        [("a", "abcd"), ("b", "abcdef")], "id string, name string"
    )
    assert blocked_edit_distance_pairs(names, "id", "name").collect() == []
    # but at max_distance 2 the pair passes and the distance is exact
    out = blocked_edit_distance_pairs(names, "id", "name", max_distance=2).collect()
    assert [(r.id_a, r.id_b, r.distance) for r in out] == [("a", "b", 2)]
