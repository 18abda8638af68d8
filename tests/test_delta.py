"""snapshot_diff (operators/delta.py) — classification, null-safe value
compare, keep_unchanged, multi-column keys."""

from kg_microbe_spark.operators.delta import snapshot_diff


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [
            ("a", "t1", 1),
            ("b", "t2", 2),
            ("c", None, 3),   # null value, unchanged
            ("d", "t4", 4),   # removed
            ("e", None, 5),   # null -> value = changed
        ],
        "url string, text string, size long",
    )
    new = spark.createDataFrame(
        [
            ("a", "t1", 1),      # unchanged
            ("b", "t2-new", 2),  # changed
            ("c", None, 3),      # unchanged (null == null)
            ("e", "t5", 5),      # changed
            ("f", "t6", 6),      # added
        ],
        "url string, text string, size long",
    )
    got = {r.url: r for r in snapshot_diff(old, new, ["url"]).collect()}
    assert {u: r.status for u, r in got.items()} == {
        "a": "unchanged",
        "b": "changed",
        "c": "unchanged",
        "d": "removed",
        "e": "changed",
        "f": "added",
    }
    assert got["d"].new_text is None and got["d"].old_text == "t4"
    assert got["f"].old_text is None and got["f"].new_text == "t6"
    assert got["b"].old_text == "t2" and got["b"].new_text == "t2-new"


def test_snapshot_diff_drop_unchanged_and_subset_cols(spark):
    old = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], "k string, v long, noise string")
    new = spark.createDataFrame([("a", 1, "DIFFERENT"), ("b", 3, "y")], "k string, v long, noise string")
    got = {
        r.k: r.status
        for r in snapshot_diff(
            old, new, ["k"], compare_cols=["v"], keep_unchanged=False
        ).collect()
    }
    # noise is excluded from comparison: a is unchanged (filtered), b changed
    assert got == {"b": "changed"}
