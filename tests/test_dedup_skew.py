"""A2 skew guarantees (VERDICT r3 #1).

The aggregation form of ``dedup_most_complete`` must (a) produce exactly
the window form's output — same ranking semantics, null handling, and
deterministic tiebreak — and (b) carry NO window in its plan, so a hub key
("water" / "E. coli" on a large fraction of a web corpus) is absorbed by
map-side partial aggregation instead of parking the full key under one
window task.
"""

import time

from pyspark.sql import functions as F

from kg_microbe_spark.operators import dedup
from kg_microbe_spark.operators.merge import merge_nodes


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ROWS = [
    # key, name, description, a, b  — exercises: empty vs null vs populated,
    # null tiebreaks, equal-completeness ties
    ("K:1", "n", "d", "x", 3),
    ("K:1", "n", "d", "x", 1),      # wins K:1 (same completeness, b asc)
    ("K:1", "", "d", "a", 0),
    ("K:2", None, None, None, None),
    ("K:2", "", "", "z", 9),        # wins K:2 (one more non-empty field)
    ("K:3", "n", None, None, 5),
    ("K:3", None, "d", "q", 2),     # name beats description? no — name desc first
    ("K:4", "n", "d", None, 7),
    ("K:4", "n", "d", "w", None),   # null-vs-value tiebreaks on both a and b
    ("K:5", "only", "", "", 0),
]
SCHEMA = "id string, name string, description string, a string, b int"


def test_agg_equals_window(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for parts in (1, 3, 8):
        got = sorted(
            dedup.dedup_most_complete(df.repartition(parts), "id").collect()
        )
        want = sorted(
            dedup.dedup_most_complete_window(df.repartition(parts), "id").collect()
        )
        assert got == want


def test_agg_equals_window_custom_tiebreaks(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kw = dict(key="id", name_col=None, description_col=None, tiebreak_cols=["b", "a"])
    got = sorted(dedup.dedup_most_complete(df, **kw).collect())
    want = sorted(dedup.dedup_most_complete_window(df, **kw).collect())
    assert got == want


def test_hot_key_no_window_straggler(spark):
    """ONE key carrying 10^6 rows: the plan must contain no Window (the
    one-task straggler shape) and the min_by aggregation must have a
    partial (map-side) stage; the job completes in bounded time."""
    n = 1_000_000
    df = spark.range(n).select(
        F.lit("NCBITaxon:hub").alias("id"),
        F.when(F.col("id") == 123_456, F.lit("the name")).otherwise(F.lit("")).alias("name"),
        F.lit("").alias("description"),
        F.col("id").cast("string").alias("val"),
    )
    out = dedup.dedup_most_complete(df, "id")
    plan = _plan(out)
    assert "Window" not in plan, "A2 agg form must not plan a window"
    assert "min_by" in plan
    # partial aggregation before the exchange is the skew-absorbing property
    assert "partial_min_by" in plan or "partial" in plan.lower()
    t0 = time.time()
    rows = out.collect()
    wall = time.time() - t0
    assert len(rows) == 1
    assert rows[0].name == "the name" and rows[0].val == "123456"
    assert wall < 60, f"hot-key dedup took {wall:.1f}s — straggler suspected"


def test_merge_nodes_no_keyed_prepartition(spark):
    """merge_nodes must not hash/range-partition by id before the dedup —
    that would route the whole hot key through one task BEFORE partial
    aggregation can shrink it. Legal shuffles: the aggregation's own
    exchange (of partial rows) only."""
    frames = [
        spark.createDataFrame(
            [(f"N:{i}", f"name{i}", "", "", "", "", "", "", "") for i in range(50)],
            "id string, category string, name string, description string, xref string,"
            " provided_by string, synonym string, deprecated string, same_as string",
        )
        for _ in range(2)
    ]
    plan = _plan(merge_nodes(frames))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan.lower()
