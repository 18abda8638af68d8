"""Small-file compaction planning for partitioned lakehouse tables.

At 100 TB the table-maintenance job that decides WHICH small files merge
into WHICH target-size outputs is itself a big-data job: a hot table
partition can hold millions of sub-MB files (streaming sinks, per-batch
writers), and a driver-side planner that lists them into one Python list
is the classic OOM. This operator plans next-fit-decreasing bin packing
entirely as window arithmetic, so the plan computation scales with the
same engine as the data.

Spark-first shape, ONE logical shuffle:

* files order within their table partition by (size desc, id) — the
  next-fit-DECREASING discipline (big files first → fewer overflowing
  groups than arrival order, deterministic under unique ids);
* a running-sum window assigns each file its group:
  ``group = ((csum - 1) div target) + 1`` in pure integer arithmetic
  (no double division — exact at group boundaries);
* group totals come from a SECOND window over the SAME partition key
  ordered by group with a RANGE CURRENT ROW frame (all peers share the
  frame), so Catalyst reuses the first window's hash partitioning —
  no second shuffle, no groupBy+join-back;
* per-partition state is the window's running sum, never a collected
  list — a partition with 10M files streams through.

Next-fit (not first-fit/best-fit) is the standard streaming relaxation:
it never revisits an earlier group, which is exactly what makes it
expressible as a running sum; the waste bound (each group ≥ half target
except the last, for inputs below target) is the accepted trade for a
plan that costs one shuffle at any scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    size_col: str = "size_bytes",
    id_col: str = "file_id",
    part_cols: Sequence[str] = ("part",),
) -> DataFrame:
    """Assign every file a ``compaction_group`` within its table
    partition plus the group's ``group_bytes`` / ``n_files`` totals;
    downstream, one merge task per (partition, group) rewrites the
    group's files into ~``target_bytes`` outputs.

    Overshoot note (ADVICE r5): grouping is by running-sum position, not
    true next-fit — a file straddling a ``target_bytes`` boundary joins
    the group its cumulative sum ends in, so ``group_bytes`` may exceed
    ``target_bytes`` by up to one file (and by arbitrarily much for a
    single file larger than the target, which is correct: an oversized
    file cannot be split by planning). Callers that need a hard output
    ceiling should post-split oversized groups at rewrite time."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    parts = [F.col(c) for c in part_cols]
    run = (
        Window.partitionBy(*parts)
        .orderBy(F.col(size_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.select(
        *parts,
        F.col(id_col),
        F.col(size_col).cast("long").alias(size_col),
        F.sum(F.col(size_col).cast("long")).over(run).alias("_csum"),
    ).withColumn(
        "compaction_group",
        F.expr(f"((_csum - 1) div {int(target_bytes)}) + 1"),
    )
    peers = (
        Window.partitionBy(*parts)
        .orderBy("compaction_group")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    return planned.select(
        *parts,
        id_col,
        size_col,
        "compaction_group",
        F.sum(size_col).over(peers).alias("group_bytes"),
        F.count(F.lit(1)).over(peers).alias("n_files"),
    )
