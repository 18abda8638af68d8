"""Temporal joins — as-of (point-in-time) matching.

The reference has no temporal operator family (its tables are static
ontology snapshots); this is one of the custom-operator families the
task brief names (as-of join / range join) for the training-data
pipeline: attribute each observation to the latest prior state row per
key (event attribution, slowly-changing dimensions, market-data joins).

Spark-first shape — NOT a range join: a naive `left.ts >= right.ts`
join explodes to |left|×|right-per-key| rows and then needs an argmax.
The scalable form is the tagged-union window trick:

  1. union left and right rows (right rows carry their payload columns,
     left rows carry NULLs for them) with a side tag,
  2. one window per key ordered by (ts, side) where the right side sorts
     BEFORE a left row at the same timestamp (inclusive match),
  3. `last(payload, ignorenulls=True)` over ROWS UNBOUNDED PRECEDING —
     each left row sees exactly the most recent right payload,
  4. keep the left rows.

One shuffle (the window partition by key), zero row amplification, and
the sort is per-key — the plan survives 100 TB as long as no single key
holds a material fraction of rows (hub keys: pre-filter or salt by
coarse time bucket with boundary replication)."""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: List[str],
    left_ts: str,
    right_ts: str,
    payload_cols: List[str],
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` (or < when ``inclusive=False``)
    sharing ``key_cols``; NULL payload when no prior right row exists.

    Output: all left columns + ``payload_cols`` (nullable). Left columns
    and payload columns must not collide — alias payloads first."""
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")
    # side tag: at equal ts the right row must be visible to the left row
    # iff inclusive — window order (ts, side) with right side sorting first
    # (0 < 1) gives inclusive; swapping gives strict precedence.
    r_side, l_side = (0, 1) if inclusive else (1, 0)
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in key_cols],
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(r_side).alias("_side"),
        *[F.col(c) for c in payload_cols],
    ).select(l_tagged.columns)  # align column order for the union
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_asof_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).select(
        *[c for c in l_tagged.columns if c not in payload_cols and c not in ("_asof_ts", "_side")],
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return matched.filter(F.col("_side") == l_side).drop("_side")
