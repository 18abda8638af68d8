"""Interval (range) joins — match points to [lo, hi) intervals.

The reference's only "range" logic is scalar binning against a fixed
bin table (metatraits.py:1536-1608 → operators/binning.py); a general
interval join — points matched to ARBITRARY, possibly overlapping
numeric intervals (price bands, IP/geo ranges, time validity windows)
— is one of the custom operator families the task brief names (range
join) that Spark lacks natively: a raw `lo <= p AND p < hi` join plans
as BroadcastNestedLoop (small dim) or CartesianProduct (else).

Spark-first scale shape — bucket decomposition:

  1. pick a bucket width; each interval is exploded to the buckets it
     overlaps (sequence/explode — rows ∝ interval_span / width),
  2. each point computes its single bucket (floor(p / width) — a pure
     narrow map),
  3. equi-join on the bucket (hash-partitionable, AQE/skew-splittable,
     broadcastable when the exploded dim is small),
  4. refine with the exact predicate.

A point lives in exactly ONE bucket, so an interval spanning many
buckets still matches each point once — no post-join dedup. Shuffle is
|points| + Σ span/width rows instead of |points| × |intervals|
comparisons; at 100 TB the equi-join co-partitions both sides where
the nested-loop form cannot be partitioned at all."""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    payload_cols: List[str],
    bucket_width: Optional[float] = None,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo <= point < hi`` (half-open; overlapping intervals yield one
    output row per match). Output: all point columns + ``payload_cols``.

    ``bucket_width`` defaults to the mean interval span (computed from
    the intervals side — a dimension-scale aggregate). Pass
    ``broadcast_intervals=False`` when the exploded interval side is too
    large to broadcast; the equi-join then shuffles both sides on the
    bucket key."""
    overlap = set(payload_cols) & set(points.columns)
    if overlap:
        raise ValueError(f"payload columns collide with point columns: {sorted(overlap)}")
    if bucket_width is None:
        row = intervals.select(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")
        ).first()
        bucket_width = float(row["w"]) if row["w"] else 1.0
        if bucket_width <= 0:
            raise ValueError("intervals must have positive spans")
    w = F.lit(float(bucket_width))
    # hi is exclusive: an interval ending exactly on a bucket boundary
    # must not claim that bucket, hence floor((hi - epsilon)/w) via the
    # half-open sequence bound below.
    iv = intervals.select(
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
        *[F.col(c) for c in payload_cols],
    ).filter(
        # empty [lo, lo) intervals match nothing — and must be dropped
        # BEFORE bucket expansion: Spark's sequence() generates a
        # DESCENDING sequence when start > stop instead of an empty one.
        F.col("_hi") > F.col("_lo")
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("_lo") / w),
                # last bucket an [lo,hi) interval can touch: the bucket of
                # the largest value strictly below hi — for hi exactly on a
                # boundary that is floor(hi/w)-1, else floor(hi/w).
                F.when(
                    F.col("_hi") == F.floor(F.col("_hi") / w) * w,
                    F.floor(F.col("_hi") / w) - 1,
                ).otherwise(F.floor(F.col("_hi") / w)),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / w))
    joined = pt.join(iv, on="_bucket", how="inner").filter(
        (F.col("_lo") <= F.col(point_col)) & (F.col(point_col) < F.col("_hi"))
    )
    return joined.drop("_bucket", "_lo", "_hi")


def epsilon_band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps,
) -> DataFrame:
    """Band (epsilon) join: all (L, R) pairs with |L.v − R.v| ≤ eps —
    the numeric-proximity join (near-identical prices, timestamps
    within tolerance, sensor readings off by jitter) that a raw
    ``abs(a-b) <= eps`` predicate plans as a nested loop.

    Same bucket-decomposition idea as interval_join, specialized to the
    symmetric band: the LEFT side computes its single bucket
    floor(v/eps); the RIGHT side replicates to its bucket ± 1 (a 3-row
    in-row explode, constant amplification); a pair within eps can
    never be further than one bucket apart, so the bucket equi-join is
    a superset and the exact |Δ| ≤ eps refine keeps precision. Shuffle
    is |L| + 3|R| hash-partitioned rows, AQE-skew-splittable; the
    nested-loop form cannot partition at all.

    Integer-valued inputs make the bucketing exactly reproducible in a
    SQL oracle; for float values at bucket boundaries the refine
    predicate — not the bucket arithmetic — decides membership, so
    results are still exact (a 0.5-ulp division error can only send a
    TRUE pair 2 buckets apart when v/eps sits within an ulp of an
    integer — integerize eps-quantized floats first, as the entry
    fixture does with cents).

    Returns left columns (prefixed ``l_``-as-given) joined to right
    columns plus ``abs_diff``.
    """
    lb = F.floor(F.col(left_val) / F.lit(eps)).alias("_bk")
    l2 = left.select(F.struct(*left.columns).alias("_l"), lb)
    r2 = right.select(
        F.struct(*right.columns).alias("_r"),
        F.explode(
            F.array(
                F.floor(F.col(right_val) / F.lit(eps)) - 1,
                F.floor(F.col(right_val) / F.lit(eps)),
                F.floor(F.col(right_val) / F.lit(eps)) + 1,
            )
        ).alias("_bk"),
    )
    joined = l2.join(r2, "_bk").filter(
        F.abs(F.col("_l." + left_val) - F.col("_r." + right_val)) <= F.lit(eps)
    )
    return joined.select(
        "_l.*",
        "_r.*",
        F.abs(F.col("_l." + left_val) - F.col("_r." + right_val)).alias(
            "abs_diff"
        ),
    )
