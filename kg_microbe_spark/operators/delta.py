"""Snapshot diff between two crawls of the same keyed table.

An incremental crawl pipeline re-fetches a corpus and must know, per
key (url), whether the row is new, gone, changed, or identical — the
delta drives selective re-extraction, tombstoning, and freshness stats,
and is the read-side complement of :func:`merge.upsert_latest` (which
APPLIES updates; this REPORTS them). The reference's monthly rebuild
recomputes everything; at 10^12 documents only the delta is affordable.

Spark-first shape: ONE full-outer sort-merge join keyed on the diff key
— both sides shuffle once on the same key (bucketing either input by the
key makes its Exchange vanish, sources/bucketed.py), then a pure
projection classifies each row with null-safe comparisons. No window, no
second pass, no driver state; output is partitioned by the same key for
whatever applies the delta next.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    keep_unchanged: bool = True,
) -> DataFrame:
    """Classify every key across two snapshots as added / removed /
    changed / unchanged. ``compare_cols`` defaults to every shared
    non-key column; VALUE comparisons are null-safe (NULL == NULL is
    unchanged) but KEY columns must be non-null — a null key never
    equi-joins, so such rows would misclassify as added+removed (crawl
    keys are urls; enforce upstream). Returns key columns + ``status`` +
    each compared column twice (``old_<c>``, ``new_<c>``; null on the
    absent side)."""
    keys = list(key_cols)
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c in set(old.columns) and c not in keys]
    )
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{k}") == F.col(f"_nk_{k}") for k in keys],
    )
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare],
        F.lit(True),
    )
    status = (
        F.when(~in_old, F.lit(STATUS_ADDED))
        .when(~in_new, F.lit(STATUS_REMOVED))
        .when(same, F.lit(STATUS_UNCHANGED))
        .otherwise(F.lit(STATUS_CHANGED))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )
    if not keep_unchanged:
        out = out.filter(F.col("status") != STATUS_UNCHANGED)
    return out
