"""Bucketed (hash-clustered) parquet tables — co-located, shuffle-free
joins and aggregations.

At 100 TB the single biggest shuffle in a KG pipeline is the fact⋈fact
join (pages⋈mentions, edges⋈edges for closure). Bucketing moves that
shuffle to WRITE time, once: both sides are written hash-clustered into
the same number of buckets on the join key, and every later equi-join or
groupBy on that key reads bucket i against bucket i with ZERO Exchange —
Spark's output-partitioning metadata proves co-location to the planner
(`spark.sql.sources.bucketing.enabled`, on by default).

This is the persistent-table complement of `repartition()`: repartition
co-locates for ONE job; a bucketed table amortizes the shuffle across
every downstream job that joins on the key — the right trade for
dimension-stable corpora re-joined each crawl cycle.

Rules the helpers encode (easy to get silently wrong):
- both sides must use the SAME bucket count and key for a shuffle-free
  join (mismatched counts fall back to shuffling the smaller side);
- `sortBy` within buckets lets SortMergeJoin skip its sort;
- tables are EXTERNAL (explicit ``path``) so the warehouse dir never
  collects hidden state; callers own the path's lifecycle.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def safe_table_name(raw: str) -> str:
    """Catalog identifiers forbid '-' etc. (applicationIds contain both)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", raw)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
) -> str:
    """Write ``df`` as an external parquet table hash-clustered into
    ``num_buckets`` buckets on ``bucket_cols`` (sorted within buckets by
    ``sort_cols``, default = the bucket key). Returns the catalog name."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be ≥ 1, got {num_buckets}")
    name = safe_table_name(name)
    bucket_cols = list(bucket_cols)
    sort_cols = list(sort_cols) if sort_cols is not None else bucket_cols
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(name)
    )
    return name


def drop_table(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (external data stays; caller owns the path)."""
    spark.sql(f"DROP TABLE IF EXISTS {safe_table_name(name)}")
