"""Sources & sinks (SURVEY.md §2.1 S-family).

The reference reads TSV/CSV (plain + gzip), JSON documents, JSONL(.gz) and
writes canonical-header TSVs. Spark reads compressed text natively, so the
whole S1-S5 family is thin config around ``spark.read``; the value here is
pinning the options (tab sep, header, permissive nulls) in one place and
the deterministic KGX TSV sink (sorted output, like the reference's
sort-before-rewrite, pandas_utils.py:57).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kg_microbe_spark.schemas import EDGE_COLUMNS, NODE_COLUMNS


def read_tsv(spark: SparkSession, path: str, schema: Optional[StructType] = None, header: bool = True) -> DataFrame:
    """S1/S2: TSV scan; `.gz` handled transparently by Spark."""
    r = spark.read.option("sep", "\t").option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "false")  # strings, like the reference
    return r.csv(path)


def read_csv(spark: SparkSession, path: str, schema: Optional[StructType] = None, header: bool = True) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def read_json_docs(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """S4: one JSON array/dict of nested records (BacDive shape)."""
    return spark.read.option("multiLine", str(multiline).lower()).json(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S5: JSONL(.gz)."""
    return spark.read.json(path)


def write_kgx_tsv(df: DataFrame, path: str, sort_by: Sequence[str]) -> None:
    """S11: canonical-header TSV sink with deterministic row order.

    Single-file deterministic output is a *driver-side* choice (coalesce(1))
    — at scale you keep N sorted part files (sortWithinPartitions after
    repartitionByRange gives global order across parts)."""
    (
        df.repartitionByRange(*[F.col(c) for c in sort_by])
        .sortWithinPartitions(*sort_by)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .csv(path)
    )


def write_nodes(df: DataFrame, path: str) -> None:
    write_kgx_tsv(df.select(*[c for c in NODE_COLUMNS if c in df.columns]), path, sort_by=["id"])


def write_edges(df: DataFrame, path: str) -> None:
    write_kgx_tsv(
        df.select(*[c for c in EDGE_COLUMNS if c in df.columns]),
        path,
        sort_by=["subject", "predicate", "object"],
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (path/col=value/…) — the
    poor-man's Iceberg partitioning available without a catalog: a reader
    filtering on a partition column scans ONLY the matching directories
    (partition pruning — `PartitionFilters` in the plan, asserted in
    test_partitioned_pruning). Partition columns should be low-cardinality
    (lang, source, date bucket); high-cardinality partitioning produces
    the classic many-small-files failure at scale."""
    df.write.mode(mode).partitionBy(*list(partition_cols)).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition columns come back as columns
    (their type is inferred from directory names — cast explicitly when
    exact types matter downstream)."""
    return spark.read.parquet(path)
