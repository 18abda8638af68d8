"""Structured Streaming ingest: incremental page arrival → mention stream.

The reference is strictly batch (SURVEY.md §2.11) — its analogue of
streaming is resumable file-based ingest. This module exists for the
continuous-crawl deployment shape: a file-source stream over the pages
table (new parquet files = new WARC drops), the SAME extract+scan
operators (they are mapInPandas transforms, legal in streaming), windowed
mention counts with a watermark for late captures, and a checkpointed
sink → exactly-once resumable ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_microbe_spark.operators.extract import extract_pages
from kg_microbe_spark.operators.mentions import scan_mentions
from kg_microbe_spark.schemas import PAGES_SCHEMA


def pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_mentions(
    pages: DataFrame, name_index: DataFrame, matcher_cache_key: str | None = None
) -> DataFrame:
    """extract → scan, streaming-legal (stateless mapInPandas transforms)."""
    extracted = extract_pages(pages)
    return scan_mentions(
        extracted.filter(F.col("lang") == "en"), name_index, matcher_cache_key=matcher_cache_key
    )


def windowed_mention_counts(
    pages: DataFrame,
    name_index: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
    matcher_cache_key: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts per term — late captures beyond
    the watermark are dropped deterministically."""
    extracted = extract_pages(pages).withWatermark("warc_ts", watermark)
    mentions = scan_mentions_with_ts(
        extracted.filter(F.col("lang") == "en"), name_index, matcher_cache_key=matcher_cache_key
    )
    return mentions.groupBy(F.window("warc_ts", window), "term_norm").agg(
        F.count("*").alias("n_mentions")
    )


def scan_mentions_with_ts(
    extracted: DataFrame, name_index: DataFrame, matcher_cache_key: str | None = None
) -> DataFrame:
    """scan_mentions carrying warc_ts through (streaming needs the
    event-time column downstream of the scan). Thin wrapper over the ONE
    matcher-scan implementation (operators/mentions.py _scan_with_matcher,
    ``passthrough_cols``) — same broadcast-matcher cache, same 4M-pattern
    ceiling, same leftmost-longest semantics as the batch path."""
    return scan_mentions(
        extracted,
        name_index,
        matcher_cache_key=matcher_cache_key,
        passthrough_cols=("warc_ts",),
    ).select("url", "warc_ts", "term_norm")


def run_ingest(
    spark: SparkSession,
    source_path: str,
    name_index: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    await_seconds: float | None = None,
    matcher_cache_key: str | None = None,
):
    """File-stream → mention parquet sink with exactly-once checkpointing."""
    stream = pages_stream(spark, source_path)
    mentions = streaming_mentions(stream, name_index, matcher_cache_key=matcher_cache_key)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_seconds is not None:
        q.awaitTermination(await_seconds)
    return q
