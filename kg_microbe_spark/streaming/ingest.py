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


def streaming_mentions(pages: DataFrame, name_index: DataFrame) -> DataFrame:
    """extract → scan, streaming-legal (stateless mapInPandas transforms)."""
    extracted = extract_pages(pages)
    return scan_mentions(extracted.filter(F.col("lang") == "en"), name_index)


def windowed_mention_counts(pages: DataFrame, name_index: DataFrame, watermark: str = "1 hour", window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per term — late captures beyond
    the watermark are dropped deterministically."""
    extracted = extract_pages(pages).withWatermark("warc_ts", watermark)
    mentions = scan_mentions_with_ts(extracted.filter(F.col("lang") == "en"), name_index)
    return mentions.groupBy(F.window("warc_ts", window), "term_norm").agg(
        F.count("*").alias("n_mentions")
    )


def scan_mentions_with_ts(extracted: DataFrame, name_index: DataFrame) -> DataFrame:
    """scan_mentions variant that carries warc_ts through (streaming needs
    the event-time column downstream of the scan)."""
    from typing import Iterable, Iterator, List

    import pandas as pd

    from kg_microbe_spark.functions.automaton import build_matcher
    from kg_microbe_spark.functions.normalize import normalize_name_py
    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    from kg_microbe_spark.operators.mentions import MAX_BROADCAST_PATTERNS, LexiconTooLargeError

    spark = extracted.sparkSession
    patterns: List[str] = [r.term_norm for r in name_index.select("term_norm").distinct().collect()]
    if len(patterns) > MAX_BROADCAST_PATTERNS:  # same ceiling as the batch scan (SCALE.md)
        raise LexiconTooLargeError(
            f"{len(patterns)} patterns > ceiling {MAX_BROADCAST_PATTERNS}; "
            "shard the pattern space (scan_mentions_sharded semantics) before streaming"
        )
    bc = spark.sparkContext.broadcast(build_matcher(patterns))

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("term_norm", StringType(), False),
        ]
    )

    def _scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = bc.value
        for pdf in batches:
            urls, tss, terms = [], [], []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                if not text:
                    continue
                for _s, _e, surface in ac.find_mentions(normalize_name_py(text)):
                    urls.append(url)
                    tss.append(ts)
                    terms.append(surface)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "term_norm": terms})

    return extracted.select("url", "warc_ts", "text").mapInPandas(_scan, schema)


def run_ingest(
    spark: SparkSession,
    source_path: str,
    name_index: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    await_seconds: float | None = None,
):
    """File-stream → mention parquet sink with exactly-once checkpointing."""
    stream = pages_stream(spark, source_path)
    mentions = streaming_mentions(stream, name_index)
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
