"""Stream-stream time-bounded join (watermarked symmetric hash join).

``streaming/ingest.py`` covers stateless streaming transforms and
``streaming/stateful.py`` covers arbitrary per-key state; this module
covers the third Structured Streaming surface the pipeline would need in
a continuous-crawl deployment: joining TWO live streams — e.g. attaching
each page-fetch event to the crawl-scheduler decision that caused it, or
sessions-to-conversions attribution — where neither side is a static
dimension.

Spark-first shape: ``stream.join(stream)`` compiles to a
StreamingSymmetricHashJoin — both sides are hash-partitioned on the equi
key, each side buffers rows in the checkpointed state store, and the
event-time range predicate plus watermarks bound HOW LONG a row must be
buffered: state ∝ (rows per key within the time window), never the full
stream history. Without the time bound, inner stream-stream joins would
buffer forever — the range condition is what makes the operator viable
at 100 TB, so this wrapper REQUIRES it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_time_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right row's event time
    falls in ``[left.ts - lookback_seconds, left.ts]``. Both sides get the
    same watermark so Spark can evict buffered state once event time
    passes ``max(ts) - watermark - lookback``. Columns are emitted with
    ``l_`` / ``r_`` prefixes (the two sides usually share a schema)."""
    l = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
    )
    return l.join(r, cond, "inner")


def run_stream_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    lookback_seconds: int = 300,
    select_cols=None,
    max_files_per_trigger: int = 2,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Join two parquet file-source streams with :func:`stream_time_join`
    and write the matches to an exactly-once checkpointed parquet sink,
    draining all available input (availableNow).

    ``watermark`` must exceed the event-time DISORDER the sources can
    exhibit. With availableNow file sources that disorder is the whole
    backlog's time span (files replay in arbitrary order, so one side
    can race its max event time past the other side's oldest unread
    row, and rows older than watermark are dropped from the join
    state) — size it to the backlog span for drain-the-directory runs,
    and to the real arrival skew for continuous ones."""
    l = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(left_dir)
    )
    r = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(right_dir)
    )
    joined = stream_time_join(
        l, r, key, lookback_seconds=lookback_seconds, watermark=watermark
    )
    if select_cols:
        joined = joined.select(*select_cols)
    return (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
