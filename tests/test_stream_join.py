"""stream_time_join / run_stream_join (streaming/join.py) — matches the
equivalent batch range join across micro-batches, exactly once."""

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from kg_microbe_spark.streaming.join import run_stream_join


def _fixture(spark):
    # clicks (left) at t, views (right) may precede by up to 300 s
    left = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:10:00"),
            (1, 101, "2024-01-01 01:00:00"),
            (2, 200, "2024-01-01 00:10:00"),
            (3, 300, "2024-01-01 00:10:00"),
        ],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, 900, "2024-01-01 00:06:00"),  # 240 s before click 100 -> match
            (1, 901, "2024-01-01 00:04:59"),  # 301 s before -> no match
            (1, 902, "2024-01-01 00:59:00"),  # matches click 101
            (2, 903, "2024-01-01 00:10:00"),  # equal ts -> match
            (2, 904, "2024-01-01 00:11:00"),  # after click -> no match
            (4, 905, "2024-01-01 00:10:00"),  # no such user on left
        ],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    return left, right


def test_stream_join_matches_batch(spark):
    left, right = _fixture(spark)
    base = os.path.join(tempfile.gettempdir(), "stream_join_%s" % uuid.uuid4().hex[:8])
    lsrc, rsrc, sink, ckpt = (os.path.join(base, d) for d in ("l", "r", "sink", "ckpt"))
    try:
        # several files per side so the join spans micro-batches
        left.repartition(3).write.parquet(lsrc)
        right.repartition(3).write.parquet(rsrc)
        q = run_stream_join(
            spark,
            lsrc,
            rsrc,
            left.schema,
            sink,
            ckpt,
            key="user_id",
            lookback_seconds=300,
            select_cols=["l_user_id", "l_event_id", "r_event_id"],
            max_files_per_trigger=1,
            # the fixture spans ~56 min and availableNow replays files in
            # arbitrary order — the watermark must exceed the backlog span
            # or a racing side can evict/reject the other's older rows
            watermark="2 hours",
        )
        q.awaitTermination()
        got = {
            (r.l_user_id, r.l_event_id, r.r_event_id)
            for r in spark.read.parquet(sink).collect()
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    expected = {(1, 100, 900), (1, 101, 902), (2, 200, 903)}
    assert got == expected
