"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (this container has no image/audio libs) behind
``DecodeNotAvailable`` / a deterministic fake, but the Spark-side plumbing
is real and tested: schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing. Swap ``_decode_image_stub`` for a PIL/libvips call in
production and nothing else changes.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("decode_status", StringType(), False),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised by the real decode path when the codec lib is absent."""


def _decode_image_stub(payload: bytes) -> list:
    """Deterministic fake 8-dim feature from the raw bytes (byte histogram
    buckets). Replace with a real decoder in production.

    Raising path (the honest stub): ``raise DecodeNotAvailable("no PIL in
    container")`` — kept callable so tests can exercise both branches.
    """
    if payload is None:
        raise DecodeNotAvailable("empty payload")
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in buckets]


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Errors are
    captured per row into ``decode_status`` (never a task failure — one bad
    file must not kill a 100 TB scan)."""
    import pandas as pd

    def _extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, statuses, nbytes = [], [], []
            for payload in pdf["payload"]:
                nbytes.append(len(payload) if payload is not None else 0)
                try:
                    feats.append(_decode_image_stub(payload))
                    statuses.append("ok")
                except DecodeNotAvailable as e:
                    feats.append(None)
                    statuses.append(f"decode_unavailable: {e}")
                except Exception as e:  # noqa: BLE001 — per-row error capture
                    feats.append(None)
                    statuses.append(f"error: {type(e).__name__}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "feature": feats,
                    "decode_status": statuses,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_extract, FEATURES_SCHEMA)


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    import hashlib

    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 5)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}", 64, 64, 1.5))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
