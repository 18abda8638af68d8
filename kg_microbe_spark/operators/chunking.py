"""Token-window chunking and sequence packing for LLM training data.

Two halves of turning a cleaned corpus into model-ready sequences:

``chunk_by_tokens`` — split each document into fixed-size token windows
with a configurable stride (overlapping windows when stride < window).
Pure JVM: the token array is built once per row and every chunk is a
``slice`` over it inside one whole-stage-codegen projection; ``explode``
is narrow, so the operator adds ZERO shuffles regardless of corpus size.

``pack_sequences`` — greedy next-fit packing of documents into
fixed-token-budget training sequences. Packing is inherently
order-dependent (each placement depends on the running fill), so it
cannot be a window function; the scale shape is the one real pipelines
use: hash-shard the corpus into ``n_shards`` independent streams and
run the sequential next-fit per shard in an Arrow-batched
``applyInPandas``. State per task is two integers; memory is bounded by
the shard's row count, and shards scale out linearly with the cluster.
Determinism: shard = md5(id) % n_shards and docs pack in ascending id
order within a shard, so any engine reproduces the assignment exactly
(the DuckDB oracle replays it with a linear recursive CTE per shard).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.operators.dedup import normalize_doc_text_col
from kg_microbe_spark.operators.sampling import hash_bucket


def chunk_by_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 512,
    stride: int = 512,
) -> DataFrame:
    """Explode each document into token windows of ``window`` tokens
    every ``stride`` tokens (final window may be short). Returns
    ``(id_col, chunk_id, n_tokens, chunk_text)``."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # gaps between windows would also break the last-chunk bound
        # (a start index can land past the end of the token array)
        raise ValueError("stride must be <= window")
    toks = F.split(normalize_doc_text_col(F.col(text_col)), " ")
    n = F.size(toks)
    # chunks cover starts 0, stride, 2*stride, ... while start < n and
    # (start == 0 or start + window - stride < n): ceil((n-window)/stride)+1
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - F.lit(window) + F.lit(stride) - 1) / F.lit(stride))
        .cast("int")
        + F.lit(1)
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(
                F.lit(window),
                F.size("_toks") - F.col("chunk_id") * F.lit(stride),
            )
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(
                    "_toks", F.col("chunk_id") * F.lit(stride) + 1, window
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


PACK_SCHEMA = (
    "id long, shard int, seq_id long, seq_offset long, n_tokens long"
)


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_shards: int = 16,
) -> DataFrame:
    """Next-fit pack documents into training sequences of at most
    ``budget`` tokens per shard. A document larger than the budget opens
    (and overflows) its own sequence — next-fit never splits documents
    (chunk first with ``chunk_by_tokens`` if that matters). Returns
    ``(id, shard, seq_id, seq_offset, n_tokens)``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "shard", hash_bucket(F.col("id").cast("string"), n_shards).cast("int")
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, running = 0, 0
        for w in pdf["n_tokens"]:
            w = int(w)
            if running > 0 and running + w > budget:
                seq += 1
                running = 0
            seq_ids.append(seq)
            offsets.append(running)
            running += w
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[["id", "shard", "seq_id", "seq_offset", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)


def materialize_sequences(
    docs: DataFrame,
    packed: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = " ",
) -> DataFrame:
    """Join the ``pack_sequences`` assignment back onto the documents and
    concatenate each training sequence's texts in offset order. Returns
    ``(shard, seq_id, n_docs, seq_tokens, seq_text)``.

    Shape: one equi-join on the doc id (co-partitioned with the pack
    output when AQE reuses the exchange) + one groupBy(shard, seq_id)
    whose collect is bounded BY CONSTRUCTION — a sequence holds at most
    ``budget`` tokens, so the per-group state is one model context, not
    a hub key. sort_array on (seq_offset, text) structs makes the
    concatenation order deterministic without a window."""
    joined = packed.join(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")),
        "id",
    )
    return (
        joined.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seq_offset", "_t"))
                    ),
                    lambda s: s["_t"],
                ),
                sep,
            ).alias("seq_text"),
        )
    )
