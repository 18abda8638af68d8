"""Frequent-token (heavy-hitter) mining over a document corpus.

The naive plan — explode every token and ``groupBy(token).count()`` —
shuffles one partial-count row per (task, distinct-token). On web text
the distinct-token set is dominated by a long tail of unique junk
(urls, hashes, typos), so at 100 TB the shuffle is ∝ |vocabulary| ×
|tasks| even though only a few thousand tokens can possibly clear any
interesting threshold.

Two-pass sketch-then-verify shape (the standard production pattern):

  pass 1 — per-partition Misra-Gries summaries, NO shuffle. A capacity-k
      MG summary underestimates any token's in-partition count by at most
      n_p/k, so every token with global count > n/k survives in at least
      one partition's summary (pigeonhole over partitions). The union of
      summaries is therefore a SUPERSET of the true heavy hitters —
      at most k × |partitions| candidates, collected to the driver.
  pass 2 — exact counts of the candidate set only: explode + isin-filter
      + groupBy. Map-side partial aggregation shrinks each task's output
      to ≤ |candidates| rows, so the shuffle is ∝ |candidates| × |tasks|
      — independent of vocabulary size.

The result is EXACT (pass 2 recounts), which is what makes a DuckDB
oracle possible; the sketch only prunes the shuffle. MG runs in
``mapInPandas`` — a genuinely per-partition stateful stream algorithm,
i.e. the designated use of the Python path (task brief: custom sketches).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.text import tokens_col


def _mg_candidates(df_text: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries over the whitespace token stream of
    ``text``; emits each partition's surviving candidate tokens."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                if text is None:
                    continue
                for tok in text.lower().split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": pd.Series(list(counters), dtype="object")})

    return df_text.select("text").mapInPandas(run, "token string")


def frequent_tokens(
    docs: DataFrame,
    text_col: str,
    min_count: int,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT tokens with global count ≥ ``min_count`` → (token, n).

    ``capacity`` must satisfy capacity ≥ total_tokens / min_count for the
    superset guarantee (per partition it holds a fortiori). The guard is
    enforced from the pass-2 total, which is free at that point; at the
    default 4096 the guarantee holds whenever the threshold captures
    ≥ 1/4096 of the stream — the regime heavy-hitter mining is for.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1, got {min_count}")
    src = docs.select(F.col(text_col).alias("text"))
    candidates = [r.token for r in _mg_candidates(src, capacity).distinct().collect()]
    if not candidates:
        return docs.sparkSession.createDataFrame([], "token string, n long")
    tok = src.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    counted = (
        tok.filter(F.col("token").isin(candidates))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(int(min_count)))
    )
    # guarantee check: total token count vs capacity*min_count. Cheap agg
    # (reuses the exploded frame's map-side partials); fail loudly rather
    # than silently under-report when the caller's threshold is too deep
    # for the sketch capacity.
    # MG retains every token with count > total/capacity; we must cover
    # count ≥ min_count, so require min_count > total/capacity — i.e.
    # equality is already outside the guarantee.
    total = tok.agg(F.count("*").alias("t")).first()["t"]
    if total >= capacity * min_count:
        raise ValueError(
            f"capacity {capacity} cannot guarantee min_count {min_count} at "
            f"{total} total tokens; need capacity > {total // min_count}"
        )
    return counted
