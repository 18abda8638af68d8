"""Custom stateful streaming operator: cross-batch first-seen dedup.

``streaming/ingest.py`` covers the stateless streaming surface (file
source → mapInPandas scan → watermarked windows). This module covers the
one Spark streaming API the pipeline otherwise never exercises:
``applyInPandasWithState`` — per-key state that survives micro-batches,
the tool for operators whose semantics windowed aggregation can't
express. First-seen dedup is the canonical training-data case: a crawl
stream re-delivers documents (re-crawls, mirror URLs); only the first
arrival per content key may pass downstream, across ALL micro-batches.

100-TB shape: state is one boolean per distinct key, partitioned by the
groupBy hash — state size ∝ distinct keys, never rows; each micro-batch
shuffles only its own rows. The state store is checkpointed with the
query, so a restart resumes with the seen-set intact (exactly-once
end-to-end with an idempotent sink)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_dedup_first(stream: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Emit exactly one row per distinct ``key_col`` value across the whole
    stream: the minimum-``order_col`` row of the FIRST micro-batch in which
    the key appears; every later arrival is dropped via per-key state.

    Deterministic when each key's globally-minimal ``order_col`` row
    arrives in the earliest batch containing that key (true for ordered
    ingest — e.g. files that are contiguous id ranges); otherwise the
    result is still exactly-one-per-key but batch-order-dependent, the
    standard first-wins streaming contract."""
    schema = stream.schema

    def first_seen(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier micro-batch
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_col, kind="mergesort").head(1)
            if best is None:
                best = cand
            else:
                best = pd.concat([best, cand]).sort_values(order_col, kind="mergesort").head(1)
        if best is not None:
            state.update((True,))
            yield best

    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        first_seen,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
