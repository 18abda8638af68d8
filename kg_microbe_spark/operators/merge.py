"""Stage 7 — MERGE: n-way union + dedup, the scalable replacement for KGX's
hold-everything-in-memory merge (merge_kg.py:93-124; J6/A2 in SURVEY.md).

- union: ``unionByName(allowMissingColumns=True)`` handles per-source
  extension columns (PREGO's 7 extras, BacDive's value/unit — §1.1).
- nodes: A2 completeness-ranked dedup in its AGGREGATION form
  (groupBy(id).agg(min_by(struct, order_struct))) — hub ids ("water",
  "E. coli" on a large fraction of pages; the reference's NCBITaxon skew)
  are absorbed by map-side partial aggregation, each task emitting at most
  one candidate per id before the shuffle. No pre-partitioning: any
  key-based repartition (hash OR range) would route the whole hot key
  through one task BEFORE the partial aggregation could shrink it — the
  round-3 repartitionByRange here was exactly that straggler.
- edges: groupBy (subject, predicate, object) with first-wins provenance
  (deterministic MIN) + occurrence-count aggregation — hub-entity skew on
  `subject` is absorbed the same way.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.operators.dedup import dedup_most_complete
from kg_microbe_spark.schemas import EDGE_COLUMNS, NODE_COLUMNS


def union_by_name(frames: Sequence[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def merge_nodes(frames: Sequence[DataFrame], num_partitions: int | None = None) -> DataFrame:
    """J6 node merge: union → A2 dedup (skew-absorbing aggregation form).

    ``num_partitions`` (optional) round-robin-rebalances the INPUT before
    the aggregation — key-free, so it can never concentrate a hot id; the
    dedup itself shuffles only map-side partial rows."""
    u = union_by_name(list(frames))
    if num_partitions:
        u = u.repartition(num_partitions)
    return dedup_most_complete(u, key="id", name_col="name", description_col="description")


def merge_edges(frames: Sequence[DataFrame]) -> DataFrame:
    """J6 edge merge: union → groupBy triple key, first-wins provenance.

    first-wins = deterministic MIN over each provenance column (the
    distributed analog of the reference's stable keep='first'); extension
    column ``n_cooccur`` is summed when present.
    """
    u = union_by_name(list(frames))
    agg = [
        F.min("relation").alias("relation"),
        F.min("primary_knowledge_source").alias("primary_knowledge_source"),
        F.min("knowledge_level").alias("knowledge_level"),
        F.min("agent_type").alias("agent_type"),
        F.count("*").alias("n_sources"),
    ]
    if "n_cooccur" in u.columns:
        agg.append(F.sum("n_cooccur").alias("n_cooccur"))
    return u.groupBy("subject", "predicate", "object").agg(*agg)


def to_kgx_nodes(entities: DataFrame, provided_by_col: str = "primary_knowledge_source") -> DataFrame:
    """entity rows (curie, label, category, …) → canonical KGX node frame."""
    cols = {
        "id": F.col("curie"),
        "category": F.col("category"),
        "name": F.col("label"),
        "description": F.lit(""),
        "xref": F.lit(""),
        "provided_by": F.col(provided_by_col) if provided_by_col in entities.columns else F.lit(""),
        "synonym": F.lit(""),
        "deprecated": F.lit(""),
        "same_as": F.lit(""),
    }
    return entities.select(*[v.alias(k) for k, v in cols.items()])


def to_kgx_edges(edges: DataFrame) -> DataFrame:
    """scored pair rows → canonical KGX edge frame (+ engine extension cols)."""
    base = [F.col(c).cast("string").alias(c) for c in EDGE_COLUMNS]
    extras = [
        F.col("score").cast("double").alias("score"),
        F.col("channel").alias("channel"),
        F.col("subject_mentions").alias("subject_mentions"),
        F.col("object_mentions").alias("object_mentions"),
        F.col("url").alias("url"),
    ]
    return edges.select(*base, *extras)


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins upsert (SCD type-1 / compaction merge): one row per key,
    the highest ``version_col`` wins; at equal version the UPDATES side
    wins (the re-crawl semantics: a page re-fetched with the same
    timestamp replaces the stored row). Remaining ties — same key, same
    version, same side — fall to the payload struct's ordering (nulls
    smallest), making the result partitioning-independent.

    Same skew-absorbing aggregation shape as the A2 merge above:
    ``groupBy(key).agg(max_by(row_struct, order_struct))`` — map-side
    partials absorb hub keys; no window, no one-task-per-key straggler.
    This is the MERGE INTO of an incremental corpus refresh expressed as
    a batch operator: base ∪ updates in, compacted table out (the
    read-side of merge-on-read, runnable as each crawl cycle's
    compaction job). ``version_col`` must be non-null orderable
    (timestamp / long); null versions would sort smallest and silently
    lose — filter or default them upstream."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schemas differ: {sorted(set(base.columns) ^ set(updates.columns))}"
        )
    key_cols = list(key_cols)
    cols = base.columns
    payload = [c for c in cols if c not in key_cols]
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_src", F.lit(1))
    )
    ord_struct = F.struct(
        F.col(version_col).alias("_v"),
        F.col("_src").alias("_s"),
        *[F.col(c).alias(f"_t{i}") for i, c in enumerate(payload)],
    )
    row_struct = F.struct(*[F.col(c).alias(c) for c in cols])
    best = tagged.groupBy(*key_cols).agg(F.max_by(row_struct, ord_struct).alias("_r"))
    return best.select(*[F.col(f"_r.{c}").alias(c) for c in cols])
