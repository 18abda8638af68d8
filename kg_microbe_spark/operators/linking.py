"""Stages 4-5 — LINK + CANON: entity-link candidate resolution and CURIE
canonicalization.

- Link: broadcast equi-join mentions ⋈ name_index on ``term_norm``. The
  name index already carries one winner per term (W4), so candidate scoring
  collapses to that precomputed rank rule; the partial-match/overlap scorer
  for *term lists* (N3/W2) lives in ``term_linking.py``.
- Canon: J9 xref routing (SECONDARY→canonical through the xref map) as a
  second broadcast join, then re-aggregation per (url, curie).

Skew note (north rule): hub terms make ``term_norm`` skewed, but this join
is a **broadcast** join — no shuffle on the skewed key at all, which is the
strongest skew mitigation available. The post-routing re-aggregation groups
by (url, curie): url's cardinality dominates, so no hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_mentions(agg_mentions: DataFrame, name_index: DataFrame) -> DataFrame:
    """(url, term_norm, n_mentions) ⋈ index → (url, curie, label, category,
    rank, n_mentions)."""
    idx = F.broadcast(name_index.select("term_norm", "curie", "label", "category", "rank"))
    return agg_mentions.join(idx, "term_norm", "inner")


def canonicalize_entities(linked: DataFrame, xref_routing: DataFrame) -> DataFrame:
    """Reroute linked entities through the xref map and re-aggregate.

    Output: one row per (url, curie) with summed mention counts and the
    canonical label/category. Deterministic regardless of partitioning.
    """
    routing = F.broadcast(
        xref_routing.select(
            F.col("src_curie"),
            F.col("dst_curie"),
            F.col("dst_label"),
            F.col("dst_category"),
        )
    )
    routed = (
        linked.join(routing, linked["curie"] == routing["src_curie"], "left")
        .select(
            "url",
            F.coalesce("dst_curie", "curie").alias("curie"),
            F.coalesce("dst_label", "label").alias("label"),
            F.coalesce("dst_category", "category").alias("category"),
            "rank",
            "n_mentions",
        )
    )
    return routed.groupBy("url", "curie").agg(
        F.min("label").alias("label"),
        F.min("category").alias("category"),
        F.min("rank").alias("rank"),
        F.sum("n_mentions").alias("n_mentions"),
    )
