"""A7 — graph summary stats: the merged_graph_stats.yaml equivalent
(merge.yaml:272-286) as one multi-facet pass.

The reference computes facets with nested loops over the whole graph; here
a single ``cube`` (or per-facet groupBys unioned) produces counts by
predicate, category, provided_by, and spo-triple type in one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefix(col):
    return F.split(col, ":")[0]


def edge_stats(edges: DataFrame) -> DataFrame:
    """Counts by predicate + spo prefix-shape (the 'triple type' facet)."""
    shaped = edges.select(
        "predicate",
        F.concat_ws("-", _prefix(F.col("subject")), F.col("predicate"), _prefix(F.col("object"))).alias(
            "spo_type"
        ),
        _prefix(F.col("subject")).alias("subject_prefix"),
        _prefix(F.col("object")).alias("object_prefix"),
    )
    return shaped.cube("predicate", "spo_type").count().filter(
        F.col("predicate").isNotNull() | F.col("spo_type").isNotNull()
    )


def node_stats(nodes: DataFrame) -> DataFrame:
    return nodes.groupBy("category").agg(
        F.count("*").alias("n_nodes"),
        F.count_distinct("provided_by").alias("n_sources"),
    )


def graph_summary(nodes: DataFrame, edges: DataFrame) -> dict:
    """Driver-side scalar summary (the yaml headline numbers)."""
    n_nodes = nodes.count()
    n_edges = edges.count()
    top_pred = (
        edges.groupBy("predicate").count().orderBy(F.col("count").desc(), F.col("predicate")).limit(1).collect()
    )
    return {
        "total_nodes": n_nodes,
        "total_edges": n_edges,
        "largest_predicate": top_pred[0].predicate if top_pred else None,
        "largest_predicate_count": top_pred[0]["count"] if top_pred else 0,
    }
