"""PageRank over the KG edge table (fixed-iteration power method).

Centrality ranking of merged-KG entities (which taxa/chemicals dominate
the graph — the analytical counterpart of the reference's
merged_graph_stats degree reports) and a second iterative-graph family
next to connected components (operators/components.py).

Spark-first shape, per iteration:
  1. edges ⋈ ranks on src    — equi-join, co-partitioned with the
                               iteration's groupBy when AQE reuses the
                               exchange; broadcast never needed,
  2. groupBy(dst) sum(r/deg) — map-side combinable,
  3. nodes LEFT JOIN contribs — keeps zero-inbound nodes at (1-d)/N.

N ships as a broadcast 1-row aggregate (no driver collect). Lineage is
cut with localCheckpoint every few iterations (same discipline as
transitive_closure/connected_components) so long runs don't replan an
ever-deeper DAG.

Simplified classical variant: dangling-node mass (nodes with no
outbound edge) is NOT redistributed — ranks sum to < 1 in graphs with
dangling nodes. This matches the unrolled-CTE oracle exactly and is the
common default in bulk implementations; callers needing the stochastic
normalization can add self-loops upstream."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """(id, rank) after ``iterations`` synchronous power-method steps from
    a uniform start over nodes = distinct(src ∪ dst). Unweighted
    (default): parallel edges collapse (distinct) so each link counts
    once. With ``weight_col`` (e.g. the domain link graph's n_links):
    contributions split proportionally to edge weight — rank·w/W_out —
    and parallel edges' weights ADD. Same per-iteration plan either
    way: one equi-join + one combinable groupBy(dst)."""
    if iterations < 1:
        raise ValueError(f"iterations must be ≥ 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
        deg = e.groupBy("src").agg(F.count("*").cast("double").alias("_deg"))
        ed = e.join(deg, on="src").withColumn("_w", F.lit(1.0))
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("double").alias("_w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("_w").alias("_w"))
        )
        deg = e.groupBy("src").agg(F.sum("_w").alias("_deg"))
        ed = e.join(deg, on="src")
    nodes = e.select(F.col("src").alias("id")).union(e.select(F.col("dst").alias("id"))).distinct()
    n_df = F.broadcast(nodes.agg(F.count("*").alias("_n")))
    base = nodes.crossJoin(n_df)
    ranks = base.select("id", (F.lit(1.0) / F.col("_n")).alias("rank"))
    for i in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), on="src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("rank") * F.col("_w") / F.col("_deg")).alias("_m")
            )
        )
        ranks = (
            base.join(contribs.withColumnRenamed("dst", "id"), on="id", how="left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
