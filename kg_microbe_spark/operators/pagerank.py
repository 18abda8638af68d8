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


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — fixed synchronous
    iterations with L1 normalization, the directed-graph complement to
    :func:`pagerank`: on the domain link graph authorities are the
    linked-to content hosts and hubs the linker/directory hosts, a pair
    of quality priors PageRank conflates.

    Same Spark shape as pagerank, twice per iteration:
      auth(v) = Σ_{u→v} hub(u)   — edges ⋈ hubs on src, groupBy(dst);
      hub(u)  = Σ_{u→v} auth(v)  — edges ⋈ auths on dst, groupBy(src);
    each followed by an L1 normalization against a keyless 1-row sum
    (broadcast join, no driver collect). Every step is an equi-join +
    map-combinable aggregation; parallel edges collapse via distinct.
    Nodes with no inbound (resp. outbound) edges carry 0 on that side
    — kept by the left join against the node frame.

    Returns (id, authority, hub) rounded to 6 dp.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be ≥ 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    auth = nodes.select("id", F.lit(1.0).alias("authority"))
    hub = nodes.select("id", F.lit(1.0).alias("hub"))

    def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("_tot"))
        return df.join(F.broadcast(total)).select(
            "id", (F.col(col) / F.col("_tot")).alias(col)
        )

    for _ in range(iterations):
        contrib_a = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("_a"))
        )
        auth = nodes.join(
            contrib_a.withColumnRenamed("dst", "id"), "id", "left"
        ).select("id", F.coalesce("_a", F.lit(0.0)).alias("authority"))
        auth = _l1_normalize(auth, "authority")
        contrib_h = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("authority").alias("_h"))
        )
        hub = nodes.join(
            contrib_h.withColumnRenamed("src", "id"), "id", "left"
        ).select("id", F.coalesce("_h", F.lit(0.0)).alias("hub"))
        hub = _l1_normalize(hub, "hub")
    return (
        auth.join(hub, "id")
        .select(
            "id",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    seeds: DataFrame,
    seed_col: str,
    iterations: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, rank) after ``iterations`` synchronous steps of PERSONALIZED
    PageRank: teleport mass returns to the seed set (uniformly over
    seeds) instead of to all nodes — the standard KG-entity relatedness
    / seed-expansion score (rank concentrates in the seeds'
    neighborhood; global PageRank's celebrity hubs stop dominating).

    r₀ = teleport;  r_{k+1}(v) = (1−d)·t(v) + d·Σ_{u→v} r_k(u)/deg(u)
    with t uniform over seeds and 0 elsewhere. Like :func:`pagerank`,
    dangling mass is NOT redistributed (documented; both engines and
    the oracle agree on the same recurrence).

    Scale shape: identical per-iteration plan to :func:`pagerank` (one
    equi-join + one combinable groupBy(dst)); the teleport vector is a
    broadcast semi-join flag on the node frame — seeds are a query-
    sized set by construction. Seeds absent from the graph's node set
    are ignored for ranking but still count in |S| (the caller's seed
    list defines the distribution).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be ≥ 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("_deg"))
    ed = e.join(deg, on="src")
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    s = F.broadcast(seeds.select(F.col(seed_col).alias("id")).distinct())
    n_seeds = F.broadcast(s.agg(F.count("*").alias("_ns")))
    base = (
        nodes.join(s.withColumn("_is_seed", F.lit(1)), "id", "left")
        .crossJoin(n_seeds)
        .select(
            "id",
            (
                F.coalesce(F.col("_is_seed"), F.lit(0)).cast("double")
                / F.col("_ns")
            ).alias("_t"),
        )
    )
    ranks = base.select("id", F.col("_t").alias("rank"))
    for i in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), on="src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_m"))
        )
        ranks = (
            base.join(contribs.withColumnRenamed("dst", "id"), on="id", how="left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("_t")
                    + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
