"""Semi-supervised label propagation: type untyped KG nodes from
their neighbors.

Web extraction yields many entities with no category assertion; the
curated side of the graph (the reference's ontology nodes carry Biolink
categories — kg_microbe transform node tables) supplies typed seeds.
Label propagation pushes those seed types along edges: each round,
every non-seed node adopts the majority type among its labeled
neighbors (ties broken by lexicographically smallest type — fully
deterministic), keeping its previous label when no neighbor is labeled
yet. Seeds are clamped and never change.

100-TB shape per round (the loop is O(iterations), typically 2-5):

* ONE equi-join of the bidirectional edge list against current labels —
  shuffle O(|E|);
* ONE ``groupBy(node, label).count()`` — map-side combinable, so a hub
  node's million incident edges shrink to (hub, label) partials before
  the shuffle;
* ONE ``min_by`` argmax per node — again partial-aggregatable (the
  same skew-absorbing form as operators/dedup.py's A2 rewrite);
* ``localCheckpoint`` cuts lineage each round (swap for ``checkpoint``
  on a cluster), exactly as operators/closure.py / pagerank.py do.

No per-node neighbor lists are ever collected; state per node is one
label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_labels(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    seed_col: str = "seed",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """nodes(node, seed: nullable type), edges(src, dst) undirected →
    (node, label) after ``iterations`` rounds of clamped majority
    propagation. Unreached nodes keep label NULL."""
    bidir = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("nb"))
        .unionByName(
            edges.select(F.col(dst).alias("n"), F.col(src).alias("nb"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = nodes.select(
        F.col(node_col).alias("node"), F.col(seed_col).alias("seed")
    )
    labels = seeds.select("node", F.col("seed").alias("label"))
    for _ in range(iterations):
        nbr = bidir.join(
            labels.filter(F.col("label").isNotNull()).select(
                F.col("node").alias("nb"), F.col("label")
            ),
            on="nb",
        )
        votes = nbr.groupBy("n", "label").agg(F.count(F.lit(1)).alias("c"))
        winners = votes.groupBy("n").agg(
            F.min_by(
                "label", F.struct((-F.col("c")).alias("nc"), F.col("label"))
            ).alias("won")
        )
        labels = (
            seeds.join(winners, on=F.col("node") == F.col("n"), how="left")
            .join(
                labels.select("node", F.col("label").alias("prev")),
                on="node",
                how="left",
            )
            .select(
                "node",
                F.coalesce("seed", "won", "prev").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def modularity_by_community(
    edges: DataFrame,
    assignments: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Newman modularity contributions per community — the quality
    score for a :func:`propagate_labels` (or any) partition:
    Q = Σ_c [ e_c/m − (d_c/2m)² ] with e_c intra-community edges,
    d_c the community's total degree, m the edge count of the
    UNDIRECTED simple graph.

    ``edges``: one row per undirected edge (symmetrized duplicates and
    self-loops are removed here); ``assignments``: (id, community) —
    nodes missing an assignment drop out of both terms (their edges
    are excluded from m), keeping the two sums consistent.

    Everything that can be integer IS integer: e_c, d_c, m are exact
    BIGINT aggregations (map-combinable — a mega-community collapses
    in partials), and the only doubles are the final two divisions per
    community row, rounded to 6 dp. Returns (community, n_nodes,
    e_intra, degree_sum, contribution); Q = SUM(contribution) up to
    6-dp rounding.
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    asg = assignments.select(F.col("id"), F.col("community"))
    e = (
        und.join(asg.withColumnRenamed("id", "a").withColumnRenamed("community", "_ca"), "a")
        .join(asg.withColumnRenamed("id", "b").withColumnRenamed("community", "_cb"), "b")
    )
    m_row = e.agg(F.count(F.lit(1)).alias("_m"))
    intra = (
        e.filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_intra"))
    )
    deg = (
        e.select(F.col("a").alias("id"), F.col("_ca").alias("community"))
        .unionByName(e.select(F.col("b").alias("id"), F.col("_cb").alias("community")))
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("degree_sum"),
            F.count_distinct("id").alias("n_nodes"),
        )
    )
    return (
        deg.join(intra, "community", "left")
        .select("community", "n_nodes", F.coalesce("e_intra", F.lit(0)).alias("e_intra"), "degree_sum")
        .join(F.broadcast(m_row))
        .select(
            "community",
            "n_nodes",
            "e_intra",
            "degree_sum",
            F.round(
                F.col("e_intra") / F.col("_m")
                - (F.col("degree_sum") / (F.lit(2.0) * F.col("_m")))
                * (F.col("degree_sum") / (F.lit(2.0) * F.col("_m"))),
                6,
            ).alias("contribution"),
        )
    )


def louvain_move_round(
    edges: DataFrame,
    assignments: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """One synchronous Louvain local-move round (Blondel et al. 2008
    phase 1, one sweep): every node moves to the neighbor community
    (or stays) maximizing the modularity gain, evaluated against the
    ROUND-START partition — the deterministic bulk-synchronous variant
    (sequential Louvain's node order is irreproducible on a shuffled
    cluster; synchronous sweeps converge the same communities and are
    replayable). Iterate by feeding the result back in; grade the
    partition with :func:`modularity_by_community`.

    All gain arithmetic is EXACT BIGINT: with integer weights, moving
    node i to community c beats c' iff
    ``2m·k_{i,c} − k_i·Σtot(c\\i)`` beats the same for c' (the common
    1/2m² factor of ΔQ cancels in the argmax). Ties break to the
    smaller community id, and a node with no strictly better neighbor
    community keeps its own — so a converged partition is a fixpoint.

    Shape: symmetrize/simplify (as modularity) → ONE combinable
    (i, c_neighbor) weight sum — a hub's million incident edges shrink
    to per-community partials map-side — + combinable degree and Σtot
    sums → candidate scoring joins (Σtot is community-keyed and
    node-sized at round 0, an honest equi-join, never broadcast) →
    the A2 min_by argmax. Returns (id, community).

    ``weight_col`` must be integer-typed when given (the exactness
    contract); parallel edges' weights add BEFORE simplification.
    Nodes missing an assignment drop from the graph entirely (edges,
    degrees, and 2m), keeping the gain arithmetic internally
    consistent — the same universe rule as
    :func:`modularity_by_community`.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    bidir = und.select("a", "b", "w").unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    asg = assignments.select("id", "community")
    # assigned-only subgraph: a semi-filtered, b carries its community
    e = bidir.join(
        asg.select(F.col("id").alias("a")), "a", "left_semi"
    ).join(
        asg.select(F.col("id").alias("b"), F.col("community").alias("_cb")),
        "b",
    )
    # k_{i,c}: weight from i into each neighbor community (round-start)
    kic = (
        e.groupBy(F.col("a").alias("id"), F.col("_cb").alias("community"))
        .agg(F.sum("w").alias("k_ic"))
    )
    deg = e.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("k_i"))
    sigma = (
        asg.join(deg, "id")
        .groupBy("community")
        .agg(F.sum("k_i").alias("sigma_tot"))
    )
    m2 = deg.agg(F.sum("k_i").alias("_m2"))  # 2m (each edge counted twice)
    own = asg.withColumnRenamed("community", "_c_own")
    # candidate set = neighbor communities ∪ own community (k_ic 0 when
    # no intra neighbor); nodes with no assigned neighbor are absent
    # from deg/kic and keep their assignment via the final coalesce
    cand = (
        kic.unionByName(
            own.join(deg.select("id"), "id", "left_semi").select(
                "id",
                F.col("_c_own").alias("community"),
                F.lit(0).cast("long").alias("k_ic"),
            )
        )
        .groupBy("id", "community")
        .agg(F.max("k_ic").alias("k_ic"))
    )
    scored = (
        cand.join(own, "id")
        .join(deg, "id")
        .join(sigma, "community")
        .join(F.broadcast(m2))
        .select(
            "id",
            "community",
            (
                F.col("_m2") * F.col("k_ic")
                - F.col("k_i")
                * (
                    F.col("sigma_tot")
                    - F.when(
                        F.col("community") == F.col("_c_own"), F.col("k_i")
                    ).otherwise(F.lit(0))
                )
            ).alias("_gain"),
        )
    )
    moved = scored.groupBy("id").agg(
        F.min(
            F.struct(
                (-F.col("_gain")).alias("_ng"), F.col("community").alias("c")
            )
        )["c"].alias("_c_new")
    )
    return asg.join(moved, "id", "left").select(
        "id", F.coalesce("_c_new", "community").alias("community")
    )
