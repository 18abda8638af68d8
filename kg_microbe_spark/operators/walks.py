"""Seeded random-walk generation over the KG edge table.

KG-construction use: DeepWalk/node2vec-family entity embeddings train
on walk corpora, and walk-reachability features feed link prediction —
the graph-side sibling of the text pipeline's sequence ops
(operators/chunking.py) and the consumer of operators/negatives.py's
entity index. Walks here are DETERMINISTIC: step choice is
argmin-by-md5 over the out-neighborhood, keyed by
(start, walk, step, candidate, seed). Same input + same seed → the
identical corpus on any cluster size or partitioning — the property
that makes the operator driver-verifiable and resume-safe, and md5 is
uniform enough that the walk distribution matches a uniform random
neighbor pick.

100-TB shape, per step (steps = walk length, small and fixed):

* ONE equi-join frontier ⋈ edges on the current node — shuffle
  O(|frontier| + |E|), with AQE reusing the edge side's exchange
  across steps;
* ONE ``groupBy(start, walk).agg(min_by(dst, md5key))`` — map-side
  combinable, so a hub node's 10⁶ out-edges collapse to one partial
  per partition before the shuffle (the A2 skew-absorbing argmax form
  from operators/dedup.py);
* walks at a sink node simply leave the frontier (the join drops
  them) — no tombstone state;
* ``localCheckpoint`` per step cuts lineage, the
  closure/pagerank/labelprop discipline.

Never collects neighbor lists; per-walk state is one node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    length: int,
    walks_per_node: int = 1,
    seed: str = "0",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) directed → (start, walk, step, node): one row
    per visited position, step 0..length (walks that hit a sink end
    early). Starts = every node with at least one out-edge ×
    ``walks_per_node`` walk ids."""
    if length < 1:
        raise ValueError(f"length must be ≥ 1, got {length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be ≥ 1, got {walks_per_node}")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        e.select(F.col("_s").alias("start"))
        .distinct()
        .select(
            "start",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("walk"),
        )
        .select("start", "walk", F.col("start").alias("cur"))
    )
    out = frontier.select(
        "start", "walk", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    for t in range(1, length + 1):
        key = F.md5(
            F.concat_ws(
                "|",
                F.col("start"),
                F.col("walk"),
                F.lit(str(t)),
                F.col("_d"),
                F.lit(seed),
            )
        )
        frontier = (
            frontier.join(e, frontier.cur == e._s)
            .groupBy("start", "walk")
            .agg(F.min_by("_d", key).alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            frontier.select(
                "start",
                "walk",
                F.lit(t).alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) co-occurrence counts from walk sequences — the
    DeepWalk/node2vec corpus step between :func:`random_walks` and any
    skip-gram trainer (Perozzi et al. 2014 §4.2: each walk is a
    "sentence", every node within ``window`` hops of a center is a
    positive context).

    ``walks``: (start, walk, step, node) as produced by
    :func:`random_walks`. Returns (center, context, n_pairs) with each
    ordered pair counted once per co-occurrence (both directions emit,
    as in skip-gram: the center at step i sees j and vice versa).

    Spark shape: the pair generation is a SELF-EQUI-JOIN on the walk
    identity (start, walk) with the |Δstep| ∈ [1, window] filter
    landing post-join — per-walk work is length·window, bounded by
    construction, never corpus². The closing count is one
    map-combinable groupBy: popular (center, context) edges collapse
    in map-side partials.
    """
    if window < 1:
        raise ValueError(f"window must be ≥ 1, got {window}")
    a = walks.select(
        "start", "walk", F.col("step").alias("_i"), F.col("node").alias("center")
    )
    b = walks.select(
        "start", "walk", F.col("step").alias("_j"), F.col("node").alias("context")
    )
    pairs = a.join(b, ["start", "walk"]).filter(
        (F.col("_j") != F.col("_i"))
        & (F.abs(F.col("_j") - F.col("_i")) <= window)
    )
    return pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
