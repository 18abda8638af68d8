"""Single-source(s) shortest paths — bounded-round distributed relaxation.

The reference answers reachability questions through its SQL hop
queries (reference: kg_microbe query_utils organism queries — 1-hop and
2-hop CTEs) and the closure utilities generalize "is there a path"; the
natural next question over a merged KG is "how FAR" — the cheapest
evidence chain between an organism and a chemical, the hop-weighted
distance between two taxa. This module is weighted SSSP as iterative
DataFrame relaxation (Bellman-Ford rounds), the same fixed-round
synchronous shape as :mod:`pagerank` and :mod:`labelprop`.

Spark shape (100-TB honest):
- state is ONE row per reached node: (node, dist) — linear, never a
  frontier-of-paths;
- each round is one equi-join (dist ⋈ edges on node=src) + one
  map-combinable ``min`` aggregation: hub nodes' inbound relaxations
  collapse in map-side partials;
- ``rounds`` bounds the hop count explicitly (after k rounds the dist
  column is exact for all shortest paths of ≤ k edges) — the driver
  never inspects convergence, so the plan is deterministic and
  checkpoint-resumable;
- ``localCheckpoint`` every few rounds cuts the lineage exactly as the
  closure/pagerank fixpoints do.

Weights are BIGINT so every path length is an exact integer sum —
addition-order-independent on any partitioning (the same integerization
posture as adamic_adar/alignment/disambiguation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    sources: DataFrame,
    rounds: int = 4,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Distances from any source after ``rounds`` relaxation rounds.

    ``edges``: directed (src, dst, weight≥0, BIGINT-castable);
    ``sources``: one column ``id`` — distance 0 seeds (distances are
    "from the nearest source", the multi-source form; pass one row for
    classic SSSP). Returns (id, dist) for every node reached within
    ``rounds`` hops; unreached nodes are absent (not +inf rows — at
    graph scale materializing the unreached complement is the bug).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1, got {rounds}")
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    dist = sources.select(F.col("id"), F.lit(0).cast("long").alias("dist"))
    for i in range(rounds):
        relaxed = (
            dist.join(e, dist["id"] == e["src"])
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < rounds:
            dist = dist.localCheckpoint()
    return dist
