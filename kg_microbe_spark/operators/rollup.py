"""Taxonomy-aware count rollup: aggregate per-node evidence up the
is-a closure.

KG-construction use: mention/evidence counts land on leaf taxa
("E. coli K-12"), but corpus analytics and the reference's organism
report ask genus/family-level questions (reference analog: the
strain→species rollup implicit in organism_queries.py's
strain-subclass + trait joins). Given per-node counts and the subclass
closure, every ancestor receives the SUM over its descendants —
including itself.

100-TB shape:

* closure ∪ identity pairs built by a zero-shuffle union (no new scan);
* ONE equi-join counts ⋈ closure on the descendant key — shuffle
  O(|closure|), never node×node;
* ONE ``groupBy(ancestor).sum()`` — map-side combinable, so the root
  node (which is an ancestor of everything — the worst hub imaginable)
  collapses to per-partition partials before the shuffle. This is why
  rollup MUST be a sum-agg over the closure and never a per-ancestor
  descendant-list collect.

Compose with operators/closure.py's ``transitive_closure`` (fixpoint,
doubling) to produce the closure frame from raw is-a edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_counts(
    counts: DataFrame,
    closure: DataFrame,
    node_col: str = "node",
    count_col: str = "n",
    desc_col: str = "subject",
    anc_col: str = "object",
) -> DataFrame:
    """counts(node, n) + closure(desc, anc) → (node, n_self, n_rolled)
    per node appearing in counts or closure, where n_rolled sums counts
    over {node} ∪ descendants(node). Nodes with no count anywhere in
    their subtree report 0 (they exist in the taxonomy; the absence is
    data)."""
    c = counts.select(
        F.col(node_col).alias("d"), F.col(count_col).cast("long").alias("_n")
    )
    pairs = closure.select(
        F.col(desc_col).alias("d"), F.col(anc_col).alias("anc")
    )
    universe = (
        pairs.select(F.col("d").alias("node"))
        .unionByName(pairs.select(F.col("anc").alias("node")))
        .unionByName(c.select(F.col("d").alias("node")))
        .distinct()
    )
    # self pairs ride the universe frame: every node rolls itself up
    up = pairs.unionByName(
        universe.select(F.col("node").alias("d"), F.col("node").alias("anc"))
    )
    rolled = (
        c.join(up, on="d")
        .groupBy("anc")
        .agg(F.sum("_n").alias("n_rolled"))
    )
    self_n = c.groupBy("d").agg(F.sum("_n").alias("n_self"))
    return (
        universe.join(self_n, universe.node == self_n.d, "left")
        .join(rolled, universe.node == rolled.anc, "left")
        .select(
            "node",
            F.coalesce("n_self", F.lit(0)).alias("n_self"),
            F.coalesce("n_rolled", F.lit(0)).alias("n_rolled"),
        )
    )
