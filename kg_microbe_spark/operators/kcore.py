"""k-core decomposition: iterative degree peeling of the KG.

KG-construction use: after web extraction the merged graph carries long
pendant chains and one-off entities (a page that mentioned two things
once). The k-core — the maximal subgraph where every node keeps degree
≥ k — is the standard densification filter before embedding training or
community detection (reference analog: merged_graph_stats degree
reports feed manual prune thresholds; this automates the prune).

100-TB shape, per round (rounds is O(peel depth), fixed and small):

* degree = ONE ``groupBy(node).count()`` over the bidirectional edge
  list — map-side combinable, hub nodes shrink to partials before the
  shuffle;
* survivors = the ≥k filter on that |V|-sized aggregate;
* edge prune = TWO left-semi joins (src side, dst side) against the
  survivor set — semi joins never widen rows and AQE broadcasts the
  survivor side as peeling shrinks it;
* ``localCheckpoint`` cuts lineage per round (swap for ``checkpoint``
  on a cluster), the closure/pagerank/labelprop discipline.

Fixed round count (like pagerank.py) keeps the plan deterministic and
oracle-replayable; a chain of length L fully peels in ⌈L/2⌉ rounds, so
callers size ``rounds`` to the peel depth they care about. At-scale
early exit would compare per-round edge counts (one cheap count action)
— left to the caller so the default stays a single lazy DAG per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) undirected (parallel edges / self-loops collapse;
    self-loops dropped — they never contribute to coreness) →
    (node, degree) for nodes still alive after ``rounds`` peeling
    rounds, with degree computed inside the surviving subgraph."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1, got {rounds}")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        bidir = e.select(F.col("a").alias("n")).unionByName(
            e.select(F.col("b").alias("n"))
        )
        deg = bidir.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
        survivors = deg.filter(F.col("degree") >= k).select("n")
        e = (
            e.join(survivors.withColumnRenamed("n", "a"), on="a", how="left_semi")
            .join(survivors.withColumnRenamed("n", "b"), on="b", how="left_semi")
            .localCheckpoint(eager=True)
        )
    bidir = e.select(F.col("a").alias("node")).unionByName(
        e.select(F.col("b").alias("node"))
    )
    return (
        bidir.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )
