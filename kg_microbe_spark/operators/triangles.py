"""Triangle counting on the undirected KG co-mention graph.

Clustering-structure statistic (the densest analytics query on a graph
table; complements degree stats A7, components, and PageRank). The
naive 3-way self-join explodes on hub nodes: a degree-d node
contributes d² wedge candidates. The standard fix — orient every edge
from the LOWER (degree, id) endpoint to the higher — bounds every
node's out-degree by O(√|E|), so the wedge join generates
Σ out_deg² = O(|E|^1.5) candidates total regardless of hub skew
(compact-forward / Schank-Wagner). Each triangle is then generated
exactly once (its vertices appear in a unique (deg,id)-ascending
order), so the count needs no division by 3/6.

Three equi-joins + two groupBys, all JVM, no window functions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """1-row frame (n_triangles long) over the undirected, de-duplicated,
    self-loop-free projection of ``edges``."""
    und = _undirected(edges, src_col, dst_col)
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient low (deg, id) → high (deg, id)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("_db"))
    w = und.join(da, on="a").join(db, on="b")
    fwd = F.struct(F.col("_da"), F.col("a")) < F.struct(F.col("_db"), F.col("b"))
    oriented = w.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    # wedges lo→x, lo→y with x before y in the orientation order need the
    # order again; cheaper: join oriented on shared source, then close
    # with a third oriented edge in either of the two possible directions
    # — but orientation is a total order, so the closing edge x→y exists
    # oriented exactly one way and each triangle closes exactly once.
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("y"))
    wedges = e1.join(e2, on="u").filter(F.col("x") != F.col("y"))
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tri = wedges.join(closing, on=["x", "y"])
    # each unordered wedge {x,y} appears twice ((x,y) and (y,x)) but the
    # closing edge exists in only ONE orientation → each triangle counted once
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))
