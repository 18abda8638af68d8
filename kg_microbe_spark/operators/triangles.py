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


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )


def _triangle_rows(und: DataFrame, deg: DataFrame) -> DataFrame:
    """One row per triangle of the undirected simple graph, columns
    (u, x, y) — its three vertices, each triangle exactly once."""
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
    # each unordered wedge {x,y} appears twice ((x,y) and (y,x)) but the
    # closing edge exists in only ONE orientation → each triangle counted once
    return wedges.join(closing, on=["x", "y"])


def triangle_count(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """1-row frame (n_triangles long) over the undirected, de-duplicated,
    self-loop-free projection of ``edges``."""
    und = _undirected(edges, src_col, dst_col)
    tri = _triangle_rows(und, _degrees(und))
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def local_clustering(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    cc(v) = 2·T(v) / (d(v)·(d(v)−1)) over the undirected simple graph —
    the node-level density signal next to the global ``triangle_count``
    (Watts-Strogatz 1998; the spam-farm/community-core discriminator on
    a web link graph).

    Same compact-forward orientation as ``triangle_count`` (wedge work
    bounded O(|E|^1.5) regardless of hub skew), then each triangle row
    credits its THREE vertices via one in-row explode and T(v) is one
    map-combinable count — a clique's quadratic triangle fan-in
    collapses in partials. Degree-<2 nodes get coefficient 0.0 (no
    possible pairs), an explicit contract rather than NULL/NaN.
    Returns (id, degree, triangles, coefficient) with the coefficient
    rounded to 6 dp (double division only in the final per-node row).
    """
    und = _undirected(edges, src_col, dst_col)
    deg = _degrees(und)
    tri = _triangle_rows(und, deg)
    per = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("degree")
    return (
        deg.select(F.col("v").alias("id"), F.col("d").alias("degree"))
        .join(per, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                d >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce("triangles", F.lit(0))
                    / (d * (d - F.lit(1))),
                    6,
                )
                + F.lit(0.0),
            )
            .otherwise(F.lit(0.0))
            .alias("coefficient"),
        )
    )


def edge_triangle_support(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Triangle support per undirected edge — the number of triangles
    each edge participates in; the edge-level density signal k-truss
    is built on. Same compact-forward enumeration; each triangle row
    contributes its THREE edges via an in-row explode of canonical
    (least, greatest) pairs, then ONE combinable count. Edges in no
    triangle report support 0 (left join against the simple-graph
    edge list). Returns (a, b, support) with a < b."""
    und = _undirected(edges, src_col, dst_col)
    tri = _triangle_rows(und, _degrees(und))
    pair = lambda p, q: F.struct(  # noqa: E731
        F.least(p, q).alias("a"), F.greatest(p, q).alias("b")
    )
    sup = (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("u"), F.col("x")),
                    pair(F.col("u"), F.col("y")),
                    pair(F.col("x"), F.col("y")),
                )
            ).alias("_e")
        )
        .groupBy(F.col("_e.a").alias("a"), F.col("_e.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return und.select("a", "b").join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )


def ktruss_prune(
    edges: DataFrame, src_col: str, dst_col: str, k: int, rounds: int = 3
) -> DataFrame:
    """Bounded-round k-truss: iteratively drop edges with triangle
    support < k−2 (Cohen 2008) — the edge-level analog of
    ``kcore.kcore``'s node pruning, and a stronger community-core
    filter (a k-core can be triangle-free; a k-truss cannot). Spam
    rings and template link farms survive k-core but fall out of the
    truss.

    Each round re-enumerates triangles on the SURVIVING edges (the
    compact-forward bound applies per round) and prunes once;
    ``rounds`` is explicit so the plan is deterministic and
    resume-safe — like ``kcore``/``shortest_paths``, callers pick the
    depth, a fixpoint needs support ≥ k−2 everywhere (idempotent once
    converged). ``localCheckpoint`` cuts lineage per round. Returns
    the surviving canonical edges (a, b).
    """
    if k < 3:
        raise ValueError(f"k must be ≥ 3 for a meaningful truss, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1, got {rounds}")
    cur = _undirected(edges, src_col, dst_col).localCheckpoint(eager=True)
    for _ in range(rounds):
        sup = edge_triangle_support(cur, "a", "b")
        cur = (
            sup.filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return cur


def butterfly_count(
    edges: DataFrame,
    left_col: str,
    right_col: str,
    max_right_degree: int | None = None,
) -> DataFrame:
    """Global butterfly (2×2-biclique) and caterpillar (wedge) counts for
    a BIPARTITE graph — the bipartite analog of triangle_count, the
    cohesion statistic for (doc, entity) / (user, item) co-occurrence
    layers where triangles cannot exist by construction.

    Exact-count identity: butterflies = Σ over left-vertex pairs of
    C(codeg, 2); wedges from the right side = Σ_r C(deg(r), 2). The
    codegree table comes from ONE self-equi-join of the distinct edge
    list on the right vertex, oriented ``l1 < l2`` so each pair counts
    once — candidate volume is Σ_r deg(r)², the bipartite
    Schank-Wagner analog, so a hub RIGHT vertex is the quadratic hot
    spot: ``max_right_degree`` drops rights above the cap first (the
    pairwise_jaccard stop-item guard, similarity.py), turning the bound
    into Σ min(deg, cap)² — at 100 TB you always cap (a stopword-like
    entity on 10^9 docs is 10^18 pairs uncapped) and report the dropped
    rights alongside.

    Returns one row: (n_wedges, n_butterflies, n_rights_dropped).
    """
    e = edges.select(
        F.col(left_col).alias("_l"), F.col(right_col).alias("_r")
    ).distinct()
    rdeg = e.groupBy("_r").agg(F.count(F.lit(1)).alias("_d"))
    if max_right_degree is not None:
        keep = rdeg.filter(F.col("_d") <= max_right_degree)
        dropped = rdeg.filter(F.col("_d") > max_right_degree).count()
        e = e.join(F.broadcast(keep.select("_r")), "_r")
        rdeg = keep
    else:
        dropped = 0
    pairs = (
        e.alias("a")
        .join(e.alias("b"), "_r")
        .filter(F.col("a._l") < F.col("b._l"))
        .groupBy(F.col("a._l").alias("l1"), F.col("b._l").alias("l2"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # combine the two global scalars join-free: union one-row partials,
    # then a keyless sum (a scalar crossJoin would plan CartesianProduct)
    w_leg = rdeg.agg(
        F.coalesce(F.sum(F.expr("_d * (_d - 1) DIV 2")), F.lit(0)).alias("w"),
        F.lit(0).cast("long").alias("b"),
    )
    b_leg = pairs.agg(
        F.lit(0).cast("long").alias("w"),
        F.coalesce(F.sum(F.expr("_c * (_c - 1) DIV 2")), F.lit(0)).alias("b"),
    )
    return w_leg.unionByName(b_leg).agg(
        F.sum("w").alias("n_wedges"),
        F.sum("b").alias("n_butterflies"),
        F.max(F.lit(dropped).cast("long")).alias("n_rights_dropped"),
    )
