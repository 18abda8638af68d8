"""Similarity search over embeddings + set-overlap aggregation (A4).

- brute-force cosine top-k: the exactness baseline. Dot products are pure
  JVM array expressions (zip_with + aggregate) — no Python, no UDF.
- LSH-bucketed ANN: random-hyperplane signatures (deterministic seeded
  planes via xxhash64-free arithmetic) bucket the vectors; candidates come
  from equal-signature buckets (+ optional multi-probe), so the join is an
  equi-join on the signature — shuffle ∝ bucket sizes, not n².
- A4 pairwise Jaccard of collected sets (pandas_utils.py:211-237) —
  exploded self-join + groupBy, with the |∩|/|∪| identity
  |∪| = |A|+|B|−|∩| so only the intersection is aggregated.
"""

from __future__ import annotations

import math
from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


# Optimization r06 note (measured, then reverted): unrolling the dot
# products to fixed-dim element_at arithmetic (64 terms × 6 planes) was
# tried and made lsh_topk SLOWER (2.2 s → 5.5 s at sf1.0): the generated
# projection is enormous, so Janino compilation dominates at this row
# count, while the interpreted HOF aggregate is adequate for 20k rows.
# The HOF forms stay; at truly large row counts revisit with a measured
# compile-vs-run tradeoff.


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    (huge) corpus, rank per query. Corpus side never shuffles the vectors —
    only (query_id, doc_id, score) rows reach the top-k window, and the
    per-query partial top-k is computed map-side by the window's underlying
    sort."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("dv"),
    )
    scored = q.crossJoin(c).select(
        "query_id",
        "doc_id",
        cosine_col(F.transform(F.col("qv"), lambda x: x.cast("double")), F.col("dv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure function of seed;
    no RNG state → same planes on every executor/run)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            # hash-ish uniform in [-1, 1): fractional part of sin-free LCG
            x = (1103515245 * (p * 7919 + d * 104729 + seed) + 12345) % (2 ** 31)
            row.append((x / float(2 ** 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: sig bit p = sign(v · plane_p); returned as a
    single long. JVM-side: per plane, dot product via zip_with against an
    array literal."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for p, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(_dot(v, lit) >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return embeddings.select(F.col(id_col).alias("doc_id"), v.alias("dv"), sig.alias("lsh_sig"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 10,
    round_dp: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates share the full LSH signature (bucket
    equi-join), then exact cosine re-rank within candidates.

    ``round_dp`` rounds the cosine before ranking — cross-engine oracle
    comparisons need rank stability under last-ulp float differences; the
    production path leaves it None (full precision)."""
    corpus = lsh_signatures(embeddings, dim, id_col, vec_col, n_planes)
    qsig = lsh_signatures(queries, dim, id_col, vec_col, n_planes).select(
        F.col("doc_id").alias("query_id"), F.col("dv").alias("qv"), "lsh_sig"
    )
    cand = F.broadcast(qsig).join(corpus, "lsh_sig")
    cos = cosine_col(F.col("qv"), F.col("dv"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    scored = cand.select("query_id", "doc_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_cells(
    df: DataFrame,
    centroids: List[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_id: str = "doc_id",
) -> DataFrame:
    """IVF cell assignment: each vector goes to its ``nprobe``
    highest-cosine centroids. ``centroids`` is a small driver-side list of
    ``(centroid_id, vector)`` (an IVF codebook is dimension-scale — tens to
    thousands of entries — so it rides into the plan as array literals,
    the same broadcast-dimension treatment the lexicon gets).

    100-TB shape: the assignment is a pure map-side JVM expression — an
    array of (cosine, centroid) structs, ``array_sort`` + ``slice`` for the
    top-``nprobe`` — NO shuffle, no window, no Python. Writing the corpus
    ``partitionBy("cell_id")`` afterwards turns every probe into partition
    pruning, which is the entire point of IVF: a query reads nprobe/K of
    the corpus instead of all of it."""
    K = len(centroids)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = F.array(
        *[
            F.struct(
                cosine_col(v, F.array(*[F.lit(float(x)) for x in cvec])).alias("cos"),
                # ties (never expected vs distinct random centroids) break
                # toward the SMALLEST centroid id: structs sort
                # lexicographically, so store K - id and invert on the way out
                F.lit(K - int(cid)).cast("int").alias("inv"),
            )
            for cid, cvec in centroids
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return (
        df.select(
            F.col(id_col).alias(out_id),
            v.alias("dv"),
            F.transform(top, lambda s: F.lit(K) - s["inv"]).alias("_cells"),
        )
        .withColumn("cell_id", F.explode("_cells"))
        .drop("_cells")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: List[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    round_dp: int | None = None,
) -> DataFrame:
    """IVF ANN top-k: corpus vectors live in their argmax-cosine cell
    (nprobe=1); queries probe their ``nprobe`` nearest cells; exact cosine
    re-rank runs only inside probed cells (an equi-join on cell_id — the
    candidate set is the cell contents, never the corpus). Self-matches are
    excluded. ``round_dp`` rounds the cosine before ranking for
    cross-engine rank stability (same contract as ``lsh_topk``)."""
    corpus = ivf_cells(embeddings, centroids, id_col, vec_col, nprobe=1, out_id="doc_id")
    qcells = ivf_cells(queries, centroids, id_col, vec_col, nprobe=nprobe, out_id="query_id").select(
        F.col("query_id"), F.col("dv").alias("qv"), "cell_id"
    )
    cand = F.broadcast(qcells).join(corpus, "cell_id").filter(F.col("query_id") != F.col("doc_id"))
    cos = cosine_col(F.col("qv"), F.col("dv"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    scored = cand.select("query_id", "doc_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate clustering: pairs with cosine ≥
    ``threshold`` form an undirected graph; connected components label each
    cluster; cluster_id is the minimum member id (the kept canonical — the
    same keep-lowest convention as the exact/MinHash dedup family).

    ``candidate_pairs`` (src, dst) is the production path: feed LSH-bucket
    candidates (``lsh_signatures`` equi-join, shuffle ∝ duplicates) so only
    candidates pay the cosine verify. With ``None`` the operator generates
    ALL id<id pairs — exact semantics, quadratic in row count, intended for
    dimension-scale inputs and oracle verification only (the same
    exact-baseline / LSH-scale-path split as ``brute_force_topk`` vs
    ``lsh_topk``)."""
    from .components import connected_components

    v = embeddings.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if candidate_pairs is None:
        # explicit broadcast: a non-equi self-join plans as CartesianProduct
        # without stats — hint the (dimension-scale) left side so the plan
        # is BroadcastNestedLoop, mirroring brute_force_topk's baseline
        a = F.broadcast(v.select(F.col("_id").alias("src"), F.col("_v").alias("va")))
        b = v.select(F.col("_id").alias("dst"), F.col("_v").alias("vb"))
        cand = a.join(b, F.col("src") < F.col("dst"))
    else:
        a = v.select(F.col("_id").alias("src"), F.col("_v").alias("va"))
        b = v.select(F.col("_id").alias("dst"), F.col("_v").alias("vb"))
        cand = (
            candidate_pairs.select("src", "dst").join(a, "src").join(b, "dst")
        )
    edges = cand.filter(cosine_col(F.col("va"), F.col("vb")) >= threshold).select("src", "dst")
    comp = connected_components(edges)
    labels = (
        v.select(F.col("_id").alias(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(id_col, F.coalesce("component", F.col(id_col)).alias("cluster_id"))
    )
    sizes = labels.groupBy("cluster_id").agg(F.count("*").cast("long").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


def pairwise_jaccard(
    df: DataFrame,
    key_col: str,
    item_col: str,
    max_item_frequency: int | None = None,
) -> DataFrame:
    """A4: overlap of item-sets between every pair of keys that share ≥1
    item (pairs with empty intersections are omitted — they'd be n² rows).

    Scale guard: the candidate join emits |keys sharing an item|² rows per
    item, so one hub item present in f keys contributes f² pairs — a
    ubiquitous item makes the operator quadratic in key count. With
    ``max_item_frequency=f`` items in more than f keys are dropped from
    BOTH the intersection and the set sizes (standard stop-item removal:
    jaccard is then computed over the filtered item space — an explicit,
    documented approximation; a hub item carries ~0 Jaccard information
    anyway since it inflates every union equally). The default ``None``
    keeps exact semantics and is the reference's A4 contract
    (pandas_utils.py:211-237): DIMENSION-scale inputs (solutions ×
    ingredients), where all-pairs is genuinely intended."""
    items = df.select(F.col(key_col).alias("k"), F.col(item_col).alias("item")).distinct()
    if max_item_frequency is not None:
        freq = items.groupBy("item").agg(F.count("*").alias("_df"))
        keep = F.broadcast(freq.filter(F.col("_df") <= max_item_frequency).select("item"))
        items = items.join(keep, "item")
    sets = items.groupBy("k").agg(F.count("*").alias("n"))
    a = items.select(F.col("k").alias("key_a"), "item")
    b = items.select(F.col("k").alias("key_b"), "item")
    inter = (
        a.join(b, "item")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sets.select(F.col("k").alias("key_a"), F.col("n").alias("n_a"))
    sb = sets.select(F.col("k").alias("key_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .select(
            "key_a",
            "key_b",
            (F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def kmeans_assign(
    points: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    cid_col: str,
    cvec_col: str,
) -> DataFrame:
    """One k-means ASSIGNMENT step: each point gets its nearest
    centroid by squared L2 — the building block for embedding-space
    corpus clustering (topic bucketing before mixture sampling) and
    for IVF cell assignment; iterate by re-deriving centroids from the
    assignment and calling again (the loop stays in the caller, like
    closure.py's fixpoint contract).

    Determinism contract: the distance is integerized PER ELEMENT —
    Σ floor(1e9·(xᵢ−cᵢ)²) as BIGINT — so the sum is addition-order-
    exact and the argmin (min over a (dist, cid) struct — tie →
    smaller centroid id) is engine-stable.

    Scale shape: centroids broadcast (k rows by construction); the
    broadcast join emits k candidate rows per point INSIDE each task,
    and the argmin is a combinable min-struct aggregation, so the
    k-fold blow-up collapses map-side before any shuffle — the
    post-join shuffle carries ~|points| rows, not |points|·k.
    Returns (``id_col``, cluster_id, dist2_int).
    """
    c = F.broadcast(
        centroids.select(
            F.col(cid_col).alias("_cid"), F.col(cvec_col).alias("_cvec")
        )
    )
    paired = points.select(F.col(id_col), F.col(vec_col).alias("_vec")).join(c)
    d2 = F.aggregate(
        F.zip_with(
            F.col("_vec"),
            F.col("_cvec"),
            lambda x, y: F.floor(
                F.lit(1e9)
                * (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    win = paired.select(
        F.col(id_col), F.struct(d2.alias("d2"), F.col("_cid").alias("cid")).alias("_s")
    ).groupBy(id_col).agg(F.min("_s").alias("_w"))
    return win.select(
        id_col,
        F.col("_w.cid").alias("cluster_id"),
        F.col("_w.d2").alias("dist2_int"),
    )
