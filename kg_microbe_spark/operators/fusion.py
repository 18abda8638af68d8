"""Triple confidence fusion across extraction sources (noisy-OR).

A web-scale KG sees the same (subj, pred, obj) asserted by many
extractors / many crawls with varying confidence. Knowledge-Vault-style
fusion treats each source as an independent noisy witness and scores
the triple ``1 - prod(1 - p_src)`` over its DISTINCT sources — repeat
extractions from one source must not compound, so the per-source
confidence is max-pooled first. (The reference's merge step keeps
first-wins provenance per canonical id — kg_microbe merge; this is the
probabilistic generalization the web-extraction setting needs.)

Spark-first shape, 100-TB reasoning:

* two aggregations, both map-side-combinable: ``(s,p,o,source) ->
  max(p)`` collapses per-source repeats BEFORE the wide key drops the
  source (a hub triple extracted a billion times shrinks in the
  partials), then ``(s,p,o)`` folds the per-source maxima;
* the product is computed as ``exp(sum(ln(1-p)))`` — sum is the only
  distributive form, and Spark has no product aggregate. p is clamped
  under 1.0 - 1e-12 so a certain witness cannot emit -inf;
* provenance travels as the sorted distinct source list
  (``sort_array(collect_set(source))``) — bounded by the source
  registry, not the row count, so the collect_set is safe without
  salting (contrast operators/salting.py for unbounded-value sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12


def fuse_triple_confidence(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    source_col: str = "source",
    conf_col: str = "p",
) -> DataFrame:
    """Noisy-OR fusion: one row per (subj, pred, obj) with
    ``n_sources``, ``fused_conf = 1 - prod(1 - max_p_per_source)``
    rounded to 6dp, ``max_p`` (the best single witness), and
    ``sources`` (comma-joined sorted distinct source names)."""
    keys = [subj_col, pred_col, obj_col]
    per_source = triples.groupBy(*keys, source_col).agg(
        F.max(F.least(F.col(conf_col), F.lit(1.0 - _EPS))).alias("p_src")
    )
    fused = per_source.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sources"),
        # + 0.0 canonicalizes IEEE -0.0 after rounding (all-zero p).
        (
            F.round(-F.expm1(F.sum(F.log1p(-F.col("p_src")))), 6)
            + F.lit(0.0)
        ).alias("fused_conf"),
        (F.round(F.max("p_src"), 6) + F.lit(0.0)).alias("max_p"),
        F.array_join(
            F.sort_array(F.collect_set(source_col)), ","
        ).alias("sources"),
    )
    return fused


def rrf_fuse(
    rankings: DataFrame,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    multiple rankers' result lists: fused(q, d) = Σ_rankers
    1/(k + rank) — the standard zero-training way to combine the ANN,
    BM25-ish lexical, and link-prior retrievers this engine ships into
    one candidate list.

    ``rankings``: (ranker, query_id, doc_id, rank) with rank ≥ 1.
    Returns the top ``top_n`` docs per query: (query_id, doc_id,
    n_rankers, rrf_x1e9, rrf, fused_rank).

    Spark shape: ONE map-combinable groupBy(query, doc) — a doc ranked
    by every ranker collapses in map-side partials — then a keyed
    top-n window over the fused frame (bounded per query by
    |rankers|·list length). Contributions are integerized BIGINT
    floor(1e9/(k+rank)) so the fused sum is addition-order-independent;
    the final order ties deterministically to the smaller doc_id.
    """
    from pyspark.sql import Window as W

    fused = rankings.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_rankers"),
        F.sum(
            F.floor(F.lit(1000000000.0) / (F.lit(k) + F.col("rank"))).cast(
                "long"
            )
        ).alias("rrf_x1e9"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rrf_x1e9").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_n)
        .select(
            "query_id",
            "doc_id",
            "n_rankers",
            "rrf_x1e9",
            F.round(F.col("rrf_x1e9") / 1e9, 6).alias("rrf"),
            "fused_rank",
        )
    )
