"""TF-IDF term weighting + top-k terms per document.

Standard training-data-pipeline signal (keyword extraction, topic
fingerprints, near-dup features). Spark-first shape, three shuffles
total, all map-side combinable:

  1. explode tokens → groupBy(doc, token) count      — tf
  2. tf frame      → groupBy(token) count            — df (rows already
                                                       distinct per doc)
  3. window top-k per doc over the tf⋈df join

The doc total N joins in as a broadcast 1-row aggregate (no driver
collect). The idf join broadcasts when the vocabulary is small; at web
scale it is a plain equi-join on token — co-partitioned with the tf
frame by the groupBy that produced each side, so AQE reuses the
exchange.

Ranking is by the INTEGER key (tf DESC, df ASC, token ASC) — the same
order tf·idf induces when idf is monotone-decreasing in df at equal tf —
so the per-doc top-k is bit-identical across engines (a float
``tfidf DESC`` rank key could flip on 1-ulp ln() differences between
libm implementations); the tf-idf score itself is emitted as a value
column. Reference analogue: none (the reference has no term-weighting);
this is one of the text-analysis operators the task brief adds."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.functions.text import tokens_col


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document → (id, token, tf, df, tfidf).

    tfidf = tf · (ln((N+1)/(df+1)) + 1)  (smoothed idf, sklearn-style).
    """
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = F.broadcast(docs.agg(F.count("*").alias("_n")))
    scored = (
        tf.join(df_, on="token")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (
                F.log((F.col("_n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double"))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(F.col("_id").alias(id_col), "token", "tf", "df", "tfidf")
    )


# integer weight scale for tfidf_cosine_pairs: floor(1e4·tf·idf).
# Headroom: idf ≤ ln(N)+1 (~29 at N=1e12), so w ≤ 3e5·tf and a document
# needs Σ tf² ~ 1e8 before its norm² nears the BIGINT line — far beyond
# any real page after the df guard removes the high-tf stop terms.
COSINE_SCALE = 10_000


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_cosine: float = 0.3,
    max_doc_frequency: int = 100,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity self-join — the weighted-vector
    complement of ``setjoin.jaccard_set_join`` (near-topic pages that
    share few exact shingles still score; the classic inverted-index
    similarity join of Bayardo et al. 2007).

    Weights are INTEGERIZED — w = floor(1e4·tf·(ln((N+1)/(df+1))+1)),
    the same smoothed idf as :func:`tfidf_top_terms` — so norms² and
    dot products are exact BIGINT map-combinable sums (a float dot
    summed across partitions is addition-order-dependent; the floor
    happens once per (doc, term), never inside an aggregation). The
    only doubles are the final per-pair cosine divisions, rounded to
    6 dp.

    Scale shape: candidate generation is the term-keyed inverted-index
    self-join; ``max_doc_frequency`` drops stop terms BEFORE the join
    (the A4 hub guard — fan-out is Σ df² over KEPT terms, never n²,
    and the dropped terms are exactly the ~zero-idf ones that carry no
    cosine mass). Norms are computed over the SAME guarded vocabulary
    so the cosine is internally consistent. Returns
    (doc_a, doc_b, cosine) with doc_a < doc_b, cosine ≥ ``min_cosine``.
    """
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    tf = tok.groupBy("_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = F.broadcast(docs.agg(F.count("*").alias("_n")))
    w = (
        tf.join(df_.filter(F.col("df") <= max_doc_frequency), "token")
        .crossJoin(n_docs)
        .select(
            "_id",
            "token",
            F.floor(
                F.lit(COSINE_SCALE)
                * F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                )
            )
            .cast("long")
            .alias("w"),
        )
    )
    norm2 = w.groupBy("_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a = w.select(F.col("_id").alias("doc_a"), "token", F.col("w").alias("wa"))
    b = w.select(F.col("_id").alias("doc_b"), "token", F.col("w").alias("wb"))
    dot = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dot.join(norm2.select(F.col("_id").alias("doc_a"), F.col("n2").alias("na2")), "doc_a")
        .join(norm2.select(F.col("_id").alias("doc_b"), F.col("n2").alias("nb2")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.round(
                    F.col("dot")
                    / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
                    6,
                )
                + F.lit(0.0)
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(min_cosine)))
    )


def chi2_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
    min_doc_count: int = 2,
) -> DataFrame:
    """χ² term–class association over document-level token PRESENCE —
    the classic feature-selection / drift-detection statistic for a
    labeled corpus (which vocabulary is over-represented in one
    language / domain / quality band; reference analog: the per-source
    vocabulary audits kg_microbe runs before trusting a new dump).

    For each (token, class) the 2×2 contingency table is
      a = docs of this class containing the token
      b = docs of other classes containing the token
      c = class size − a,   d = N − class_size − b
    and χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).

    Scale shape: presence is explode→distinct (one shuffle keyed by
    (doc, token) — map-side combinable because duplicates collapse
    early); (token, class) counts and per-token totals are combinable
    groupBys; class sizes and N ride a broadcast. Every table cell is
    an exact BIGINT, so (ad−bc)² and the denominator are exact integer
    products (document counts ≤ ~3·10⁴ per class keep the BIGINT
    products in range at any realistic shard size — shard the corpus
    before counting if a class exceeds that), and the single float
    division IEEE-rounds identically on every engine.
    Returns (token, class_, n_class_with, chi2).
    """
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be ≥ 1, got {min_doc_count}")
    presence = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.col(class_col).alias("class_"),
            F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("token"),
        )
        .distinct()
    )
    ac = presence.groupBy("token", "class_").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    tok_tot = presence.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    # class sizes: keyed aggregate over the full corpus — ≤ |classes| rows
    # after the combinable count, but the optimizer cannot know that at
    # plan time, so no explicit broadcast hint: AQE sees the materialized
    # size at runtime and converts the join to broadcast itself.
    cls_sz = docs.groupBy(F.col(class_col).alias("class_")).agg(
        F.count(F.lit(1)).cast("long").alias("csz")
    )
    n_tot = F.broadcast(docs.agg(F.count(F.lit(1)).cast("long").alias("nn")))
    j = (
        ac.join(tok_tot, "token")
        .filter(F.col("t") >= F.lit(int(min_doc_count)))
        .join(cls_sz, "class_")
        .crossJoin(n_tot)
    )
    a = F.col("a")
    b = F.col("t") - a
    c = F.col("csz") - a
    d = F.col("nn") - F.col("csz") - b
    num = F.col("nn") * (a * d - b * c) * (a * d - b * c)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return j.select(
        "token",
        "class_",
        a.alias("n_class_with"),
        F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0)).alias("chi2"),
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed query-term set
    (Robertson et al., TREC-3) — the retrieval scorer a corpus-quality
    pipeline uses to mine query-relevant training slices; complements
    tfidf_top_terms (per-doc keywords) with a per-(doc, query) score.

    Same three-shuffle dataflow as tfidf_top_terms, with the tf frame
    FILTERED to the query terms before df/score work — the fact-table
    pass never carries non-query tokens past its first groupBy. Doc
    length and its global average come from a broadcast 1-row aggregate
    over per-doc token counts (F.size on the token array: no second
    explode). idf = ln(1 + (N - df + ½)/(df + ½)), the RSJ form that
    stays positive for df ≤ N/2 and is monotone in df, Lucene's choice.

    Returns (id, n_matched, bm25) for documents matching ≥ 1 query
    term, bm25 rounded 6 dp.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tok = docs.select(
        F.col(id_col).alias("_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    dl = tok.select("_id", F.size("_toks").cast("double").alias("_dl"))
    stats = F.broadcast(
        dl.agg(
            F.avg("_dl").alias("_avgdl"), F.count("*").cast("double").alias("_n")
        )
    )
    tf = (
        tok.select("_id", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("_id", "token")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").cast("double").alias("_df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "_id")
        .crossJoin(stats)
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
    )
    return scored.groupBy("_id").agg(
        F.count("*").alias("n_matched"),
        F.round(F.sum("_s"), 6).alias("bm25"),
    ).select(F.col("_id").alias(id_col), "n_matched", "bm25")
