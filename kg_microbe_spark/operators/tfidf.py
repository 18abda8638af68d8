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
