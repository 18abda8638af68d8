"""Within-document repetition signals (Gopher-style quality rules).

Web-crawl filtering keeps/drops documents on repetition statistics —
fraction of the doc covered by its most frequent unigram/bigram,
fraction of tokens that are repeats, distinct-token ratio (Rae et al.
2021 "Scaling Language Models" §A1.1 repetition filters). These are
per-document aggregations over n-gram counts:

  explode grams → groupBy(doc, gram) count → groupBy(doc) stats

— two shuffles per n-gram order, every one map-side combinable, no
window functions, no Python. A hub DOCUMENT cannot exist (grams of one
doc hash-spread by (doc, gram)); a hub GRAM is irrelevant because the
key includes the doc. This shape survives 100 TB unchanged.

The complement of functions/text.py's quality_score (length/stopword/
punctuation bands, which are per-row narrow maps): repetition needs the
per-gram counts, hence an operator, not a Column function."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.text import tokens_col


def _bigrams_col(toks: Column) -> Column:
    """Adjacent-pair bigrams "a b" of a token array; empty when < 2
    tokens (guard first: sequence(1,0) would generate DESCENDING)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(F.array().cast("array<string>"))


def repetition_signals(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition stats → (id, n_tokens, distinct_ratio,
    top_token_share, dup_token_share, top_bigram_share).

    - distinct_ratio    = |distinct tokens| / n_tokens
    - top_token_share   = count(most frequent token) / n_tokens
    - dup_token_share   = Σ count(token appearing ≥2×) / n_tokens
    - top_bigram_share  = count(most frequent bigram) / (n_tokens - 1),
                          0.0 for single-token docs

    Documents with zero tokens produce no row (nothing to measure)."""
    toks = tokens_col(F.col(text_col))
    uni = (
        docs.select(F.col(id_col).alias("_id"), F.explode(toks).alias("g"))
        .groupBy("_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (F.count("*").cast("double") / F.sum("c")).alias("distinct_ratio"),
            (F.max("c").cast("double") / F.sum("c")).alias("top_token_share"),
            (
                F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).cast("double")
                / F.sum("c")
            ).alias("dup_token_share"),
        )
    )
    bi = (
        docs.select(F.col(id_col).alias("_id"), F.explode(_bigrams_col(toks)).alias("g"))
        .groupBy("_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("_id")
        .agg((F.max("c").cast("double") / (F.sum("c"))).alias("top_bigram_share"))
    )
    return (
        uni.join(bi, on="_id", how="left")
        .withColumn("top_bigram_share", F.coalesce(F.col("top_bigram_share"), F.lit(0.0)))
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "distinct_ratio",
            "top_token_share",
            "dup_token_share",
            "top_bigram_share",
        )
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Adjacent word n-grams of a token array (generalizes
    :func:`_bigrams_col`); empty when the doc has < n tokens."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, pairs).otherwise(
        F.array().cast("array<string>")
    )
