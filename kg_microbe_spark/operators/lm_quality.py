"""Corpus-level unigram language-model quality scoring.

The heuristic quality score (functions/text.py:quality_score_col) is
per-document; production corpus filters (CCNet, Gopher) also rank
documents by how *typical* their text is under a language model of the
corpus itself — gibberish and boilerplate score low, fluent prose
scores high. The cheapest honest version is an add-alpha-smoothed
unigram LM fit on the corpus and applied back to every document; the
DSIR variant (``importance_logratio``) scores the RATIO of a curated
target LM to the corpus LM — the importance weight that data-selection
resampling uses (Xie et al., arXiv:2302.03169, at unigram order).

Spark-first shape at 100 TB:

1. token counts: one map-side-combinable ``groupBy(token)`` — the same
   shuffle profile as word count; hub tokens are absorbed by partial
   aggregation.
2. vocabulary gate: tokens below ``min_count`` collapse into a single
   ``<unk>`` type. This is what BOUNDS the vocabulary broadcast —
   a web corpus has unbounded hapax tail (typos, ids, hashes), and a
   broadcast of raw counts would grow with the data. The gate is the
   plan-visible selective filter the repo's broadcast guards require.
3. (N, V, unk-mass) scalars: one global aggregate (≤1 row) — the
   plan-guard-sanctioned scalar-broadcast pattern.
4. scoring join: token→logp is a BROADCAST left join; misses take the
   ``<unk>`` floor. The per-doc mean is the second and last shuffle,
   combinable.

Everything is JVM built-ins — no UDF anywhere. Scores are rounded to
4 dp with -0.0 folded to +0.0 (cross-engine hash stability).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.text import tokens_col


def unigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram counts: (token, c)."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _round4(col: Column) -> Column:
    # + 0.0 folds IEEE -0.0 to +0.0 (a mean can round to zero from below)
    return F.round(col, 4) + F.lit(0.0)


def unigram_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    min_count: int = 1,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus unigram
    LM with add-``alpha`` smoothing over the ``min_count``-gated
    vocabulary (+1 ``<unk>`` type that absorbs the sub-threshold tail).
    Returns ``(id_col, n_tokens, mean_logprob)``. Pass ``counts`` to
    score against a PREVIOUSLY fitted model (e.g. score a candidate
    crawl under last month's corpus)."""
    if counts is None:
        counts = unigram_counts(docs, text_col)
    a = F.lit(float(alpha))
    mc = F.lit(int(min_count))
    scalars = counts.agg(
        F.sum("c").cast("double").alias("_n"),
        F.sum(F.when(F.col("c") >= mc, 1).otherwise(0))
        .cast("double")
        .alias("_vk"),
        F.sum(F.when(F.col("c") < mc, F.col("c")).otherwise(0))
        .cast("double")
        .alias("_cunk"),
    )
    denom = F.col("_n") + a * (F.col("_vk") + F.lit(1.0))  # V = kept + <unk>
    probs = (
        counts.filter(F.col("c") >= mc)  # the broadcast-bounding gate
        .crossJoin(F.broadcast(scalars))
        .select("token", F.log((F.col("c") + a) / denom).alias("_logp"))
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(probs), "token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.coalesce(
                "_logp", F.log((F.col("_cunk") + a) / denom)
            ).alias("_logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        _round4(F.avg("_logp")).alias("mean_logprob"),
    )


def importance_logratio(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """DSIR-style data selection score: per-document mean token
    log-ratio ln(P_target(t) / P_corpus(t)) between add-``alpha``
    unigram LMs of a (small, curated) target corpus and of the raw
    corpus. Documents that look like the target score high — rank by
    this and hash-sample the top band to build a targeted mix.

    The shared vocabulary is corpus tokens with count >= ``min_count``
    PLUS every target token (the target is curated and dimension-sized
    by contract, so keeping all of it stays broadcastable); everything
    else scores as the shared ``<unk>`` type under both LMs. Returns
    ``(id_col, n_tokens, mean_logratio)``."""
    cc = unigram_counts(docs, text_col).withColumnRenamed("c", "cc")
    tc = unigram_counts(target, text_col).withColumnRenamed("c", "tc")
    joined = cc.join(tc, "token", "full_outer")
    a = F.lit(float(alpha))
    mc = F.lit(int(min_count))
    kept = (F.coalesce("cc", F.lit(0)) >= mc) | F.col("tc").isNotNull()
    scalars = joined.agg(
        F.sum(F.coalesce("cc", F.lit(0))).cast("double").alias("_nc"),
        F.sum(F.coalesce("tc", F.lit(0))).cast("double").alias("_nt"),
        F.sum(kept.cast("int")).cast("double").alias("_vk"),
        F.sum(F.when(kept, 0).otherwise(F.coalesce("cc", F.lit(0))))
        .cast("double")
        .alias("_ccunk"),
    )
    v = F.col("_vk") + F.lit(1.0)  # + <unk>
    t_logp = F.log(
        (F.coalesce("tc", F.lit(0)) + a) / (F.col("_nt") + a * v)
    )
    c_logp = F.log(
        (F.coalesce("cc", F.lit(0)) + a) / (F.col("_nc") + a * v)
    )
    probs = (
        joined.filter(kept)
        .crossJoin(F.broadcast(scalars))
        .select("token", (t_logp - c_logp).alias("_lr"))
    )
    # sub-threshold corpus tokens: never seen in target (else kept), so
    # the <unk> ratio is the 0-count target floor over the unk corpus mass
    unk_lr = F.log(a / (F.col("_nt") + a * v)) - F.log(
        (F.col("_ccunk") + a) / (F.col("_nc") + a * v)
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(probs), "token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(F.col(id_col), F.coalesce("_lr", unk_lr).alias("_lr"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        _round4(F.avg("_lr")).alias("mean_logratio"),
    )


def ccnet_buckets(
    scores: DataFrame,
    id_col: str,
    score_col: str,
    shares: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("tail", "middle", "head"),
) -> DataFrame:
    """CCNet-style quality banding: split documents into tail / middle /
    head by LM score quantile thresholds, WITHOUT a global per-row
    window (the 10^12-row rank trap). Scores arrive 4-dp-rounded from
    ``unigram_logprob``, so distinct score values form a bounded bin
    table: one combinable groupBy(score) count, a cumulative-share
    window over the BINS (A6 histogram-cutoff discipline — thousands of
    rows, not the corpus), and a broadcast threshold join back. Ties
    share a bin, so banding is deterministic on every engine. Returns
    ``(id_col, score_col, band)``."""
    if len(labels) != len(shares) + 1:
        raise ValueError("need exactly one more label than shares")
    bins = scores.groupBy(score_col).agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = bins.select(
        F.col(score_col),
        (
            F.sum("_c").over(w).cast("double")
            / F.sum("_c").over(
                Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("_share"),
    )
    # per share s: the smallest score whose cumulative share reaches s
    thr = cdf.agg(
        *[
            F.min(F.when(F.col("_share") >= F.lit(s), F.col(score_col))).alias(
                f"_t{i}"
            )
            for i, s in enumerate(shares)
        ]
    )
    out = scores.crossJoin(F.broadcast(thr))
    band = F.lit(labels[-1])
    for i in range(len(shares) - 1, -1, -1):
        band = F.when(F.col(score_col) <= F.col(f"_t{i}"), F.lit(labels[i])).otherwise(
            band
        )
    return out.select(F.col(id_col), F.col(score_col), band.alias("band"))


def bigram_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Per-document mean transition log-probability under the corpus
    BIGRAM LM with add-``alpha`` smoothing — the order-2 step from
    :func:`unigram_logprob` toward the CCNet/KenLM quality signal
    (word-salad text has plausible unigrams but implausible
    transitions; this is the signal that separates them).

    Model: tokens below the ``min_count`` unigram gate map to the
    shared ``<unk>`` type (vocabulary V = kept + 1, the same gate that
    bounds every broadcast here);
    P(w|v) = (c(v,w) + α) / (c(v) + α·V) over the MAPPED types.
    Each document scores the mean over its token transitions; docs
    with < 2 tokens have no transitions and are excluded (an honest
    absence, not a fabricated score).

    Spark shape: the unigram gate is one combinable count whose KEPT
    side broadcasts (min_count bounds it); bigram counts are one
    combinable groupBy over mapped-token pairs; scoring joins each
    document transition against the bigram-count frame by (v, w) —
    an honest fact-sized equi-join, NOT a broadcast (the bigram vocab
    grows with the corpus) — and against the broadcast context counts
    for the unseen-bigram fallback. Returns (``id_col``,
    n_transitions, mean_logprob) rounded to 4 dp.
    """
    from kg_microbe_spark.functions.text import tokens_col

    a = F.lit(float(alpha))
    uni = unigram_counts(docs, text_col)
    kept = uni.filter(F.col("c") >= int(min_count)).select("token")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("_pos", "token"),
    )
    mapped = toks.join(F.broadcast(kept), "token", "left_semi").select(
        id_col, "_pos", "token"
    ).unionByName(
        toks.join(F.broadcast(kept), "token", "left_anti").select(
            id_col, "_pos", F.lit("<unk>").alias("token")
        )
    )
    v_size = kept.agg((F.count(F.lit(1)) + 1).cast("double").alias("_v"))
    nxt = mapped.select(
        F.col(id_col),
        (F.col("_pos") - 1).alias("_pos"),
        F.col("token").alias("_w"),
    )
    trans = mapped.join(nxt, [id_col, "_pos"]).select(
        id_col, F.col("token").alias("_vtok"), "_w"
    )
    big = trans.groupBy("_vtok", "_w").agg(F.count(F.lit(1)).alias("_c2"))
    ctx = trans.groupBy("_vtok").agg(F.count(F.lit(1)).alias("_c1"))
    scored = (
        trans.join(big, ["_vtok", "_w"], "left")
        .join(F.broadcast(ctx), "_vtok")
        .crossJoin(F.broadcast(v_size))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("_c2"), F.lit(0)) + a)
                / (F.col("_c1") + a * F.col("_v"))
            ).alias("_logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        _round4(F.avg("_logp")).alias("mean_logprob"),
    )


def kneser_ney_bigram(
    docs: DataFrame,
    text_col: str,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities for every OBSERVED
    bigram — the smoothing the CCNet/KenLM quality models actually use
    (add-α in :func:`bigram_logprob` is the teaching baseline; KN's
    continuation counts fix the 'Francisco problem' where a token
    frequent in one context leaks probability everywhere).

      p_KN(w|v) = max(c(vw)−D, 0)/c(v·)
                  + D·N1+(v·)/c(v·) · N1+(·w)/N1+(··)

    Scale shape: ONE corpus pass builds the bigram count frame; c(v·),
    N1+(v·) and N1+(·w) are combinable re-aggregations of that frame
    keyed by one token each; N1+(··) rides a broadcast. All counts are
    exact BIGINTs; D = 0.75 is exactly representable in binary, so the
    probability expression is a fixed IEEE dataflow identical on every
    engine. Returns (w1, w2, n, p_kn) rounded to 6 dp; Σ_w p_KN(w|v)
    over the full vocab is 1 by construction (observed rows shown).
    """
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0,1), got {discount}")
    from kg_microbe_spark.functions.text import tokens_col
    from kg_microbe_spark.operators.repetition import _bigrams_col

    d = F.lit(float(discount))
    big = (
        docs.select(F.explode(_bigrams_col(tokens_col(F.col(text_col)))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n",
        )
    )
    ctx = big.groupBy("w1").agg(
        F.sum("n").cast("long").alias("_cv"),
        F.count(F.lit(1)).cast("long").alias("_n1v"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("_n1w"))
    types = F.broadcast(big.agg(F.count(F.lit(1)).cast("long").alias("_bt")))
    j = big.join(ctx, "w1").join(cont, "w2").crossJoin(types)
    p = (
        F.greatest(F.col("n") - d, F.lit(0.0)) / F.col("_cv")
        + (d * F.col("_n1v") / F.col("_cv")) * (F.col("_n1w") / F.col("_bt"))
    )
    return j.select("w1", "w2", "n", F.round(p, 6).alias("p_kn"))
