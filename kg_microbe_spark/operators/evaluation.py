"""Triple-set evaluation — the north rule's P/R metric as an operator.

The acceptance criterion for the whole pipeline is triple-set precision/
recall ≥ 0.95 against the reference's emitted (subject, predicate,
object) triples (reference: kg_microbe's merged-KG edges, e.g.
merge_utils/duplicate_edges_removal.py treats the SPO identity as the
dedup key). Rather than leaving that comparison to an ad-hoc test
script, it ships as a first-class operator so any run can score itself
against a gold table inside the same job — at 100 TB you cannot collect
either side to a driver and diff them in Python.

Shape: both sides are reduced to DISTINCT SPO keys (set semantics — the
metric is over the triple *set*, so multiplicity must not double-count),
then one inner join computes the intersection size. The join is a
shuffle on the SPO key; both inputs were just shuffled by the same key
for the distinct, so AQE reuses the exchange. Counts come back as one
row; no fact-sized data ever crosses to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPO = ("subject", "predicate", "object")


def triple_prf(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """One-row (n_pred, n_gold, n_hit, precision, recall, f1) comparing
    the DISTINCT (subject, predicate, object) sets of the two frames.

    Ratios are exact decimals of bigint counts rounded to 6 dp so the
    value-hash is stable across engines; empty sides yield 0.0 (not
    null/NaN) so the row is always well-formed.
    """
    p = predicted.select(*SPO).distinct()
    g = gold.select(*SPO).distinct()
    hit = p.join(g, list(SPO), "inner")
    # keyless 1-row aggregates; broadcast hints keep the combination a
    # BroadcastNestedLoopJoin of single rows, never a CartesianProduct
    counts = (
        p.agg(F.count("*").alias("n_pred"))
        .crossJoin(F.broadcast(g.agg(F.count("*").alias("n_gold"))))
        .crossJoin(F.broadcast(hit.agg(F.count("*").alias("n_hit"))))
    )

    def _ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    return counts.select(
        "n_pred",
        "n_gold",
        "n_hit",
        _ratio(F.col("n_hit"), F.col("n_pred")).alias("precision"),
        _ratio(F.col("n_hit"), F.col("n_gold")).alias("recall"),
        F.when(
            (F.col("n_pred") > 0) & (F.col("n_gold") > 0) & (F.col("n_hit") > 0),
            F.round(
                2.0 * F.col("n_hit") / (F.col("n_pred") + F.col("n_gold")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def ranking_metrics(
    candidates: DataFrame, gold: DataFrame, ks: tuple[int, ...] = (1, 3, 10)
) -> DataFrame:
    """Link-prediction ranking metrics — MRR and hits@k of the gold
    answer among each query's scored candidates (the standard KGE /
    entity-linking evaluation protocol, the ranking complement to
    :func:`triple_prf`'s set metric).

    ``candidates``: (query_id, candidate_id, score); ``gold``:
    (query_id, gold_id). The rank is over the DETERMINISTIC total
    order (score desc, candidate_id asc) — tie scores cannot flip the
    metric between engines or partitionings. Queries whose gold never
    appears among the candidates count in ``n_queries`` but not in
    ``n_ranked``; ratios are over ``n_ranked`` (the fail-open posture:
    a missing gold is a coverage problem surfaced by the count gap,
    not a silently-zero reciprocal rank).

    Spark shape: one keyed window per query partition (row_number —
    per-query candidate lists are bounded by construction), one filter
    to the gold row, keyless 1-row aggregates combined by broadcast
    NLJ. Reciprocal ranks are integerized as floor(1e9/rank) BIGINTs
    so the MRR sum is addition-order-independent.
    """
    from pyspark.sql import Window as W

    ranked = candidates.withColumn(
        "_rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("candidate_id")
            )
        ),
    )
    gold_ranks = ranked.join(
        gold,
        (ranked["query_id"] == gold["query_id"])
        & (ranked["candidate_id"] == gold["gold_id"]),
    ).select(ranked["query_id"], F.col("_rank"))
    agg_exprs = [
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum(F.floor(F.lit(1000000000.0) / F.col("_rank")).cast("long")).alias(
            "_rr_sum"
        ),
    ] + [
        F.sum(F.when(F.col("_rank") <= k, 1).otherwise(0)).alias(f"_h{k}")
        for k in ks
    ]
    counts = gold.agg(F.count(F.lit(1)).alias("n_queries")).crossJoin(
        F.broadcast(gold_ranks.agg(*agg_exprs))
    )
    hit_cols = [
        F.round(F.col(f"_h{k}") / F.col("n_ranked"), 6).alias(f"hits_{k}")
        for k in ks
    ]
    return counts.select(
        "n_queries",
        "n_ranked",
        F.round(F.col("_rr_sum") / F.col("n_ranked") / 1e9, 6).alias("mrr"),
        *hit_cols,
    )


def bcubed_scores(
    predicted: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    class_col: str = "class_",
) -> DataFrame:
    """B³ precision/recall/F1 of a predicted clustering against gold
    classes (Bagga & Baldwin 1998) — the standard entity-resolution /
    coreference quality metric (pairwise F1 over-rewards big clusters;
    B³ scores each ITEM's neighborhood).

    The per-item sums collapse algebraically onto aggregated frames:
    B³P = (1/N)·Σ_{k,c} n_kc²/|C_k| and B³R with |L_c| — so the whole
    metric is three map-combinable counts (cluster sizes, class sizes,
    (cluster, class) overlaps) and NEVER a per-item join-back. Each
    rational term is integerized as floor(1e9·n²/size) BIGINT before
    summing (a float sum over the overlap table is addition-order-
    dependent; the ≤1e-9-per-term floor bias is documented), division
    happens once per metric. Items present in only one frame drop
    (inner join on ``id_col``) — score over the evaluable universe.
    Returns 1 row (n_items, precision, recall, f1), 6 dp.
    """
    j = predicted.select(id_col, cluster_col).join(
        gold.select(id_col, class_col), id_col
    )
    ov = j.groupBy(cluster_col, class_col).agg(F.count(F.lit(1)).alias("n"))
    csz = j.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("c_sz"))
    lsz = j.groupBy(class_col).agg(F.count(F.lit(1)).alias("l_sz"))
    terms = ov.join(csz, cluster_col).join(lsz, class_col).select(
        F.col("n"),
        F.floor(F.lit(1e9) * F.col("n") * F.col("n") / F.col("c_sz"))
        .cast("long")
        .alias("_p"),
        F.floor(F.lit(1e9) * F.col("n") * F.col("n") / F.col("l_sz"))
        .cast("long")
        .alias("_r"),
    )
    agg = terms.agg(
        F.sum("n").alias("n_items"),
        F.sum("_p").alias("_ps"),
        F.sum("_r").alias("_rs"),
    )
    p = F.col("_ps") / (F.lit(1e9) * F.col("n_items"))
    r = F.col("_rs") / (F.lit(1e9) * F.col("n_items"))
    return agg.select(
        "n_items",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round((2 * p * r) / (p + r), 6).alias("f1"),
    )


def cohens_kappa(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's κ between two annotators / classifier runs over the
    same items — the chance-corrected agreement gate a KG curation
    loop runs before trusting a label source (Cohen 1960).

    EXACT integer arithmetic end-to-end: with n items, agree matches,
    and per-label marginals na_l/nb_l,
    κ = (agree·n − Σ na_l·nb_l) / (n² − Σ na_l·nb_l) — both sides
    BIGINT, one division at the end. Three combinable aggregations
    (agreement count, two marginal counts) + a label-keyed marginal
    join bounded by the label vocabulary; items present in only one
    frame drop (inner join). Returns 1 row
    (n_items, observed_agreement, expected_agreement, kappa), 6 dp.
    """
    pa = a.select(F.col(id_col).alias("_id"), F.col(label_col).alias("_la"))
    pb = b.select(F.col(id_col).alias("_id"), F.col(label_col).alias("_lb"))
    j = pa.join(pb, "_id")
    base = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_la") == F.col("_lb")).cast("long")).alias("agree"),
    )
    ma = j.groupBy(F.col("_la").alias("_l")).agg(F.count(F.lit(1)).alias("na"))
    mb = j.groupBy(F.col("_lb").alias("_l")).agg(F.count(F.lit(1)).alias("nb"))
    pe_sum = (
        ma.join(mb, "_l")
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("pe_s"))
    )
    out = base.join(F.broadcast(pe_sum))
    n = F.col("n")
    return out.select(
        n.alias("n_items"),
        F.round(F.col("agree") / n, 6).alias("observed_agreement"),
        F.round(F.col("pe_s") / (n * n), 6).alias("expected_agreement"),
        F.round(
            (F.col("agree") * n - F.col("pe_s"))
            / (n * n - F.col("pe_s")),
            6,
        ).alias("kappa"),
    )


def cluster_purity(
    predicted: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    class_col: str = "class_",
) -> DataFrame:
    """Purity and inverse purity of a clustering vs gold classes —
    the blunt companion to :func:`bcubed_scores` (purity alone
    over-rewards shattering; reporting both with B³ is the standard
    ER evaluation triple).

    purity = Σ_k max_c n_kc / N (each cluster votes its majority
    class), inverse = Σ_c max_k n_kc / N. Both are exact BIGINT sums
    of per-group maxima — one combinable overlap count + two
    combinable max-aggregations, never a per-item pass. Returns 1 row
    (n_items, purity, inverse_purity, f1), 6 dp; items in one frame
    only drop.
    """
    j = predicted.select(id_col, cluster_col).join(
        gold.select(id_col, class_col), id_col
    )
    ov = j.groupBy(cluster_col, class_col).agg(F.count(F.lit(1)).alias("n"))
    pur = ov.groupBy(cluster_col).agg(F.max("n").alias("m")).agg(
        F.sum("m").alias("p_s")
    )
    inv = ov.groupBy(class_col).agg(F.max("n").alias("m")).agg(
        F.sum("m").alias("i_s")
    )
    tot = ov.agg(F.sum("n").alias("n_items"))
    out = tot.join(F.broadcast(pur)).join(F.broadcast(inv))
    n = F.col("n_items")
    p = F.col("p_s") / n
    r = F.col("i_s") / n
    return out.select(
        "n_items",
        F.round(p, 6).alias("purity"),
        F.round(r, 6).alias("inverse_purity"),
        F.round((2 * p * r) / (p + r), 6).alias("f1"),
    )


def roc_auc(
    scored: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact ROC AUC as a one-row frame via the score-histogram
    (Mann-Whitney rank-sum) form — the scale-safe way to compute AUC
    distributed (reference analog: the confidence-threshold evaluation
    in kg_microbe's calibration flow scores binary edge acceptance;
    this generalizes it to a threshold-free metric).

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Instead of
    globally ranking every row (a total sort), rows first collapse to
    one row PER DISTINCT SCORE carrying (pos, neg) counts — a
    map-side-combinable groupBy. The ordered cumulative pass then runs
    over that bounded histogram, exactly like calibration.py's W5
    cumulative-CDF pattern: at 100 TB the fact table never sorts; only
    the distinct-score frame (≤ cardinality of the score domain — bin
    or quantize continuous scores first, as calibration.py does) flows
    through the single-partition window.

    The numerator is kept as an exact BIGINT doubled count
    (2·concordant + tied) so the sum is addition-order-exact; the only
    float op is the final division, which IEEE-rounds identically on
    every engine. Returns (n_pos, n_neg, auc_numer_x2, auc).
    """
    from pyspark.sql import Window as W

    lbl = F.col(label_col).cast("int")
    hist = (
        scored.select(F.col(score_col).alias("s"), lbl.alias("y"))
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(1 - F.col("y")).cast("long").alias("neg"),
        )
    )
    # cumulative negatives STRICTLY below this score (histogram rows only)
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0).cast("long"))
    )
    agg = cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
        ).cast("long").alias("auc_numer_x2"),
    )
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        "auc_numer_x2",
        F.when(den > 0, F.round(F.col("auc_numer_x2") / den, 6))
        .otherwise(F.lit(0.0))
        .alias("auc"),
    )
