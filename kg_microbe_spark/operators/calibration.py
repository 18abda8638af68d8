"""Confidence calibration — deterministic fixed-width histogram cutoffs.

Exact re-expression of the reference's A6/P7 semantics
(transform_utils/prego/calibration.py) as DataFrame ops:

- star = 4·F_r(score) within each *resource* of the continuous channel,
  where F_r is the empirical CDF; flat channels carry constant tiers
  (genomes 4.0, literature 3.0); unrecognized channels FAIL OPEN (kept,
  invariant B7).
- Cutoffs come from fixed-width binned histograms (width 1e-4, cap 4.01):
  groupBy(resource, bin) count + a cumulative-sum window — **exact, O(bins)
  memory, order-independent**. ``percentile_approx`` is deliberately NOT
  used: the reference rejects streaming sketches because they are order-
  and implementation-dependent (calibration.py:30-36), and determinism of
  which edges ship is a correctness property here.
- Ties are never split: both the cutoff and the row filter compare **bin
  indices**, not raw scores (the reference's cutoff_bin fix — mixing bin
  edges with raw floats diverges on ~11.5% of 4-dp values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.operators.triples import (
    CHANNEL_ENVIRONMENTAL,
    CHANNEL_GENOMES,
    CHANNEL_LITERATURE,
)

SCORE_MAX = 4.01
BIN_WIDTH = 1e-4
BIN_COUNT = int(round(SCORE_MAX / BIN_WIDTH))
STAR_MAX = 4.0
FLAT_STARS = {CHANNEL_GENOMES: 4.0, CHANNEL_LITERATURE: 3.0}


def bin_index_col(score):
    """Clamped bin index; non-finite / non-positive → bin 0 (F7 guard)."""
    c = score.cast("double")
    safe = F.when(c.isNull() | F.isnan(c) | (c <= 0.0), F.lit(0.0)).otherwise(c)
    return F.least(F.floor(safe / F.lit(BIN_WIDTH)).cast("long"), F.lit(BIN_COUNT - 1))


def build_cutoffs(edges: DataFrame, tau: float, resource_col: str = "primary_knowledge_source") -> DataFrame:
    """Per-resource cutoff bins for the continuous channel.

    Returns (resource, n, cutoff_bin, cutoff_score, kept_fraction) — the
    calibration table, reporting the *realized* kept fraction (ties move as
    a block, so it can differ from 1−tau/4).
    """
    cont = edges.filter(F.col("channel") == CHANNEL_ENVIRONMENTAL)
    hist = (
        cont.withColumn("bin", bin_index_col(F.col("score")))
        .groupBy(F.col(resource_col).alias("resource"), "bin")
        .agg(F.count("*").alias("cnt"))
    )
    w_cdf = (
        Window.partitionBy("resource").orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("resource")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w_cdf))
        .withColumn("n", F.sum("cnt").over(w_tot))
        .withColumn("target", F.lit(tau / STAR_MAX) * F.col("n"))
    )
    if tau <= 0.0:
        return (
            cum.groupBy("resource")
            .agg(F.max("n").alias("n"))
            .withColumn("cutoff_bin", F.lit(0).cast("long"))
            .withColumn("cutoff_score", F.lit(0.0))
            .withColumn("kept_fraction", F.lit(1.0))
        )
    # smallest bin with cum >= target; if none (can't happen: last cum == n
    # >= target for tau<=4), fall back to BIN_COUNT.
    cut = (
        cum.filter(F.col("cum") >= F.col("target"))
        .groupBy("resource")
        .agg(F.min("bin").alias("cutoff_bin"), F.max("n").alias("n"))
    )
    kept = (
        hist.join(cut, "resource")
        .filter(F.col("bin") >= F.col("cutoff_bin"))
        .groupBy("resource")
        .agg(F.sum("cnt").alias("kept_cnt"))
    )
    return (
        cut.join(kept, "resource", "left")
        .withColumn("cutoff_score", F.col("cutoff_bin") * F.lit(BIN_WIDTH))
        .withColumn("kept_fraction", F.coalesce(F.col("kept_cnt") / F.col("n"), F.lit(0.0)))
        .select("resource", "n", "cutoff_bin", "cutoff_score", "kept_fraction")
    )


def apply_threshold(edges: DataFrame, cutoffs: DataFrame, tau: float, resource_col: str = "primary_knowledge_source") -> DataFrame:
    """P7 keep_row: continuous channel compares bin indices against the
    per-resource cutoff; flat channels compare their tier against tau;
    unrecognized channels are kept (fail open, with star null)."""
    if tau <= 0.0:
        return edges.withColumn(
            "star",
            F.when(F.col("channel") == CHANNEL_GENOMES, F.lit(FLAT_STARS[CHANNEL_GENOMES]))
            .when(F.col("channel") == CHANNEL_LITERATURE, F.lit(FLAT_STARS[CHANNEL_LITERATURE]))
            .otherwise(F.lit(None).cast("double")),
        )
    cut = F.broadcast(cutoffs.select(F.col("resource"), F.col("cutoff_bin")))
    e = edges.join(cut, edges[resource_col] == cut["resource"], "left").drop("resource")
    is_cont = F.col("channel") == CHANNEL_ENVIRONMENTAL
    is_genomes = F.col("channel") == CHANNEL_GENOMES
    is_lit = F.col("channel") == CHANNEL_LITERATURE
    keep = (
        F.when(is_cont, bin_index_col(F.col("score")) >= F.coalesce(F.col("cutoff_bin"), F.lit(0)))
        .when(is_genomes, F.lit(FLAT_STARS[CHANNEL_GENOMES] >= tau))
        .when(is_lit, F.lit(FLAT_STARS[CHANNEL_LITERATURE] >= tau))
        .otherwise(F.lit(True))  # fail open (B7)
    )
    star = (
        F.when(is_genomes, F.lit(FLAT_STARS[CHANNEL_GENOMES]))
        .when(is_lit, F.lit(FLAT_STARS[CHANNEL_LITERATURE]))
        .otherwise(F.lit(None).cast("double"))
    )
    return e.filter(keep).withColumn("star", star).drop("cutoff_bin")


def isotonic_calibration(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    num_bins: int = 32,
    score_min: float = 0.0,
    score_max: float = 4.01,
) -> DataFrame:
    """Isotonic regression (pool-adjacent-violators) of a binary label
    against a link-confidence score, over fixed-width bins.

    The reference's calibration maps scores to stars through a
    per-resource empirical CDF (transform_utils/prego/calibration.py);
    when labeled links exist (curation verdicts, held-out gold edges)
    the natural refinement is an isotonic fit: the maximum-likelihood
    monotone mapping score → P(correct). Same determinism posture as
    ``build_cutoffs``: fixed-width bins, no percentile sketches.

    Spark shape: the only corpus-sized work is one groupBy(bin) with
    count/sum — map-combinable. PAV itself runs on the bin frame, whose
    size is ``num_bins`` REGARDLESS of corpus size, via the minimax
    identity (Robertson-Wright-Dykstra 1988, eq. 1.9-1.13)

        iso(i) = max_{j<=i} min_{k>=i} mean(label | bin in [j..k])

    rendered as one (i, j, k) bounded self-join (≤ num_bins³ tuples —
    constant work at any corpus scale) over window prefix sums; no
    driver-side loop, no UDF. Output is one row per OBSERVED bin:
    (bin, bin_lo, n, pos, rate, calibrated), calibrated monotone
    non-decreasing in bin, rounded to 6 dp for cross-engine hashing.
    """
    width = (score_max - score_min) / num_bins
    c = F.col(score_col).cast("double")
    safe = F.when(
        c.isNull() | F.isnan(c) | (c < score_min), F.lit(score_min)
    ).otherwise(c)
    b = F.least(
        F.floor((safe - F.lit(score_min)) / F.lit(width)).cast("long"),
        F.lit(num_bins - 1),
    )
    bins = (
        scored.select(
            b.alias("bin"), F.col(label_col).cast("long").alias("_y")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w_cum).alias("_cw"),
        F.sum("pos").over(w_cum).alias("_cy"),
    )
    lo = pref.select(
        F.col("bin").alias("_j"),
        (F.col("_cw") - F.col("n")).alias("_w_before"),
        (F.col("_cy") - F.col("pos")).alias("_y_before"),
    )
    hi = pref.select(
        F.col("bin").alias("_k"),
        F.col("_cw").alias("_w_upto"),
        F.col("_cy").alias("_y_upto"),
    )
    # all (j <= k) segment means from prefix sums — bounded bins² frame.
    # The non-equi joins below carry explicit broadcast hints: both sides
    # are keyed aggregates whose key domain is CLAMPED to num_bins rows,
    # so the broadcast is constant-sized at any corpus scale (the plan
    # guard's keyless-agg rule generalized; entries feed a filtered scan).
    seg = lo.join(F.broadcast(hi), F.col("_j") <= F.col("_k")).select(
        "_j",
        "_k",
        (
            (F.col("_y_upto") - F.col("_y_before"))
            / (F.col("_w_upto") - F.col("_w_before"))
        ).alias("_avg"),
    )
    iso = (
        pref.select(F.col("bin").alias("_i"))
        .join(
            F.broadcast(seg),
            (F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_avg").alias("_inner"))
        .groupBy("_i")
        .agg(F.round(F.max("_inner"), 6).alias("calibrated"))
    )
    return (
        bins.join(iso, bins["bin"] == iso["_i"])
        .select(
            "bin",
            F.round(F.lit(score_min) + F.col("bin") * F.lit(width), 6).alias(
                "bin_lo"
            ),
            "n",
            "pos",
            F.round(F.col("pos") / F.col("n"), 6).alias("rate"),
            "calibrated",
        )
    )


def percentile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Within-group percentile normalization: append each row's
    percent_rank of ``value_col`` inside its ``group_col`` — the
    cross-source score equalizer (extractor A's confidences cluster at
    0.9, B's at 0.5; their PERCENTILES are comparable, so downstream
    thresholds and fusions operate on pct, not raw score).

    Semantics: percent_rank = (rank − 1)/(n − 1) with ties sharing a
    rank — tied values get IDENTICAL pct regardless of physical order,
    so the output is deterministic without a tiebreaker; single-row
    groups report 0.0 (both engines define 0/0 as 0 here). 6 dp.

    Scale shape: ONE window partitioned by the group — the natural
    shuffle key. Skewed groups pay their own sort; at 100 TB a
    hot-group variant goes through the histogram-CDF path
    (histogram_cutoff) instead of an exact rank.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(F.col(group_col)).orderBy(F.col(value_col).asc())
    return df.select(
        "*", F.round(F.percent_rank().over(w), 6).alias("pct")
    )
