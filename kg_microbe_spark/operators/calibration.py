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
