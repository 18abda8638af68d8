"""Truth discovery: per-source reliability + reliability-weighted
consensus over conflicting claims.

KG-construction use: the same fact arrives from many sources with
different values (BacDive says an organism is an aerobe, a web page
says anaerobe). operators/fusion.py's noisy-OR assumes every source
asserts the SAME value and fuses confidence; this module handles
DISAGREEMENT — the classic one-round TruthFinder/Investment shape:

  1. majority vote per claim → provisional truth,
  2. source reliability = how often the source agrees with the
     majority (integer pct — exactly reproducible),
  3. re-vote with each source's weight = its reliability.

One round is deliberate: further EM rounds reuse step 2+3 unchanged
(feed the consensus back as the majority), so the operator composes
with itself; the driver-verified unit is one exactly-replayable round.

100-TB shape:

* every aggregation is map-side combinable: (claim, value) counts,
  per-claim argmax via min_by (the A2 skew-absorbing form — a
  celebrity claim asserted by 10⁶ sources collapses to partials),
  per-source agree/total counts, weighted re-vote sums;
* the source-reliability frame is source-dimension-sized —
  broadcast for the re-vote join;
* integer weights everywhere (floor pct), no float accumulation
  order-dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _majority(claims: DataFrame) -> DataFrame:
    """(claim, value) with the plurality value per claim; ties break to
    the smaller value — deterministic."""
    vc = claims.groupBy("claim", "value").agg(F.count(F.lit(1)).alias("c"))
    return vc.groupBy("claim").agg(
        F.min_by(
            "value", F.struct((-F.col("c")).alias("nc"), F.col("value"))
        ).alias("value")
    )


def source_reliability(claims: DataFrame) -> DataFrame:
    """claims(source, claim, value) →
    (source, n_claims, n_agree, reliability_pct) where agreement is
    with the per-claim plurality value. Duplicate (source, claim,
    value) rows collapse first — a source restating itself is not
    extra evidence."""
    c = claims.select("source", "claim", "value").distinct()
    maj = _majority(c).withColumnRenamed("value", "_maj")
    return (
        c.join(maj, on="claim")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_claims"),
            F.sum(
                (F.col("value") == F.col("_maj")).cast("long")
            ).alias("n_agree"),
        )
        .select(
            "source",
            "n_claims",
            "n_agree",
            # floor, not cast: cross-engine (Spark cast truncates,
            # DuckDB rounds); k·d/d divides exactly in IEEE
            F.floor(
                F.lit(100) * F.col("n_agree") / F.col("n_claims")
            ).alias("reliability_pct"),
        )
    )


def weighted_consensus(claims: DataFrame, min_claims: int = 2) -> DataFrame:
    """claims(source, claim, value) → (claim, value, weight): the
    reliability-weighted winning value per claim, weight = sum of the
    supporting sources' reliability_pct. Ties break to the smaller
    value.

    Sources with fewer than ``min_claims`` claims carry weight 0 in the
    re-vote (their claims still surface — a claim asserted ONLY by
    floor-excluded sources wins at weight 0, flagging it for review).
    The floor is the standard truth-discovery denoising rule — a
    singleton source's agreement pct is 0 or 100 by construction, pure
    noise — and doubles as the in-plan bound that makes broadcasting
    the reliability dim defensible (the n_claims ≥ k filter is the
    unigram-vocabulary min_count gate of operators/lm_quality.py
    applied to sources: Zipf leaves far fewer multi-claim sources than
    claims)."""
    c = claims.select("source", "claim", "value").distinct()
    rel = F.broadcast(
        source_reliability(claims)
        .filter(F.col("n_claims") >= min_claims)
        .select("source", "reliability_pct")
    )
    votes = (
        c.join(rel, on="source", how="left")
        .groupBy("claim", "value")
        .agg(
            F.sum(F.coalesce("reliability_pct", F.lit(0))).alias("weight")
        )
    )
    return votes.groupBy("claim").agg(
        F.min_by(
            F.struct("value", "weight"),
            F.struct((-F.col("weight")).alias("nw"), F.col("value")),
        ).alias("_w")
    ).select("claim", F.col("_w.value").alias("value"), F.col("_w.weight").alias("weight"))
