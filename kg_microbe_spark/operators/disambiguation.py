"""Collective entity disambiguation: coherence-reranked candidate links.

``term_linking`` (operators/term_linking.py) scores each mention's
candidates LOCALLY (surface overlap). Web-scale entity linking adds a
document-coherence term: the right reading of one mention usually
co-occurs with the right readings of its neighbors ("jaguar" near
"engine" vs near "jungle"). This operator reranks candidates by adding
the co-occurrence-prior mass between a candidate and the local-best
("anchor") readings of the document's OTHER mentions — one round of
the classic collective-linking iteration, which is the production
sweet spot (further rounds change <1% of links and double the cost).

Inputs:
  candidates(doc, mention, entity, base_score) — per-mention candidate
    entities with local scores (integers: overlap lengths / counts);
  prior(ent_a, ent_b, weight) — undirected co-occurrence prior
    (integer counts; operators/collocations.py emits exactly this).

Semantics (fully deterministic):
  anchor(m)   = argmax base_score per mention, ties -> smaller entity;
  coh(c of m) = sum over OTHER mentions m' in the doc of
                weight(c, anchor(m')) (prior looked up both directions,
                zero when absent);
  final       = base_score + coh;  winner per mention = argmax final,
                ties -> smaller entity.

100-TB shape: anchors are one skew-absorbing ``min_by`` aggregation;
per-doc anchor multisets aggregate combinably to (doc, entity, n)
BEFORE joining back, so the candidate x anchor fan-out is bounded by
(candidates-per-doc x distinct-anchor-entities-per-doc) — both capped
upstream by the mention cap — never by raw mention counts; the prior
lookup is an equi-join against a (entity, entity) keyed table. The
self-pair (a candidate scored against its OWN mention's anchor) is
removed exactly by one additional equi-join, not a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(prior: DataFrame) -> DataFrame:
    """Undirected prior -> both lookup directions, summed (a prior
    listing both (a,b) and (b,a) contributes their sum, same as the
    relational oracle)."""
    both = prior.select(
        F.col("ent_a").alias("ca"), F.col("ent_b").alias("cb"), "weight"
    ).unionByName(
        prior.select(
            F.col("ent_b").alias("ca"), F.col("ent_a").alias("cb"), "weight"
        )
    )
    return both.groupBy("ca", "cb").agg(F.sum("weight").alias("w"))


def disambiguate(
    candidates: DataFrame,
    prior: DataFrame,
    doc_col: str = "doc",
    mention_col: str = "mention",
    entity_col: str = "entity",
    score_col: str = "base_score",
) -> DataFrame:
    """One row per mention: ``(doc, mention, entity, final_score)`` —
    the coherence-reranked winning candidate."""
    d, m, e, s = doc_col, mention_col, entity_col, score_col
    anchors = candidates.groupBy(d, m).agg(
        F.min_by(e, F.struct((-F.col(s)).alias("ns"), F.col(e))).alias(
            "anchor"
        )
    )
    # per-doc anchor multiset, aggregated before any fan-out join
    doc_anchors = anchors.groupBy(d, "anchor").agg(
        F.count(F.lit(1)).alias("n_m")
    )
    sym = _sym(prior)
    # total coherence incl. the candidate's own mention's anchor ...
    total = (
        candidates.join(doc_anchors, on=d)
        .join(
            sym,
            on=(F.col(e) == F.col("ca")) & (F.col("anchor") == F.col("cb")),
            how="inner",
        )
        .groupBy(d, m, e)
        .agg(F.sum(F.col("w") * F.col("n_m")).alias("coh_incl_self"))
    )
    # ... minus exactly the own-anchor term
    own = (
        candidates.join(anchors, on=[d, m])
        .join(
            sym,
            on=(F.col(e) == F.col("ca")) & (F.col("anchor") == F.col("cb")),
            how="inner",
        )
        .select(d, m, e, F.col("w").alias("own_w"))
    )
    scored = (
        candidates.join(total, on=[d, m, e], how="left")
        .join(own, on=[d, m, e], how="left")
        .select(
            d,
            m,
            e,
            (
                F.col(s)
                + F.coalesce("coh_incl_self", F.lit(0))
                - F.coalesce("own_w", F.lit(0))
            ).alias("final_score"),
        )
    )
    return scored.groupBy(d, m).agg(
        F.min_by(
            F.struct(F.col(e), F.col("final_score")),
            F.struct((-F.col("final_score")).alias("nf"), F.col(e)),
        ).alias("win")
    ).select(d, m, F.col("win." + e).alias(e), F.col("win.final_score").alias("final_score"))
