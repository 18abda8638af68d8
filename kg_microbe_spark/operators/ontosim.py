"""Ontology semantic similarity — Resnik MICA over the ancestor closure.

The reference is ontology-centric end to end (NCBITaxon/ChEBI/ENVO
term tables, subclass hierarchies merged into the KG; reference:
kg_microbe transform_utils/ontologies — subclass edges are the
backbone every rollup/subclass query walks). The standard "how related
are these two terms" measure over such a hierarchy is Resnik (1995)
similarity: the information content of the Most Informative Common
Ancestor, IC(x) = ln(N / |descendants(x)|) — rare shared ancestors mean
high similarity, the root means none.

Spark shape (100-TB honest):
- the REFLEXIVE ancestor closure arrives as a DataFrame (build it with
  ``closure.transitive_closure`` — the depth-doubling fixpoint — plus
  the identity rows); this operator never re-walks the hierarchy;
- descendant counts are ONE map-combinable groupBy(ancestor) — the
  root's N-sized fan-in collapses in map-side partials;
- N is a keyless 1-row count joined by broadcast;
- common ancestors of a pair come from two equi-joins (term_a, then
  (term_b, ancestor)) — per-pair work ∝ depth², never corpus-sized;
- the MICA argmax is the skew-absorbing min_by-struct aggregation
  (A2 form), ties to the smaller ancestor id.

IC is integerized as floor(1e6·ln(N/desc)) so comparisons and the
reported score are engine-stable (the ln itself is one double op on
two exact integers — bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resnik_similarity(pairs: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Resnik similarity for each (term_a, term_b) pair.

    ``pairs``: (term_a, term_b); ``ancestors``: REFLEXIVE (term,
    ancestor) closure of the subclass hierarchy. Returns (term_a,
    term_b, mica, ic_x1e6, resnik) — one row per input pair that HAS a
    common ancestor (under a reflexive closure with a single root that
    is every pair; under a forest, cross-tree pairs drop out, which is
    the honest answer). ``mica`` ties break to the smaller ancestor id.
    """
    n = ancestors.agg(F.count_distinct("term").alias("_n"))
    ic = (
        ancestors.groupBy("ancestor")
        .agg(F.count_distinct("term").alias("_desc"))
        .join(F.broadcast(n))
        .select(
            "ancestor",
            F.floor(
                F.lit(1000000.0) * F.log(F.col("_n") / F.col("_desc"))
            )
            .cast("long")
            .alias("ic_x1e6"),
        )
    )
    a = ancestors.select(F.col("term").alias("term_a"), "ancestor")
    b = ancestors.select(F.col("term").alias("term_b"), "ancestor")
    common = (
        pairs.select("term_a", "term_b")
        .join(a, "term_a")
        .join(b, ["term_b", "ancestor"])
        .join(ic, "ancestor")
    )
    best = common.groupBy("term_a", "term_b").agg(
        F.min(
            F.struct(
                (-F.col("ic_x1e6")).alias("_nic"), F.col("ancestor").alias("_anc")
            )
        ).alias("_best")
    )
    return best.select(
        "term_a",
        "term_b",
        F.col("_best._anc").alias("mica"),
        (-F.col("_best._nic")).alias("ic_x1e6"),
        F.round(-F.col("_best._nic") / 1e6, 6).alias("resnik"),
    )
