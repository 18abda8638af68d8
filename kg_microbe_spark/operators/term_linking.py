"""Term-list entity linking — the madin-style NER cascade (SURVEY.md §2.9).

Input is a column of multi-valued term cells (comma-delimited, like madin's
``pathways``/``carbon_substrates``); the cascade is:

- N1  distinct-term extraction: split + explode + distinct (annotate each
      unique term once — A8 batching trick, ner_utils.py:118-124);
- N7  curated-map-first routing: broadcast join the curated label→CURIE map;
- N2  whole-term dictionary match: broadcast join the name index on the
      normalized term;
- N3  partial-match fallback: token-containment candidate join + W2 argmax
      char-set-overlap window (ner_utils.py:129-146: keep candidates with
      label length > 2, pick max |set(label) ∩ set(term)|);
- N5  exact-match preference: if any candidate matched exactly, partials
      for that term are discarded;
- mint fallback: unresolved terms get a deterministic ``kgmicrobe:``-style
  CURIE (madin_etal.py:446-466) — and are ALSO routed to the unmatched
  report (invariant B6).

Everything is joins + windows; the only "scoring" is a JVM-side expression
(char-set overlap via array ops), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.functions.normalize import normalize_name_col


def extract_distinct_terms(df: DataFrame, col: str, sep: str = ", ") -> DataFrame:
    """N1: split multi-value cells, strip, dedup → one row per unique term."""
    return (
        df.select(F.explode(F.split(F.col(col), sep)).alias("term"))
        .select(F.trim("term").alias("term"))
        .filter((F.col("term") != "") & (F.col("term") != "NA"))
        .distinct()
        .withColumn("term_norm", normalize_name_col(F.col("term")))
    )


def _char_set(col):
    """set(string) as a sorted distinct array of single chars (JVM-side)."""
    return F.array_distinct(F.split(col, ""))


def link_terms(
    terms: DataFrame,
    name_index: DataFrame,
    curated_map: DataFrame | None = None,
    mint_prefix: str = "kgmicrobe:",
):
    """Returns (resolved, unmatched_report).

    resolved(term, term_norm, curie, label, category, match_type) where
    match_type ∈ {curated, exact, partial, minted}.
    """
    idx = name_index.select("term_norm", "curie", "label", "category")

    # N7 level 1: curated map (term_norm → curie/label/category)
    if curated_map is not None:
        cur = F.broadcast(
            curated_map.select(
                F.col("term_norm").alias("_cm_norm"),
                F.col("curie").alias("_cm_curie"),
                F.col("label").alias("_cm_label"),
                F.col("category").alias("_cm_category"),
            )
        )
        t = terms.join(cur, terms["term_norm"] == cur["_cm_norm"], "left")
    else:
        t = terms.select("*", F.lit(None).cast("string").alias("_cm_curie"),
                         F.lit(None).cast("string").alias("_cm_label"),
                         F.lit(None).cast("string").alias("_cm_category"))

    # N2 level 2: exact whole-term match against the index
    exact = F.broadcast(
        idx.select(
            F.col("term_norm").alias("_ex_norm"),
            F.col("curie").alias("_ex_curie"),
            F.col("label").alias("_ex_label"),
            F.col("category").alias("_ex_category"),
        )
    )
    t = t.join(exact, t["term_norm"] == exact["_ex_norm"], "left")

    # N3 level 3: partial match for still-unresolved terms only.
    unresolved = t.filter(F.col("_cm_curie").isNull() & F.col("_ex_curie").isNull()).select("term", "term_norm")
    tokens = unresolved.select("term", "term_norm", F.explode(F.split("term_norm", " ")).alias("tok")).filter(
        F.length("tok") > 0
    )
    idx_tok = idx.select(
        F.col("curie").alias("_p_curie"),
        F.col("label").alias("_p_label"),
        F.col("category").alias("_p_category"),
        F.col("term_norm").alias("_p_norm"),
        F.explode(F.split("term_norm", " ")).alias("tok"),
    ).filter(F.length("_p_label") > 2)
    cand = tokens.join(F.broadcast(idx_tok), "tok").dropDuplicates(["term_norm", "_p_curie"])
    overlap = F.size(F.array_intersect(_char_set(F.col("term_norm")), _char_set(F.col("_p_norm"))))
    w = Window.partitionBy("term_norm").orderBy(overlap.desc(), F.col("_p_curie").asc())
    partial = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("term_norm").alias("_pa_norm"),
            F.col("_p_curie").alias("_pa_curie"),
            F.col("_p_label").alias("_pa_label"),
            F.col("_p_category").alias("_pa_category"),
        )
    )
    t = t.join(partial, t["term_norm"] == partial["_pa_norm"], "left")

    # 3-level coalesce (N7) + deterministic mint fallback
    minted_curie = F.concat(F.lit(mint_prefix), F.md5(F.col("term_norm")))
    resolved = t.select(
        "term",
        "term_norm",
        F.coalesce("_cm_curie", "_ex_curie", "_pa_curie", minted_curie).alias("curie"),
        F.coalesce("_cm_label", "_ex_label", "_pa_label", F.col("term")).alias("label"),
        F.coalesce("_cm_category", "_ex_category", "_pa_category", F.lit("biolink:NamedThing")).alias("category"),
        F.when(F.col("_cm_curie").isNotNull(), "curated")
        .when(F.col("_ex_curie").isNotNull(), "exact")
        .when(F.col("_pa_curie").isNotNull(), "partial")
        .otherwise("minted")
        .alias("match_type"),
    )
    unmatched_report = resolved.filter(F.col("match_type") == "minted").select("term", "term_norm")
    return resolved, unmatched_report
