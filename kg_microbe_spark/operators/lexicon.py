"""Stage 2 — LEXICON: build the normalized name index from ontology tables.

Implements, JVM-side (no UDFs):
- P5  deprecated-term filter (deprecated terms never produce triples;
      ontologies_transform.py:373-438 analogue)
- P10 stopword exclusion (stopwords.yaml / transform.py:106-113)
- W4  rank rule: canonical label (rank 0) beats synonym (rank 1) beats
      fuzzy stereo/hydrate-stripped variant (rank 2 — the
      ``fuzzy_stereochemistry`` / hydrate-free index of
      chemical_mapping_utils.py); deterministic tiebreak on curie because
      "first-seen" has no distributed meaning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.functions.normalize import normalize_name_col, normalize_name_py

RANK_LABEL = 0
RANK_SYNONYM = 1
RANK_FUZZY = 2

_FUZZY_CATEGORIES = ("biolink:ChemicalEntity",)


def build_candidate_index(
    lexicon: DataFrame, stopwords: Sequence[str]
) -> DataFrame:
    """ALL candidate links per surface form:
    (term_norm, curie, label, category, rank) with the best rank kept
    per (term_norm, curie). ``build_name_index`` collapses this to one
    winner per term (W4); the collective-linking path
    (plans/pipeline.py collective_linking=True) keeps every candidate
    so document coherence — not just the static rank — picks the
    reading. Small dimension: callers broadcast it."""
    active = lexicon.filter(~F.col("deprecated"))

    labels = active.select(
        normalize_name_col(F.col("label")).alias("term_norm"),
        "curie",
        "label",
        "category",
        F.lit(RANK_LABEL).alias("rank"),
    )
    synonyms = (
        active.select("curie", "label", "category", F.explode_outer("synonyms").alias("syn"))
        .filter(F.col("syn").isNotNull())
        .select(
            normalize_name_col(F.col("syn")).alias("term_norm"),
            "curie",
            "label",
            "category",
            F.lit(RANK_SYNONYM).alias("rank"),
        )
    )
    # Fuzzy chemical variants: stereo/hydrate-stripped norms, only when they
    # differ from the plain norm (N4 fallback surface forms).
    fuzzy_src = active.filter(F.col("category").isin(list(_FUZZY_CATEGORIES)))
    fuzzy = (
        fuzzy_src.select(
            "curie",
            "label",
            "category",
            F.explode(
                F.concat(F.array("label"), F.coalesce("synonyms", F.array(F.lit(None).cast("string"))))
            ).alias("surface"),
        )
        .filter(F.col("surface").isNotNull())
        .select(
            normalize_name_col(F.col("surface"), strip_stereochemistry=True, strip_hydrate=True).alias("term_norm"),
            normalize_name_col(F.col("surface")).alias("_plain"),
            "curie",
            "label",
            "category",
            F.lit(RANK_FUZZY).alias("rank"),
        )
        .filter(F.col("term_norm") != F.col("_plain"))
        .drop("_plain")
    )

    stop_norm = {normalize_name_py(s) for s in stopwords}
    union = labels.unionByName(synonyms).unionByName(fuzzy)
    union = union.filter((F.col("term_norm") != "") & ~F.col("term_norm").isin(sorted(stop_norm)))
    # label/category are functions of curie, so this dedup is exact
    return union.groupBy("term_norm", "curie", "label", "category").agg(
        F.min("rank").alias("rank")
    )


def build_name_index(lexicon: DataFrame, stopwords: Sequence[str]) -> DataFrame:
    """lexicon(curie,label,synonyms,category,xrefs,deprecated) →
    name_index(term_norm,curie,label,category,rank) with one winner per
    term_norm (W4: best rank, then smallest curie). Small dimension:
    callers broadcast it."""
    candidates = build_candidate_index(lexicon, stopwords)
    w = Window.partitionBy("term_norm").orderBy(F.col("rank").asc(), F.col("curie").asc())
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def enrich_synonyms(lexicon: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """N8 synonym enrichment (reference: ontology synonym merge across
    xref-equivalent entries): per CANONICAL curie, the sorted distinct set
    of normalized surface forms (label + synonyms) contributed by the
    canonical row itself AND every secondary row xref-routed to it, plus
    the total contributing-surface count.

    Skew contract: this is an A3 collect-state aggregation, and at web
    scale the fan-in is the hub problem in person — the reference's
    NCBITaxon canonicals receive names from millions of xref'd strain
    entries, so a plain ``collect_set`` would funnel the hub's entire
    surface list through ONE reducer. The collect therefore ALWAYS runs
    through :func:`salted_collect_set` (value-hash salt → disjoint phase-1
    partials → flatten): ``salt_buckets`` bounds per-reducer state at
    ~|hub surfaces|/buckets, and for non-hub keys the overhead is one
    extra shuffle of dimension-sized, pre-shrunk arrays — cheap enough
    that a fan-in threshold gate (which would itself cost a count job)
    is not worth its own skew risk. Deprecated rows contribute nothing;
    a deprecated canonical still receives its secondaries' surfaces
    (routing is existence-based, matching build_xref_routing).

    Output: (curie, synonyms array<string> sorted, n_surfaces long).
    """
    from kg_microbe_spark.operators.salting import salted_collect_set

    active = lexicon.filter(~F.col("deprecated"))
    surfaces = (
        active.select(
            "curie",
            F.explode(
                F.concat(
                    F.array("label"),
                    F.coalesce("synonyms", F.array().cast("array<string>")),
                )
            ).alias("surface"),
        )
        .filter(F.col("surface").isNotNull())
        .select("curie", normalize_name_col(F.col("surface")).alias("surface_norm"))
        .filter(F.col("surface_norm") != "")
    )
    routing = build_xref_routing(lexicon).select("src_curie", "dst_curie")
    routed = surfaces.join(
        F.broadcast(routing), surfaces["curie"] == routing["src_curie"], "left"
    ).select(F.coalesce("dst_curie", surfaces["curie"]).alias("curie"), "surface_norm")
    return salted_collect_set(
        routed,
        ["curie"],
        "surface_norm",
        "synonyms",
        salt_buckets=salt_buckets,
        count_col="n_surfaces",
    )


def build_xref_routing(lexicon: DataFrame, secondary_prefix: str = "SECONDARY:") -> DataFrame:
    """J9 xref-routing dimension: SECONDARY curie → canonical curie (first
    xref), with the canonical row's label/category for node emission."""
    # F.get (not xrefs[0]): ANSI mode throws INVALID_ARRAY_INDEX when
    # Catalyst constant-folds the extraction on a literal empty array
    # BEFORE the size(xrefs) > 0 filter prunes the row.
    sec = lexicon.filter(F.col("curie").startswith(secondary_prefix) & (F.size("xrefs") > 0)).select(
        F.col("curie").alias("src_curie"),
        F.get(F.col("xrefs"), 0).alias("dst_curie"),
    )
    canon = lexicon.select(
        F.col("curie").alias("dst_curie"),
        F.col("label").alias("dst_label"),
        F.col("category").alias("dst_category"),
    )
    return sec.join(F.broadcast(canon), "dst_curie", "left")
