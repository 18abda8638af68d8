"""Stage 6 — TRIPLES: co-occurrence pair generation, canonical-direction
filter, predicate routing, provenance metadata, raw confidence score.

Operator parity map (SURVEY.md §2):
- P4  canonical-direction classification: 2 KEEP / 4 DROP shapes over the
      (subject_category, object_category) pair; inverses dropped, never
      re-emitted (prego/utils.py:71-98 analogue, same when-chain shape).
- N7  predicate routing: curated (subject,object) pair map first,
      category-pair default second, mint fallback last — a 3-level coalesce
      of broadcast-join results (madin_etal.py:362-439).
- F10 channel derivation from provenance (site id ← url), F9 evidence
      classification, F12 (knowledge_level, agent_type) per channel×evidence
      (prego/utils.py:290-377).
- A5  drop accounting: dropped pairs are counted by reason, never silently
      discarded (invariant B6).

Scale note: the pair generator is a self-join on ``url``. url is the
highest-cardinality key in the corpus (≈ one per page), so the shuffle is
well spread; per-page fan-out is (k choose 2) over *distinct linked
entities* (already aggregated), bounded by page length, not corpus size.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAXON = "biolink:OrganismTaxon"
CHEM = "biolink:ChemicalEntity"
ENV = "biolink:EnvironmentalFeature"

KEEP_TAXON_TO_CHEM = "taxon_to_chemical"
KEEP_ENV_TO_TAXON = "environment_to_taxon"
DROP_INVERSE_TAXON_TO_CHEM = "inverse_chemical_to_taxon"
DROP_INVERSE_ENV_TO_TAXON = "inverse_taxon_to_environment"
DROP_TAXON_TAXON = "taxon_taxon_cooccurrence"
DROP_UNKNOWN_SHAPE = "unknown_shape"

KEEP_OUTCOMES = (KEEP_TAXON_TO_CHEM, KEEP_ENV_TO_TAXON)

# F10 analogue: channel from the provenance site id.
CHANNEL_ENVIRONMENTAL = "environmental_samples"
CHANNEL_GENOMES = "genomes_isolates"
CHANNEL_LITERATURE = "literature"


def classify_pair_col(subj_cat, obj_cat):
    """P4 when-chain. Pure narrow op, whole-stage codegen."""
    return (
        F.when((subj_cat == TAXON) & (obj_cat == CHEM), KEEP_TAXON_TO_CHEM)
        .when((subj_cat == ENV) & (obj_cat == TAXON), KEEP_ENV_TO_TAXON)
        .when((subj_cat == CHEM) & (obj_cat == TAXON), DROP_INVERSE_TAXON_TO_CHEM)
        .when((subj_cat == TAXON) & (obj_cat == ENV), DROP_INVERSE_ENV_TO_TAXON)
        .when((subj_cat == TAXON) & (obj_cat == TAXON), DROP_TAXON_TAXON)
        .otherwise(DROP_UNKNOWN_SHAPE)
    )


def site_channel_col(url):
    site = F.regexp_extract(url, r"https://site(\d+)\.", 1).cast("int")
    return (
        F.when(site < 8, CHANNEL_ENVIRONMENTAL)
        .when(site < 16, CHANNEL_GENOMES)
        .otherwise(CHANNEL_LITERATURE)
    )


def generate_pairs_join(entities: DataFrame) -> DataFrame:
    """The original self-join pair generator — kept as the reference
    implementation for the generate_pairs equivalence property test
    (r06); production uses the single-shuffle aggregation form below."""
    left = entities.select(
        "url",
        F.col("curie").alias("subject"),
        F.col("label").alias("subject_label"),
        F.col("category").alias("subject_category"),
        F.col("n_mentions").alias("subject_mentions"),
    )
    right = entities.select(
        "url",
        F.col("curie").alias("object"),
        F.col("label").alias("object_label"),
        F.col("category").alias("object_category"),
        F.col("n_mentions").alias("object_mentions"),
    )
    pairs = left.join(right, "url").filter(F.col("subject") != F.col("object"))
    return pairs.withColumn(
        "outcome", classify_pair_col(F.col("subject_category"), F.col("object_category"))
    )


def generate_pairs(entities: DataFrame) -> DataFrame:
    """entities(url, curie, label, category, n_mentions) → all ordered pairs
    of distinct entities per url, with P4 outcome.

    Optimization r06: one groupBy(url) + in-row double loop instead of the
    url self-join (kept above as ``generate_pairs_join`` for the
    property test) — the join shuffled the entities table TWICE (both
    exchange legs); the aggregation form shuffles it once and generates
    the identical ordered-pair multiset (duplicate-curie rows included;
    subject ≠ object is the same predicate, applied in-row). The per-url
    fan-out bound is unchanged — (k²−k) over linked entities per page,
    bounded by page length — and the collected list per url is exactly
    the entity set the join's per-key hash group held, so the memory
    bound is unchanged too (tested equal in tests/test_operators.py)."""
    ent = F.struct(
        F.col("curie").alias("curie"),
        F.col("label").alias("label"),
        F.col("category").alias("category"),
        F.col("n_mentions").alias("n_mentions"),
    )
    per_url = entities.groupBy("url").agg(F.collect_list(ent).alias("_es"))

    def _pair(a, b):
        return F.struct(
            a["curie"].alias("subject"),
            a["label"].alias("subject_label"),
            a["category"].alias("subject_category"),
            a["n_mentions"].alias("subject_mentions"),
            b["curie"].alias("object"),
            b["label"].alias("object_label"),
            b["category"].alias("object_category"),
            b["n_mentions"].alias("object_mentions"),
        )

    es = F.col("_es")
    pairs_arr = F.flatten(
        F.transform(
            es,
            lambda a: F.transform(
                F.filter(es, lambda b: b["curie"] != a["curie"]), lambda b: _pair(a, b)
            ),
        )
    )
    pairs = per_url.select("url", F.explode(pairs_arr).alias("_p")).select("url", "_p.*")
    return pairs.withColumn(
        "outcome", classify_pair_col(F.col("subject_category"), F.col("object_category"))
    )


def split_pairs(pairs: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """(kept, drop_report). Drop report = A5 count-by-reason."""
    kept = pairs.filter(F.col("outcome").isin(list(KEEP_OUTCOMES)))
    dropped = (
        pairs.filter(~F.col("outcome").isin(list(KEEP_OUTCOMES)))
        .groupBy("outcome")
        .agg(F.count("*").alias("n"))
    )
    return kept, dropped


def assign_predicates(
    kept: DataFrame,
    curated_pairs: DataFrame,
    category_defaults: DataFrame,
    fallback: Tuple[str, str] = ("biolink:related_to", "biolink:related_to"),
) -> DataFrame:
    """N7 three-level routing via two broadcast left joins + coalesce.

    curated_pairs(subject, object, predicate, relation);
    category_defaults(subject_category, object_category, predicate, relation).
    """
    cur = F.broadcast(
        curated_pairs.select(
            F.col("subject").alias("_c_s"),
            F.col("object").alias("_c_o"),
            F.col("predicate").alias("_c_pred"),
            F.col("relation").alias("_c_rel"),
        )
    )
    cat = F.broadcast(
        category_defaults.select(
            F.col("subject_category").alias("_d_sc"),
            F.col("object_category").alias("_d_oc"),
            F.col("predicate").alias("_d_pred"),
            F.col("relation").alias("_d_rel"),
        )
    )
    out = (
        kept.join(cur, (kept["subject"] == cur["_c_s"]) & (kept["object"] == cur["_c_o"]), "left")
        .join(cat, (kept["subject_category"] == cat["_d_sc"]) & (kept["object_category"] == cat["_d_oc"]), "left")
        .withColumn("predicate", F.coalesce("_c_pred", "_d_pred", F.lit(fallback[0])))
        .withColumn("relation", F.coalesce("_c_rel", "_d_rel", F.lit(fallback[1])))
        .drop("_c_s", "_c_o", "_c_pred", "_c_rel", "_d_sc", "_d_oc", "_d_pred", "_d_rel")
    )
    return out


def score_and_provenance(edges: DataFrame) -> DataFrame:
    """Raw score = subject_mentions × object_mentions (continuous channel
    calibrates it, flat channels carry tier constants — calibration.py);
    channel from site (F10); evidence class (F9); knowledge_level/agent_type
    (F12, including the habitat-inside-genomes nuance and the
    unrecognized-channel fail-open)."""
    e = edges.withColumn("channel", site_channel_col(F.col("url")))
    e = e.withColumn(
        "primary_knowledge_source",
        F.concat(F.lit("infores:"), F.regexp_extract("url", r"https://(site\d+)\.", 1)),
    )
    e = e.withColumn("score", (F.col("subject_mentions") * F.col("object_mentions")).cast("double"))
    e = e.withColumn(
        "evidence_class",
        F.when(F.col("channel") == CHANNEL_LITERATURE, "publication")
        .when(
            (F.col("channel") == CHANNEL_GENOMES) & (F.col("object_category") == ENV),
            "habitat",
        )
        .when(F.col("channel") == CHANNEL_GENOMES, "resource_class")
        .when(F.col("channel") == CHANNEL_ENVIRONMENTAL, "sample_count")
        .otherwise("unknown"),
    )
    e = e.withColumn(
        "knowledge_level",
        F.when((F.col("evidence_class") == "publication") | (F.col("channel") == CHANNEL_LITERATURE), "prediction")
        .when(F.col("channel") == CHANNEL_ENVIRONMENTAL, "statistical_association")
        .when((F.col("channel") == CHANNEL_GENOMES) & (F.col("evidence_class") == "habitat"), "observation")
        .when(F.col("channel") == CHANNEL_GENOMES, "knowledge_assertion")
        .otherwise("not_provided"),
    ).withColumn(
        "agent_type",
        F.when((F.col("evidence_class") == "publication") | (F.col("channel") == CHANNEL_LITERATURE), "text_mining_agent")
        .when(F.col("channel") == CHANNEL_ENVIRONMENTAL, "data_analysis_pipeline")
        .when(F.col("channel") == CHANNEL_GENOMES, "automated_agent")
        .otherwise("not_provided"),
    )
    return e
