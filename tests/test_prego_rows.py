"""Reference-parity unit tests for the PREGO row operators: the exact
classify/evidence/metadata semantics from prego/utils.py (cited in module),
checked against hand-derived expected values."""

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.prego_rows import (
    classify_evidence_col,
    classify_row_col,
    edge_metadata_cols,
)

CLASSIFY_CASES = [
    (-2, -21, "taxon_to_go"),
    (-2, -22, "taxon_to_go"),
    (-2, -23, "taxon_to_go"),
    (-27, -2, "envo_to_taxon"),
    (-2, -26, "taxon_to_doid"),
    (-2, -25, "taxon_to_bto"),
    (-21, -2, "inverse_go_to_taxon"),
    (-2, -27, "inverse_taxon_to_envo"),
    (-25, -2, "inverse_bto_to_taxon"),
    (-2, -2, "taxon_taxon_host"),
    (-25, -27, "unknown_shape"),
    (9606, -21, "unknown_shape"),
]

EVIDENCE_CASES = [
    ("402 of 487 samples", "sample_count"),
    ("1 of 1 samples", "sample_count"),
    ("402 of samples", "habitat"),
    ("PMID:123456", "publication"),
    ("Isolates GOLD", "resource_class"),
    ("Genome annotation pipeline", "resource_class"),
    ("Metagenome-Assembled Genome", "resource_class"),
    ("Single Amplified Genome", "resource_class"),
    ("forest soil", "habitat"),
    ("", "unknown"),
    (None, "unknown"),
]

METADATA_CASES = [
    ("literature", "publication", "prediction", "text_mining_agent"),
    ("environmental_samples", "sample_count", "statistical_association", "data_analysis_pipeline"),
    ("environmental_samples", "publication", "prediction", "text_mining_agent"),  # citation overrides
    ("genomes_isolates", "habitat", "observation", "automated_agent"),  # habitat nested in genomes
    ("genomes_isolates", "resource_class", "knowledge_assertion", "automated_agent"),
    ("mystery_channel", "habitat", "not_provided", "not_provided"),  # unrecognized declines
]


def test_classify_row(spark):
    df = spark.createDataFrame([(e1, e2) for e1, e2, _ in CLASSIFY_CASES], "e1 int, e2 int")
    got = [r.o for r in df.select(classify_row_col(F.col("e1"), F.col("e2")).alias("o")).collect()]
    assert got == [want for _, _, want in CLASSIFY_CASES]


def test_classify_evidence(spark):
    df = spark.createDataFrame([(v,) for v, _ in EVIDENCE_CASES], "ev string")
    got = [r.o for r in df.select(classify_evidence_col(F.col("ev")).alias("o")).collect()]
    assert got == [want for _, want in EVIDENCE_CASES]


def test_edge_metadata(spark):
    df = spark.createDataFrame([(c, e) for c, e, _, _ in METADATA_CASES], "channel string, evidence string")
    kl, at = edge_metadata_cols(F.col("channel"), F.col("evidence"))
    got = [(r.kl, r.at) for r in df.select(kl.alias("kl"), at.alias("at")).collect()]
    assert got == [(k, a) for _, _, k, a in METADATA_CASES]
