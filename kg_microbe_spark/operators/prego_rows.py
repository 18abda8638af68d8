"""PREGO-style row operators: the exact reference semantics for the
9-column pairs stream, as JVM column expressions.

Parity targets (semantics, not code):
- classify_row: transform_utils/prego/utils.py:71-98 — 4 KEEP / 5 DROP
  canonical-direction shapes over integer entity-type codes;
- classify_evidence: prego/utils.py:310-327 — tally / PMID / resource-class
  / habitat;
- edge_metadata_for: prego/utils.py:329-377 — (knowledge_level, agent_type)
  per channel×evidence, habitat nested inside the genomes branch,
  unrecognized channels decline to assert provenance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TYPE_NCBITAXON = -2
TYPE_GO_BP = -21
TYPE_GO_CC = -22
TYPE_GO_MF = -23
TYPE_BTO = -25
TYPE_DOID = -26
TYPE_ENVO = -27
GO_TYPES = (TYPE_GO_BP, TYPE_GO_CC, TYPE_GO_MF)


def classify_row_col(e1: Column, e2: Column) -> Column:
    is_go2 = e2.isin(list(GO_TYPES))
    is_go1 = e1.isin(list(GO_TYPES))
    return (
        F.when((e1 == TYPE_NCBITAXON) & is_go2, "taxon_to_go")
        .when((e1 == TYPE_ENVO) & (e2 == TYPE_NCBITAXON), "envo_to_taxon")
        .when((e1 == TYPE_NCBITAXON) & (e2 == TYPE_DOID), "taxon_to_doid")
        .when((e1 == TYPE_NCBITAXON) & (e2 == TYPE_BTO), "taxon_to_bto")
        .when(is_go1 & (e2 == TYPE_NCBITAXON), "inverse_go_to_taxon")
        .when((e1 == TYPE_NCBITAXON) & (e2 == TYPE_ENVO), "inverse_taxon_to_envo")
        .when((e1 == TYPE_BTO) & (e2 == TYPE_NCBITAXON), "inverse_bto_to_taxon")
        .when((e1 == TYPE_NCBITAXON) & (e2 == TYPE_NCBITAXON), "taxon_taxon_host")
        .otherwise("unknown_shape")
    )


CLASSIFY_ROW_SQL_CASE = """
    CASE
      WHEN e1 = -2  AND e2 IN (-21,-22,-23) THEN 'taxon_to_go'
      WHEN e1 = -27 AND e2 = -2  THEN 'envo_to_taxon'
      WHEN e1 = -2  AND e2 = -26 THEN 'taxon_to_doid'
      WHEN e1 = -2  AND e2 = -25 THEN 'taxon_to_bto'
      WHEN e1 IN (-21,-22,-23) AND e2 = -2 THEN 'inverse_go_to_taxon'
      WHEN e1 = -2  AND e2 = -27 THEN 'inverse_taxon_to_envo'
      WHEN e1 = -25 AND e2 = -2  THEN 'inverse_bto_to_taxon'
      WHEN e1 = -2  AND e2 = -2  THEN 'taxon_taxon_host'
      ELSE 'unknown_shape'
    END
"""


def classify_evidence_col(value: Column) -> Column:
    """F9: '12 of 40 samples' → sample_count; PMID:… → publication;
    resource-class prefixes → resource_class; else habitat; empty → unknown."""
    is_tally = value.rlike(r"^\d+ of \d+ samples$")
    is_pmid = value.startswith("PMID:")
    is_resource = (
        value.startswith("Isolates")
        | value.startswith("Genome annotation")
        | value.startswith("Metagenome-Assembled Genome")
        | value.startswith("Single Amplified Genome")
    )
    return (
        F.when(value.isNull() | (value == ""), "unknown")
        .when(is_tally, "sample_count")
        .when(is_pmid, "publication")
        .when(is_resource, "resource_class")
        .otherwise("habitat")
    )


CLASSIFY_EVIDENCE_SQL_CASE = """
    CASE
      WHEN ev IS NULL OR ev = '' THEN 'unknown'
      WHEN regexp_matches(ev, '^[0-9]+ of [0-9]+ samples$') THEN 'sample_count'
      WHEN ev LIKE 'PMID:%' THEN 'publication'
      WHEN ev LIKE 'Isolates%' OR ev LIKE 'Genome annotation%'
        OR ev LIKE 'Metagenome-Assembled Genome%' OR ev LIKE 'Single Amplified Genome%'
        THEN 'resource_class'
      ELSE 'habitat'
    END
"""

CHANNEL_ENVIRONMENTAL = "environmental_samples"
CHANNEL_GENOMES = "genomes_isolates"
CHANNEL_LITERATURE = "literature"


def edge_metadata_cols(channel: Column, evidence_class: Column) -> tuple:
    """F12: returns (knowledge_level, agent_type) columns."""
    pub = (evidence_class == "publication") | (channel == CHANNEL_LITERATURE)
    kl = (
        F.when(pub, "prediction")
        .when(channel == CHANNEL_ENVIRONMENTAL, "statistical_association")
        .when((channel == CHANNEL_GENOMES) & (evidence_class == "habitat"), "observation")
        .when(channel == CHANNEL_GENOMES, "knowledge_assertion")
        .otherwise("not_provided")
    )
    at = (
        F.when(pub, "text_mining_agent")
        .when(channel == CHANNEL_ENVIRONMENTAL, "data_analysis_pipeline")
        .when(channel == CHANNEL_GENOMES, "automated_agent")
        .otherwise("not_provided")
    )
    return kl, at


EDGE_METADATA_SQL = """
    CASE
      WHEN evidence_class = 'publication' OR channel = 'literature' THEN 'prediction'
      WHEN channel = 'environmental_samples' THEN 'statistical_association'
      WHEN channel = 'genomes_isolates' AND evidence_class = 'habitat' THEN 'observation'
      WHEN channel = 'genomes_isolates' THEN 'knowledge_assertion'
      ELSE 'not_provided'
    END AS knowledge_level,
    CASE
      WHEN evidence_class = 'publication' OR channel = 'literature' THEN 'text_mining_agent'
      WHEN channel = 'environmental_samples' THEN 'data_analysis_pipeline'
      WHEN channel = 'genomes_isolates' THEN 'automated_agent'
      ELSE 'not_provided'
    END AS agent_type
"""
