"""Canonical schemas (data model per SURVEY.md §1).

Reference analogues:
- KGX node header: /root/reference/kg_microbe/transform_utils/transform.py:54-64
- KGX edge header: /root/reference/kg_microbe/transform_utils/transform.py:65-73
- pages table shape: BASELINE.json.input_hint
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages (Iceberg in production; parquet in tests).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# KGX-shaped outputs. Everything string-typed on disk, like the reference
# (SURVEY.md §1.2); multi-valued cells pipe-delimited for byte parity.
# ---------------------------------------------------------------------------
NODE_COLUMNS = [
    "id",
    "category",
    "name",
    "description",
    "xref",
    "provided_by",
    "synonym",
    "deprecated",
    "same_as",
]
NODES_SCHEMA = StructType([StructField(c, StringType(), True) for c in NODE_COLUMNS])

EDGE_COLUMNS = [
    "subject",
    "predicate",
    "object",
    "relation",
    "primary_knowledge_source",
    "knowledge_level",
    "agent_type",
]
EDGES_SCHEMA = StructType([StructField(c, StringType(), True) for c in EDGE_COLUMNS])

# ---------------------------------------------------------------------------
# Ontology lexicon dimension (FIXTURES.md §2).
# ---------------------------------------------------------------------------
LEXICON_SCHEMA = StructType(
    [
        StructField("curie", StringType(), False),
        StructField("label", StringType(), False),
        StructField("synonyms", ArrayType(StringType()), True),
        StructField("category", StringType(), False),
        StructField("xrefs", ArrayType(StringType()), True),
        StructField("deprecated", BooleanType(), False),
    ]
)

# Normalized name-index built from the lexicon (W4 rank rule:
# chemical_mapping_utils.py:229-262 — canonical label rank 0 beats synonym
# rank 1; equal rank keeps first-seen).
NAME_INDEX_SCHEMA = StructType(
    [
        StructField("term_norm", StringType(), False),
        StructField("curie", StringType(), False),
        StructField("label", StringType(), False),
        StructField("category", StringType(), False),
        StructField("rank", IntegerType(), False),
    ]
)

# Mentions emitted by the trie scan (Stage 3).
# Mention-scan contract (operators/mentions.py): matching runs over the
# F1-NORMALIZED text, so `surface` == `term_norm` (the matched span IS the
# normalized term) and `start`/`end` are offsets into the normalized text,
# NOT raw page bytes. `surface` exists as a separate column because a
# raw-offset-preserving normalizer would change it (and only it); consumers
# must join on `term_norm` and treat `surface` as display-only.
MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("term_norm", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

# Extracted-text stage output.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Per-partition lineage / metrics checkpoint rows (north rule; reference
# analogue: atomic_io.py completeness markers + prego.py drop reports).
LINEAGE_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_fingerprint", StringType(), True),
        StructField("row_count", LongType(), False),
        StructField("wall_time_sec", DoubleType(), False),
        StructField("run_id", StringType(), False),
    ]
)
