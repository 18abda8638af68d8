"""PII detection and redaction over text columns.

A training-data pipeline over Common-Crawl-style pages must strip
personally identifying strings before corpus release; the reference
pipeline has no analog (its inputs are curated ontology tables), so this
is one of the LLM-data operators the task brief adds as first-class.

Spark-first shape: pure JVM expressions — one ``regexp_count`` per PII
class on the RAW text plus a chain of ``regexp_replace`` — all inside a
single whole-stage-codegen projection. No shuffle, no Python boundary,
filter/column pruning pass straight through to the scan; at 100 TB this
is a free rider on whatever scan already reads the text column.

Patterns deliberately stay inside the RE2 ∩ java.util.regex common
subset (character classes, bounded repetition, ``\\b`` — no lookaround,
no backreferences) so the same strings run on Spark, RE2-based engines,
and the DuckDB oracle byte-identically.

Semantics contract: per-class counts are measured INDEPENDENTLY on the
raw input (a phone number inside an email's local part counts for both);
replacements apply sequentially in the declared class order, so an
earlier replacement can consume a later pattern's characters. Documented
rather than "fixed" because any other choice is equally arbitrary and
this one keeps counts reproducible without intermediate materialization.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# class -> (pattern, replacement token); insertion order = replacement order.
PII_PATTERNS: Dict[str, Tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "redacted_text",
    patterns: Optional[Dict[str, Tuple[str, str]]] = None,
) -> DataFrame:
    """Add one ``n_<class>`` count column per PII class plus ``out_col``
    with every match replaced by its class token. Counts are on the raw
    ``text_col``; replacements chain in ``patterns`` order."""
    pats = patterns or PII_PATTERNS
    out = df
    for name, (pat, _) in pats.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
    redacted = F.col(text_col)
    for name, (pat, token) in pats.items():
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(out_col, redacted)
