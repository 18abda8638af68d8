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


# 13-19 digit runs in 4-digit groups with optional uniform separators is
# the realistic web form; the simple 16-digit shape keeps the fixture and
# oracle replay compact while still exercising separators + \b edges.
CARD_CANDIDATE_PATTERN = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"


def card_candidates(
    df: DataFrame,
    text_col: str,
    id_cols: Tuple[str, ...] = ("doc_id",),
    pattern: str = CARD_CANDIDATE_PATTERN,
) -> DataFrame:
    """Checksum-validated payment-card detection: candidate spans by regex,
    then the Luhn check as in-row arithmetic — the precision gate a regex
    alone cannot provide (any 16-digit order id matches the shape; only
    ~1 in 10 random digit runs passes Luhn, and real PANs always do).

    Spark-first shape: ``regexp_extract_all`` (candidate spans) + one
    explode, then Luhn entirely in JVM higher-order array expressions —
    ``transform(sequence(1, len), …)`` maps each reversed-position digit
    to its doubled-or-not contribution and ``aggregate`` folds the sum;
    no Python boundary, no shuffle (a pure per-row projection after the
    explode), whole-stage-codegen end to end. The regex stays in the
    RE2 ∩ java.util.regex subset so the DuckDB oracle replays it
    byte-identically.

    Emits one row per candidate span: ``*id_cols, span, digits,
    luhn_valid`` — detection, not redaction: conditional-per-match
    replacement is not expressible in a single regexp_replace, and the
    downstream corpus policy (drop page vs mask span) owns that choice.
    """
    spans = df.select(
        *[F.col(c) for c in id_cols],
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).alias("span"),
    )
    digits = F.regexp_replace(F.col("span"), r"[- ]", "")
    # Luhn over the reversed digit string: positions 1,3,5,… (1-based) keep
    # the digit, positions 2,4,… double it and subtract 9 when the double
    # exceeds 9 (d > 4). Valid iff the fold sums to 0 mod 10.
    luhn = F.expr(
        "aggregate("
        "  transform(sequence(1, length(digits)), i -> CASE"
        "    WHEN i % 2 = 1 THEN CAST(substring(reverse(digits), i, 1) AS INT)"
        "    WHEN CAST(substring(reverse(digits), i, 1) AS INT) > 4"
        "      THEN 2 * CAST(substring(reverse(digits), i, 1) AS INT) - 9"
        "    ELSE 2 * CAST(substring(reverse(digits), i, 1) AS INT) END),"
        "  0, (acc, x) -> acc + x) % 10 = 0"
    )
    return spans.withColumn("digits", digits).withColumn("luhn_valid", luhn)
