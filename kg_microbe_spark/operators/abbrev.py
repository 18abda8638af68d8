"""Abbreviation (short-form / long-form) mining — Schwartz-Hearst-lite.

KG-construction use: web text introduces entities as
"World Health Organization (WHO)" and then uses the short form; mined
(SF, LF) pairs become synonym rows for the lexicon (the reference's
curated synonym tables, transform_utils synonym gathering) so the
dictionary matcher catches the short form on every later page.

Implements the high-precision core of Schwartz & Hearst (2003,
Pacific Symposium on Biocomputing): a parenthesized 2-6 uppercase
token whose letters match, in order, the initials of the |SF|
immediately preceding words. The full algorithm's character-level
backward alignment admits mid-word matches; the initials-only rule is
the precision-mode subset — and is exactly expressible in relational
string ops, so the operator stays a zero-UDF codegen projection that a
DuckDB oracle can replay.

100-TB shape:

* candidate capture = two ``regexp_extract_all`` groups (preceding
  word window, parenthesized token) zipped by position — one codegen
  projection riding the page scan, no UDF;
* the initials test is in-row array algebra (split / slice /
  transform / concat) — still zero shuffle;
* corpus aggregation = ONE ``groupBy(short_form, long_form)`` with
  count(distinct doc) pre-collapsed per doc — map-side combinable
  (the per-doc distinct happens in-row via array_distinct before the
  explode, so a doc repeating its own definition 500× contributes 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Up to 6 words (letters only, any case) immediately before a
# parenthesized 2-6 letter uppercase token. RE2 ∩ java.util.regex safe.
ABBREV_PATTERN = (
    r"((?:[A-Za-z]+ ){2,6})\(([A-Z]{2,6})\)"
)


def _initials(words: Column) -> Column:
    return F.lower(
        F.concat_ws("", F.transform(words, lambda w: F.substring(w, 1, 1)))
    )


def abbreviation_pairs(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """docs(id, text) → (short_form, long_form, n_docs): validated
    definitions with distinct-document evidence counts."""
    wins = F.regexp_extract_all(F.col(text_col), F.lit(ABBREV_PATTERN), 1)
    sfs = F.regexp_extract_all(F.col(text_col), F.lit(ABBREV_PATTERN), 2)
    cand = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.arrays_zip(wins.alias("win"), sfs.alias("sf")))
        ).alias("c"),
    ).select(
        "doc",
        F.split(F.trim(F.col("c.win")), " ").alias("words"),
        F.col("c.sf").alias("short_form"),
    )
    k = F.length("short_form")
    # last |SF| words of the captured window; slice start is 1-based
    lf_words = F.slice(
        F.col("words"), F.greatest(F.size("words") - k + 1, F.lit(1)), k
    )
    validated = (
        cand.select(
            "doc",
            "short_form",
            lf_words.alias("lf_words"),
        )
        .filter(F.size("lf_words") == k)
        .filter(_initials(F.col("lf_words")) == F.lower("short_form"))
        .select(
            "doc",
            "short_form",
            F.lower(F.concat_ws(" ", "lf_words")).alias("long_form"),
        )
        .distinct()
    )
    return validated.groupBy("short_form", "long_form").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
