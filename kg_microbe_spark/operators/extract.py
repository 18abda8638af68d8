"""Stage 1 — EXTRACT: html→text, page filtering, url dedup.

North-rule invariant: byte-identical extracted text per url. The extraction
function is the pinned pure-Python ``extract_text_from_html`` (no external
libs, no locale dependence); it runs inside an Arrow-batched ``mapInPandas``
so no per-row Python crosses the serialization boundary row-wise.

Reference analogues: resumable-scan guards (atomic_io.py), the per-source
read stage (SURVEY.md §3.1 step 4).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.schemas import EXTRACTED_SCHEMA
from kg_microbe_spark.sources.synthetic import extract_text_from_html

EXTRACT_VERSION = "1"  # bump when extraction semantics change


def dedup_pages_by_url(pages: DataFrame) -> DataFrame:
    """Keep the latest capture per url: max_by over the total order
    (warc_ts, text length, text).

    Implemented as groupBy + max_by rather than a row_number window: the
    aggregate gets map-side partial combining, so the shuffle carries one
    candidate row per (url, map task) instead of every capture's full html
    bytes — the difference between shuffling the corpus and shuffling the
    duplicates at 10^12 pages. The ordering struct is a total order, so the
    winner is deterministic under any partitioning (pandas' stable
    mergesort has no distributed analog, SURVEY.md §7.3)."""
    cols = pages.columns
    ordering = F.struct(
        F.col("warc_ts"),
        F.length(F.coalesce(F.col("text"), F.lit(""))),
        F.coalesce(F.col("text"), F.lit("")),
    )
    winner = F.max_by(F.struct(*[F.col(c) for c in cols]), ordering).alias("w")
    return pages.groupBy("url").agg(winner).select(*[F.col(f"w.{c}").alias(c) for c in cols if c != "url"], "url").select(*cols)


def extract_pages(pages: DataFrame, validate: bool = False) -> DataFrame:
    """html→text for rows missing text; optional invariant check.

    With ``validate=True`` rows whose shipped ``text`` differs from the
    re-extracted text raise — the per-url byte-identity invariant.
    """
    import pandas as pd

    def _extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extracted = pdf["html"].map(extract_text_from_html)
            if validate:
                shipped = pdf["text"]
                mask = shipped.notna() & extracted.notna() & (shipped != extracted)
                if mask.any():
                    bad = pdf.loc[mask, "url"].iloc[0]
                    raise ValueError(f"extraction invariant violated for url={bad}")
            out = pdf.copy()
            out["text"] = extracted.where(extracted.notna(), pdf["text"])
            yield out[["url", "warc_ts", "text", "lang"]]

    return pages.mapInPandas(_extract, EXTRACTED_SCHEMA)


def split_by_lang(extracted: DataFrame, lang: str = "en"):
    """Non-target-language pages are flagged and routed aside, never dropped
    silently (invariant B6: unmatched inputs are reported)."""
    keep = extracted.filter(F.col("lang") == lang)
    skipped = extracted.filter((F.col("lang") != lang) | F.col("lang").isNull())
    return keep, skipped
