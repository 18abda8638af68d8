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


def dedup_pages_by_url(pages: DataFrame, broadcast_dup_urls: bool = True) -> DataFrame:
    """Keep the latest capture per url: max_by over the total order
    (warc_ts, text length, text).

    Shuffle-volume design: duplicate urls are a few percent of the corpus,
    so shuffling every page's html to dedup them is waste — at 10^12 pages
    it is THE dominant IO. Instead:

    1. one cheap shuffle of (url) only (column-pruned scan + partial
       count) finds the duplicated urls;
    2. unique pages pass through with NO wide exchange (left_anti against
       the dup-url set);
    3. only the duplicated captures' full rows shuffle, into a map-side-
       combinable max_by whose ordering struct is a total order →
       deterministic winner under any partitioning (pandas' stable
       mergesort has no distributed analog, SURVEY.md §7.3).

    The dup-url set is EXPLICITLY broadcast by default: its pre-runtime
    size estimate is unknown (it sits above an aggregate), so without the
    hint AQE first shuffle-materializes the FULL pages table (html bytes
    and all) for both joins before it can convert them — measured 46s of
    a 113s local[4] wall on 800k pages, at 0.3-1.4x parallel efficiency.
    The dup-url set is (url)-only and a few % of the corpus; it fits the
    broadcast budget far past 10^9 pages. Beyond that, pass False and
    accept the shuffle joins (or pre-bucket the pages table by url)."""
    cols = pages.columns
    dup_urls = (
        pages.groupBy("url").agg(F.count("*").alias("_n")).filter(F.col("_n") > 1).select("url")
    )
    if broadcast_dup_urls:
        dup_urls = F.broadcast(dup_urls)
    uniques = pages.join(dup_urls, "url", "left_anti")
    dups = pages.join(dup_urls, "url", "left_semi")
    ordering = F.struct(
        F.col("warc_ts"),
        F.length(F.coalesce(F.col("text"), F.lit(""))),
        F.coalesce(F.col("text"), F.lit("")),
    )
    winner = F.max_by(F.struct(*[F.col(c) for c in cols]), ordering).alias("w")
    dedup_dups = (
        dups.groupBy("url")
        .agg(winner)
        .select(*[F.col(f"w.{c}").alias(c) for c in cols if c != "url"], "url")
        .select(*cols)
    )
    return uniques.select(*cols).unionByName(dedup_dups)


def extract_pages(pages: DataFrame, validate: bool = False) -> DataFrame:
    """html→text for rows missing text; optional invariant check.

    Scale-critical shape: only rows whose ``text`` is NULL cross the
    Python boundary, and they carry only the columns the UDF needs. The
    binary ``html`` column never rides through Arrow for the ~90% of rows
    that already have text — measured on this box, streaming the full
    binary column through 32 concurrent Arrow channels anti-scaled 5-50×
    (direct-memory allocation contention), while the filtered path is flat.

    With ``validate=True`` EVERY row (including ones with shipped text) is
    re-extracted and compared — the per-url byte-identity invariant; this
    is the expensive audit path used by tests, not the hot path.
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

    if validate:
        return pages.mapInPandas(_extract, EXTRACTED_SCHEMA)

    have_text = pages.filter(F.col("text").isNotNull()).select("url", "warc_ts", "text", "lang")
    need = pages.filter(F.col("text").isNull()).select("url", "warc_ts", "html", "text", "lang")
    extracted = need.mapInPandas(_extract, EXTRACTED_SCHEMA)
    return have_text.unionByName(extracted)


def split_by_lang(extracted: DataFrame, lang: str = "en"):
    """Non-target-language pages are flagged and routed aside, never dropped
    silently (invariant B6: unmatched inputs are reported)."""
    keep = extracted.filter(F.col("lang") == lang)
    skipped = extracted.filter((F.col("lang") != lang) | F.col("lang").isNull())
    return keep, skipped
