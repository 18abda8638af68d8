"""Anchor-text profiles: what the web calls a page.

The anchor phrases of incoming hyperlinks are the classic web-KG
naming signal (they seed entity aliases and surface forms the page's
own text never states — the reference's curated synonym tables play
this role for ontology terms; kg_microbe/transform_utils gathers
synonyms per node, here the crawl itself supplies them). Given pages
with an HTML body, this module aggregates, per link *target*, the
distinct anchor phrases pointing at it and how broadly each is used.

Spark-first shape, 100-TB reasoning:

* anchor extraction is two ``regexp_extract_all`` calls (href group
  and anchor-text group of the same ``<a>`` pattern) zipped by
  position — pure codegen projection, no UDF, rides the page scan;
* the profile is TWO map-side-combinable aggregations: first
  ``(target, anchor, page)`` mention counts (collapses per-page link
  spam before anything shuffles wide), then ``(target, anchor)``
  with ``n_pages = count(1)`` / ``n_mentions = sum(cnt)``. A hub
  target (everyone links wikipedia.org) is absorbed by partial
  aggregation at both levels — no single task ever holds the hub's
  raw link rows;
* ``top_anchors`` ranks within each target AFTER aggregation, when
  the frame is (targets × distinct anchors) — orders of magnitude
  smaller than pages — so the window's per-key sort is cheap and the
  earlier skew-safe aggregation has already eaten the fan-in.

Anchors are whitespace-collapsed and lowercased (matching the
lexicon normalization family in functions/normalize.py); empty
anchors (image links) are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.functions.urls import registered_domain_col

# href in double quotes, anchor text up to the closing tag; RE2-safe so
# the DuckDB oracle can run the identical pattern.
ANCHOR_PATTERN = r"""<a\s+href="([^"]+)"[^>]*>([^<]*)</a>"""


def extract_anchors(
    pages: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """One row per ``<a href>`` occurrence: (page id, target url,
    normalized anchor phrase). Positionally zips the two capture
    groups of ANCHOR_PATTERN — same regex, same match order."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 1)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 2)
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor")))
    return (
        pages.select(F.col(id_col), pair.alias("a"))
        .select(
            id_col,
            F.col("a.href").alias("href"),
            F.lower(
                F.trim(F.regexp_replace(F.col("a.anchor"), r"\s+", " "))
            ).alias("anchor"),
        )
        .filter(F.col("anchor") != "")
    )


def anchor_text_profile(
    pages: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Per (target registered domain, anchor phrase): how many distinct
    pages use the phrase (``n_pages``) and total occurrences
    (``n_mentions``). Two-level aggregation keeps both shuffles
    partial-agg combinable (see module docstring)."""
    anchors = extract_anchors(pages, id_col, html_col).select(
        F.col(id_col),
        registered_domain_col(F.col("href")).alias("dst_domain"),
        "anchor",
    )
    per_page = anchors.groupBy("dst_domain", "anchor", id_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_page.groupBy("dst_domain", "anchor").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("cnt").alias("n_mentions"),
    )


def top_anchors(
    profile: DataFrame, k: int
) -> DataFrame:
    """Top-k anchor phrases per target domain from an
    ``anchor_text_profile`` frame, ranked by breadth then volume then
    phrase (fully deterministic tie-break)."""
    w = Window.partitionBy("dst_domain").orderBy(
        F.col("n_pages").desc(),
        F.col("n_mentions").desc(),
        F.col("anchor").asc(),
    )
    return (
        profile.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
