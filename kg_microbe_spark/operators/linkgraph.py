"""Hyperlink domain-graph extraction from web pages.

Common-Crawl-style corpora carry their own citation structure: the
hrefs inside each page. Aggregated to registered domains (eTLD+1) they
become the web graph that feeds PageRank-style quality priors
(operators/pagerank.py) and per-domain quota sampling
(sampling.deterministic_group_sample). This module extracts that graph
as a pure-JVM projection + one map-side-combinable aggregation:

1. ``regexp_extract_all`` pulls http(s) URLs out of the page text —
   codegen, no UDF;
2. ``registered_domain_col`` (functions/urls.py, frozen-PSL eTLD+1)
   canonicalizes both the source page URL and each outlink;
3. one ``groupBy(src_domain, dst_domain)`` count — the only shuffle,
   carrying (src, dst) pairs already collapsed per page by
   ``array_distinct``, so a page linking one domain 500 times
   contributes one edge-unit. Self-links are dropped (intra-domain
   navigation, not signal).

100-TB shape: extraction is narrow; the aggregation's key space is
domains² observed, orders of magnitude smaller than pages. Hub domains
(everyone links wikipedia.org) are absorbed by partial aggregation —
counts combine map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.urls import registered_domain_col

URL_PATTERN = r"https?://[^\s\"'<>]+"  # RE2-safe: portable to DuckDB oracles


def extract_outlinks(
    pages: DataFrame, id_col: str, url_col: str, text_col: str
) -> DataFrame:
    """One row per (page, distinct outlink URL) with source and target
    registered domains attached."""
    return (
        pages.select(
            F.col(id_col),
            registered_domain_col(F.col(url_col)).alias("src_domain"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(URL_PATTERN), 0
                    )
                )
            ).alias("outlink"),
        )
        .withColumn("dst_domain", registered_domain_col(F.col("outlink")))
    )


def domain_link_graph(
    pages: DataFrame, id_col: str, url_col: str, text_col: str
) -> DataFrame:
    """Weighted domain-level link graph: ``(src_domain, dst_domain,
    n_links)`` where n_links counts DISTINCT pages of src that link dst
    at least once (the robust edge weight — per-page link spam can't
    inflate it)."""
    links = extract_outlinks(pages, id_col, url_col, text_col).filter(
        F.col("dst_domain") != F.col("src_domain")
    )
    per_page = links.select(id_col, "src_domain", "dst_domain").distinct()
    return (
        per_page.groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
