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


def adamic_adar_pairs(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    max_degree: int | None = None,
    min_score_x1e6: int = 0,
) -> DataFrame:
    """Link prediction by Adamic-Adar common-neighbor scoring: for every
    NON-adjacent node pair sharing ≥1 neighbor, score = Σ_z 1/ln(deg z)
    over common neighbors z — the classic missing-edge prior for a KG
    (which taxon-chemical association is the extraction most likely to
    have missed given the observed neighborhoods).

    Spark shape (undirected): symmetrize + distinct, degree = one
    combinable groupBy, then the wedge enumeration is a SELF-EQUI-JOIN
    on the shared neighbor z with x < y — shuffle ∝ Σ_z deg(z)², never
    all pairs. That Σ deg² is exactly the hub-fan-out hazard, so
    ``max_degree`` drops super-hub pivots BEFORE the join (same stop-
    item guard as pairwise_jaccard's max_item_frequency; a z linking
    everything predicts nothing). Existing edges leave via one
    anti-join. deg(z)=1 cannot reach the join (a common neighbor has
    ≥2 edges), so 1/ln(deg) never divides by zero.

    Scoring is integerized for cross-engine determinism: each pivot
    contributes floor(10⁶/ln(deg z)) and the BIGINT contributions sum
    (double sums are addition-order-dependent; integer sums are not).
    ``score`` is that integer scaled back to a 6-dp double.
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("z")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    pivots = deg if max_degree is None else deg.filter(F.col("deg") <= max_degree)
    # (z, neighbor) with the pivot's degree attached
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("n")).join(
        pivots, "z"
    )
    wedges = (
        adj.select("z", F.col("n").alias("x"), "deg")
        .join(
            adj.select("z", F.col("n").alias("y")),
            "z",
        )
        .filter(F.col("x") < F.col("y"))
    )
    scored = wedges.groupBy("x", "y").agg(
        F.sum(
            F.floor(F.lit(1000000.0) / F.log("deg")).cast("long")
        ).alias("score_x1e6")
    ).withColumn("score", F.round(F.col("score_x1e6") / 1e6, 6))
    existing = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return (
        scored.join(existing, ["x", "y"], "left_anti")
        .filter(F.col("score_x1e6") >= min_score_x1e6)
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "score",
            "score_x1e6",
        )
    )


def link_reciprocity(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """Per-node reciprocity profile over the DISTINCT directed edge set:
    (node, out_deg, in_deg, n_reciprocal, reciprocity) where
    n_reciprocal counts outgoing edges whose reverse edge also exists
    and reciprocity = n_reciprocal/out_deg — the classic link-exchange
    / link-farm signal (organic web graphs are mostly asymmetric;
    mutual-link cliques light up at reciprocity ≈ 1).

    Scale shape: the reverse-edge test is ONE self semi-join of the
    distinct edge set against its swapped projection — same key
    domain, so AQE reuses the exchange — and every count is a
    combinable groupBy. The out/in/reciprocal frames merge on the node
    key via outer joins (each side ≤ |V|). Nodes with no outgoing
    edges report out_deg 0 and reciprocity 0.0; the one division
    IEEE-rounds identically everywhere.
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).filter(F.col("_s") != F.col("_d")).distinct()
    rev = e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    recip = e.join(rev, ["_s", "_d"], "left_semi")
    outd = e.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("out_deg"))
    ind = e.groupBy(F.col("_d").alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg")
    )
    rc = recip.groupBy("_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_reciprocal")
    )
    base = (
        outd.join(ind, "_s", "full_outer")
        .join(rc, "_s", "left")
        .select(
            F.col("_s").alias("node"),
            F.coalesce(F.col("out_deg"), F.lit(0).cast("long")).alias("out_deg"),
            F.coalesce(F.col("in_deg"), F.lit(0).cast("long")).alias("in_deg"),
            F.coalesce(F.col("n_reciprocal"), F.lit(0).cast("long")).alias(
                "n_reciprocal"
            ),
        )
    )
    return base.select(
        "node",
        "out_deg",
        "in_deg",
        "n_reciprocal",
        F.when(
            F.col("out_deg") > 0,
            F.round(F.col("n_reciprocal") / F.col("out_deg"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("reciprocity"),
    )


def crawl_frontier_schedule(
    urls: DataFrame,
    url_col: str,
    host_col: str,
    priority_col: str,
    slots_per_round: int = 1,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: within each host,
    rank URLs by (priority DESC, url ASC — deterministic) and assign
    fetch_round = ceil(rank / slots_per_round), so no host is hit more
    than ``slots_per_round`` times per round regardless of how many of
    its URLs are queued — the per-host rate cap every large crawler
    enforces (a frontier sorted by global priority alone hammers one
    host with its million best-scored URLs).

    Scale shape: ONE window partitioned by the host key — the natural
    shuffle key; a mega-host's partition is the documented hot spot
    and is bounded by frontier-per-host caps upstream, not by salting
    (the rank must be globally consistent within the host). Integer
    rank arithmetic only. Returns (url, host, rank_in_host,
    fetch_round).
    """
    if slots_per_round < 1:
        raise ValueError(f"slots_per_round must be ≥ 1, got {slots_per_round}")
    from pyspark.sql import Window as W

    w = W.partitionBy(F.col(host_col)).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    rk = F.row_number().over(w)
    s = F.lit(int(slots_per_round))
    return urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        rk.alias("rank_in_host"),
        (F.floor((rk + s - 1) / s)).cast("long").alias("fetch_round"),
    )
