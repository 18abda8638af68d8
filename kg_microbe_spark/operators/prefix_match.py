"""Longest-prefix rule matching (robots.txt / URL-policy routing).

A crawl pipeline carries a rule table ("under this URL prefix: allow /
deny / assign source X") and must attribute every fetched URL to its
MOST SPECIFIC (longest) matching rule — the string analog of CIDR
longest-prefix routing. The reference routes xrefs by CURIE prefix
with a when-chain over a small literal list (functions/normalize.py
compact_curie); this operator is the data-driven form where the rules
are a TABLE (thousands of rules, updated without a redeploy).

Spark-first shape — NOT a LIKE-prefix theta join (which degenerates to
a nested-loop scan of rules per URL): rules are grouped by prefix
LENGTH; for each distinct length l the facts project substr(url, 1, l)
and equi-join the length-l rule slice on exact string equality. The
union over lengths costs |distinct lengths| projections of the fact
table (cheap codegen; one actual scan feeding a union), every join is
a hash equi-join against a broadcast-sized rule side, and the winner
is one combinable max_by aggregation keyed by the fact row — ties are
impossible because two equal-length matching prefixes are the same
string, and rule prefixes are unique.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def longest_prefix_match(
    facts: DataFrame,
    url_col: str,
    rules: DataFrame,
    prefix_col: str,
    rule_lengths: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Left-join each fact row to its longest-prefix rule.

    ``rules`` must be unique on ``prefix_col`` (callers dedup); all its
    non-prefix columns ride along as the matched payload. When
    ``rule_lengths`` is None the distinct lengths are read from the
    rule table with a dimension-side collect (the rules frame is
    dimension-sized by contract — the same guarded-dimension-collect
    pattern as the mention matcher's pattern list); pass the lengths
    explicitly to keep the plan fully static. Unmatched facts keep NULL
    payloads. Output: all fact columns + ``matched_prefix`` + rule
    payload columns.
    """
    payload_cols = [c for c in rules.columns if c != prefix_col]
    r = rules.select(
        F.col(prefix_col).alias("_pfx"),
        F.length(prefix_col).alias("_plen"),
        *[F.col(c) for c in payload_cols],
    )
    if rule_lengths is None:
        rule_lengths = [
            row["_plen"] for row in r.select("_plen").distinct().collect()
        ]
    lengths = sorted({int(x) for x in rule_lengths if int(x) > 0})
    if not lengths:
        raise ValueError("no positive rule lengths")
    # Resolve per DISTINCT url (the distinct collapses map-side), then
    # left-join the winners back — the shuffle key stays the url alone
    # and probe fan-out is |lengths| x |distinct urls|, not x |facts|.
    urls = facts.select(F.col(url_col).alias("_url")).distinct()
    probes = None
    for l in lengths:
        p = urls.filter(F.length("_url") >= l).select(
            "_url",
            F.substring(F.col("_url"), 1, l).alias("_pfx"),
            F.lit(l).alias("_plen"),
        )
        probes = p if probes is None else probes.unionByName(p)
    hits = probes.join(F.broadcast(r), ["_pfx", "_plen"], "inner")
    best = (
        hits.groupBy("_url")
        .agg(
            F.max_by(
                F.struct(
                    F.col("_pfx").alias("matched_prefix"),
                    *[F.col(c) for c in payload_cols],
                ),
                F.col("_plen"),
            ).alias("_w")
        )
        .select(
            "_url",
            F.col("_w.matched_prefix").alias("matched_prefix"),
            *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
        )
    )
    return facts.join(
        best, facts[url_col] == best["_url"], "left"
    ).drop("_url")
