"""URL canonicalization for web-crawl corpora.

A Common-Crawl-scale pipeline dedups and groups by URL constantly; raw
crawl URLs differ in case, default ports, fragments, tracking params and
query-param order while naming the same resource. The reference has no
analog (curated ontology inputs), so this is one of the LLM-data
operators the task brief adds as first-class.

Spark-first shape: every function here is a pure JVM Column expression
(regexp capture + higher-order array filter/sort) — one whole-stage-
codegen projection, no shuffle, no Python boundary. At 100 TB this rides
for free on whatever scan already reads the url column, and the
canonical form it emits is exactly the key the url-dedup stage
(operators/extract.py dedup_latest_by_url) wants to group on.

Canonicalization contract (documented, not configurable):
  1. fragment (#...) dropped;
  2. scheme and authority lowercased (path/query case is significant);
  3. default ports stripped (http:80, https:443);
  4. tracking params removed (utm_*, gclid, fbclid, msclkid);
  5. surviving query params sorted lexicographically (byte order);
  6. empty path before a query/end becomes "/".
Registered-domain extraction uses a frozen multi-part-suffix list
(PSL-style; the full Public Suffix List is a data file a deployment
would broadcast — the when-chain shape is identical at any list size).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Params stripped by rule 4 — anchored key match before '='.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

# Frozen two-label public suffixes; real deployments broadcast the PSL.
MULTI_PART_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp", "com.br")

_AUTHORITY_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def host_col(url: Column) -> Column:
    """Lowercased host (authority minus userinfo and port)."""
    auth = F.regexp_extract(url, _AUTHORITY_RE, 2)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def registered_domain_col(url: Column) -> Column:
    """eTLD+1 under the frozen suffix list: last two host labels, or last
    three when the last two form a multi-part suffix (co.uk, ...)."""
    host = host_col(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    multi = last2.isin(*MULTI_PART_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(multi & (n >= 3), last3)
        .otherwise(last2)
    )


def normalize_url_col(url: Column) -> Column:
    """Apply the 6-rule canonicalization contract; see module docstring."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _AUTHORITY_RE, 1))
    auth = F.lower(F.regexp_extract(no_frag, _AUTHORITY_RE, 2))
    rest = F.regexp_extract(no_frag, _AUTHORITY_RE, 3)

    strip80 = (scheme == "http") & auth.endswith(":80")
    strip443 = (scheme == "https") & auth.endswith(":443")
    auth = (
        F.when(strip80, F.substring(auth, F.lit(1), F.length(auth) - 3))
        .when(strip443, F.substring(auth, F.lit(1), F.length(auth) - 4))
        .otherwise(auth)
    )

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(rest.contains("?"), F.regexp_extract(rest, r"\?(.*)$", 1)).otherwise(
        F.lit("")
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    params = F.array_sort(params)
    q_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), auth, path, q_part)
