"""URL canonicalization (functions/urls.py) — parity with a pure-Python
reference implementing the same 6-rule contract, plus plan shape."""

import re

from pyspark.sql import functions as F

from kg_microbe_spark.functions.urls import (
    MULTI_PART_SUFFIXES,
    TRACKING_PARAM_RE,
    host_col,
    normalize_url_col,
    registered_domain_col,
)

CASES = [
    "HTTP://WWW.Example.COM:80/Path/To?b=2&utm_source=x&a=1#frag",
    "https://sub.shop.example.co.uk:443/",
    "https://example.org?gclid=abc",
    "http://user:pw@Example.com:8080/x?z=1&y=2&y=1",
    "https://a.b.c.example.com/deep/path/",
    "http://localhost/",
    "https://example.co.uk",
    "http://example.com:80?utm_medium=m&utm_campaign=c",
    "https://x.io/CaseSensitive/Path?A=1&a=2",
    "http://example.com/p?fbclid=1&msclkid=2&keep=3",
]


def _py_host(url):
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", url)
    auth = m.group(2).split("@")[-1]
    return auth.split(":")[0].lower()


def _py_domain(url):
    host = _py_host(url)
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in MULTI_PART_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


def _py_normalize(url):
    no_frag = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", no_frag)
    scheme, auth, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    path = rest.split("?")[0] or "/"
    query = rest.split("?", 1)[1] if "?" in rest else ""
    params = sorted(
        p for p in query.split("&") if p and not re.match(TRACKING_PARAM_RE, p)
    )
    return scheme + "://" + auth + path + ("?" + "&".join(params) if params else "")


def test_url_functions_match_python(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(CASES)], "i long, url string"
    )
    u = F.col("url")
    rows = {
        r.i: r
        for r in df.select(
            "i",
            host_col(u).alias("host"),
            registered_domain_col(u).alias("domain"),
            normalize_url_col(u).alias("norm"),
        ).collect()
    }
    for i, url in enumerate(CASES):
        r = rows[i]
        assert r.host == _py_host(url), (url, r.host)
        assert r.domain == _py_domain(url), (url, r.domain)
        assert r.norm == _py_normalize(url), (url, r.norm)


def test_url_normalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    once = df.select(normalize_url_col(F.col("url")).alias("url"))
    twice = once.select(normalize_url_col(F.col("url")).alias("url"))
    assert sorted(r.url for r in once.collect()) == sorted(
        r.url for r in twice.collect()
    )


def test_url_normalize_no_shuffle(spark):
    df = spark.createDataFrame([("http://a.io/",)], "url string")
    plan = (
        df.select(normalize_url_col(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
