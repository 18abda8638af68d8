"""Sharded mention scan == single-broadcast scan (exact parity), plus the
lexicon-size guard. The sharding is only correct because leftmost-longest
resolution happens AFTER the shard union — these tests pin that."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.functions.automaton import build_matcher, find_mentions_bruteforce
from kg_microbe_spark.operators.mentions import (
    LexiconTooLargeError,
    scan_mentions,
    scan_mentions_sharded,
)

PATTERNS = [
    "escherichia coli",
    "escherichia",
    "coli",
    "forest soil",
    "soil",
    "heat stress",
    "glucose",
]

TEXTS = [
    "escherichia coli grows in forest soil under heat stress",
    "soil bacteria love glucose and glucose again",
    "the escherichia coli escherichia coli pair",
    "",
    "nothing relevant here",
]


def _index_df(spark):
    return spark.createDataFrame([(p,) for p in PATTERNS], "term_norm string")


def _pages_df(spark):
    return spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(TEXTS)], "url string, text string"
    )


def _as_set(df):
    return {(r.url, r.start, r.end, r.surface) for r in df.collect()}


def test_sharded_equals_plain(spark):
    pages, idx = _pages_df(spark), _index_df(spark)
    plain = _as_set(scan_mentions(pages, idx))
    for shards in (2, 3, 7):
        assert _as_set(scan_mentions_sharded(pages, idx, shards=shards)) == plain
    assert plain  # non-trivial fixture


def test_candidates_resolution_matches_bruteforce():
    """find_candidates + global greedy == find_mentions == brute force,
    including when candidates come from disjoint pattern shards."""
    m = build_matcher(PATTERNS)
    for text in TEXTS:
        expected = find_mentions_bruteforce(text, PATTERNS)
        assert m.find_mentions(text) == expected
        # merge per-shard candidates, resolve globally
        shard_a = build_matcher([p for p in PATTERNS if hash(p) % 2 == 0])
        shard_b = build_matcher([p for p in PATTERNS if hash(p) % 2 == 1])
        cands = sorted(
            shard_a.find_candidates(text) + shard_b.find_candidates(text),
            key=lambda t: (t[0], -t[1]),
        )
        out, pos = [], -1
        for s, e, surf in cands:
            if s < pos:
                continue
            out.append((s, e, surf))
            pos = e
        assert out == expected


def test_lexicon_guard_raises(spark):
    pages, idx = _pages_df(spark), _index_df(spark)
    with pytest.raises(LexiconTooLargeError, match="scan_mentions_sharded"):
        scan_mentions(pages, idx, max_broadcast_patterns=3)
    # bypass is explicit
    assert scan_mentions(pages, idx, max_broadcast_patterns=None).count() > 0


def test_passthrough_cols_carry_event_time(spark):
    """The ONE matcher-scan implementation serves streaming too:
    passthrough_cols appends input columns (typed from the input schema)
    per match — warc_ts here, exactly what windowed counts need."""
    import datetime

    idx = _index_df(spark)
    rows = [
        (f"u{i}", t, datetime.datetime(2026, 1, 1, i, 0, 0))
        for i, t in enumerate(TEXTS)
    ]
    pages = spark.createDataFrame(rows, "url string, text string, warc_ts timestamp")
    out = scan_mentions(pages, idx, passthrough_cols=("warc_ts",))
    assert out.columns == ["url", "surface", "term_norm", "start", "end", "warc_ts"]
    assert dict(out.dtypes)["warc_ts"] == "timestamp"
    got = out.collect()
    assert got  # non-trivial
    ts_by_url = {r[0]: r[2] for r in rows}
    for r in got:
        assert r.warc_ts == ts_by_url[r.url]  # per-match value = its row's
    # plain scan over the same pages == passthrough scan minus the column
    plain = _as_set(scan_mentions(pages.select("url", "text"), idx))
    assert {(r.url, r.start, r.end, r.surface) for r in got} == plain


def test_surface_equals_term_norm_contract(spark):
    """Honesty contract (schemas.MENTIONS_SCHEMA): matching runs on
    normalized text, so surface == term_norm and offsets index the
    NORMALIZED text — pinned so a future raw-surface change is deliberate."""
    from kg_microbe_spark.functions.normalize import normalize_name_py

    pages = spark.createDataFrame(
        [("u0", "Escherichia   COLI, in Forest-Soil!")], "url string, text string"
    )
    rows = scan_mentions(pages, _index_df(spark)).collect()
    assert rows
    norm = normalize_name_py("Escherichia   COLI, in Forest-Soil!")
    for r in rows:
        assert r.surface == r.term_norm  # normalized span, not raw bytes
        assert norm[r.start : r.end] == r.surface  # offsets → normalized text
