"""Unit tests for gopher_quality_flags and zipf_slope on constructed
fixtures where every rule branch fires."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg_microbe_spark.operators.heavyhitters import zipf_slope
from kg_microbe_spark.operators.quality_rules import gopher_quality_flags


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df, "doc_id", "text", **kw).collect()[0]


def test_gopher_all_rules_pass(spark):
    text = "the cat and dog ran " * 12  # 60 words, stopwords present
    r = _flags(spark, text)
    assert r["n_words"] == 60 and r["passes"]


def test_gopher_word_count_bounds(spark):
    r = _flags(spark, "the and word list here")
    assert not r["flag_word_count"] and not r["passes"]
    assert r["flag_stopwords"]  # 'the' + 'and'


def test_gopher_mean_word_len_bounds(spark):
    # all 1-char words -> mean 1 < 3
    short = " ".join(["a"] * 60)
    assert not _flags(spark, short)["flag_mean_word_len"]
    # all 12-char words -> mean 12 > 10
    long_ = " ".join(["abcdefghijkl"] * 60)
    assert not _flags(spark, long_)["flag_mean_word_len"]


def test_gopher_alpha_fraction_integer_exact(spark):
    # 8 alpha of 10 words == exactly 80% -> passes (>=, not >)
    text = "the of cat dog bird fish cow hen 123 456"
    r = _flags(spark, text)
    assert r["n_words"] == 10 and r["n_alpha_words"] == 8
    assert r["flag_alpha_words"]
    # 7 of 10 fails
    r2 = _flags(spark, "the of cat dog bird fish cow 12 34 56")
    assert not r2["flag_alpha_words"]


def test_gopher_symbols_hash_and_ellipsis(spark):
    # 60 words, 7 symbols (4 '#' + 3 '...') -> 11.67% > 10% -> fail
    body = "the cat and dog ran " * 12
    r = _flags(spark, body + "#### ... ... ...")
    assert r["n_symbols"] == 7 and not r["flag_symbols"]
    # 6 symbols of 60+6... words: recompute exact counts from the row
    r2 = _flags(spark, body + "### ... ... ")
    assert r2["n_symbols"] == 5
    assert 100 * r2["n_symbols"] <= 10 * r2["n_words"]
    assert r2["flag_symbols"]


def test_gopher_stopword_distinct_hits(spark):
    # 'the' repeated 60 times is ONE distinct hit -> fails min 2
    r = _flags(spark, " ".join(["the"] * 60))
    assert r["stop_hits"] == 1 and not r["flag_stopwords"]


def test_zipf_slope_exact_power_law(spark):
    # counts = round(1000 / rank): a perfect slope -1 corpus (up to the
    # 1e-6 integerization grid). 8 types, type i repeated 1000//(i+1).
    rows = []
    for i in range(8):
        tok = f"t{i:02d}"
        rows.extend((j, tok) for j in range(1000 // (i + 1)))
    df = (
        spark.createDataFrame(rows, "i long, text string")
        .groupBy("i")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
    )
    out = zipf_slope(df, "text", top_n=8).collect()[0]
    assert out["n_terms"] == 8
    # expected slope from the same integerized coordinates
    xs = [math.floor(math.log(r) * 1e6) for r in range(1, 9)]
    ys = [math.floor(math.log(1000 // r) * 1e6) for r in range(1, 9)]
    n = 8.0
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx = float(sum(a * a for a in xs))
    exp_slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["slope"] == round(exp_slope, 6)
    assert abs(out["slope"] + 1.0) < 0.02  # near the true exponent
    assert out["sx"] == sum(xs) and out["sxy"] == sxy


def test_zipf_slope_degenerate_single_rank_guard(spark):
    # top_n=2 but the corpus has ONE type: denom = n*sxx - sx² with a
    # single point is 0 -> slope/intercept NULL, moments still exact.
    df = spark.createDataFrame([(1, "same same same")], "i long, text string")
    out = zipf_slope(df, "text", top_n=2).collect()[0]
    assert out["n_terms"] == 1
    assert out["slope"] is None and out["intercept"] is None
