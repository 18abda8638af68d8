"""Dunning LLR collocations, Kneser-Ney bigram smoothing, n-gram novelty."""

import math

import pytest

from kg_microbe_spark.operators.collocations import llr_bigrams
from kg_microbe_spark.operators.dedup import ngram_novelty
from kg_microbe_spark.operators.lm_quality import kneser_ney_bigram


def _xlogx(k):
    return k * math.log(k) if k > 0 else 0.0


def test_llr_hand_computed(spark):
    # corpus bigrams: ("hot","dog")×3, ("hot","day")×1, ("cold","dog")×1
    rows = [("hot dog",)] * 3 + [("hot day",), ("cold dog",)]
    df = spark.createDataFrame(rows, "text string")
    out = {(r.w1, r.w2): (r.n, r.llr) for r in llr_bigrams(df, "text", 1).collect()}
    k11, r1, c1, n = 3, 4, 4, 5
    k12, k21 = r1 - k11, c1 - k11
    k22 = n - r1 - k21
    llr = 2 * (
        _xlogx(k11) + _xlogx(k12) + _xlogx(k21) + _xlogx(k22)
        - _xlogx(r1) - _xlogx(n - r1) - _xlogx(c1) - _xlogx(n - c1)
        + _xlogx(n)
    )
    got_n, got_llr = out[("hot", "dog")]
    assert got_n == 3
    assert abs(got_llr - round(llr, 6)) < 1e-9


def test_llr_min_count_filters_output_not_marginals(spark):
    rows = [("hot dog",)] * 3 + [("hot day",)]
    df = spark.createDataFrame(rows, "text string")
    out = llr_bigrams(df, "text", min_count=2).collect()
    # ("hot","day") n=1 filtered, but it still contributed to c("hot ·")=4
    assert len(out) == 1 and out[0].n == 3
    k11, r1, c1, n = 3, 4, 3, 4
    k12, k21 = r1 - k11, c1 - k11
    k22 = n - r1 - k21
    llr = 2 * (
        _xlogx(k11) + _xlogx(k12) + _xlogx(k21) + _xlogx(k22)
        - _xlogx(r1) - _xlogx(n - r1) - _xlogx(c1) - _xlogx(n - c1)
        + _xlogx(n)
    )
    assert abs(out[0].llr - round(llr, 6)) < 1e-9


def test_llr_independent_pair_is_zero(spark):
    # perfectly independent 2x2 table: k11=1,k12=1,k21=1,k22=1 → LLR = 0
    rows = [("a x",), ("a y",), ("b x",), ("b y",)]
    df = spark.createDataFrame(rows, "text string")
    out = {(r.w1, r.w2): r.llr for r in llr_bigrams(df, "text", 1).collect()}
    assert out[("a", "x")] == 0.0


def test_llr_rejects_bad_min_count(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        llr_bigrams(df, "text", min_count=0)


def test_kneser_ney_hand_computed(spark):
    # bigrams: (san,francisco)×2, (new,york)×1, (new,francisco)×1
    rows = [("san francisco",)] * 2 + [("new york",), ("new francisco",)]
    df = spark.createDataFrame(rows, "text string")
    out = {(r.w1, r.w2): r.p_kn for r in kneser_ney_bigram(df, "text").collect()}
    d, bt = 0.75, 3  # 3 distinct bigram types
    # (san, francisco): c=2, cv=2, n1v=1, n1w(francisco)=2 preceders
    p = max(2 - d, 0) / 2 + (d * 1 / 2) * (2 / bt)
    assert abs(out[("san", "francisco")] - round(p, 6)) < 1e-9
    # (new, york): c=1, cv=2, n1v=2, n1w(york)=1
    p = max(1 - d, 0) / 2 + (d * 2 / 2) * (1 / bt)
    assert abs(out[("new", "york")] - round(p, 6)) < 1e-9


def test_kneser_ney_rows_sum_below_one_per_context(spark):
    # Σ_w p_KN(w|v) over OBSERVED w must be ≤ 1 (remainder goes to unseen)
    rows = [("a x",), ("a y",), ("a x",), ("b x",)]
    df = spark.createDataFrame(rows, "text string")
    out = kneser_ney_bigram(df, "text").collect()
    by_ctx = {}
    for r in out:
        by_ctx.setdefault(r.w1, 0.0)
        by_ctx[r.w1] += r.p_kn
    assert all(s <= 1.0 + 1e-9 for s in by_ctx.values())


def test_kneser_ney_rejects_bad_discount(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        kneser_ney_bigram(df, "text", discount=1.0)


def test_ngram_novelty_disjoint_docs_fully_novel(spark):
    rows = [(1, "a b c d"), (2, "e f g h")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in ngram_novelty(df, "doc_id", "text", 3).collect()}
    assert out[1].n_grams == 2 and out[1].n_dup == 0 and out[1].novelty == 1.0


def test_ngram_novelty_exact_copy_fully_dup(spark):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "z z z")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in ngram_novelty(df, "doc_id", "text", 3).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0


def test_ngram_novelty_partial_overlap(spark):
    # doc 2 shares exactly one trigram ("b c d") with doc 1
    rows = [(1, "a b c d"), (2, "b c d e")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in ngram_novelty(df, "doc_id", "text", 3).collect()}
    assert out[1].n_dup == 1 and out[1].novelty == 0.5


def test_ngram_novelty_short_docs_drop(spark):
    rows = [(1, "a b"), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = ngram_novelty(df, "doc_id", "text", 3).collect()
    assert [r.doc_id for r in out] == [2]


def test_ngram_novelty_within_doc_repeat_not_dup(spark):
    # the same trigram twice INSIDE one doc is not cross-corpus duplication
    rows = [(1, "a b a b a b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = ngram_novelty(df, "doc_id", "text", 3).collect()[0]
    assert out.n_grams == 2 and out.n_dup == 0  # "a b a", "b a b" distinct
