"""Truth-discovery reliability/consensus (operators/reliability.py)
and BPE pair statistics (operators/bpe.py)."""

import pytest

from kg_microbe_spark.operators.bpe import bpe_pair_candidates
from kg_microbe_spark.operators.reliability import (
    source_reliability,
    weighted_consensus,
)


def _claims(spark):
    rows = []
    # s_good agrees with the majority everywhere; s_bad contradicts.
    for k in range(4):
        rows += [
            ("s_good", f"c{k}", "v1"),
            ("s_mid", f"c{k}", "v1" if k < 2 else "v2"),
            ("s_bad", f"c{k}", "v2"),
        ]
    # duplicate restatement must not count twice
    rows.append(("s_bad", "c0", "v2"))
    return spark.createDataFrame(rows, "source string, claim string, value string")


def test_source_reliability_agreement_pct(spark):
    out = {r.source: r for r in source_reliability(_claims(spark)).collect()}
    # majority per claim: v1 wins c0,c1 (2v1 vs 1v2); c2,c3 tie 1.5? —
    # c2/c3 have v1(s_good), v2(s_mid,s_bad) → majority v2
    assert (out["s_good"].n_claims, out["s_good"].n_agree) == (4, 2)
    assert out["s_good"].reliability_pct == 50
    assert (out["s_bad"].n_claims, out["s_bad"].n_agree) == (4, 2)
    assert out["s_mid"].reliability_pct == 100


def test_weighted_consensus_winner_and_tiebreak(spark):
    out = {r.claim: (r.value, r.weight) for r in weighted_consensus(_claims(spark)).collect()}
    # weights: s_good 50, s_mid 100, s_bad 50
    # c0: v1 = 50+100 = 150, v2 = 50 → v1
    assert out["c0"] == ("v1", 150)
    # c2: v1 = 50, v2 = 100+50 = 150 → v2
    assert out["c2"] == ("v2", 150)


def test_consensus_tie_smaller_value(spark):
    claims = spark.createDataFrame(
        [("a", "c", "x"), ("b", "c", "y")],
        "source string, claim string, value string",
    )
    # min_claims=1: majorities tie x/y → smaller 'x'; a agrees (100),
    # b not (0) → weights x=100, y=0
    row = weighted_consensus(claims, min_claims=1).collect()[0]
    assert (row.value, row.weight) == ("x", 100)


def test_consensus_min_claims_floor(spark):
    claims = spark.createDataFrame(
        # s1/s2 assert 2 claims each; s_once asserts only k_solo
        [("s1", "k1", "a"), ("s1", "k2", "a"),
         ("s2", "k1", "a"), ("s2", "k2", "b"),
         ("s_once", "k_solo", "z")],
        "source string, claim string, value string",
    )
    out = {r.claim: (r.value, r.weight) for r in weighted_consensus(claims).collect()}
    # floor-excluded singleton still surfaces, at weight 0
    assert out["k_solo"] == ("z", 0)
    # s1 agrees with majority on both (100), s2 on k1 only (50)
    assert out["k1"] == ("a", 150)
    assert out["k2"] == ("a", 100)


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    docs = spark.createDataFrame(
        [("ab ab ab cd",), ("ab cd x",)], "text string"
    )
    out = {(r.left, r.right): (r.rank, r.n) for r in
           bpe_pair_candidates(docs, "text", top_k=10).collect()}
    # words: ab×4, cd×2, x×1 (dropped, len<2)
    assert out[("a", "b")] == (1, 4)
    assert out[("c", "d")] == (2, 2)
    assert len(out) == 2


def test_bpe_rank_tiebreak_and_topk(spark):
    docs = spark.createDataFrame([("zz aa zz aa",)], "text string")
    rows = bpe_pair_candidates(docs, "text", top_k=1).collect()
    # ('a','a') and ('z','z') both n=2 → tie breaks on pair asc
    assert [(r.rank, r.left, r.right) for r in rows] == [(1, "a", "a")]
    with pytest.raises(ValueError):
        bpe_pair_candidates(docs, "text", top_k=0)


def test_bpe_multichar_word_internal_pairs(spark):
    docs = spark.createDataFrame([("abc abc",)], "text string")
    out = {(r.left, r.right): r.n for r in
           bpe_pair_candidates(docs, "text").collect()}
    assert out == {("a", "b"): 2, ("b", "c"): 2}
