"""Unit tests for flesch_scores, assoc_rules, percentile_normalize."""

from __future__ import annotations

from kg_microbe_spark.operators.calibration import percentile_normalize
from kg_microbe_spark.operators.collocations import assoc_rules
from kg_microbe_spark.operators.quality_rules import flesch_scores


def test_flesch_counts_and_score(spark):
    # "the cat sat. it ran!" -> 5 words, 2 sentence runs, 5 vowel runs
    df = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, ""), (3, "no terminators here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in flesch_scores(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    exp = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert r1["flesch"] == round(exp, 6)
    assert out[2]["flesch"] is None  # empty doc
    assert out[3]["n_sentences"] == 1  # max(1, 0 runs) floor


def test_assoc_rules_counts_confidence_lift(spark):
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
        (5, "w"),  # lone item, never in a pair
        (1, "x"),  # duplicate (basket,item) must collapse
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in assoc_rules(df, "b", "i", min_pair_count=1).collect()
    }
    r = out[("x", "y")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["support"] == round(2 / 5, 6)
    assert r["conf_a_to_b"] == round(2 / 3, 6)
    assert r["conf_b_to_a"] == round(2 / 3, 6)
    assert r["lift"] == round(5 * 2 / 9, 6)
    assert ("x", "z") in out and len(out) == 2


def test_assoc_rules_hub_guard_and_min_count(spark):
    rows = [(b, "hub") for b in range(10)] + [
        (0, "a"), (1, "a"), (0, "b"), (1, "b"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = assoc_rules(
        df, "b", "i", min_pair_count=2, max_item_frequency=5
    ).collect()
    # hub (freq 10) removed BEFORE the join; only (a,b) with n_ab=2 remains
    assert [(r["item_a"], r["item_b"], r["n_ab"]) for r in out] == [("a", "b", 2)]


def test_percentile_normalize_ties_and_singleton(spark):
    rows = [
        ("s1", 10), ("s1", 20), ("s1", 20), ("s1", 40),
        ("s2", 7),
    ]
    df = spark.createDataFrame(rows, "src string, v long")
    out = percentile_normalize(df, "src", "v").collect()
    got = sorted((r["src"], r["v"], r["pct"]) for r in out)
    third = round(1 / 3, 6)
    assert got == [
        ("s1", 10, 0.0),
        ("s1", 20, third),  # tied values share the rank-based pct
        ("s1", 20, third),
        ("s1", 40, 1.0),
        ("s2", 7, 0.0),     # single-row group
    ]
