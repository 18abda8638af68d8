"""Unit tests for skeleton-key blocking, Fellegi–Sunter scoring, and
blocking metrics (operators/entity_resolution.py round-5 additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg_microbe_spark.operators.entity_resolution import (
    blocking_metrics,
    fellegi_sunter_scores,
    skeleton_blocking_pairs,
    skeleton_key,
)


def _keys(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return [
        r["k"] for r in df.select(skeleton_key(F.col("name")).alias("k")).collect()
    ]


def test_skeleton_key_vowel_and_case_invariant(spark):
    ks = _keys(spark, ["Acme Corporation", "acm corpratin", "ACME-CORP 99"])
    assert ks[0] == ks[1] == "acmcrp"
    assert ks[2] == "acmcrp"  # truncation to 6


def test_skeleton_key_keeps_leading_vowel(spark):
    assert _keys(spark, ["omega"]) == ["omg"]


def test_skeleton_blocking_pairs_cap_excludes_hot_block(spark):
    rows = [(i, "hot name") for i in range(5)] + [
        (10, "cold stem"),
        (11, "cald stam"),  # same skeleton as cold stem
        (12, "unique one"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = skeleton_blocking_pairs(
        df, "id", "name", max_block_size=4
    ).collect()
    # the 5-row hot block (10 pairs) is dropped; only (10, 11) survives
    assert [(r["id_a"], r["id_b"]) for r in got] == [(10, 11)]


def test_fellegi_sunter_agreement_and_nulls(spark):
    rows = [
        (1, 2, "x", "x", "c1", "c1"),     # both agree
        (3, 4, "x", "y", "c1", "c1"),     # name disagrees
        (5, 6, "x", "x", None, "c1"),     # city null -> contributes 0
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, na string, nb string, ca string, cb string"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["fs_score"], r["is_match"])
        for r in fellegi_sunter_scores(
            df,
            [("na", "nb", 4_000_000, -500_000), ("ca", "cb", 2_000_000, -1_500_000)],
            threshold_microbits=3_500_000,
        ).collect()
    }
    assert out[(1, 2)] == (6_000_000, True)
    assert out[(3, 4)] == (1_500_000, False)
    assert out[(5, 6)] == (4_000_000, True)


def test_blocking_metrics_known_counts(spark):
    # 6 entities, key = first char: blocks a:3, b:2, c:1
    ents = spark.createDataFrame(
        [(1, "ax"), (2, "ay"), (3, "az"), (4, "bx"), (5, "by"), (6, "cx")],
        "id long, name string",
    )
    # gold: (1,2) same block; (1,6) cross block
    gold = spark.createDataFrame([(1, 2), (1, 6)], "id_a long, id_b long")
    r = blocking_metrics(
        ents, "id", F.substring(F.col("name"), 1, 1), gold
    ).collect()[0]
    assert r["n_entities"] == 6
    assert r["n_candidate_pairs"] == 3 + 1  # C(3,2) + C(2,2)
    assert r["n_total_pairs"] == 15
    assert r["n_gold"] == 2 and r["n_gold_covered"] == 1
    assert r["reduction_ratio"] == round(1 - 4 / 15, 6)
    assert r["pairs_completeness"] == 0.5
