"""TF-IDF sparse cosine self-join and exponential decay aggregation."""

import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.temporal import decay_sum
from kg_microbe_spark.operators.tfidf import COSINE_SCALE, tfidf_cosine_pairs


def _w(tf, df, n):
    return math.floor(COSINE_SCALE * tf * (math.log((n + 1) / (df + 1)) + 1))


# ------------------------------------------------------------ tfidf cosine
def test_cosine_identical_partial_and_stop_guard(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry common"),
            (2, "apple banana cherry common"),
            (3, "dog emu fox common"),
            (4, "apple zebra common"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", min_cosine=0.05, max_doc_frequency=3
        ).collect()
    }
    # 'common' (df=4 > 3) is guarded out, so doc 3 shares nothing
    assert not any(3 in p for p in out)
    assert out[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    # replicate the integer arithmetic for the (1,4) pair
    n = 4
    wa_apple = _w(1, 3, n)
    wa_other = _w(1, 2, n)  # banana, cherry
    w4_apple = _w(1, 3, n)
    w4_zebra = _w(1, 1, n)
    na = math.sqrt(wa_apple**2 + 2 * wa_other**2)
    nb = math.sqrt(w4_apple**2 + w4_zebra**2)
    expect = round(wa_apple * w4_apple / (na * nb), 6)
    assert out[(1, 4)] == pytest.approx(expect, abs=1e-6)
    assert 0.0 < out[(1, 4)] < 1.0


def test_cosine_min_threshold_filters(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a q r s t u v w")],
        "doc_id int, text string",
    )
    # one shared term of eight -> low cosine, filtered at 0.5
    assert (
        tfidf_cosine_pairs(docs, "doc_id", "text", min_cosine=0.5).count() == 0
    )
    low = tfidf_cosine_pairs(docs, "doc_id", "text", min_cosine=0.01).collect()
    assert len(low) == 1 and low[0].cosine < 0.5


# -------------------------------------------------------------- decay sum
def test_decay_sum_matches_reference_arithmetic(spark):
    half = 7 * 86400.0
    ref = "2024-01-08 00:00:00"
    rows = [
        ("k", "2024-01-01 00:00:00", 2.0),  # age = one half-life -> ~1.0
        ("k", "2024-01-08 00:00:00", 3.0),  # age 0 -> exactly 3.0
        ("j", "2024-01-04 12:00:00", 4.0),  # age = half a half-life
    ]
    ev = spark.createDataFrame(rows, "k string, ts_s string, v double").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r.k: r
        for r in decay_sum(ev, "k", "ts", ref, half, weight_col="v").collect()
    }
    c = -math.log(2.0) / (half * 1e6)

    def contrib(age_s, w):
        return math.floor(1e9 * w * math.exp(age_s * 1e6 * c))

    assert out["k"].n_events == 2
    assert out["k"].decayed_sum == pytest.approx(
        round((contrib(7 * 86400, 2.0) + contrib(0, 3.0)) / 1e9, 6), abs=1e-9
    )
    assert out["j"].decayed_sum == pytest.approx(
        round(contrib(3.5 * 86400, 4.0) / 1e9, 6), abs=1e-9
    )
    # age 0 is exact; one half-life halves
    assert out["k"].decayed_sum == pytest.approx(2.0 * 0.5 + 3.0, abs=1e-6)
