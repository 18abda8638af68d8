"""salted_join (operators/salting.py), frequent_tokens (operators/
heavyhitters.py), tfidf_top_terms (operators/tfidf.py),
repetition_signals (operators/repetition.py), stratified_hash_sample
(operators/sampling.py)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.heavyhitters import frequent_tokens
from kg_microbe_spark.operators.repetition import repetition_signals
from kg_microbe_spark.operators.salting import salted_join
from kg_microbe_spark.operators.sampling import hash_bucket, stratified_hash_sample
from kg_microbe_spark.operators.tfidf import tfidf_top_terms


# ---------------------------------------------------------------- salted_join


def _facts_dim(spark):
    # hot key 7: 60 of 100 fact rows
    facts = spark.createDataFrame(
        [(i, 7 if i < 60 else i % 5, float(i)) for i in range(100)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(10)], "k long, name string")
    return facts, dim


def test_salted_join_equals_plain_inner(spark):
    facts, dim = _facts_dim(spark)
    for buckets in (1, 4, 16):
        got = {
            (r.row_id, r.name)
            for r in salted_join(facts, dim, ["k"], "row_id", salt_buckets=buckets).collect()
        }
        want = {(r.row_id, r.name) for r in facts.join(dim, on="k").collect()}
        assert got == want, f"buckets={buckets}"


def test_salted_join_left_keeps_unmatched(spark):
    facts, dim = _facts_dim(spark)
    sparse_dim = dim.filter(F.col("k") < 3)
    got = {
        (r.row_id, r.name)
        for r in salted_join(facts, sparse_dim, ["k"], "row_id", 8, how="left").collect()
    }
    want = {(r.row_id, r.name) for r in facts.join(sparse_dim, on="k", how="left").collect()}
    assert got == want
    assert any(name is None for _, name in got)  # unmatched fact rows survive


def test_salted_join_spreads_hot_key(spark):
    facts, dim = _facts_dim(spark)
    # the salt column the join adds must take >1 value for the hot key
    salted = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("row_id").cast("string")), F.lit(8))
    )
    n_salts = salted.filter("k = 7").select("_salt").distinct().count()
    assert n_salts > 1
    # and the dim replicas cover every salt value exactly once per key
    out = salted_join(facts, dim, ["k"], "row_id", 8)
    assert out.count() == facts.join(dim, on="k").count()


def test_salted_join_rejects_ambiguous_and_outer(spark):
    facts, dim = _facts_dim(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dim, ["k"], "row_id", 4, how="full")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(facts, dim.withColumnRenamed("name", "v"), ["k"], "row_id", 4)


# ------------------------------------------------------------ frequent_tokens


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_frequent_tokens_exact(spark):
    texts = [
        "apple banana apple cherry apple",
        "banana cherry banana durian",
        "apple elderberry fig grape",
    ]
    exact = Counter(w for t in texts for w in t.split())
    docs = _docs(spark, texts)
    for min_count in (2, 3):
        got = {(r.token, r.n) for r in frequent_tokens(docs, "text", min_count, capacity=64).collect()}
        want = {(tok, n) for tok, n in exact.items() if n >= min_count}
        assert got == want, f"min_count={min_count}"


def test_frequent_tokens_capacity_guard(spark):
    # 3 docs × 5 tokens = 15 total; capacity 2, min_count 2 → 2*2 < 15
    docs = _docs(spark, ["a b c d e", "f g h i j", "k l m n o"])
    with pytest.raises(ValueError, match="cannot guarantee"):
        frequent_tokens(docs, "text", 2, capacity=2)


def test_frequent_tokens_superset_survives_adversarial_partitions(spark):
    # heavy token interleaved with unique junk across many partitions
    texts = [f"junk{i}a junk{i}b hot junk{i}c" for i in range(200)]
    docs = _docs(spark, texts).repartition(16)
    got = {(r.token, r.n) for r in frequent_tokens(docs, "text", 150, capacity=1024).collect()}
    assert got == {("hot", 200)}


# ------------------------------------------------------------ tfidf_top_terms


def test_tfidf_matches_python(spark):
    texts = [
        "spark spark hadoop data",
        "data data data lake",
        "spark lake lake delta",
    ]
    docs = _docs(spark, texts)
    out = tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    n = len(texts)
    tfs = [Counter(t.split()) for t in texts]
    dfs = Counter(tok for tf in tfs for tok in tf)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
        expect = tfs[r.doc_id][r.token] * (math.log((n + 1) / (dfs[r.token] + 1)) + 1)
        assert r.tf == tfs[r.doc_id][r.token] and r.df == dfs[r.token]
        assert abs(r.tfidf - expect) < 1e-12
    for doc_id, rows in by_doc.items():
        assert len(rows) == 2
        # top-2 by (tf desc, df asc, token asc)
        ranked = sorted(tfs[doc_id], key=lambda t: (-tfs[doc_id][t], dfs[t], t))[:2]
        assert sorted(r.token for r in rows) == sorted(ranked)


# --------------------------------------------------------- repetition_signals


def test_repetition_signals_values(spark):
    docs = _docs(spark, ["a a a b", "x y z", "solo"])
    got = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    r0 = got[0]
    assert r0.n_tokens == 4
    assert r0.distinct_ratio == pytest.approx(2 / 4)
    assert r0.top_token_share == pytest.approx(3 / 4)
    assert r0.dup_token_share == pytest.approx(3 / 4)
    assert r0.top_bigram_share == pytest.approx(2 / 3)  # "a a" twice of 3 bigrams
    r1 = got[1]
    assert r1.distinct_ratio == 1.0 and r1.dup_token_share == 0.0
    assert r1.top_bigram_share == pytest.approx(1 / 2)  # all bigrams unique
    r2 = got[2]
    assert r2.n_tokens == 1 and r2.top_bigram_share == 0.0  # no bigrams


def test_repetition_signals_empty_doc_dropped(spark):
    docs = _docs(spark, ["", "a b"])
    assert repetition_signals(docs, "doc_id", "text").count() == 1


# ------------------------------------------------------ stratified_hash_sample


def test_stratified_sample_deterministic_per_stratum(spark):
    rows = [(f"k{i}", ["en", "de", "fr"][i % 3]) for i in range(900)]
    df = spark.createDataFrame(rows, "k string, lang string")
    fr = {"en": 1.0, "de": 0.5, "fr": 0.0}
    got = {r.k for r in stratified_hash_sample(df, "k", "lang", fr).collect()}
    buckets = {
        r.k: r.b for r in df.withColumn("b", hash_bucket(F.col("k"))).collect()
    }
    want = {
        k
        for k, lang in rows
        if buckets[k] < int(fr[lang] * 10000)
    }
    assert got == want
    assert all(lang != "fr" for k, lang in rows if k in got)
    # unlisted strata use default_fraction
    df2 = spark.createDataFrame([("a", "xx"), ("b", "en")], "k string, lang string")
    assert {r.k for r in stratified_hash_sample(df2, "k", "lang", {"en": 1.0}).collect()} == {"b"}
    got_all = stratified_hash_sample(df2, "k", "lang", {"en": 1.0}, default_fraction=1.0)
    assert got_all.count() == 2


def test_stratified_sample_nested_when_fraction_grows(spark):
    df = spark.createDataFrame([(f"k{i}", "en") for i in range(500)], "k string, lang string")
    small = {r.k for r in stratified_hash_sample(df, "k", "lang", {"en": 0.2}).collect()}
    big = {r.k for r in stratified_hash_sample(df, "k", "lang", {"en": 0.6}).collect()}
    assert small <= big
