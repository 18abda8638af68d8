"""ROC AUC, degree assortativity, and χ² term–class association."""

import math

from kg_microbe_spark.operators.evaluation import roc_auc
from kg_microbe_spark.operators.stats import degree_assortativity
from kg_microbe_spark.operators.tfidf import chi2_terms


def test_roc_auc_perfect_separation(spark):
    rows = [(s, 1 if s >= 5 else 0) for s in range(10)]
    df = spark.createDataFrame(rows, "s int, y int")
    r = roc_auc(df, "y", "s").collect()[0]
    assert (r.n_pos, r.n_neg) == (5, 5)
    assert r.auc == 1.0


def test_roc_auc_ties_count_half(spark):
    # all scores equal → AUC must be exactly 0.5 via the tie term
    rows = [(7, 1)] * 3 + [(7, 0)] * 5
    df = spark.createDataFrame(rows, "s int, y int")
    r = roc_auc(df, "y", "s").collect()[0]
    assert r.auc_numer_x2 == 3 * 5  # pos*neg tied pairs, counted once
    assert r.auc == 0.5


def test_roc_auc_hand_computed(spark):
    # pos scores {3, 1}, neg scores {2, 0}:
    # pairs: (3>2),(3>0),(1>0) concordant=3, (1<2) discordant=1 → 3/4
    rows = [(3, 1), (1, 1), (2, 0), (0, 0)]
    df = spark.createDataFrame(rows, "s int, y int")
    r = roc_auc(df, "y", "s").collect()[0]
    assert r.auc == 0.75


def test_roc_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "s int, y int")
    r = roc_auc(df, "y", "s").collect()[0]
    assert r.n_neg == 0 and r.auc == 0.0


def test_assortativity_matches_numpy_pearson(spark):
    edges = [
        ("a", "x"), ("a", "y"), ("a", "z"),
        ("b", "x"), ("b", "y"),
        ("c", "x"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(e, "src", "dst").collect()[0]
    # per-edge (out(src), in(dst)) pairs
    xs = [3, 3, 3, 2, 2, 1]
    ys = [3, 2, 1, 3, 2, 3]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(n * sum(x * x for x in xs) - sum(xs) ** 2) * math.sqrt(
        n * sum(y * y for y in ys) - sum(ys) ** 2
    )
    assert r.n_edges == n
    assert abs(r.assortativity - round(num / den, 6)) < 1e-9


def test_assortativity_uniform_degrees_guard(spark):
    # perfect 2-regular bipartite graph → zero variance → guard fires
    edges = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    e = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(e, "src", "dst").collect()[0]
    assert r.assortativity == 0.0


def test_assortativity_dedups_edges(spark):
    e = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y")], "src string, dst string"
    )
    r = degree_assortativity(e, "src", "dst").collect()[0]
    assert r.n_edges == 2 and r.sx == 4  # out-deg 2 on both edges


def test_chi2_hand_computed(spark):
    # 4 docs, 2 classes; token "hot" in both c0 docs, neither c1 doc
    rows = [
        (0, "hot alpha", "c0"),
        (1, "hot beta", "c0"),
        (2, "cold alpha", "c1"),
        (3, "cold beta", "c1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, cls string")
    out = {
        (r.token, r.class_): (r.n_class_with, r.chi2)
        for r in chi2_terms(df, "doc_id", "text", "cls", min_doc_count=1).collect()
    }
    # "hot" ⊥ c0: a=2 b=0 c=0 d=2 → chi2 = 4*(2*2)^2/(2*2*2*2) = 4.0
    assert out[("hot", "c0")] == (2, 4.0)
    assert out[("cold", "c1")] == (2, 4.0)
    # "alpha" is split evenly: a=1 b=1 c=1 d=1 → chi2 = 0
    assert out[("alpha", "c0")] == (1, 0.0)


def test_chi2_universal_token_guard_and_min_count(spark):
    rows = [
        (0, "shared rare", "c0"),
        (1, "shared", "c0"),
        (2, "shared", "c1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, cls string")
    out = chi2_terms(df, "doc_id", "text", "cls", min_doc_count=2).collect()
    toks = {(r.token, r.class_): r.chi2 for r in out}
    # "rare" (t=1) filtered by min_doc_count; "shared" universal → denom 0
    assert all(t == "shared" for t, _ in toks)
    assert set(toks.values()) == {0.0}


def test_chi2_presence_not_frequency(spark):
    # repeating a token inside one doc must not change the counts
    rows = [(0, "dup dup dup", "c0"), (1, "other", "c1")]
    df = spark.createDataFrame(rows, "doc_id int, text string, cls string")
    out = {
        (r.token, r.class_): r.n_class_with
        for r in chi2_terms(df, "doc_id", "text", "cls", min_doc_count=1).collect()
    }
    assert out[("dup", "c0")] == 1
