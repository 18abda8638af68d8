"""Unit tests for the operator library (SURVEY.md §2 coverage)."""

import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators import closure, dedup, similarity, term_linking
from kg_microbe_spark.operators.lexicon import build_name_index
from kg_microbe_spark.sources import synthetic


# ---------------------------------------------------------------------------
# A2 — completeness-ranked dedup
# ---------------------------------------------------------------------------

def test_dedup_most_complete(spark):
    rows = [
        ("X:1", "", "", "a"),          # least complete
        ("X:1", "name", "desc", "b"),  # most complete → wins
        ("X:1", "name", "", "c"),
        ("X:2", "", "", "z"),
    ]
    df = spark.createDataFrame(rows, "id string, name string, description string, extra string")
    out = {r.id: r for r in dedup.dedup_most_complete(df, "id").collect()}
    assert out["X:1"].extra == "b"
    assert out["X:2"].extra == "z"


def test_dedup_deterministic_tiebreak(spark):
    # equal completeness → total-order tiebreak (all cols asc) picks same
    # winner under any partitioning
    rows = [("X:1", "name", "d", "b"), ("X:1", "name", "d", "a")]
    df = spark.createDataFrame(rows, "id string, name string, description string, extra string")
    for parts in (1, 2, 7):
        out = dedup.dedup_most_complete(df.repartition(parts), "id").collect()
        assert len(out) == 1 and out[0].extra == "a"


# ---------------------------------------------------------------------------
# Document dedup family
# ---------------------------------------------------------------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),      # near dup
    (3, "completely different text about spark pipelines"),
    (4, "THE  QUICK   brown fox jumps over the lazy dog"),   # ws/case dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_text_dedup(docs):
    out = dedup.exact_text_dedup(docs, "doc_id", "text").collect()
    groups = {r.keep_id: r.n_dups for r in out}
    assert groups[0] == 3  # 0, 1, 4 collapse
    assert groups[2] == 1 and groups[3] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=16, bands=16).collect()
    found = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs}
    assert (0, 1) in found and found[(0, 1)] == 1.0
    assert (0, 4) in found and found[(0, 4)] == 1.0
    assert (0, 2) in found and found[(0, 2)] > 0.3
    assert all(3 not in p for p in found)


def test_ngram_jaccard(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text").collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.3 < pairs[(0, 2)] < 1.0
    assert pairs[(0, 3)] == 0.0


def test_ngram_jaccard_salted_equals_unsalted(docs):
    """r06 skew-salting property: the sub-bucketed equi-join must produce
    the exact pair multiset of the plain bucket join (same docs, same
    jaccard values), for several salt factors."""
    with_bucket = docs.withColumn("b", F.length(F.col("text")) % 2)
    base = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(with_bucket, "doc_id", "text", bucket_col="b").collect()
    )
    for salt in (2, 7, 64):
        salted = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                with_bucket, "doc_id", "text", bucket_col="b", salt=salt
            ).collect()
        )
        assert salted == base


def test_generate_pairs_aggregation_equals_join(spark):
    """r06: the single-shuffle in-row pair generator must emit the exact
    ordered-pair multiset of the original self-join form — including
    duplicate-curie rows and the subject≠object exclusion."""
    from kg_microbe_spark.operators.triples import generate_pairs, generate_pairs_join

    rows = [
        ("u1", "X:1", "a", "biolink:OrganismTaxon", 2),
        ("u1", "X:2", "b", "biolink:ChemicalEntity", 1),
        ("u1", "X:3", "c", "biolink:EnvironmentalFeature", 4),
        ("u1", "X:1", "a2", "biolink:OrganismTaxon", 9),  # duplicate curie
        ("u2", "X:9", "z", "biolink:ChemicalEntity", 1),  # singleton url
        ("u3", "X:1", "a", "biolink:OrganismTaxon", 1),
        ("u3", "X:1", "a", "biolink:OrganismTaxon", 1),   # only same-curie → no pairs
    ]
    df = spark.createDataFrame(
        rows, "url string, curie string, label string, category string, n_mentions long"
    )
    got = sorted(map(tuple, generate_pairs(df).collect()))
    want = sorted(map(tuple, generate_pairs_join(df).collect()))
    assert got == want and len(want) > 0


def test_predict_lang_staged_equals_inline(spark):
    """r06: the staged language classifier must agree row-for-row with the
    inline Column form on ties, zero-score ('und') and null/empty text."""
    from kg_microbe_spark.functions import text as T

    rows = [
        ("the cat and the dog is here",),
        ("der hund und die katze ist",),
        ("le chat est dans la maison",),
        ("el perro es de los gatos",),
        ("o gato é de uma casa não",),
        ("xyzzy qwerty plugh",),        # no stopwords → und
        ("de la",),                     # tie across several langs
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string").withColumn("i", F.monotonically_increasing_id())
    inline = [
        (r.i, r.p)
        for r in df.select("i", T.predict_lang_col(F.col("text")).alias("p")).collect()
    ]
    staged = [
        (r.i, r.predicted)
        for r in T.predict_lang_staged(df, "text", keep_cols=("i",)).collect()
    ]
    assert sorted(staged) == sorted(inline)


def test_simhash_near_dup_close(docs):
    t = {r.doc: r.simhash for r in dedup.simhash_table(docs, "doc_id", "text").collect()}
    assert t[0] == t[1] == t[4]
    ham_near = bin(t[0] ^ t[2]).count("1")
    ham_far = bin(t[0] ^ t[3]).count("1")
    assert ham_near < ham_far


# ---------------------------------------------------------------------------
# Similarity / ANN
# ---------------------------------------------------------------------------

def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    vecs = rng.randn(50, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 3)
    got = similarity.brute_force_topk(df, q, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.cosine))
    dv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = dv @ dv.T
    for qid in range(3):
        order = sorted(range(50), key=lambda j: (-round(sims[qid, j], 9), j))[:4]
        got_ids = [d for _rk, d, _c in sorted(by_q[qid])]
        assert got_ids == order, (qid, got_ids, order)


def test_ivf_topk_partition_pruned_probe(spark):
    # two tight clusters on orthogonal axes; centroids are the axes
    rows = []
    for i in range(4):  # cluster A -> cell 0
        rows.append((i, [1.0, 0.05 * i, 0.0, 0.0]))
    for i in range(4, 8):  # cluster B -> cell 1
        rows.append((i, [0.0, 0.05 * i, 1.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    q = df.filter(F.col("vec_id") == 0)
    # nprobe=1: only cluster-A members (self excluded) are candidates
    got1 = similarity.ivf_topk(df, q, centroids, k=10, nprobe=1).collect()
    assert sorted(r.doc_id for r in got1) == [1, 2, 3]
    # nprobe=2 probes both cells -> full corpus minus self
    got2 = similarity.ivf_topk(df, q, centroids, k=10, nprobe=2).collect()
    assert sorted(r.doc_id for r in got2) == [1, 2, 3, 4, 5, 6, 7]
    # ranking: within cluster A, lower i means closer to [1,0,0,0]
    ranked = [r.doc_id for r in sorted(got1, key=lambda r: r.rank)]
    assert ranked == [1, 2, 3]


def test_ivf_cells_map_side_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id long, embedding array<float>"
    )
    cells = similarity.ivf_cells(df, [(0, [1.0, 0.0]), (1, [0.0, 1.0])], nprobe=1)
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # assignment must stay map-side


def test_embedding_near_dup_clusters(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.98, 0.02, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.99, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in similarity.embedding_near_dup(df, threshold=0.9).collect()}
    assert {i: got[i].cluster_id for i in range(6)} == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
    assert got[0].cluster_size == 3 and got[3].cluster_size == 2 and got[5].cluster_size == 1
    assert [got[i].is_canonical for i in range(6)] == [True, False, False, True, False, True]


def test_lsh_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(1)
    base = rng.randn(40, 8).astype("float32")
    # plant near-neighbors: vec i+40 = vec i + tiny noise
    near = base[:10] + 0.01 * rng.randn(10, 8).astype("float32")
    allv = np.vstack([base, near])
    df = spark.createDataFrame(
        [(i, [float(x) for x in allv[i]]) for i in range(len(allv))], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 5)
    got = similarity.lsh_topk(df, q, dim=8, k=2, n_planes=6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    # a query's planted near-dup shares all 6 hyperplane signs with very
    # high probability; require ≥3/5 recall to keep the test robust
    hits = sum(1 for qid in range(5) if qid + 40 in by_q.get(qid, []))
    assert hits >= 3


def test_pairwise_jaccard(spark):
    rows = [("s1", "a"), ("s1", "b"), ("s1", "c"), ("s2", "b"), ("s2", "c"), ("s3", "x")]
    df = spark.createDataFrame(rows, "k string, item string")
    out = {(r.key_a, r.key_b): r.jaccard for r in similarity.pairwise_jaccard(df, "k", "item").collect()}
    assert out == {("s1", "s2"): 2 / 3}


def test_pairwise_jaccard_hub_item_guard(spark):
    # 'hub' spans ALL 40 keys: unguarded it alone generates 40·39/2 = 780
    # candidate pairs (quadratic in key count); with max_item_frequency it
    # is dropped from intersections AND set sizes, so only genuinely
    # similar pairs survive with jaccard over the non-hub item space.
    rows = [(f"k{i}", "hub") for i in range(40)]
    rows += [("k0", "a"), ("k0", "b"), ("k1", "a"), ("k1", "b"), ("k2", "zz")]
    df = spark.createDataFrame(rows, "k string, item string")

    unguarded = similarity.pairwise_jaccard(df, "k", "item").collect()
    assert len(unguarded) == 780  # every key-pair shares the hub

    guarded = {
        (r.key_a, r.key_b): r.jaccard
        for r in similarity.pairwise_jaccard(df, "k", "item", max_item_frequency=10).collect()
    }
    assert guarded == {("k0", "k1"): 1.0}  # {a,b} vs {a,b} once hub is removed


# ---------------------------------------------------------------------------
# J3 — transitive closure
# ---------------------------------------------------------------------------

def test_one_hop_and_closure(spark):
    edges = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("x", "q", "y")],
        "subject string, predicate string, object string",
    )
    hop = {(r.subject, r.object) for r in closure.one_hop(edges, "p").collect()}
    assert hop == {("a", "c"), ("b", "d")}
    full = {(r.subject, r.object) for r in closure.transitive_closure(edges, "p").collect()}
    assert full == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d"), ("a", "d")}
    multi = {(r.subject, r.object) for r in closure.multi_hop(edges, "p", 2).collect()}
    assert multi == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}


# ---------------------------------------------------------------------------
# N1/N3/N7 — term-list linking cascade
# ---------------------------------------------------------------------------

def test_term_linking_cascade(spark):
    lexicon = synthetic.lexicon_df(spark)
    idx = build_name_index(lexicon, synthetic.STOPWORDS)
    cells = spark.createDataFrame(
        [("glucose, soil, qqqzz unknown thing",), ("glucose, curated special",)],
        "terms string",
    )
    terms = term_linking.extract_distinct_terms(cells, "terms")
    curated = spark.createDataFrame(
        [("curated special", "CUR:1", "Curated Special", "biolink:ChemicalEntity")],
        "term_norm string, curie string, label string, category string",
    )
    resolved, unmatched = term_linking.link_terms(terms, idx, curated)
    by_term = {r.term: r for r in resolved.collect()}
    assert by_term["glucose"].match_type == "exact"
    assert by_term["soil"].match_type == "exact"
    assert by_term["curated special"].match_type == "curated"
    assert by_term["curated special"].curie == "CUR:1"
    u = by_term["qqqzz unknown thing"]
    assert u.match_type in ("partial", "minted")
    assert unmatched.count() == (1 if u.match_type == "minted" else 0)


def test_term_linking_partial_overlap_winner(spark):
    # index with two candidates sharing a token; W2 argmax char-overlap wins
    idx = spark.createDataFrame(
        [
            ("alpha ketoglutarate", "C:1", "alpha ketoglutarate", "biolink:ChemicalEntity"),
            ("ketoglutarate salt", "C:2", "ketoglutarate salt", "biolink:ChemicalEntity"),
        ],
        "term_norm string, curie string, label string, category string",
    )
    terms = spark.createDataFrame([("alpha ketoglutarate acid", "alpha ketoglutarate acid")], "term string, term_norm string")
    resolved, _ = term_linking.link_terms(terms, idx)
    r = resolved.collect()[0]
    assert r.match_type == "partial"
    assert r.curie == "C:1"
