"""Abbreviation mining (operators/abbrev.py), verb-mediated relation
candidates (operators/relations.py), seeded random walks
(operators/walks.py), lexicon alignment (operators/alignment.py)."""

import pytest

from kg_microbe_spark.operators.abbrev import abbreviation_pairs
from kg_microbe_spark.operators.alignment import align_lexicons
from kg_microbe_spark.operators.relations import (
    map_predicates,
    relation_candidates,
)
from kg_microbe_spark.operators.walks import random_walks


def test_abbrev_initials_validated(spark):
    docs = spark.createDataFrame(
        [
            (1, "the World Health Organization (WHO) said"),
            (2, "joined the World Health Organization (WHO) again (WHO) x"),
            (3, "a Bad Match Here (XYZ) no"),          # initials mismatch
            (4, "short window (ABCDEFG) x"),           # SF longer than regex cap
            (5, "polymerase chain reaction stuff (PCR) hmm"),  # window has extra word
        ],
        "doc_id int, text string",
    )
    out = {
        (r.short_form, r.long_form): r.n_docs
        for r in abbreviation_pairs(docs, "doc_id", "text").collect()
    }
    assert out == {("WHO", "world health organization"): 2}


def test_abbrev_counts_distinct_docs_not_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "Acid Base (AB) one Acid Base (AB) twice")],
        "doc_id int, text string",
    )
    out = abbreviation_pairs(docs, "doc_id", "text").collect()
    assert len(out) == 1 and out[0].n_docs == 1


def _mention_fixture(spark):
    # text: "Ea consumes Eb and Eb produces Ec." with exact offsets
    text = "Ea consumes Eb and Eb produces Ec."
    pages = spark.createDataFrame([("u1", text), ("u2", text)], "url string, text string")
    mentions = spark.createDataFrame(
        [
            (u, c, s, e)
            for u in ("u1", "u2")
            for c, s, e in [("Ea", 0, 2), ("Eb", 12, 14), ("Eb", 19, 21), ("Ec", 31, 33)]
        ],
        "url string, curie string, start int, end int",
    )
    return mentions, pages


def test_relation_candidates_verb_between(spark):
    mentions, pages = _mention_fixture(spark)
    out = {
        (r.subject, r.predicate, r.object): r.n_docs
        for r in relation_candidates(
            mentions, pages, verbs=["consumes", "produces"], max_gap=20
        ).collect()
    }
    assert out[("Ea", "consumes", "Eb")] == 2
    assert out[("Eb", "produces", "Ec")] == 2
    # Ea..(second Eb) gap 19-2=17 ≤ 20, between-text "consumes eb and "
    assert out[("Ea", "consumes", "Eb")] == 2
    # no same-entity pairs, no pair without a lexicon verb between
    assert all(s != o for (s, _, o) in out)
    assert ("Eb", "consumes", "Ec") not in out


def test_relation_candidates_gap_and_cap(spark):
    mentions, pages = _mention_fixture(spark)
    out = relation_candidates(
        mentions, pages, verbs=["consumes", "produces"], max_gap=5
    ).collect()
    assert out == []  # all gaps exceed 5
    with pytest.raises(ValueError):
        relation_candidates(mentions, pages, verbs=[])


def test_map_predicates(spark):
    mentions, pages = _mention_fixture(spark)
    cands = relation_candidates(
        mentions, pages, verbs=["consumes", "produces"], max_gap=20
    )
    mapped = {
        r.predicate
        for r in map_predicates(cands, {"consumes": "biolink:consumes"}).collect()
    }
    assert mapped == {"biolink:consumes", "produces"}


def test_random_walks_deterministic_and_follow_edges(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "e")],
        "src string, dst string",
    )
    eset = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "e")}
    w1 = random_walks(edges, length=3, walks_per_node=2, seed="s").collect()
    w2 = random_walks(edges, length=3, walks_per_node=2, seed="s").collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
    byw = {}
    for r in w1:
        byw.setdefault((r.start, r.walk), {})[r.step] = r.node
    # starts: a, b, c, d (every node with an out-edge) × 2 walks
    assert {k[0] for k in byw} == {"a", "b", "c", "d"}
    for (start, _), steps in byw.items():
        assert steps[0] == start
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
    # d→e ends at the sink: exactly steps 0 and 1
    d_walk = byw[("d", 0)]
    assert set(d_walk) == {0, 1} and d_walk[1] == "e"
    # different seed changes at least one choice somewhere
    w3 = random_walks(edges, length=3, walks_per_node=2, seed="t").collect()
    assert sorted(map(tuple, w3)) != sorted(map(tuple, w1))


def test_align_lexicons_jaccard_and_xref_excluded(spark):
    schema = "curie string, label string, synonyms array<string>"
    lex_a = spark.createDataFrame(
        [
            ("A:1", "alpha", ["shared one", "shared two"]),
            ("A:2", "beta", []),
            ("A:3", "hubless", ["common"]),
        ],
        schema,
    )
    lex_b = spark.createDataFrame(
        [
            ("B:1", "shared one", ["shared two", "alpha"]),
            ("B:2", "beta", ["extra", "more", "words"]),
            ("B:3", "common", []),
        ],
        schema,
    )
    out = {
        (r.a_curie, r.b_curie): (r.n_shared, r.jaccard_pct)
        for r in align_lexicons(lex_a, lex_b, min_jaccard_pct=50).collect()
    }
    # A:1 ∩ B:1 = 3 of 3 — perfect
    assert out[("A:1", "B:1")] == (3, 100)
    # A:2 ∩ B:2 share 1 of 4 → 25% — below threshold
    assert ("A:2", "B:2") not in out
    # hub guard: 'common' within df cap here, so A:3–B:3 matches fully
    assert out[("A:3", "B:3")][1] == 50  # shared=1, union: {hubless,common} vs {common} → 1/2

    xrefs = spark.createDataFrame([("A:1", "B:1")], "a_curie string, b_curie string")
    out2 = align_lexicons(lex_a, lex_b, known_xrefs=xrefs, min_jaccard_pct=50)
    assert ("A:1", "B:1") not in {(r.a_curie, r.b_curie) for r in out2.collect()}


def test_align_hub_term_guard(spark):
    schema = "curie string, label string, synonyms array<string>"
    lex_a = spark.createDataFrame(
        [(f"A:{i}", "protein", [f"uniq a{i}"]) for i in range(5)], schema
    )
    lex_b = spark.createDataFrame(
        [(f"B:{i}", "protein", [f"uniq b{i}"]) for i in range(5)], schema
    )
    # df('protein')=5 on each side > max_term_df=3 → dropped → no pairs
    assert align_lexicons(lex_a, lex_b, max_term_df=3).collect() == []
    # with a generous cap the hub term creates the 25 pairs (below 50% it
    # still filters — so measure with threshold 0)
    allp = align_lexicons(lex_a, lex_b, min_jaccard_pct=0, max_term_df=10)
    assert allp.count() == 25
