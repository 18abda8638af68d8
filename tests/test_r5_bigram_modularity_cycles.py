"""bigram LM scoring, modularity, hierarchy cycle detection."""

import math

import pytest

from kg_microbe_spark.operators.labelprop import modularity_by_community
from kg_microbe_spark.operators.lm_quality import bigram_logprob
from kg_microbe_spark.operators.validation import hierarchy_cycle_nodes


# ------------------------------------------------------------- bigram LM
def test_bigram_transition_math(spark):
    # corpus: "a b" x3, "a c" x1 → contexts: c1(a)=4; c2(a,b)=3, c2(a,c)=1
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")], "id int, text string"
    )
    out = {r.id: r for r in bigram_logprob(docs, "id", "text", alpha=1.0).collect()}
    v = 4.0  # kept types a,b,c + <unk>
    p_ab = (3 + 1) / (4 + v)
    p_ac = (1 + 1) / (4 + v)
    assert out[1].n_transitions == 1
    assert out[1].mean_logprob == pytest.approx(math.log(p_ab), abs=1e-4)
    assert out[4].mean_logprob == pytest.approx(math.log(p_ac), abs=1e-4)
    # plausible transition scores higher than the rarer one
    assert out[1].mean_logprob > out[4].mean_logprob


def test_bigram_unk_gate_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x x rare1"), (2, "x x rare2"), (3, "solo")], "id int, text string"
    )
    out = {r.id: r for r in bigram_logprob(docs, "id", "text", alpha=1.0, min_count=2).collect()}
    assert 3 not in out  # <2 tokens → no transitions → no row
    # rare1/rare2 both map to <unk>: doc1 and doc2 have identical
    # transition multisets (x→x, x→<unk>) → identical scores
    assert out[1].mean_logprob == out[2].mean_logprob
    assert out[1].n_transitions == 2


def test_bigram_word_salad_scores_below_natural_order(spark):
    natural = [(i, "the cat sat on the mat") for i in range(1, 9)]
    salad = [(9, "mat the on sat the cat")]
    docs = spark.createDataFrame(natural + salad, "id int, text string")
    out = {r.id: r.mean_logprob for r in bigram_logprob(docs, "id", "text").collect()}
    assert out[1] > out[9]


# ------------------------------------------------------------- modularity
def test_modularity_two_cliques_and_bridge(spark):
    # two triangles joined by one bridge edge; perfect 2-community split
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a1", "b1"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    asg = spark.createDataFrame(
        [(n, n[0]) for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "id string, community string",
    )
    rows = {r.community: r for r in modularity_by_community(e, asg).collect()}
    m = 7.0
    for c in ("a", "b"):
        assert rows[c].e_intra == 3 and rows[c].degree_sum == 7 and rows[c].n_nodes == 3
        assert rows[c].contribution == pytest.approx(3 / m - (7 / (2 * m)) ** 2, abs=1e-6)
    q = sum(r.contribution for r in rows.values())
    assert 0.3 < q < 0.4  # classic two-clique-bridge modularity


def test_modularity_ignores_self_loops_dups_and_unassigned(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a"), ("a", "z")], "src string, dst string"
    )
    asg = spark.createDataFrame([("a", "c1"), ("b", "c1")], "id string, community string")
    rows = modularity_by_community(e, asg).collect()
    assert len(rows) == 1
    r = rows[0]
    # only the single a-b edge survives (dup symmetrized, self-loop cut,
    # a-z dropped for unassigned z) → one intra edge, m=1, Q = 1 - 1 = 0
    assert r.e_intra == 1 and r.degree_sum == 2
    assert r.contribution == pytest.approx(1 / 1 - (2 / 2) ** 2, abs=1e-6)


# ------------------------------------------------------------- cycles
def test_cycle_nodes_found_exactly(spark):
    edges = [
        ("n1", "n2"), ("n2", "n3"), ("n3", "n4"),   # clean chain
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),   # 3-cycle
        ("s", "s"),                                  # self-loop
        ("t", "c1"),                                 # points INTO the cycle, not on it
    ]
    e = spark.createDataFrame(edges, "child string, parent string")
    got = {r.id for r in hierarchy_cycle_nodes(e, "child", "parent").collect()}
    assert got == {"c1", "c2", "c3", "s"}


def test_acyclic_hierarchy_reports_nothing(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "child string, parent string"
    )
    assert hierarchy_cycle_nodes(e, "child", "parent").count() == 0
