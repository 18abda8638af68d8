"""local clustering coefficient, GraphSAGE fan-out sampling, C4 line dedup."""

import pytest

from kg_microbe_spark.operators.boilerplate import dedup_lines_keep_first
from kg_microbe_spark.operators.sampling import neighbor_fanout_sample
from kg_microbe_spark.operators.triangles import local_clustering, triangle_count


# --------------------------------------------------------- local clustering
def _two_cliques_bridge(spark):
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a1", "b1"),
    ]
    return spark.createDataFrame(edges, "src string, dst string")


def test_local_clustering_two_cliques_bridge(spark):
    e = _two_cliques_bridge(spark)
    assert triangle_count(e, "src", "dst").collect()[0].n_triangles == 2
    rows = {r.id: r for r in local_clustering(e, "src", "dst").collect()}
    # bridge endpoints: degree 3, one triangle → 2·1/(3·2)
    for n in ("a1", "b1"):
        assert rows[n].degree == 3 and rows[n].triangles == 1
        assert rows[n].coefficient == pytest.approx(1 / 3, abs=1e-6)
    # pure clique members: degree 2, one triangle → closed neighborhood
    for n in ("a2", "a3", "b2", "b3"):
        assert rows[n].degree == 2 and rows[n].triangles == 1
        assert rows[n].coefficient == pytest.approx(1.0, abs=1e-6)


def test_local_clustering_no_triangles_and_degree_one(spark):
    # star: center deg 3, no triangles; leaves deg 1 → coefficient 0.0
    e = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src string, dst string"
    )
    rows = {r.id: r for r in local_clustering(e, "src", "dst").collect()}
    assert rows["c"].degree == 3 and rows["c"].triangles == 0
    assert rows["c"].coefficient == 0.0
    for leaf in ("l1", "l2", "l3"):
        assert rows[leaf].degree == 1 and rows[leaf].coefficient == 0.0


# --------------------------------------------------------- fan-out sampling
def test_fanout_deterministic_and_prefix_stable(spark):
    edges = [("u", f"n{i}") for i in range(10)] + [("v", "n0")]
    # parallel edges must not inflate the candidate set
    e = spark.createDataFrame(edges + edges[:3], "src string, dst string")
    k3 = {(r.src, r.dst) for r in neighbor_fanout_sample(e, "src", "dst", 3).collect()}
    k3_again = {
        (r.src, r.dst) for r in neighbor_fanout_sample(e, "src", "dst", 3).collect()
    }
    k5 = {(r.src, r.dst) for r in neighbor_fanout_sample(e, "src", "dst", 5).collect()}
    assert k3 == k3_again
    assert len([p for p in k3 if p[0] == "u"]) == 3
    assert ("v", "n0") in k3  # below-k sources keep everything
    assert k3 <= k5  # prefix-stable in k
    other = {
        (r.src, r.dst)
        for r in neighbor_fanout_sample(e, "src", "dst", 3, seed="s1").collect()
    }
    assert len(other) == len(k3)  # same quota, independent draw


def test_fanout_k_validation(spark):
    e = spark.createDataFrame([("u", "v")], "src string, dst string")
    with pytest.raises(ValueError):
        neighbor_fanout_sample(e, "src", "dst", 0)


# --------------------------------------------------------- C4 line dedup
def test_dedup_lines_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared\nunique1\nshared"),
            (2, "shared\nunique2"),
            (3, "shared"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in dedup_lines_keep_first(docs).collect()}
    # winner of "shared" is (doc 1, pos 0); doc 1's internal repeat loses too
    assert rows[1].clean_text == "shared\nunique1"
    assert rows[1].n_kept == 2 and rows[1].n_removed == 1
    assert rows[2].clean_text == "unique2"
    assert rows[2].n_kept == 1 and rows[2].n_removed == 1
    # a doc whose every line lost survives with ''
    assert rows[3].clean_text == "" and rows[3].n_kept == 0


def test_dedup_lines_all_unique_is_identity(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "c\nd")], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in dedup_lines_keep_first(docs).collect()}
    assert rows[1].clean_text == "a\nb" and rows[1].n_removed == 0
    assert rows[2].clean_text == "c\nd" and rows[2].n_removed == 0
