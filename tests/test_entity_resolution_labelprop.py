"""Entity resolution (operators/entity_resolution.py) and label
propagation typing (operators/labelprop.py)."""

from pyspark.sql import Row

from kg_microbe_spark.operators.entity_resolution import resolve_entities
from kg_microbe_spark.operators.labelprop import propagate_labels


def test_resolve_entities_transitive_variants(spark):
    ents = spark.createDataFrame(
        [
            # A~B at 2/4=0.5, B~C at 3/4=0.75, A~C only 2/5=0.4:
            # transitivity through B must still merge all three.
            Row(eid="e1", name="Acme Corp 7"),
            Row(eid="e2", name="acme corporation 7"),
            Row(eid="e3", name="Acme  Corporation 7 Ltd"),
            # unrelated singleton
            Row(eid="e4", name="Zeta Industries"),
            # exact-duplicate pair (jaccard 1.0)
            Row(eid="e5", name="blue river labs"),
            Row(eid="e6", name="Blue River  LABS"),
        ]
    )
    out = {
        r.eid: (r.canonical_id, r.cluster_size)
        for r in resolve_entities(ents, "eid", "name", 0.5).collect()
    }
    assert out["e1"] == ("e1", 3)
    assert out["e2"] == ("e1", 3)
    assert out["e3"] == ("e1", 3)
    assert out["e4"] == ("e4", 1)
    assert out["e5"] == ("e5", 2) and out["e6"] == ("e5", 2)


def test_resolve_entities_threshold_respected(spark):
    ents = spark.createDataFrame(
        [
            Row(eid="a", name="alpha beta"),
            Row(eid="b", name="alpha gamma"),  # jaccard 1/3 < 0.5
        ]
    )
    out = {
        r.eid: r.canonical_id
        for r in resolve_entities(ents, "eid", "name", 0.5).collect()
    }
    assert out == {"a": "a", "b": "b"}


def _chain_graph(spark):
    # seeds at the ends of a 5-node path: t1 - ? - ? - ? - t2
    nodes = spark.createDataFrame(
        [
            Row(node="n0", seed="t1"),
            Row(node="n1", seed=None),
            Row(node="n2", seed=None),
            Row(node="n3", seed=None),
            Row(node="n4", seed="t2"),
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(src="n0", dst="n1"),
            Row(src="n1", dst="n2"),
            Row(src="n2", dst="n3"),
            Row(src="n3", dst="n4"),
        ]
    )
    return nodes, edges


def test_labelprop_spreads_one_hop_per_round(spark):
    nodes, edges = _chain_graph(spark)
    one = {
        r.node: r.label
        for r in propagate_labels(nodes, edges, iterations=1).collect()
    }
    # after 1 round only the seeds' direct neighbors are labeled
    assert one == {"n0": "t1", "n1": "t1", "n2": None, "n3": "t2", "n4": "t2"}

    two = {
        r.node: r.label
        for r in propagate_labels(nodes, edges, iterations=2).collect()
    }
    # n2 hears t1 (from n1) and t2 (from n3) equally: tie -> smaller label
    assert two["n2"] == "t1"
    # seeds stay clamped even though each now has a labeled neighbor
    assert two["n0"] == "t1" and two["n4"] == "t2"


def test_labelprop_majority_beats_tiebreak(spark):
    nodes = spark.createDataFrame(
        [
            Row(node="c", seed=None),
            Row(node="s1", seed="tb"),
            Row(node="s2", seed="tb"),
            Row(node="s3", seed="ta"),
        ]
    )
    edges = spark.createDataFrame(
        [Row(src="c", dst="s1"), Row(src="c", dst="s2"), Row(src="c", dst="s3")]
    )
    out = {
        r.node: r.label
        for r in propagate_labels(nodes, edges, iterations=1).collect()
    }
    # majority tb (2 votes) wins over lexicographically-smaller ta (1)
    assert out["c"] == "tb"


def test_labelprop_isolated_node_stays_null(spark):
    nodes = spark.createDataFrame(
        [Row(node="a", seed="t"), Row(node="lone", seed=None)]
    )
    edges = spark.createDataFrame([Row(src="a", dst="a2")]).filter(
        "src <> src"
    )  # empty edge list, schema preserved
    out = {
        r.node: r.label
        for r in propagate_labels(nodes, edges, iterations=2).collect()
    }
    assert out == {"a": "t", "lone": None}
