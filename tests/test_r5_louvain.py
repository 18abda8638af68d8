"""Synchronous Louvain local-move round."""

from kg_microbe_spark.operators.labelprop import (
    louvain_move_round,
    modularity_by_community,
)

EDGES = [
    ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
    ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
    ("a1", "b1"),
]


def _e(spark, rows=EDGES):
    return spark.createDataFrame(rows, "src string, dst string")


def test_singleton_init_round_hand_computed(spark):
    # singleton communities named by node; 2m=14, all gains exact ints:
    # a1: {a2:14-3*2=8, a3:8, b1:14-3*3=5, own:0} -> tie 8 -> 'a2'
    # a2: {a1:14-2*3=8, a3:14-2*2=10, own:0}      -> 'a3'
    # a3: {a1:8, a2:10, own:0}                     -> 'a2'  (b-side mirror)
    asg = spark.createDataFrame(
        [(n, n) for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "id string, community string",
    )
    out = {r.id: r.community for r in louvain_move_round(_e(spark), asg).collect()}
    assert out == {
        "a1": "a2", "a2": "a3", "a3": "a2",
        "b1": "b2", "b2": "b3", "b3": "b2",
    }


def test_perfect_partition_is_fixpoint(spark):
    asg = spark.createDataFrame(
        [(n, n[0]) for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "id string, community string",
    )
    out = {r.id: r.community for r in louvain_move_round(_e(spark), asg).collect()}
    assert out == {n: n[0] for n in ("a1", "a2", "a3", "b1", "b2", "b3")}
    # and that fixpoint is the high-modularity split
    q = sum(
        r.contribution
        for r in modularity_by_community(
            _e(spark),
            spark.createDataFrame(list(out.items()), "id string, community string"),
        ).collect()
    )
    assert 0.3 < q < 0.4


def test_weighted_bridge_pulls_node_across(spark):
    # bridge weight 10 dominates: 2m=32; a1 own {a}: 32*2-12*(16-12)=16,
    # move to {b}: 32*10-12*16=128 -> a1 defects to b, and by symmetry
    # b1 simultaneously defects to a (the synchronous swap); clique
    # interiors stay put
    rows = [(s, d, 1) for s, d in EDGES[:-1]] + [("a1", "b1", 10)]
    e = spark.createDataFrame(rows, "src string, dst string, w int")
    asg = spark.createDataFrame(
        [(n, n[0]) for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "id string, community string",
    )
    out = {
        r.id: r.community
        for r in louvain_move_round(e, asg, weight_col="w").collect()
    }
    assert out["a1"] == "b" and out["b1"] == "a"
    assert out["a2"] == "a" and out["b2"] == "b"


def test_unassigned_and_isolated_nodes(spark):
    # z is unassigned (its edge drops from the universe); i is assigned
    # but isolated (keeps its community)
    e = _e(spark, EDGES + [("a1", "z")])
    asg = spark.createDataFrame(
        [(n, n[0]) for n in ("a1", "a2", "a3", "b1", "b2", "b3")]
        + [("i", "solo")],
        "id string, community string",
    )
    out = {r.id: r.community for r in louvain_move_round(e, asg).collect()}
    assert "z" not in out
    assert out["i"] == "solo"
    assert out["a1"] == "a"  # same fixpoint as without z
