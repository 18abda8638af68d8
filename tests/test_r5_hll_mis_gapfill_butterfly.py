"""HLL register-merge distinct, Luby MIS, gap-fill resample, butterflies."""

import datetime

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.components import luby_mis, luby_mis_round
from kg_microbe_spark.operators.stats import hll_alpha, hll_distinct
from kg_microbe_spark.operators.temporal import gapfill_resample
from kg_microbe_spark.operators.triangles import butterfly_count


# ---------------------------------------------------------------- HLL

def test_hll_estimate_within_standard_error(spark):
    # m=64 → relative standard error 1.04/sqrt(64) ≈ 13%; assert 3σ
    rows = [("g", f"value-{i}") for i in range(2000)] * 2  # dups are free
    df = spark.createDataFrame(rows, "grp string, val string")
    (row,) = hll_distinct(df, "grp", "val", p=6).collect()
    assert row.n_zero_registers == 0
    assert abs(row.est_distinct - 2000) / 2000 < 3 * 1.04 / 8


def test_hll_duplicates_do_not_change_registers(spark):
    once = spark.createDataFrame(
        [("g", f"v{i}") for i in range(300)], "grp string, val string"
    )
    thrice = once.unionAll(once).unionAll(once)
    assert (
        hll_distinct(once, "grp", "val").collect()
        == hll_distinct(thrice, "grp", "val").collect()
    )


def test_hll_small_range_linear_counting(spark):
    # 5 distinct values, m=64 → E ≤ 2.5m with zero registers → the
    # linear-counting branch; m*ln(m/V) is exact-ish for tiny counts
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(5)], "grp string, val string"
    )
    (row,) = hll_distinct(df, "grp", "val", p=6).collect()
    assert row.n_zero_registers == 64 - 5  # 5 values, no register collision here
    assert abs(row.est_distinct - 5) < 1.0


def test_hll_alpha_constants():
    assert hll_alpha(64) == 0.709
    assert abs(hll_alpha(4096) - 0.7213 / (1 + 1.079 / 4096)) < 1e-12


def test_hll_rejects_bad_precision(spark):
    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    with pytest.raises(ValueError):
        hll_distinct(df, "grp", "val", p=3)


# ---------------------------------------------------------------- Luby MIS

def _check_mis(edge_list, mis_nodes):
    adj = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # independence
    for n in mis_nodes:
        assert not (adj.get(n, set()) & mis_nodes), f"{n} has a neighbor in MIS"
    # maximality: every non-member has a member neighbor
    for n in adj:
        if n not in mis_nodes:
            assert adj[n] & mis_nodes, f"{n} could be added — not maximal"


def test_luby_round_is_independent(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    sel = {
        r.node
        for r in luby_mis_round(e).collect()
        if r.selected
    }
    assert sel  # some strict local minimum always exists
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n in sel:
        assert not (adj[n] & sel)


@pytest.mark.parametrize(
    "edges",
    [
        [("a", "b")],
        [("a", "b"), ("b", "c"), ("c", "a")],  # triangle
        [(f"n{i}", f"n{i+1}") for i in range(30)],  # path
        [("hub", f"leaf{i}") for i in range(40)],  # star: MIS = leaves
        [(f"u{i}", f"u{(i * 7 + 3) % 23}") for i in range(60)],  # scramble
    ],
)
def test_luby_mis_independent_and_maximal(spark, edges):
    e = spark.createDataFrame(edges, "src string, dst string")
    out = luby_mis(e).collect()
    mis = {r.node for r in out if r.in_mis}
    _check_mis([(u, v) for u, v in edges if u != v], mis)


def test_luby_mis_star_takes_leaves(spark):
    e = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(10)], "src string, dst string"
    )
    out = {r.node: r.in_mis for r in luby_mis(e).collect()}
    # whichever side wins round 1, maximality forces all leaves in OR hub in
    if out["hub"]:
        assert not any(out[f"leaf{i}"] for i in range(10))
    else:
        assert all(out[f"leaf{i}"] for i in range(10))


# ---------------------------------------------------------------- gap-fill

def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def test_gapfill_fills_interior_gaps_forward(spark):
    rows = [
        ("k1", _ts(0, 15), 1.0),
        ("k1", _ts(0, 45), 3.0),  # same bucket: max wins
        ("k1", _ts(3, 5), 7.0),   # hours 1,2 are gaps
        ("k2", _ts(2, 0), 5.0),   # single point → single bucket
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_resample(df, "k", "ts", "v", unit="hour")
    got = {
        (r.k, r.bucket_ts.hour): (r.value, r.filled_value, r.is_gap)
        for r in out.collect()
    }
    assert got[("k1", 0)] == (3.0, 3.0, False)
    assert got[("k1", 1)] == (None, 3.0, True)
    assert got[("k1", 2)] == (None, 3.0, True)
    assert got[("k1", 3)] == (7.0, 7.0, False)
    assert got[("k2", 2)] == (5.0, 5.0, False)
    assert len(got) == 5  # dense grid per key, nothing beyond the span


def test_gapfill_day_unit(spark):
    rows = [
        ("k", datetime.datetime(2024, 3, 1, 9), 1.0),
        ("k", datetime.datetime(2024, 3, 4, 23), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_resample(df, "k", "ts", "v", unit="day").collect()
    assert len(out) == 4
    assert sum(1 for r in out if r.is_gap) == 2
    assert all(r.filled_value == 1.0 for r in out if r.is_gap)


# ---------------------------------------------------------------- butterflies

def test_butterfly_complete_bipartite(spark):
    # K_{3,3}: butterflies = C(3,2)*C(3,2) = 9; wedges = 3*C(3,2) = 9
    edges = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    e = spark.createDataFrame(edges, "l string, r string")
    (row,) = butterfly_count(e, "l", "r").collect()
    assert (row.n_wedges, row.n_butterflies, row.n_rights_dropped) == (9, 9, 0)


def test_butterfly_none_in_a_tree(spark):
    edges = [("l1", "r1"), ("l2", "r1"), ("l2", "r2"), ("l3", "r2")]
    e = spark.createDataFrame(edges, "l string, r string")
    (row,) = butterfly_count(e, "l", "r").collect()
    assert row.n_butterflies == 0
    assert row.n_wedges == 2


def test_butterfly_hub_cap_drops_and_reports(spark):
    edges = [(f"l{i}", "hub") for i in range(10)] + [
        ("l0", "r1"),
        ("l1", "r1"),
    ]
    e = spark.createDataFrame(edges, "l string, r string")
    (row,) = butterfly_count(e, "l", "r", max_right_degree=5).collect()
    assert row.n_rights_dropped == 1
    assert row.n_butterflies == 0  # hub gone, only r1's single wedge left
    assert row.n_wedges == 1


def test_butterfly_duplicate_edges_collapse(spark):
    edges = [("l1", "r1"), ("l1", "r1"), ("l2", "r1"), ("l1", "r2"), ("l2", "r2")]
    e = spark.createDataFrame(edges, "l string, r string")
    (row,) = butterfly_count(e, "l", "r").collect()
    assert row.n_butterflies == 1
