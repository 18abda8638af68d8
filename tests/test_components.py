"""connected_components (alternating large-star/small-star) vs a plain
union-find oracle: chains (the diameter pathology star-alternation exists
to kill), rings, overlapping cliques (the LSH-candidate shape), random
graphs, isolated handling, determinism."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.components import connected_components


def uf_components(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    all_nodes = set(nodes or []) | {n for e in edges for n in e}
    return {n: find(n) for n in all_nodes}


def spark_components(spark, edges):
    df = spark.createDataFrame([(a, b) for a, b in edges], "src long, dst long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_long_chain(spark):
    # 0-1-2-...-40: diameter 40, must converge well inside 25 star rounds
    edges = [(i, i + 1) for i in range(40)]
    assert spark_components(spark, edges) == {i: 0 for i in range(41)}


def test_two_rings_and_isolated_edge(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    edges += [(10 + i, 10 + (i + 1) % 4) for i in range(4)]
    edges += [(100, 200)]
    got = spark_components(spark, edges)
    assert got == uf_components(edges)
    assert got[200] == 100 and got[3] == 0 and got[13] == 10


def test_overlapping_cliques_lsh_shape(spark):
    # two 4-cliques sharing one node — the banded-LSH candidate shape
    c1 = [(a, b) for a in (1, 2, 3, 7) for b in (1, 2, 3, 7) if a < b]
    c2 = [(a, b) for a in (7, 8, 9, 11) for b in (7, 8, 9, 11) if a < b]
    got = spark_components(spark, c1 + c2)
    assert set(got.values()) == {1}


@pytest.mark.parametrize("seed", [7, 99, 12345])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 80))
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert spark_components(spark, edges) == uf_components(edges)


def test_deterministic_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(0, 30, 2)] + [(i, i + 17) for i in range(10)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {(r.node, r.component) for r in connected_components(df1).collect()}
    r8 = {(r.node, r.component) for r in connected_components(df8).collect()}
    assert r1 == r8


def test_duplicate_and_reversed_edges_collapse(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3)]
    assert spark_components(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("x", "y")], "src string, dst string"
    )
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a", "x": "x", "y": "x"}
