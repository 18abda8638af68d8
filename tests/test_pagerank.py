"""pagerank (operators/pagerank.py) vs a pure-python power method."""

import pytest

from kg_microbe_spark.operators.pagerank import pagerank


def _py_pagerank(edges, iterations, d=0.85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += r[s] / deg[s]
        r = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return r


GRAPHS = {
    "triangle+tail": [(1, 2), (2, 3), (3, 1), (4, 1)],
    "star": [(i, 0) for i in range(1, 8)],
    "dangling": [(1, 2), (2, 3)],  # 3 has no outbound: mass leaks, by design
    "parallel-collapse": [(1, 2), (1, 2), (2, 1)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_python(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "s long, t long")
    for iters in (1, 3):
        got = {r.id: r.rank for r in pagerank(df, "s", "t", iterations=iters).collect()}
        want = _py_pagerank(edges, iters)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), (name, iters, v)


def test_pagerank_checkpoint_path(spark):
    # iterations > checkpoint_every exercises the lineage cut
    df = spark.createDataFrame(GRAPHS["triangle+tail"], "s long, t long")
    got = {r.id: r.rank for r in pagerank(df, "s", "t", iterations=7, checkpoint_every=3).collect()}
    want = _py_pagerank(GRAPHS["triangle+tail"], 7)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_validation(spark):
    df = spark.createDataFrame([(1, 2)], "s long, t long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, "s", "t", iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, "s", "t", damping=1.0)
