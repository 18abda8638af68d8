"""jaccard_set_join (setjoin.py), triangle_count (triangles.py),
deterministic_group_sample (sampling.py)."""

import hashlib
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.sampling import deterministic_group_sample
from kg_microbe_spark.operators.setjoin import jaccard_set_join
from kg_microbe_spark.operators.triangles import triangle_count


def _jac(a, b):
    a, b = set(a), set(b)
    return len(a & b) / len(a | b)


def test_set_join_matches_all_pairs(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    docs = [(i, rng.sample(vocab, rng.randint(3, 9))) for i in range(80)]
    df = spark.createDataFrame(docs, "id long, s array<string>")
    for t in (0.3, 0.5, 0.8, 1.0):
        got = {(r.id_a, r.id_b) for r in jaccard_set_join(df, "id", "s", t).collect()}
        want = {
            (i, j)
            for (i, sa), (j, sb) in combinations(docs, 2)
            if _jac(sa, sb) >= t
        }
        assert got == want, f"t={t}: missing={want-got} extra={got-want}"


def test_set_join_values_and_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["a", "b"]), (3, []), (4, ["c"])],
        "id long, s array<string>",
    )
    rows = jaccard_set_join(df, "id", "s", 0.5).collect()
    assert [(r.id_a, r.id_b, r.jac) for r in rows] == [(1, 2, 1.0)]  # dup-token + empty-set handling
    with pytest.raises(ValueError, match="threshold"):
        jaccard_set_join(df, "id", "s", 0.0)


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b])
    return count // 3


GRAPHS = {
    "k4": [(i, j) for i in range(4) for j in range(i + 1, 4)],  # 4 triangles
    "triangle+chord": [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)],
    "no-triangles": [(1, 2), (2, 3), (3, 4)],
    "dup+selfloop+reversed": [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (3, 3)],
    "hub": [(0, i) for i in range(1, 20)] + [(i, i + 1) for i in range(1, 19)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_triangle_count(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "s long, d long")
    got = triangle_count(df, "s", "d").collect()[0].n_triangles
    assert got == _py_triangles(edges), name


def test_triangle_count_random(spark):
    import random

    rng = random.Random(3)
    edges = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(200)]
    df = spark.createDataFrame(edges, "s long, d long")
    assert triangle_count(df, "s", "d").collect()[0].n_triangles == _py_triangles(edges)


def test_deterministic_group_sample(spark):
    rows = [(f"k{i}", ["en", "de"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, lang string")
    out = deterministic_group_sample(df, "k", "lang", 10)
    got = {r.lang: sorted(r2.k for r2 in out.filter(F.col("lang") == r.lang).collect()) for r in out.select("lang").distinct().collect()}
    # python replication: 10 smallest 60-bit md5 hashes per stratum
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for lang in ("en", "de"):
        keys = [k for k, l in rows if l == lang]
        want = sorted(sorted(keys, key=lambda s: (h(s), s))[:10])
        assert got[lang] == want
    # prefix-stable: k=10 result ⊂ k=25 result
    out25 = {r.k for r in deterministic_group_sample(df, "k", "lang", 25).collect()}
    assert {r.k for r in out.collect()} <= out25
    # partition-invariant
    out_b = {r.k for r in deterministic_group_sample(df.repartition(7), "k", "lang", 10).collect()}
    assert {r.k for r in out.collect()} == out_b
