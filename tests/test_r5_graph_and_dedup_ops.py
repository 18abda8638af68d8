"""sorted_neighborhood_pairs, repeated_span_dedup, isotonic_calibration,
hits, adamic_adar_pairs — round-5 operator unit tests, each checked
against an independent brute-force Python oracle on the same fixture."""

import math
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.calibration import isotonic_calibration
from kg_microbe_spark.operators.dedup import repeated_span_dedup
from kg_microbe_spark.operators.entity_resolution import sorted_neighborhood_pairs
from kg_microbe_spark.operators.linkgraph import adamic_adar_pairs
from kg_microbe_spark.operators.pagerank import hits


# ---------------------------------------------------------------- SNM ----
def test_sorted_neighborhood_matches_bruteforce(spark):
    names = [(f"id{i}", k) for i, k in enumerate(
        ["apple", "appel", "apricot", "banana", "bananna", "cherry", "date"]
    )]
    df = spark.createDataFrame(names, "id string, name string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", F.col("name"), window=2).collect()
    }
    # brute force: sort by (key, id), pair within rank distance <= 2
    order = sorted(names, key=lambda t: (t[1], t[0]))
    want = {
        (order[i][0], order[j][0])
        for i in range(len(order))
        for j in range(i + 1, min(i + 3, len(order)))
    }
    assert got == want
    # every pair exactly once, lower-rank first
    assert len(got) == len(want)


def test_sorted_neighborhood_window_one_is_adjacent_only(spark):
    df = spark.createDataFrame(
        [(f"i{k}", f"k{k}") for k in range(5)], "id string, name string"
    )
    got = sorted_neighborhood_pairs(df, "id", F.col("name"), window=1).collect()
    assert sorted((r.id_a, r.id_b) for r in got) == [
        ("i0", "i1"), ("i1", "i2"), ("i2", "i3"), ("i3", "i4")
    ]


# ------------------------------------------------------- repeated spans ----
def test_repeated_span_dedup_finds_shared_boilerplate(spark):
    footer = "all rights reserved contact us terms of service apply"  # 9 tokens
    docs = [
        (1, "alpha beta gamma " + footer),
        (2, "delta epsilon zeta eta " + footer),
        (3, "totally unique words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = repeated_span_dedup(df, "doc_id", "text", shingle_tokens=4, min_docs=2)
    spans = {r.doc_id: (r.span_start, r.span_end) for r in out.collect()}
    # doc1: footer starts at token 3 (0-based), doc2 at token 4; 9 tokens long
    assert spans[1] == (3, 11)
    assert spans[2] == (4, 12)
    assert 3 not in spans
    for r in out.collect():
        assert r.span_tokens == r.span_end - r.span_start + 1


def test_repeated_span_dedup_merges_adjacent_islands(spark):
    # two repeats inside ONE doc pair separated by unique middles —
    # must come back as two separate islands per doc
    a = "common one two three X0 unique A common four five six"
    b = "common one two three Y0 other B common four five six"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = repeated_span_dedup(df, "doc_id", "text", shingle_tokens=3, min_docs=2)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert len(per_doc[1]) == 2 and len(per_doc[2]) == 2


# ------------------------------------------------------------ isotonic ----
def _pav_reference(pairs):
    """Classic stack PAV over (weight, sum_y) blocks, returns per-bin fit."""
    blocks = [[w, y, [i]] for i, (w, y) in enumerate(pairs)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][1] / out[-2][0] > out[-1][1] / out[-1][0]:
            w2, y2, i2 = out.pop()
            out[-1][0] += w2
            out[-1][1] += y2
            out[-1][2].extend(i2)
    fit = {}
    for w, y, idxs in out:
        for i in idxs:
            fit[i] = y / w
    return fit


def test_isotonic_matches_classic_pav(spark):
    # per-bin (count, positives) with a violation in the middle
    bins = [(10, 1), (10, 5), (10, 3), (10, 8), (5, 5)]
    rows = []
    for b, (n, pos) in enumerate(bins):
        score = 0.05 + b * 0.1  # lands in bin b with num_bins=10 over [0,1)
        rows += [(score, 1)] * pos + [(score, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r.bin: (r.n, r.pos, r.calibrated)
        for r in isotonic_calibration(
            df, "score", "label", num_bins=10, score_min=0.0, score_max=1.0
        ).collect()
    }
    want = _pav_reference([(n, pos) for n, pos in bins])
    assert sorted(got) == [0, 1, 2, 3, 4]
    for i, (n, pos) in enumerate(bins):
        assert got[i][0] == n and got[i][1] == pos
        assert got[i][2] == pytest.approx(want[i], abs=1e-6)
    # monotone non-decreasing
    fits = [got[i][2] for i in sorted(got)]
    assert fits == sorted(fits)


def test_isotonic_already_monotone_is_identity(spark):
    rows = [(0.1, 0)] * 8 + [(0.1, 1)] * 2 + [(0.9, 0)] * 2 + [(0.9, 1)] * 8
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r.bin: r.calibrated
        for r in isotonic_calibration(
            df, "score", "label", num_bins=4, score_min=0.0, score_max=1.0
        ).collect()
    }
    assert got[0] == pytest.approx(0.2, abs=1e-6)
    assert got[3] == pytest.approx(0.8, abs=1e-6)


# ---------------------------------------------------------------- HITS ----
def test_hits_matches_numpy_iteration(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: (r.authority, r.hub) for r in hits(df, "src", "dst", 2).collect()}

    nodes = sorted({n for e in edges for n in e})
    auth = {n: 1.0 for n in nodes}
    hub = {n: 1.0 for n in nodes}
    for _ in range(2):
        na = {n: sum(hub[s] for s, d in edges if d == n) for n in nodes}
        tot = sum(na.values())
        auth = {n: v / tot for n, v in na.items()}
        nh = {n: sum(auth[d] for s, d in edges if s == n) for n in nodes}
        tot = sum(nh.values())
        hub = {n: v / tot for n, v in nh.items()}
    for n in nodes:
        assert got[n][0] == pytest.approx(auth[n], abs=1e-6), n
        assert got[n][1] == pytest.approx(hub[n], abs=1e-6), n
    # c is the authority sink, a the directory hub
    assert max(got, key=lambda n: got[n][0]) == "c"
    assert max(got, key=lambda n: got[n][1]) == "a"


# ---------------------------------------------------------- Adamic-Adar ----
def test_adamic_adar_matches_bruteforce(spark):
    edges = [("a", "z"), ("b", "z"), ("a", "w"), ("b", "w"), ("c", "z"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.node_a, r.node_b): r.score_x1e6
        for r in adamic_adar_pairs(df, "src", "dst").collect()
    }
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    for x, y in combinations(sorted(adj), 2):
        if y in adj[x]:
            continue  # adjacent pairs excluded
        common = adj[x] & adj[y]
        if common:
            want[(x, y)] = sum(
                math.floor(1_000_000 / math.log(len(adj[z]))) for z in common
            )
    assert got == want
    assert ("a", "b") not in got  # existing edge anti-joined away


def test_adamic_adar_hub_guard_drops_superhub_pivot(spark):
    # hub h touches everything; with max_degree=3 it cannot pivot
    edges = [("h", x) for x in "abcd"] + [("a", "m"), ("b", "m")]
    df = spark.createDataFrame(edges, "src string, dst string")
    unguarded = {
        (r.node_a, r.node_b)
        for r in adamic_adar_pairs(df, "src", "dst").collect()
    }
    guarded = {
        (r.node_a, r.node_b)
        for r in adamic_adar_pairs(df, "src", "dst", max_degree=3).collect()
    }
    assert ("a", "b") in unguarded and ("a", "b") in guarded  # via m (deg 2)
    assert ("c", "d") in unguarded and ("c", "d") not in guarded  # only via h
