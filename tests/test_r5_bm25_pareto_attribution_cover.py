"""BM25 retrieval scoring, 2-D Pareto frontier, touch attribution,
greedy set cover."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.sampling import greedy_set_cover
from kg_microbe_spark.operators.stats import pareto_frontier_2d
from kg_microbe_spark.operators.temporal import touch_attribution
from kg_microbe_spark.operators.tfidf import bm25_scores


# ---------------------------------------------------------------- BM25

def _bm25_ref(docs, query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in query
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        m = 0
        for q in query:
            tf = v.count(q)
            if not tf:
                continue
            m += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            out[i] = (m, round(s, 6))
    return out

DOCS = [
    (1, "hash join hash probe build"),
    (2, "sort merge join spill"),
    (3, "vector scan filter"),
    (4, "window frame sort"),
]


def test_bm25_matches_reference_formula(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_matched, r.bm25)
        for r in bm25_scores(d, "doc_id", "text", ["hash", "join", "vector"]).collect()
    }
    assert got == _bm25_ref(DOCS, ["hash", "join", "vector"])


def test_bm25_nonmatching_docs_absent(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = bm25_scores(d, "doc_id", "text", ["nonexistent"]).collect()
    assert got == []


def test_bm25_repeated_term_beats_single_at_equal_length(spark):
    d = spark.createDataFrame(
        [(1, "hash hash scan scan"), (2, "hash scan scan scan")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(d, "doc_id", "text", ["hash"]).collect()}
    assert got[1] > got[2]


def test_bm25_rejects_empty_query(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_scores(d, "doc_id", "text", [])


# ---------------------------------------------------------------- Pareto

def test_pareto_frontier_basic(spark):
    rows = [
        ("a", 1, 9),
        ("b", 2, 7),
        ("c", 3, 8),   # dominated by b
        ("d", 3, 3),
        ("e", 5, 3),   # dominated by d (y ties, x worse)
        ("f", 6, 1),
    ]
    df = spark.createDataFrame(rows, "id string, x int, y int")
    got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
    assert got == {"a", "b", "d", "f"}


def test_pareto_frontier_matches_bruteforce(spark):
    rows = [
        (f"p{i}", (i * 17) % 23, (i * 11 + 5) % 19) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id string, x int, y int")
    got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}

    def dominated(a, b):
        return b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])

    want = {a[0] for a in rows if not any(dominated(a, b) for b in rows)}
    assert got == want


def test_pareto_keeps_all_ties_on_frontier_point(spark):
    rows = [("a", 1, 5), ("b", 1, 5), ("c", 2, 9)]
    df = spark.createDataFrame(rows, "id string, x int, y int")
    got = {r.id for r in pareto_frontier_2d(df, "x", "y").collect()}
    assert got == {"a", "b"}


# ---------------------------------------------------------------- attribution

def _ev(uid, minute, etype, eid):
    return (uid, datetime.datetime(2024, 5, 1, 10, minute), etype, eid)


def test_attribution_first_and_last_touch(spark):
    rows = [
        _ev("u1", 0, "ad", 1),
        _ev("u1", 1, "email", 2),
        _ev("u1", 2, "buy", 3),     # journey 1: first=ad, last=email
        _ev("u1", 3, "social", 4),
        _ev("u1", 4, "buy", 5),     # journey 2: first=last=social
        _ev("u2", 0, "email", 6),
        _ev("u2", 1, "buy", 7),     # first=last=email
        _ev("u2", 2, "ad", 8),      # trailing journey, no conversion
        _ev("u3", 0, "buy", 9),     # conversion with no touches: no credit
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp, etype string, eid long")
    out = touch_attribution(df, "uid", "ts", "etype", "buy", "eid")
    got = {(r.model, r.channel): r.conversions for r in out.collect()}
    assert got == {
        ("first_touch", "ad"): 1,
        ("first_touch", "email"): 1,
        ("first_touch", "social"): 1,
        ("last_touch", "email"): 2,
        ("last_touch", "social"): 1,
    }


def test_attribution_ts_ties_break_on_order_col(spark):
    t = datetime.datetime(2024, 5, 1, 10, 0)
    rows = [
        ("u", t, "ad", 2),
        ("u", t, "email", 1),  # same ts, lower eid → first touch
        ("u", datetime.datetime(2024, 5, 1, 10, 1), "buy", 3),
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp, etype string, eid long")
    got = {
        (r.model, r.channel): r.conversions
        for r in touch_attribution(df, "uid", "ts", "etype", "buy", "eid").collect()
    }
    assert got[("first_touch", "email")] == 1
    assert got[("last_touch", "ad")] == 1


# ---------------------------------------------------------------- set cover

def _cover_ref(pairs, k):
    sets = {}
    for i, it in pairs:
        sets.setdefault(str(i), set()).add(str(it))
    covered, out = set(), []
    for rank in range(1, k + 1):
        best = min(sets, key=lambda i: (-len(sets[i] - covered), i))
        gain = len(sets[best] - covered)
        if gain == 0:
            break
        covered |= sets[best]
        out.append((rank, best, gain, len(covered)))
    return out


def test_greedy_cover_matches_bruteforce(spark):
    pairs = []
    for i in range(12):
        for j in range(1 + (i * 5) % 7):
            pairs.append((f"d{i:02d}", f"item{(i * 3 + j) % 15}"))
    df = spark.createDataFrame(pairs, "id string, item string")
    got = greedy_set_cover(df, "id", "item", k=5)
    assert got == _cover_ref(pairs, 5)


def test_greedy_cover_stops_when_saturated(spark):
    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df = spark.createDataFrame(pairs, "id string, item string")
    got = greedy_set_cover(df, "id", "item", k=4)
    assert got == [(1, "a", 2, 2)]  # b adds nothing → early stop


def test_greedy_cover_redundancy_beats_proportional(spark):
    # d1,d2 duplicate each other; d3 small but novel → greedy takes d3 second
    pairs = (
        [("d1", f"i{j}") for j in range(5)]
        + [("d2", f"i{j}") for j in range(5)]
        + [("d3", "novel")]
    )
    df = spark.createDataFrame(pairs, "id string, item string")
    got = greedy_set_cover(df, "id", "item", k=2)
    assert [g[1] for g in got] == ["d1", "d3"]
