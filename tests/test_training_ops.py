"""Late-r5 training-data operators: decontamination, chunking, packing,
bloom prefilter, link graph, unigram LM — Python-reference parity plus
the contracts the driver oracle can't see (bloom zero-false-negative,
pack budget invariants, chunk reassembly)."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from kg_microbe_spark.operators.bloomjoin import (
    bloom_prefilter_join,
    bloom_probe,
    build_bloom_words,
)
from kg_microbe_spark.operators.chunking import chunk_by_tokens, pack_sequences
from kg_microbe_spark.operators.decontamination import decontaminate
from kg_microbe_spark.operators.linkgraph import domain_link_graph
from kg_microbe_spark.operators.lm_quality import (
    importance_logratio,
    unigram_logprob,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "alpha beta gamma other words here"),
    (2, "completely different tokens only"),
    (3, "beta gamma delta trailing tail"),
    (4, ""),
    (5, "one"),
]


def test_decontaminate_flags_overlapping_docs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r.doc_id: (r.n_hit_shingles, r.keep)
        for r in decontaminate(docs, bench, "doc_id", "text", n=3).collect()
    }
    assert out[0][0] == 4 and not out[0][1]  # the bench doc itself: 4 trigrams
    assert out[1] == (1, False)  # shares "alpha beta gamma"
    assert out[2] == (0, True)
    # doc 3's only bench overlap is the trigram "beta gamma delta"
    assert out[3] == (1, False)
    assert out[4] == (0, True) and out[5] == (0, True)


def test_decontaminate_max_hits_threshold(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r.doc_id: r.keep
        for r in decontaminate(
            docs, bench, "doc_id", "text", n=3, max_hits=1
        ).collect()
    }
    assert out[1] is True and out[0] is False


def test_decontaminate_spans_excises_exact_tokens(spark):
    from kg_microbe_spark.operators.decontamination import decontaminate_spans

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in decontaminate_spans(docs, bench, "doc_id", "text", n=3).collect()
    }
    # doc 0 IS the benchmark: fully excised
    assert got[0] == (6, 6, "")
    # doc 1 shares "alpha beta gamma" (tokens 1-3): remainder survives
    assert got[1] == (6, 3, "other words here")
    assert got[2] == (4, 0, "completely different tokens only")
    # doc 3: only "beta gamma delta" (tokens 1-3) hits
    assert got[3] == (5, 3, "trailing tail")
    # short docs: no bench overlap → untouched
    assert got[5] == (1, 0, "one")
    # removal is consistent with the drop verdict: any doc the drop
    # variant keeps must lose zero tokens here
    from kg_microbe_spark.operators.decontamination import decontaminate

    keeps = {
        r.doc_id: r.keep
        for r in decontaminate(docs, bench, "doc_id", "text", n=3).collect()
    }
    for d, kept in keeps.items():
        if kept:
            assert got[d][1] == 0


def test_chunking_reassembles_and_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        chunk_by_tokens(docs, "doc_id", "text", window=4, stride=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    for doc_id, text in DOCS:
        toks = " ".join(text.lower().split()).split(" ")
        rows = [r for r in got if r.doc_id == doc_id]
        n = len(toks)
        expect_chunks = 1 if n <= 4 else math.ceil((n - 4) / 2) + 1
        assert len(rows) == expect_chunks
        for r in rows:
            start = r.chunk_id * 2
            assert r.chunk_text == " ".join(toks[start : start + 4])
            assert r.n_tokens == min(4, n - start) and r.n_tokens >= 1
        # stride=window/2 → every token appears in some chunk
        covered = set()
        for r in rows:
            covered.update(range(r.chunk_id * 2, r.chunk_id * 2 + r.n_tokens))
        assert covered == set(range(n))


def test_chunking_rejects_gapped_stride(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_by_tokens(docs, "doc_id", "text", window=4, stride=8)


def test_pack_sequences_matches_python_nextfit(spark):
    rows = [(i, (i * 7) % 40 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r.id: (r.shard, r.seq_id, r.seq_offset)
        for r in pack_sequences(df, "doc_id", "w", budget=64, n_shards=4).collect()
    }
    # python replay: shard by md5-60bit % 4, ascending id, next-fit
    shards = {}
    for i, w in rows:
        shards.setdefault(_md5_60(str(i)) % 4, []).append((i, w))
    expect = {}
    for shard, docs in shards.items():
        seq = running = 0
        for i, w in sorted(docs):
            if running > 0 and running + w > 64:
                seq += 1
                running = 0
            expect[i] = (shard, seq, running)
            running += w
    assert got == expect


def test_pack_sequences_budget_invariants(spark):
    rows = [(i, 10 + (i % 90)) for i in range(100)]  # all fit the budget
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = pack_sequences(df, "doc_id", "w", budget=100, n_shards=4)
    per_seq = (
        out.groupBy("shard", "seq_id").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    assert all(r.tot <= 100 for r in per_seq)
    # offsets tile each sequence contiguously from 0
    seqs = {}
    for r in out.collect():
        seqs.setdefault((r.shard, r.seq_id), []).append(
            (r.seq_offset, r.n_tokens)
        )
    for chunks in seqs.values():
        pos = 0
        for off, n in sorted(chunks):
            assert off == pos
            pos += n


def test_materialize_sequences_orders_and_bounds(spark):
    from kg_microbe_spark.operators.chunking import materialize_sequences

    rows = [(i, f"doc{i} text", 30) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    packed = pack_sequences(df, "doc_id", "w", budget=100, n_shards=2)
    out = materialize_sequences(df, packed, "doc_id", "text").collect()
    assigned = {r.id: (r.shard, r.seq_id, r.seq_offset) for r in packed.collect()}
    for r in out:
        ids = sorted(
            (off for i, (sh, sq, off) in assigned.items()
             if (sh, sq) == (r.shard, r.seq_id))
        )
        assert r.n_docs == len(ids) and r.seq_tokens == 30 * len(ids)
        assert r.seq_tokens <= 100
        # texts appear in ascending offset order
        members = sorted(
            (i for i, (sh, sq, off) in assigned.items()
             if (sh, sq) == (r.shard, r.seq_id)),
            key=lambda i: assigned[i][2],
        )
        assert r.seq_text == " ".join(f"doc{i} text" for i in members)
    assert sum(r.n_docs for r in out) == 20


def test_bloom_no_false_negatives_and_prefilter_equals_exact(spark):
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 300, 7)], "k long"
    )
    fact = spark.createDataFrame([(i, f"v{i}") for i in range(300)], "k long, v string")
    words = build_bloom_words(dim, "k", m_bits=512, k=3)
    probed = bloom_probe(fact, "k", words, k=3)
    dim_keys = {r.k for r in dim.collect()}
    flags = {r.k: r.bloom_pass for r in probed.collect()}
    # a Bloom filter NEVER misses a real member
    assert all(flags[k] for k in dim_keys)
    # prefiltered exact join == plain semi join
    got = sorted(
        (r.k, r.v) for r in bloom_prefilter_join(fact, dim, "k", "k").collect()
    )
    assert got == sorted((k, f"v{k}") for k in dim_keys)


def test_bloom_words_match_python_bitmap(spark):
    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    words = build_bloom_words(dim, "k", m_bits=256, k=2)
    expect = [0] * 4
    for i in range(50):
        for probe in range(2):
            p = _md5_60(f"{i}:{probe}") % 256
            expect[p // 64] |= 1 << (p % 64)
    # python ints are unbounded; fold to signed 64-bit like the JVM
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in expect]
    assert words == signed


def test_domain_link_graph_collapses_and_drops_self(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.example.org/x",
             "see https://b.com/1 and https://b.com/2 plus https://a.example.org/self"),
            (2, "https://www.a.example.org/y", "go https://b.com/3"),
            (3, "https://c.co.uk/z", "ref https://sub.b.com/4"),
        ],
        "doc_id long, url string, text string",
    )
    got = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in domain_link_graph(pages, "doc_id", "url", "text").collect()
    }
    # page 1: two b.com links collapse to one unit; self link dropped
    assert got == {("example.org", "b.com"): 2, ("c.co.uk", "b.com"): 1}


def test_neighbor_mean_features_matches_python(spark):
    from kg_microbe_spark.operators.projection import neighbor_mean_features

    feats = spark.createDataFrame(
        [(i, [float(i), float(i * 10)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    # 0→1, 1→1, 2→3, 3→3, plus a parallel duplicate edge 0→1
    edges = spark.createDataFrame(
        [(0, 1), (1, 1), (0, 1), (2, 3), (3, 3)], "src long, dst long"
    )
    got = {
        (r.id, r.pos): (r.n_neighbors, r.mean_val)
        for r in neighbor_mean_features(
            edges, feats, "src", "dst", "vec_id", "embedding"
        ).collect()
    }
    # dst 1 averages feats of {0, 1} (duplicate edge collapses)
    assert got[(1, 1)] == (2, 0.5) and got[(1, 2)] == (2, 5.0)
    # dst 3 averages feats of {2, 3}
    assert got[(3, 1)] == (2, 2.5) and got[(3, 2)] == (2, 25.0)
    assert set(got) == {(1, 1), (1, 2), (3, 1), (3, 2)}


def test_mixture_sample_shares_and_stability(spark):
    from kg_microbe_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i < 400 else ("b" if i < 600 else "c")) for i in range(700)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    targets = {"a": 0.6, "b": 0.3, "c": 0.1}
    out = mixture_sample(df, "doc_id", "g", targets).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, set()).add(r.doc_id)
    # feasibility bound: n_out = min(400/.6, 200/.3, 100/.1) = 666.67
    # → a keeps 400/400=1.0, b keeps .3*666.67/200≈1.0, c keeps ~0.667
    assert len(by_g["a"]) == 400
    assert len(by_g["b"]) == 200
    assert 0.5 * 100 < len(by_g["c"]) < 0.85 * 100  # hash fraction ≈ 2/3
    # determinism: rerun selects the identical set
    out2 = mixture_sample(df, "doc_id", "g", targets).collect()
    assert {(r.doc_id, r.g) for r in out} == {(r.doc_id, r.g) for r in out2}
    # prefix stability: growing group a only APPENDS to b/c selections
    grown = df.union(
        spark.createDataFrame([(i, "a") for i in range(700, 900)], "doc_id long, g string")
    )
    out3 = mixture_sample(grown, "doc_id", "g", targets).collect()
    by_g3 = {}
    for r in out3:
        by_g3.setdefault(r.g, set()).add(r.doc_id)
    assert by_g["c"] <= by_g3["c"] and by_g["b"] <= by_g3["b"]
    with pytest.raises(ValueError):
        mixture_sample(df, "doc_id", "g", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        mixture_sample(df, "doc_id", "g", {"a": 0.9, "zzz": 0.1})


def test_unigram_logprob_matches_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob)
        for r in unigram_logprob(docs, "doc_id", "text", alpha=1.0).collect()
    }
    toks = {d: t.lower().split() for d, t in DOCS}
    counts = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n, v = sum(counts.values()), len(counts) + 1  # +1: the <unk> type
    for d, ts in toks.items():
        if not ts:
            assert d not in got  # empty docs have no tokens to score
            continue
        mean = sum(math.log((counts[t] + 1.0) / (n + v)) for t in ts) / len(ts)
        assert got[d][0] == len(ts)
        assert got[d][1] == pytest.approx(round(mean, 4), abs=1e-9)
    # rarer vocabulary scores lower
    assert got[2][1] < got[0][1]


def test_unigram_logprob_min_count_unk_floor(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.mean_logprob
        for r in unigram_logprob(
            docs, "doc_id", "text", alpha=1.0, min_count=2
        ).collect()
    }
    toks = {d: t.lower().split() for d, t in DOCS}
    counts = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n = sum(counts.values())
    kept = {t: c for t, c in counts.items() if c >= 2}
    cunk = sum(c for t, c in counts.items() if c < 2)
    v = len(kept) + 1
    floor = math.log((cunk + 1.0) / (n + v))
    for d, ts in toks.items():
        if not ts:
            continue
        mean = sum(
            math.log((kept[t] + 1.0) / (n + v)) if t in kept else floor
            for t in ts
        ) / len(ts)
        assert got[d] == pytest.approx(round(mean, 4), abs=1e-9)


def test_importance_logratio_matches_python_and_prefers_target(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = docs.filter(F.col("doc_id").isin(0, 1))
    got = {
        r.doc_id: (r.n_tokens, r.mean_logratio)
        for r in importance_logratio(docs, target, "doc_id", "text").collect()
    }
    toks = {d: t.lower().split() for d, t in DOCS}
    cc, tc = {}, {}
    for d, ts in toks.items():
        for t in ts:
            cc[t] = cc.get(t, 0) + 1
            if d in (0, 1):
                tc[t] = tc.get(t, 0) + 1
    nc, nt, v = sum(cc.values()), sum(tc.values()), len(cc) + 1
    for d, ts in toks.items():
        if not ts:
            assert d not in got
            continue
        mean = sum(
            math.log((tc.get(t, 0) + 1.0) / (nt + v))
            - math.log((cc[t] + 1.0) / (nc + v))
            for t in ts
        ) / len(ts)
        assert got[d][0] == len(ts)
        assert got[d][1] == pytest.approx(round(mean, 4), abs=1e-9)
    # target-like docs outscore off-target docs
    assert got[0][1] > got[2][1] and got[1][1] > got[2][1]


def test_char_entropy_matches_python(spark):
    from collections import Counter

    from kg_microbe_spark.functions.text import char_entropy_col

    docs = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, ""), (4, "zz yy zz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", char_entropy_col(F.col("text")).alias("e")
        ).collect()
    }
    for d, t in docs:
        n = len(t)
        expect = (
            0.0
            if n == 0
            else -sum(
                (c / n) * math.log(c / n) for c in Counter(t).values()
            )
        )
        assert got[d] == pytest.approx(expect, abs=1e-12)
    # uniform 4-char doc = ln(4); constant doc = 0
    assert got[2] == pytest.approx(math.log(4))
    assert got[0] == 0.0 and got[1] == pytest.approx(math.log(2))


def test_ccnet_buckets_thresholds_and_ties(spark):
    from kg_microbe_spark.operators.lm_quality import ccnet_buckets

    # 9 docs, scores with a tie straddling the 1/3 boundary: ties share
    # a bin so both -8.0 docs land in the SAME band
    rows = [
        (0, -9.0), (1, -8.5), (2, -8.0), (3, -8.0), (4, -7.0),
        (5, -6.5), (6, -6.0), (7, -5.5), (8, -5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    got = {r.doc_id: r.band for r in ccnet_buckets(df, "doc_id", "s").collect()}
    # cum shares: -9.0→1/9, -8.5→2/9, -8.0→4/9(≥1/3 → t0=-8.0),
    # -7.0→5/9, -6.5→6/9(≥2/3 → t1=-6.5)
    assert [got[i] for i in range(9)] == [
        "tail", "tail", "tail", "tail",
        "middle", "middle",
        "head", "head", "head",
    ]


def test_fingerprint_overlap_matches_python_and_hub_guard(spark):
    from kg_microbe_spark.operators.dedup import fingerprint_overlap_pairs

    docs = [
        (1, "a b c d e f"),
        (2, "x a b c d y"),  # shares spans "a b c", "b c d" with doc 1
        (3, "a b c q r s"),  # shares only "a b c" with docs 1/2
        (4, "totally different words here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_overlap_pairs(
            df, "doc_id", "text", window=3, min_shared=2
        ).collect()
    }
    assert got == {(1, 2): 2}
    # min_shared=1 also surfaces the single-span pairs
    got1 = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_overlap_pairs(
            df, "doc_id", "text", window=3, min_shared=1
        ).collect()
    }
    assert got1 == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # hub guard: "a b c" appears in 3 docs; capping frequency at 2
    # removes it, leaving only the (1,2)-exclusive span "b c d"
    got_g = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_overlap_pairs(
            df, "doc_id", "text", window=3, min_shared=1,
            max_fingerprint_frequency=2,
        ).collect()
    }
    assert got_g == {(1, 2): 1}


def test_cooccurrence_pmi_matches_python_and_caps(spark):
    from collections import Counter
    from itertools import combinations

    from kg_microbe_spark.operators.collocations import cooccurrence_pmi

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "c"), (4, "d"),
        (4, "d"),  # duplicate (unit, entity) must not double-count
    ]
    df = spark.createDataFrame(rows, "u long, e string")
    got = {
        (r.ea, r.eb): (r.n_pair, r.pmi)
        for r in cooccurrence_pmi(df, "u", "e", min_pair_count=2).collect()
    }
    units = {}
    for u, e in rows:
        units.setdefault(u, set()).add(e)
    pair_c, ent_c = Counter(), Counter()
    for es in units.values():
        ent_c.update(es)
        pair_c.update(combinations(sorted(es), 2))
    n = len(units)
    expect = {
        p: (c, round(math.log(c * n / (ent_c[p[0]] * ent_c[p[1]])), 6) + 0.0)
        for p, c in pair_c.items()
        if c >= 2
    }
    assert got == {p: (c, pytest.approx(v, abs=1e-9)) for p, (c, v) in expect.items()} or got == expect
    assert ("a", "b") in got and got[("a", "b")][0] == 3
    # cap: max 2 entities per unit keeps only the 2 lexicographically
    # smallest, so unit 1 contributes only (a,b)
    capped = {
        (r.ea, r.eb): r.n_pair
        for r in cooccurrence_pmi(
            df, "u", "e", min_pair_count=1, max_entities_per_unit=2
        ).collect()
    }
    assert capped == {("a", "b"): 3, ("c", "d"): 1}


def test_domain_pagerank_composition(spark):
    from kg_microbe_spark.operators.linkgraph import domain_link_graph
    from kg_microbe_spark.operators.pagerank import pagerank

    pages = spark.createDataFrame(
        [
            (1, "https://a.org/1", "x https://hub.com/p x"),
            (2, "https://b.org/1", "y https://hub.com/q and https://a.org/z"),
            (3, "https://c.org/1", "z https://hub.com/r"),
        ],
        "doc_id long, url string, text string",
    )
    g = domain_link_graph(pages, "doc_id", "url", "text")
    ranks = {
        r.id: r.rank
        for r in pagerank(g, "src_domain", "dst_domain", iterations=2).collect()
    }
    assert set(ranks) == {"a.org", "b.org", "c.org", "hub.com"}
    # everyone links hub.com → it must dominate
    assert ranks["hub.com"] == max(ranks.values())
    assert ranks["a.org"] > ranks["b.org"]  # a.org has an inlink, b/c none


def test_weighted_pagerank_proportional_split(spark):
    from kg_microbe_spark.operators.pagerank import pagerank

    # s splits 3:1 between a and b; t is a sink feeding nothing
    edges = spark.createDataFrame(
        [("s", "a", 3), ("s", "b", 1)], "src string, dst string, w long"
    )
    ranks = {
        r.id: r.rank
        for r in pagerank(
            edges, "src", "dst", iterations=1, weight_col="w"
        ).collect()
    }
    base = 0.15 / 3
    assert ranks["a"] == pytest.approx(base + 0.85 * (1 / 3) * 0.75)
    assert ranks["b"] == pytest.approx(base + 0.85 * (1 / 3) * 0.25)
    assert ranks["s"] == pytest.approx(base)
    # parallel edges add: (s,a,2)+(s,a,1) == (s,a,3)
    edges2 = spark.createDataFrame(
        [("s", "a", 2), ("s", "a", 1), ("s", "b", 1)],
        "src string, dst string, w long",
    )
    ranks2 = {
        r.id: r.rank
        for r in pagerank(
            edges2, "src", "dst", iterations=1, weight_col="w"
        ).collect()
    }
    assert ranks2 == pytest.approx(ranks)
