"""dense_index / corrupt_triples (operators/negatives.py) — index
determinism vs a global-sort reference, negative reproducibility,
positive filtering."""

import hashlib

from kg_microbe_spark.operators.negatives import corrupt_triples, dense_index


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


ENTITIES = [f"E{i:03d}" for i in range(40)]
TRIPLES = [(f"S{i}", "rel", ENTITIES[i % 40]) for i in range(30)]


def test_dense_index_matches_global_sort(spark):
    df = spark.createDataFrame([(e,) for e in ENTITIES], "entity string")
    got = {r.entity: r.idx for r in dense_index(df, "entity", n_buckets=8).collect()}
    ref = sorted(ENTITIES, key=lambda e: (_md5_60(e) % 8, e))
    assert got == {e: i for i, e in enumerate(ref)}
    assert sorted(got.values()) == list(range(len(ENTITIES)))


def test_corrupt_triples_deterministic_and_filtered(spark):
    ents = spark.createDataFrame([(e,) for e in ENTITIES], "entity string")
    tri = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    out1 = sorted(
        (r.subj, r.pred, r.neg_obj, r.neg_rank)
        for r in corrupt_triples(tri, ents, k=2, seed=7).collect()
    )
    out2 = sorted(
        (r.subj, r.pred, r.neg_obj, r.neg_rank)
        for r in corrupt_triples(tri, ents, k=2, seed=7).collect()
    )
    assert out1 == out2 and len(out1) > 0
    # no accidental positives survive the filter
    pos = {(s, p, o) for s, p, o in TRIPLES}
    assert all((s, p, o) not in pos for s, p, o, _ in out1)
    # a different seed changes the draw
    out3 = sorted(
        (r.subj, r.pred, r.neg_obj, r.neg_rank)
        for r in corrupt_triples(tri, ents, k=2, seed=8).collect()
    )
    assert out1 != out3


def test_corrupt_triples_matches_python_reference(spark):
    ents = spark.createDataFrame([(e,) for e in ENTITIES], "entity string")
    tri = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    got = sorted(
        (r.subj, r.pred, r.neg_obj, r.neg_rank)
        for r in corrupt_triples(
            tri, ents, k=2, seed=7, filter_positives=False
        ).collect()
    )
    order = sorted(ENTITIES, key=lambda e: (_md5_60(e) % 256, e))
    expect = sorted(
        (s, p, order[_md5_60(f"{s}:{p}:{o}:{j}:7") % len(order)], j)
        for s, p, o in TRIPLES
        for j in (0, 1)
    )
    assert got == expect
