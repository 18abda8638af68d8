"""Coherence-reranked collective entity disambiguation
(operators/disambiguation.py)."""

from pyspark.sql import Row

from kg_microbe_spark.operators.disambiguation import disambiguate


def _frames(spark):
    # doc d1: mention m1 is ambiguous (cat_animal 5 vs cat_unix 4);
    # m2 and m3 anchor to animal-world entities that cohere with
    # cat_animal, flipping nothing (it already wins) — so give the
    # ambiguous one a LOWER base for the flip test: cat_animal 4 vs
    # cat_unix 5, coherence must rescue cat_animal.
    candidates = spark.createDataFrame(
        [
            Row(doc="d1", mention="m1", entity="cat_animal", base_score=4),
            Row(doc="d1", mention="m1", entity="cat_unix", base_score=5),
            Row(doc="d1", mention="m2", entity="jungle", base_score=9),
            Row(doc="d1", mention="m3", entity="leopard", base_score=7),
            Row(doc="d1", mention="m3", entity="lion", base_score=7),
            # doc d2: same ambiguous mention, no coherent neighbors ->
            # local winner stands.
            Row(doc="d2", mention="m1", entity="cat_animal", base_score=4),
            Row(doc="d2", mention="m1", entity="cat_unix", base_score=5),
        ]
    )
    prior = spark.createDataFrame(
        [
            Row(ent_a="cat_animal", ent_b="jungle", weight=3),
            Row(ent_a="leopard", ent_b="cat_animal", weight=2),
            Row(ent_a="jungle", ent_b="leopard", weight=1),
        ]
    )
    return candidates, prior


def test_coherence_flips_ambiguous_mention(spark):
    candidates, prior = _frames(spark)
    out = {
        (r.doc, r.mention): (r.entity, r.final_score)
        for r in disambiguate(candidates, prior).collect()
    }
    # m3 anchors: leopard vs lion tie at 7 -> smaller entity "leopard".
    # m1 candidate cat_animal: coh = w(cat_animal,jungle) +
    # w(cat_animal,leopard) = 3+2 = 5 -> final 9; cat_unix: coh 0 -> 5.
    assert out[("d1", "m1")] == ("cat_animal", 9)
    # m2 jungle: coh = w(jungle, anchor(m1)=cat_unix)=0 +
    # w(jungle, anchor(m3)=leopard)=1 -> final 10; own anchor excluded.
    assert out[("d1", "m2")] == ("jungle", 10)
    # m3 winner: leopard final 7 + w(leopard,cat_unix)=0 + w(leopard,
    # jungle)=1 = 8; lion 7 -> leopard.
    assert out[("d1", "m3")] == ("leopard", 8)
    # isolated doc: local argmax survives untouched
    assert out[("d2", "m1")] == ("cat_unix", 5)


def test_self_anchor_excluded(spark):
    # single-mention doc: candidate must NOT gain coherence from its
    # own mention's anchor even when a (winner, winner) prior exists.
    candidates = spark.createDataFrame(
        [
            Row(doc="d", mention="m", entity="a", base_score=2),
            Row(doc="d", mention="m", entity="b", base_score=1),
        ]
    )
    prior = spark.createDataFrame(
        [Row(ent_a="b", ent_b="a", weight=100)]
    )
    out = disambiguate(candidates, prior).collect()
    assert len(out) == 1
    # b would score 1 + w(b, anchor=a)=100 if the self-term leaked; it
    # must stay 1 (its only same-doc neighbor is its own mention).
    assert out[0].entity == "a" and out[0].final_score == 2
