"""Asymmetric containment detection (operators/dedup.py
containment_pairs)."""

from kg_microbe_spark.operators.dedup import containment_pairs


def test_containment_detects_prefix_doc(spark):
    big = " ".join(f"w{i}" for i in range(20))
    small = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"x{i}" for i in range(20))
    docs = spark.createDataFrame(
        [("A", big), ("B", small), ("C", other)], "id string, text string"
    )
    out = {
        (r.container, r.contained): (r.n_shared, r.n_total, r.containment_pct)
        for r in containment_pairs(docs, "id", "text", window=4).collect()
    }
    # FP(B) = 9 four-token spans, all inside A → 100% containment
    assert out == {("A", "B"): (9, 9, 100)}


def test_containment_is_asymmetric_and_thresholded(spark):
    big = " ".join(f"w{i}" for i in range(20))
    small = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [("A", big), ("B", small)], "id string, text string"
    )
    rows = containment_pairs(
        docs, "id", "text", window=4, min_containment_pct=50
    ).collect()
    d = {(r.container, r.contained): r.containment_pct for r in rows}
    assert d[("A", "B")] == 100
    # reverse direction: 9 shared of A's 17 spans = 52% ≥ 50
    assert d[("B", "A")] == 52
    assert len(d) == 2
    strict = containment_pairs(docs, "id", "text", window=4, min_containment_pct=80)
    assert {(r.container, r.contained) for r in strict.collect()} == {("A", "B")}


def test_containment_stop_span_guard(spark):
    shared = "boiler plate line here again now"
    docs = spark.createDataFrame(
        [(f"d{i}", shared) for i in range(5)], "id string, text string"
    )
    # every span appears in 5 docs; guard at 3 drops them all → no pairs
    assert (
        containment_pairs(
            docs, "id", "text", window=4, max_fingerprint_frequency=3
        ).collect()
        == []
    )
