"""Hearst-pattern hypernym extraction (operators/hearst.py)."""

from pyspark.sql import Row

from kg_microbe_spark.operators.hearst import extract_hearst, hearst_triples


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text=(
                    "we saw animals such as cats, dogs and ferrets today. "
                    "a ferret is a mustelid."
                ),
            ),
            Row(doc_id=2, text="cats and other animals sleep. cats is a pet."),
            # repeated assertion inside ONE doc must count once
            Row(doc_id=3, text="cats is a pet. cats is a pet."),
            Row(doc_id=4, text="nothing to extract here"),
        ]
    )


def test_extract_hearst_patterns(spark):
    got = {
        (r.doc_id, r.hyponym, r.hypernym, r.pattern)
        for r in extract_hearst(_docs(spark), "doc_id", "text").collect()
    }
    assert (1, "cats", "animals", "such_as") in got
    assert (1, "dogs", "animals", "such_as") in got
    assert (1, "ferrets", "animals", "such_as") in got
    assert (1, "ferret", "mustelid", "is_a") in got
    assert (2, "cats", "animals", "and_other") in got
    assert (2, "cats", "pet", "is_a") in got
    # within-doc dedup: doc 3's duplicate sentence appears once
    assert len([g for g in got if g[0] == 3]) == 1
    assert not any(g[0] == 4 for g in got)


def test_hearst_triples_aggregate_evidence(spark):
    out = {
        (r.hyponym, r.hypernym): (r.n_docs, r.patterns, r.predicate)
        for r in hearst_triples(_docs(spark), "doc_id", "text").collect()
    }
    # cats->animals asserted by doc 1 (such_as) and doc 2 (and_other)
    assert out[("cats", "animals")] == (2, "and_other,such_as", "subclass_of")
    # cats->pet asserted by docs 2 and 3, one pattern
    assert out[("cats", "pet")] == (2, "is_a", "subclass_of")
    assert out[("ferrets", "animals")] == (1, "such_as", "subclass_of")
