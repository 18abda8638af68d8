"""Collective-linking pipeline stage (plans/pipeline.py
_collective_link + lexicon.build_candidate_index)."""

from pyspark.sql import Row

from kg_microbe_spark.operators.lexicon import (
    build_candidate_index,
    build_name_index,
)
from kg_microbe_spark.plans.pipeline import _collective_link


_LEX_SCHEMA = (
    "curie string, label string, synonyms array<string>, "
    "category string, xrefs array<string>, deprecated boolean"
)


def _lexicon(spark):
    return spark.createDataFrame(
        [
            ("X:001", "jaganimal", ["jaguar"], "biolink:OrganismTaxon", [], False),
            ("X:002", "jagcar", ["jaguar"], "biolink:NamedThing", [], False),
            ("X:010", "engine", [], "biolink:NamedThing", [], False),
        ],
        schema=_LEX_SCHEMA,
    )


def test_candidate_index_keeps_all_and_name_index_collapses(spark):
    lex = _lexicon(spark)
    cand = build_candidate_index(lex, stopwords=[]).collect()
    jaguar = {(r.curie, r.rank) for r in cand if r.term_norm == "jaguar"}
    assert jaguar == {("X:001", 1), ("X:002", 1)}
    # W4 winner: rank tie -> smaller curie
    idx = {
        r.term_norm: r.curie
        for r in build_name_index(lex, stopwords=[]).collect()
    }
    assert idx["jaguar"] == "X:001"
    assert idx["jagcar"] == "X:002"


def test_collective_linking_flips_ambiguous_surface(spark):
    lex = _lexicon(spark)
    idx = build_name_index(lex, stopwords=[])
    rows = []
    # 5 pages establish the (X:002, X:010) co-occurrence prior via the
    # unambiguous 'jagcar' surface
    for i in range(5):
        rows += [
            Row(url=f"u{i}", term_norm="jagcar"),
            Row(url=f"u{i}", term_norm="engine"),
        ]
    # 1 ambiguous page: local W4 evidence says X:001, coherence says X:002
    rows += [Row(url="a1", term_norm="jaguar"), Row(url="a1", term_norm="engine")]
    mentions = spark.createDataFrame(rows)

    linked = {
        (r.url, r.term_norm if False else r.curie)
        for r in _collective_link(
            mentions, lex, idx, stopwords=[], _k=lambda part: None
        ).collect()
    }
    # ambiguous page: X:002 beats the default X:001 (coh 5 vs 1)
    assert ("a1", "X:002") in linked
    assert ("a1", "X:001") not in linked
    # unambiguous links are untouched
    assert ("a1", "X:010") in linked
    assert ("u0", "X:002") in linked and ("u0", "X:010") in linked


def test_collective_pipeline_end_to_end(spark):
    """run_pipeline(collective_linking=True) over the synthetic corpus:
    same output schema as the default path, non-empty, and every entity
    curie is a valid lexicon target."""
    from kg_microbe_spark.plans.pipeline import run_pipeline
    from kg_microbe_spark.sources import synthetic

    pages = synthetic.pages_df(spark, 300, num_partitions=4)
    lexicon = synthetic.lexicon_df(spark)
    default = run_pipeline(spark, pages, lexicon)
    coll = run_pipeline(spark, pages, lexicon, collective_linking=True)
    assert coll.entities.columns == default.entities.columns
    n_coll = coll.entities.count()
    assert n_coll > 0
    # coherence can only re-route ambiguous surfaces, not invent or drop
    # pages: the per-url mention mass is preserved
    d_mass = dict(
        default.entities.groupBy("url").sum("n_mentions").collect()
    )
    c_mass = dict(coll.entities.groupBy("url").sum("n_mentions").collect())
    assert d_mass == c_mass
