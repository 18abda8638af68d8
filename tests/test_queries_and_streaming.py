"""Query layer (§3.3 five shapes) + streaming ingest smoke."""

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.plans.pipeline import run_pipeline
from kg_microbe_spark.queries import organism
from kg_microbe_spark.sources import synthetic

N = 200


@pytest.fixture(scope="module")
def kg(spark):
    res = run_pipeline(spark, synthetic.pages_df(spark, N, 4), synthetic.lexicon_df(spark))
    organism.register_views(spark, res.nodes, res.edges)
    return res


def test_resolve_organism(spark, kg):
    hits = organism.resolve_organism(spark, "bacillus").collect()
    assert hits and all(h.id.startswith("NCBITaxon:") for h in hits)
    assert hits[0].match_rank <= 1


def test_organism_traits_one_hop(spark, kg):
    some = kg.edges.filter(F.col("subject").startswith("NCBITaxon:")).limit(1).collect()
    assert some
    traits = organism.organism_traits(spark, some[0].subject).collect()
    assert traits and all(t.object_name is not None for t in traits)


def test_organism_environments(spark, kg):
    env_edge = kg.edges.filter(F.col("subject").startswith("ENVO:")).limit(1).collect()
    assert env_edge
    envs = organism.organism_environments(spark, env_edge[0].object).collect()
    assert envs and all(e.environment.startswith("ENVO:") for e in envs)


def test_environment_chemical_profile_two_hop(spark, kg):
    env_edge = kg.edges.filter(F.col("subject").startswith("ENVO:")).limit(1).collect()[0]
    prof = organism.environment_chemical_profile(spark, env_edge.subject)
    rows = prof.collect()
    # the 2-hop may legitimately be empty for a sparse env; shape must hold
    assert prof.columns == ["chemical", "chemical_name", "n_taxa", "taxa"]
    for r in rows:
        assert r.n_taxa >= 1 and "|" in r.taxa or r.n_taxa == 1


def test_provenance_summary(spark, kg):
    rows = organism.provenance_summary(spark).collect()
    assert rows and sum(r.n_edges for r in rows) == kg.edges.count()


def test_streaming_ingest_availablenow(spark, tmp_path):
    from kg_microbe_spark.operators.lexicon import build_name_index
    from kg_microbe_spark.streaming.ingest import run_ingest

    src = str(tmp_path / "pages_in")
    synthetic.pages_df(spark, 60, 3).write.parquet(src)
    idx = build_name_index(synthetic.lexicon_df(spark), synthetic.STOPWORDS)
    sink = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest(spark, src, idx, sink, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() > 0
    assert set(out.columns) == {"url", "surface", "term_norm", "start", "end"}

    # restart with no new files → exactly-once: no duplicate output
    n1 = out.count()
    q2 = run_ingest(spark, src, idx, sink, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == n1

def test_query_organism_full_and_report(spark, kg):
    # pick a real taxon name from the merged KG to resolve
    taxon = (
        kg.nodes.filter(F.col("id").startswith("NCBITaxon:"))
        .orderBy("id")
        .limit(1)
        .collect()[0]
    )
    result = organism.query_organism_full(spark, taxon.name)
    assert result["taxon_id"].startswith("NCBITaxon:")
    assert isinstance(result["traits"], list)
    assert set(result["media"].keys()) == {"grows_in", "no_growth"}

    report = organism.format_organism_report(result)
    assert report.startswith(f"# Organism Report: {result['name']} ({result['taxon_id']})")
    assert "**Data sources**:" in report
    if result["traits"]:
        assert "## Traits" in report and "| Predicate | Value | Source |" in report


def test_query_organism_full_unresolvable_raises(spark, kg):
    with pytest.raises(ValueError, match="No organism found"):
        organism.query_organism_full(spark, "zzz-no-such-organism-zzz")
