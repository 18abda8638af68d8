"""Sources/sinks, KGX schema normalization, graph stats, registry."""

import glob

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators import stats
from kg_microbe_spark.operators.kgx_schema import consolidate_category_col, normalize_kgx_frame
from kg_microbe_spark.plans import registry
from kg_microbe_spark.schemas import EDGE_COLUMNS, NODE_COLUMNS
from kg_microbe_spark.sources import io as kio


def test_tsv_roundtrip_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [("B:2", "cat", "b"), ("A:1", "cat", "a"), ("C:3", "cat", "c")],
        "id string, category string, name string",
    )
    out = str(tmp_path / "nodes_tsv")
    kio.write_nodes(df, out)
    back = kio.read_tsv(spark, out)
    assert back.count() == 3
    assert {r.id for r in back.collect()} == {"A:1", "B:2", "C:3"}


def test_jsonl_and_gz(spark, tmp_path):
    import gzip
    import json

    p = tmp_path / "data.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "name": f"rec{i}"}) + "\n")
    df = kio.read_jsonl(spark, str(p))
    assert df.count() == 5 and set(df.columns) == {"id", "name"}


def test_normalize_kgx_frame(spark):
    df = spark.createDataFrame(
        [("a", "p", "b", "src\r", "meta1", "legacy_src")],
        "subject string, predicate string, object string, relation string, meta string, knowledge_source string",
    )
    out = normalize_kgx_frame(df, EDGE_COLUMNS)
    row = out.collect()[0]
    assert out.columns[:7] == list(EDGE_COLUMNS)
    assert "meta" not in out.columns
    assert row.primary_knowledge_source == "legacy_src"  # legacy rename
    assert row.relation == "src"  # CR stripped
    assert row.knowledge_level == "" and row.agent_type == ""  # filled


def test_consolidate_category(spark):
    df = spark.createDataFrame(
        [
            ("biolink:GrowthMedium|biolink:ChemicalMixture",),
            ("biolink:NamedThing|biolink:OrganismTaxon",),
            ("biolink:ChemicalEntity|biolink:SmallMolecule",),
            ("biolink:MysteryThing",),
        ],
        "category string",
    )
    got = [r.c for r in df.select(consolidate_category_col(F.col("category")).alias("c")).collect()]
    # equal depth → lexicographic min; deeper wins; unknown fails open
    assert got == [
        "biolink:ChemicalMixture",
        "biolink:OrganismTaxon",
        "biolink:SmallMolecule",
        "biolink:MysteryThing",
    ]


def test_graph_stats(spark):
    edges = spark.createDataFrame(
        [
            ("NCBITaxon:1", "biolink:interacts_with", "CHEBI:2"),
            ("NCBITaxon:1", "biolink:interacts_with", "CHEBI:3"),
            ("ENVO:9", "biolink:occurs_in", "NCBITaxon:1"),
        ],
        "subject string, predicate string, object string",
    )
    nodes = spark.createDataFrame(
        [("NCBITaxon:1", "biolink:OrganismTaxon", "s1"), ("CHEBI:2", "biolink:ChemicalEntity", "s2")],
        "id string, category string, provided_by string",
    )
    summary = stats.graph_summary(nodes, edges)
    assert summary == {
        "total_nodes": 2,
        "total_edges": 3,
        "largest_predicate": "biolink:interacts_with",
        "largest_predicate_count": 2,
    }
    es = stats.edge_stats(edges).collect()
    assert any(r.spo_type == "NCBITaxon-biolink:interacts_with-CHEBI" and r["count"] == 2 for r in es)
    ns = {r.category: r for r in stats.node_stats(nodes).collect()}
    assert ns["biolink:OrganismTaxon"].n_nodes == 1


def test_registry_dispatch_and_validation(spark):
    assert "webtext" in registry.available_sources()
    with pytest.raises(ValueError):
        registry.validate_sources(["nope"])
    results = registry.transform(spark, ["webtext"], n_pages=40)
    nodes, edges = registry.merge(results)
    assert nodes.count() > 0 and edges.count() > 0
    assert set(NODE_COLUMNS) <= set(nodes.columns) or "id" in nodes.columns
