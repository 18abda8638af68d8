"""triple_prf (north-rule P/R metric) and domain/range validation."""

import math

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.evaluation import triple_prf
from kg_microbe_spark.operators.validation import domain_range_violations


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subject string, predicate string, object string")


def test_prf_exact_match(spark):
    g = _triples(spark, [("a", "p", "b"), ("c", "p", "d")])
    row = triple_prf(g, g).collect()[0]
    assert (row.n_pred, row.n_gold, row.n_hit) == (2, 2, 2)
    assert row.precision == row.recall == row.f1 == 1.0


def test_prf_partial_and_multiplicity(spark):
    pred = _triples(
        spark,
        [("a", "p", "b"), ("a", "p", "b"), ("x", "p", "y"), ("q", "p", "r")],
    )  # 3 distinct, one duplicated — set semantics must not double-count
    gold = _triples(spark, [("a", "p", "b"), ("c", "p", "d")])
    row = triple_prf(pred, gold).collect()[0]
    assert (row.n_pred, row.n_gold, row.n_hit) == (3, 2, 1)
    assert row.precision == pytest.approx(1 / 3, abs=1e-6)
    assert row.recall == pytest.approx(0.5, abs=1e-6)
    assert row.f1 == pytest.approx(2 * 1 / (3 + 2), abs=1e-6)


def test_prf_empty_sides(spark):
    empty = _triples(spark, []).filter(F.lit(False))
    gold = _triples(spark, [("a", "p", "b")])
    row = triple_prf(empty, gold).collect()[0]
    assert (row.n_pred, row.n_hit, row.precision, row.recall, row.f1) == (
        0, 0, 0.0, 0.0, 0.0,
    )


@pytest.fixture()
def kg_fixture(spark):
    nodes = spark.createDataFrame(
        [
            ("T:1", "Taxon"),
            ("T:2", "Strain"),
            ("C:1", "Chemical"),
            ("E:1", "Environment"),
        ],
        "id string, category string",
    )
    ancestors = spark.createDataFrame(
        [  # reflexive closure; Strain ⊑ Taxon
            ("Taxon", "Taxon"),
            ("Strain", "Strain"),
            ("Strain", "Taxon"),
            ("Chemical", "Chemical"),
            ("Environment", "Environment"),
        ],
        "category string, ancestor string",
    )
    constraints = spark.createDataFrame(
        [("produces", "Taxon", "Chemical"), ("found_in", "Taxon", "Environment")],
        "predicate string, domain_category string, range_category string",
    )
    return nodes, ancestors, constraints


def test_validation_flags_only_violations(spark, kg_fixture):
    nodes, ancestors, constraints = kg_fixture
    edges = spark.createDataFrame(
        [
            ("T:1", "produces", "C:1"),   # ok
            ("T:2", "produces", "C:1"),   # ok via Strain ⊑ Taxon
            ("C:1", "produces", "T:1"),   # both sides wrong
            ("T:1", "found_in", "C:1"),   # range wrong
            ("E:1", "found_in", "E:1"),   # domain wrong
            ("T:1", "unconstrained", "E:1"),  # no constraint row → skipped
        ],
        "subject string, predicate string, object string",
    )
    out = {
        (r.subject, r.predicate, r.object): r.violation
        for r in domain_range_violations(edges, nodes, constraints, ancestors).collect()
    }
    assert out == {
        ("C:1", "produces", "T:1"): "both",
        ("T:1", "found_in", "C:1"): "range",
        ("E:1", "found_in", "E:1"): "domain",
    }


def test_validation_dangling_node_is_violation(spark, kg_fixture):
    nodes, ancestors, constraints = kg_fixture
    edges = spark.createDataFrame(
        [("T:999", "produces", "C:1")], "subject string, predicate string, object string"
    )
    rows = domain_range_violations(edges, nodes, constraints, ancestors).collect()
    assert len(rows) == 1
    assert rows[0].violation == "domain"
    assert rows[0].subject_category is None
