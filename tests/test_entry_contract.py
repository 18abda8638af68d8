"""Driver-contract smoke: entry() runs on sf0.001 and every queries() key
has a matching oracle (or is deliberately rows-only)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# greedy_set_cover is the single deliberate rows-only entry: k rounds of
# data-dependent argmax (each pick reshapes later marginal gains) have no
# SQL expression; its brute-force equivalence is pytest-pinned instead
# (test_r5_bm25_pareto_attribution_cover.py).
ROWS_ONLY: set[str] = {"greedy_set_cover"}


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"subject", "predicate", "object"} <= set(df.columns)


def test_queries_oracle_alignment():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == ROWS_ONLY


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_each_query_runs_sf0001(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    # schema materializes and the query executes
    assert df.columns
    df.limit(5).collect()
