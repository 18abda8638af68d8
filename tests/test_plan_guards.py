"""Plan-regression guards over every driver entry (VERDICT r2 #9).

Locks in the round-2 plan properties:
- no CartesianProduct anywhere (BroadcastNestedLoopJoin against tiny
  range/dimension tables is allowed — that is the broadcast range join);
- the flagship kg_triples stays ZERO-broadcast (its round-2 rewrite's
  defining property: no corpus-derived broadcast, two shuffles);
- no EXPLICIT BroadcastExchange is fed by an UNFILTERED fact-table scan
  (round 1's scale-killer). A broadcast subtree may scan a fact table only
  through a Filter / pushed filter (e.g. the ANN query side, vec_id < 20).

The check reads the STATIC physical plan (AQE initial plan): runtime AQE
broadcast conversions never appear there, so only explicit F.broadcast()
hints — exactly the regressions we want to catch — can trip the guard.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
FACT_TABLES = ("documents", "lineitem", "orders", "events", "embeddings")

# queries that run non-plan work at call time (filesystem writes) or whose
# plan is built from freshly-written temp files — plan text is still checked
# but they need the write to happen first, which the call itself does.
QUERY_NAMES = sorted(em.queries().keys())


@pytest.fixture(scope="module", autouse=True)
def _no_auto_broadcast(spark):
    """At sf0.001 the parquet files are tiny, so Spark's SIZE-based planner
    legitimately broadcasts fact tables in the static plan. Disable the
    threshold for this module: any remaining BroadcastExchange comes from
    an EXPLICIT F.broadcast() hint — the only thing the guard polices."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan_string(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _indent(line: str) -> int:
    stripped = line.lstrip(" +-:*")
    return len(line) - len(stripped)


def _broadcast_subtrees(plan: str):
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        base = _indent(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                break
            if _indent(nxt) <= base:
                break
            sub.append(nxt)
        yield "\n".join(sub)


def _is_selective(subtree: str) -> bool:
    """True iff the subtree filters by something BEYOND the isnotnull
    conditions Catalyst auto-inserts on every join key — a broadcast of a
    full fact table still carries isnotnull filters, so those don't count."""
    for m in re.finditer(r"(^|\n)[\s+\-:*]*Filter[ (](.+)", subtree):
        residual = re.sub(r"isnotnull\([^)]*\)", "", m.group(2))
        if re.search(r"[<>=]|LIKE|StartsWith|Contains|IN\b| rlike", residual, re.IGNORECASE):
            return True
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", subtree):
        entries = [x.strip() for x in m.group(1).split(",") if x.strip()]
        if any(not x.startswith("IsNotNull") for x in entries):
            return True
    return False


def _scans_unfiltered_fact(subtree: str) -> bool:
    if not any(re.search(rf"{t}\.parquet", subtree) for t in FACT_TABLES):
        return False
    # A broadcast whose ROOT is a keyless (global) aggregate ships at most
    # one row no matter how big the scanned table is (the tfidf N-docs
    # scalar) — only the aggregate's output is broadcast, not the scan.
    # Root-only: a keyless agg deeper inside a wider broadcast subtree
    # would not bound the broadcast size.
    lines = [ln for ln in subtree.splitlines() if ln.strip()]
    if lines and re.match(r"[\s+\-:*]*HashAggregate\(keys=\[\]", lines[0]):
        return False
    return not _is_selective(subtree)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_plan_guards(spark, name):
    df = em.queries()[name](spark, SF)
    plan = _plan_string(df)
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"
    for sub in _broadcast_subtrees(plan):
        assert not _scans_unfiltered_fact(sub), (
            f"{name}: BroadcastExchange fed by an unfiltered fact-table scan\n{sub[:2000]}"
        )


def test_flagship_zero_broadcast(spark):
    plan = _plan_string(em.q_kg_triples(spark, SF))
    assert "BroadcastExchange" not in plan, "kg_triples must stay zero-broadcast"


# ---------------------------------------------------------------------------
# Pipeline DAG guards (VERDICT r3 #7): the same static-plan assertions over
# run_pipeline's stages, not just the driver entries.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipeline_result(spark):
    from kg_microbe_spark.plans.pipeline import run_pipeline
    from kg_microbe_spark.sources.synthetic import lexicon_df, pages_df

    return run_pipeline(spark, pages_df(spark, 300), lexicon_df(spark))


def test_pipeline_no_cartesian(spark, pipeline_result):
    for name in ("entities", "nodes", "edges", "triples"):
        plan = _plan_string(getattr(pipeline_result, name))
        assert "CartesianProduct" not in plan, f"pipeline.{name}: CartesianProduct"


def test_pipeline_dup_url_broadcast(spark, pipeline_result):
    """The url-dedup semi/anti joins must broadcast the (tiny, derived)
    dup-url dimension explicitly — AQE cannot rescue unknown-stats joins in
    time, and without the hint the full pages table shuffles (measured 46s
    of a 113s wall in round 2). autoBroadcastJoinThreshold is -1 in this
    module, so any BroadcastExchange present is the explicit hint."""
    plan = _plan_string(pipeline_result.entities)
    assert "BroadcastExchange" in plan, "dup-url broadcast hint missing from extract stage"


def test_pipeline_node_merge_is_partial_aggregation(spark, pipeline_result):
    """The A2 node merge must be the skew-absorbing aggregation (map-side
    partial min_by), never a window, and never behind a keyed
    pre-partitioning (hash or range repartition on id) that would route a
    hub id through one task before the partial agg can shrink it."""
    plan = _plan_string(pipeline_result.nodes)
    assert "Window" not in plan, "node merge regressed to a window argmax"
    assert "min_by" in plan
    assert "partial_min_by" in plan, "map-side partial aggregation missing"
    assert "rangepartitioning" not in plan.lower(), "keyed pre-partition before node dedup"


def test_pipeline_edge_merge_partial_aggregation(spark, pipeline_result):
    plan = _plan_string(pipeline_result.edges)
    assert "Window" not in plan
    # first-wins provenance via partial min/count before the triple-key shuffle
    assert "partial_min" in plan or "partial_count" in plan
