"""KGX edge validation — biolink-style domain/range constraint checking.

The reference validates category compatibility through its biolink
hierarchy utilities (reference: kg_microbe/utils/biolink_hierarchy.py:
120-230 — most-specific-category selection and ancestor-aware
category-compatibility checks) and remaps non-biolink predicates so the
merged KG "validates cleanly" (transform_utils/ontologies/
ontologies_transform.py:1014-1016). This module is that check as a set
operator: given the edge table, the node table, a per-predicate
domain/range constraint table, and the category-ancestor table, emit
every edge whose subject or object category is incompatible with its
predicate's declared domain/range.

Spark shape (100-TB honest):
- constraints and the category hierarchy are model-sized (biolink has
  a few hundred categories / predicates) → both broadcast;
- node categories are fact-sized → the two edge-side lookups are plain
  shuffle equi-joins on node id, the same key the merge step already
  partitioned by, so AQE reuses the exchange;
- compatibility = "node category OR any of its ancestors equals the
  required category", computed by joining the (category, ancestor)
  closure table — set logic, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compatible(
    cat_col: str, required_col: str, ancestors: DataFrame, df: DataFrame, flag: str
) -> DataFrame:
    """Add boolean ``flag``: category equals the requirement or has it as
    an ancestor. ``ancestors`` is the REFLEXIVE closure (category,
    ancestor) — model-sized, broadcast."""
    anc = F.broadcast(
        ancestors.select(
            F.col("category").alias(f"_{flag}_cat"),
            F.col("ancestor").alias(f"_{flag}_anc"),
        )
    )
    joined = df.join(
        anc,
        (F.col(cat_col) == F.col(f"_{flag}_cat"))
        & (F.col(required_col) == F.col(f"_{flag}_anc")),
        "left",
    )
    return joined.withColumn(flag, F.col(f"_{flag}_cat").isNotNull()).drop(
        f"_{flag}_cat", f"_{flag}_anc"
    )


def domain_range_violations(
    edges: DataFrame,
    nodes: DataFrame,
    constraints: DataFrame,
    ancestors: DataFrame,
) -> DataFrame:
    """Edges violating their predicate's domain/range declaration.

    ``edges``: (subject, predicate, object); ``nodes``: (id, category);
    ``constraints``: (predicate, domain_category, range_category) —
    predicates absent from it are unconstrained (kept out of the
    report, matching the reference's fail-open posture, invariant B7);
    ``ancestors``: reflexive (category, ancestor) closure.

    Returns (subject, subject_category, predicate, object,
    object_category, violation) with violation ∈ {'domain', 'range',
    'both'}. A null category (node missing from the node table) is a
    violation — dangling edges are exactly what validation exists to
    catch.
    """
    subj_cat = nodes.select(
        F.col("id").alias("subject"), F.col("category").alias("subject_category")
    )
    obj_cat = nodes.select(
        F.col("id").alias("object"), F.col("category").alias("object_category")
    )
    con = F.broadcast(
        constraints.select("predicate", "domain_category", "range_category")
    )
    e = (
        edges.select("subject", "predicate", "object")
        .join(con, "predicate", "inner")  # unconstrained predicates drop out
        .join(subj_cat, "subject", "left")
        .join(obj_cat, "object", "left")
    )
    e = _compatible("subject_category", "domain_category", ancestors, e, "_dom_ok")
    e = _compatible("object_category", "range_category", ancestors, e, "_rng_ok")
    return (
        e.filter(~F.col("_dom_ok") | ~F.col("_rng_ok"))
        .select(
            "subject",
            "subject_category",
            "predicate",
            "object",
            "object_category",
            F.when(~F.col("_dom_ok") & ~F.col("_rng_ok"), F.lit("both"))
            .when(~F.col("_dom_ok"), F.lit("domain"))
            .otherwise(F.lit("range"))
            .alias("violation"),
        )
    )


def hierarchy_cycle_nodes(edges: DataFrame, child_col: str, parent_col: str) -> DataFrame:
    """Every node on a subclass-hierarchy cycle — the acyclicity check
    an ontology ingest must run before any rollup/closure consumer
    (a cyclic is-a chain makes descendant counts and LCA undefined;
    the reference's ontology transforms assume DAG-ness, reference:
    transform_utils/ontologies — this operator makes the assumption
    checkable).

    Composition, not a new traversal: the shipped depth-doubling
    ``closure.transitive_closure`` (which drops reflexive pairs, so a
    cycle manifests as MUTUAL reachability) + one self-semi-join on
    the swapped pair + the self-loop edges unioned back. Returns one
    column ``id``, distinct.
    """
    from kg_microbe_spark.operators.closure import transitive_closure

    as_spo = edges.select(
        F.col(child_col).alias("subject"),
        F.lit("subclass_of").alias("predicate"),
        F.col(parent_col).alias("object"),
    )
    c = transitive_closure(as_spo, "subclass_of").select("subject", "object")
    swapped = c.select(
        F.col("object").alias("subject"), F.col("subject").alias("object")
    )
    mutual = c.join(swapped, ["subject", "object"], "left_semi")
    self_loops = edges.filter(F.col(child_col) == F.col(parent_col)).select(
        F.col(child_col).alias("id")
    )
    return (
        mutual.select(F.col("subject").alias("id"))
        .unionByName(self_loops)
        .distinct()
    )


def predicate_cardinality(edges: DataFrame) -> DataFrame:
    """Per-predicate cardinality profile: (predicate, n_edges,
    n_subjects, n_objects, cardinality) where cardinality classifies
    the DISTINCT edge set exactly — '1-1' (both sides functional),
    'N-1' (every subject has exactly one object), '1-N' (every object
    has exactly one subject), 'N-N' — the audit a KG runs before
    choosing KGE scoring functions or merge strategies (TransE can't
    model N-N relations; a 'taxon_id' predicate that classifies N-N
    is a data bug worth a report row).

    The classification uses exact integer identities (n_edges ==
    n_subjects ⟺ functional over the distinct set) — no float
    thresholds. Scale shape: one distinct + one combinable groupBy
    with two count_distinct aggregates (Spark expands multi-distinct
    into an expand+two-pass plan — bounded by the predicate vocabulary
    on output, fact-sized in the middle, no collects).
    """
    e = edges.select("subject", "predicate", "object").distinct()
    prof = e.groupBy("predicate").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.count_distinct("subject").cast("long").alias("n_subjects"),
        F.count_distinct("object").cast("long").alias("n_objects"),
    )
    ne, ns, no = F.col("n_edges"), F.col("n_subjects"), F.col("n_objects")
    return prof.select(
        "predicate",
        "n_edges",
        "n_subjects",
        "n_objects",
        F.when((ne == ns) & (ne == no), F.lit("1-1"))
        .when(ne == ns, F.lit("N-1"))
        .when(ne == no, F.lit("1-N"))
        .otherwise(F.lit("N-N"))
        .alias("cardinality"),
    )


def functional_violations(
    edges: DataFrame,
    functional_predicates: list[str],
) -> DataFrame:
    """Rows (subject, predicate, n_objects) for every subject that has
    MORE THAN ONE distinct object under a predicate declared
    functional — the OWL FunctionalProperty consistency check
    (reference analog: kg_microbe's duplicate-edge audit treats a
    second object for an identity-like predicate as a merge error to
    fix, not a fact to keep).

    Scale shape: the predicate list is a literal isin filter (pushed
    to the scan), then one combinable groupBy(subject, predicate) with
    count_distinct(object) and a HAVING > 1 — output is violation-
    sized, never fact-sized.
    """
    if not functional_predicates:
        raise ValueError("functional_predicates must be non-empty")
    return (
        edges.filter(F.col("predicate").isin(list(functional_predicates)))
        .groupBy("subject", "predicate")
        .agg(F.count_distinct("object").cast("long").alias("n_objects"))
        .filter(F.col("n_objects") > 1)
    )
