"""KGX schema normalization — the merge-time defensive pass
(merge_kg.py:127-336) re-expressed declaratively.

In the reference this machinery exists because csv writers can't enforce
schemas; under Spark most of it is free at write time, but inputs arriving
FROM the reference's ecosystem (KGX TSVs) still need: leaked-column drops,
legacy renames, duplicate-column coalesce, and CR stripping.

Also F13: biolink category consolidation by hierarchy depth
(utils/biolink_hierarchy.py, consolidate_categories.py) — multi-valued
pipe-delimited category cells collapse to the most-specific category.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge_kg.py:56-58 — KGX-leaked columns dropped at merge
KGX_LEAKED_COLUMNS = ("subsets", "meta", "id_edge")
# merge_kg.py:252-268 — legacy rename
LEGACY_RENAMES = {"knowledge_source": "primary_knowledge_source"}


def normalize_kgx_frame(df: DataFrame, canonical_columns: Sequence[str]) -> DataFrame:
    """Drop leaked columns, apply legacy renames, strip CR/LF from every
    string cell, coalesce duplicate-intent columns, and project the
    canonical header (missing columns filled with '')."""
    out = df
    for old, new in LEGACY_RENAMES.items():
        if old in out.columns and new not in out.columns:
            out = out.withColumnRenamed(old, new)
        elif old in out.columns and new in out.columns:
            # first-non-empty coalesce (merge_kg.py:326-336)
            out = out.withColumn(
                new,
                F.when(
                    (F.col(new).isNull()) | (F.trim(F.col(new)) == ""), F.col(old)
                ).otherwise(F.col(new)),
            ).drop(old)
    drop = [c for c in KGX_LEAKED_COLUMNS if c in out.columns]
    if drop:
        out = out.drop(*drop)
    for c, t in out.dtypes:
        if t == "string":
            out = out.withColumn(c, F.regexp_replace(F.col(c), r"[\r\n]", ""))
    selected = [
        (F.col(c) if c in out.columns else F.lit("").alias(c)).alias(c) for c in canonical_columns
    ]
    extras = [F.col(c) for c in out.columns if c not in canonical_columns]
    return out.select(*selected, *extras)


# ---------------------------------------------------------------------------
# F13 — category consolidation by biolink hierarchy depth.
# ---------------------------------------------------------------------------

# Depths DERIVED by BFS over the is_a hierarchy (functions/biolink.py),
# exactly like the reference's walk over biolink-model.yaml
# (utils/biolink_hierarchy.py:100-109) — no hand-maintained depth table.
# Unknown categories fall back identically to the reference (fail open).
from kg_microbe_spark.functions.biolink import compute_depths as _compute_depths

BIOLINK_CATEGORY_DEPTH: Dict[str, int] = _compute_depths()


def consolidate_category_col(category: Column, depth_map: Optional[Dict[str, int]] = None) -> Column:
    """Pipe-delimited multi-category cell → single most-specific category
    (max depth; lexicographic tiebreak for determinism). Unknown categories
    get depth -1 so any known category beats them, but a cell of only
    unknowns keeps its (sorted-first) value — fail open, B7."""
    depth_map = depth_map or BIOLINK_CATEGORY_DEPTH
    m = F.create_map(*[F.lit(x) for kv in depth_map.items() for x in kv])
    cats = F.split(category, r"\|")
    ranked = F.transform(
        cats,
        lambda c: F.struct(
            F.coalesce(m[c], F.lit(-1)).alias("depth"),
            # invert string order inside max: we want max depth, then MIN
            # category name; array_max on struct is lexicographic, so carry
            # the category twice and resolve the name outside
            c.alias("cat"),
        ),
    )
    max_depth = F.array_max(F.transform(ranked, lambda s: s["depth"]))
    winners = F.filter(ranked, lambda s: s["depth"] == max_depth)
    return F.array_min(F.transform(winners, lambda s: s["cat"]))
