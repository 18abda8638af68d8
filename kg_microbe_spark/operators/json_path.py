"""F8 — dot-path JSON traversal returning scalar lists.

Reference semantics: bacdive.py:1012-1057 ``_extract_value_from_json_path``
walks a parsed JSON document along a dot path; when a node on the path is a
*list*, the remaining path is mapped over its elements and the results are
flattened, so the function always yields a list of scalars (possibly empty).

Spark-first re-expression: JSONPath already encodes the list-map step as
``[*]`` and ``get_json_object`` evaluates it JVM-side, so the operator is

    get_json_object(col, '$.' + path)  →  raw JSON node
    node is an array  → from_json(node, array<type>)
    node is a scalar  → single-element array
    node is absent    → empty array

No Python touches the rows. Callers translate the reference's dot path to
JSONPath by writing ``[*]`` where a list occurs (``isolation.samples[*].ph``
for the reference's ``isolation.samples.ph``); a path that hits an
unexpected object shape yields NULL elements, which are filtered — the
reference likewise skips non-scalar leaves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_path_values(col: Column, path: str, elem_type: str = "string") -> Column:
    """array<elem_type> of the scalar values at ``path`` (JSONPath without
    the leading ``$.``)."""
    node = F.get_json_object(col, f"$.{path}")
    as_array = F.from_json(node, f"array<{elem_type}>")
    # get_json_object returns scalars UNQUOTED, so a from_json round-trip is
    # malformed for string leaves ("hello" -> [hello] is not JSON); a plain
    # cast is the identity for strings and correct for numerics. Object
    # leaves ({...}) are non-scalar — the reference skips them.
    # CONTRACT LIMIT: because scalars arrive unquoted, a STRING leaf whose
    # value itself begins with '[' or '{' (e.g. "[x") is indistinguishable
    # from an array/object node and is dispatched as one (dropped/mangled
    # instead of returned as the scalar). Accepted residual: the reference
    # likewise keys on leaf shape; documented in tests/test_binning_jsonpath.
    as_scalar = F.array(node.cast(elem_type))
    arr = (
        F.when(node.isNull(), F.array().cast(f"array<{elem_type}>"))
        .when(node.startswith("["), as_array)
        .when(node.startswith("{"), F.array().cast(f"array<{elem_type}>"))
        .otherwise(as_scalar)
    )
    return F.filter(F.coalesce(arr, F.array().cast(f"array<{elem_type}>")), lambda x: x.isNotNull())


def explode_json_path(
    df: DataFrame, json_col: str, path: str, out_col: str, elem_type: str = "string"
) -> DataFrame:
    """One output row per scalar at ``path`` (rows with no values drop out,
    like the reference returning [] — use explode_outer semantics upstream
    if empty docs must survive)."""
    return df.withColumn(out_col, F.explode(json_path_values(F.col(json_col), path, elem_type)))
