"""Transform registry — the DATA_SOURCES dispatch table (§3.1) as a
registry of stage functions ``(spark, inputs) → (nodes_df, edges_df)``.

Each registered transform is a lazily-planned DataFrame DAG; ``transform``
and ``merge`` mirror the reference CLI verbs (run.py:77-121) with the
staged-merge workaround gone: the shuffle-based merge replaces
hold-everything-in-memory KGX."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

from kg_microbe_spark.operators.merge import merge_edges, merge_nodes

TransformFn = Callable[..., Tuple[DataFrame, DataFrame]]

_REGISTRY: Dict[str, TransformFn] = {}


def register(name: str):
    def deco(fn: TransformFn) -> TransformFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def available_sources() -> Sequence[str]:
    return sorted(_REGISTRY)


def validate_sources(names: Sequence[str]) -> None:
    """Fail-fast pre-validation (merge_kg.py:73-90): unknown source names
    abort before any long-running work."""
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        raise ValueError(f"unknown sources {unknown}; available: {available_sources()}")


def transform(spark: SparkSession, names: Optional[Sequence[str]] = None, **kwargs):
    names = list(names) if names else available_sources()
    validate_sources(names)
    return {n: _REGISTRY[n](spark, **kwargs) for n in names}


def merge(results: Dict[str, Tuple[DataFrame, DataFrame]]):
    nodes = merge_nodes([v[0] for v in results.values()])
    edges = merge_edges([v[1] for v in results.values()])
    return nodes, edges


@register("webtext")
def _webtext_transform(spark: SparkSession, n_pages: int = 200, tau: float = 0.0, **_):
    from kg_microbe_spark.plans.pipeline import run_pipeline
    from kg_microbe_spark.sources.synthetic import lexicon_df, pages_df

    res = run_pipeline(spark, pages_df(spark, n_pages), lexicon_df(spark), tau=tau)
    return res.nodes, res.edges
