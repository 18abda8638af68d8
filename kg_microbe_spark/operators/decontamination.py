"""Benchmark n-gram decontamination for training corpora.

Before a web corpus becomes LLM training data, every document that
shares long word n-grams with an evaluation benchmark must be flagged
(the GPT-3 / PaLM "13-gram decontamination" procedure). The reference
pipeline has no analog — this is part of the training-data operator
family the graft adds on top of kg-microbe's KG semantics (SURVEY §6).

Spark-first shape, sized for 100 TB of documents vs a ~MB benchmark:

1. The benchmark side is tiny (eval suites are thousands of documents).
   Its distinct shingle set is built once and **broadcast** — the probe
   is a broadcast LEFT SEMI per exploded shingle, so the fact table is
   scanned once with NO shuffle on the corpus side at all.
2. Corpus shingles are exploded narrowly (explode is a map-side op) and
   pre-deduplicated per doc (``array_distinct``) so a pathological page
   repeating one contaminated n-gram contributes one probe row.
3. The per-doc verdict is a map-side-combinable ``groupBy(doc_id)``
   count — the only shuffle, and it carries just the CONTAMINATED
   shingle hits, not the corpus.

At a real 10^12-document scale the broadcast comfortably holds: 50k
benchmark docs × ~200 13-grams ≈ 10M strings; beyond broadcast reach
the same plan degrades gracefully to a shuffle hash join on the
shingle (drop the hint), still linear in corpus shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.operators.dedup import shingles_col


def benchmark_shingles(bench: DataFrame, text_col: str, n: int = 13) -> DataFrame:
    """Distinct word n-grams of the benchmark suite: one small DataFrame
    with a single ``shingle`` column, ready to broadcast."""
    return (
        bench.select(
            F.explode(F.array_distinct(shingles_col(F.col(text_col), n))).alias(
                "shingle"
            )
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    max_hits: int = 0,
) -> DataFrame:
    """Per-document contamination verdict vs a benchmark suite.

    Returns one row per input document: ``(id_col, n_hit_shingles,
    keep)`` where ``n_hit_shingles`` counts DISTINCT doc shingles that
    appear anywhere in the benchmark and ``keep`` is true iff the count
    is <= ``max_hits`` (0 = strict drop-on-any-overlap).
    """
    bset = benchmark_shingles(bench, text_col, n)
    doc_shingles = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), n))).alias(
            "shingle"
        ),
    )
    # Broadcast semi probe: corpus side never shuffles on the join.
    hits = doc_shingles.join(F.broadcast(bset), "shingle", "left_semi")
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_shingles")
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_shingles", F.lit(0))
            .cast("long")
            .alias("n_hit_shingles"),
        )
        .withColumn("keep", F.col("n_hit_shingles") <= F.lit(max_hits))
    )
