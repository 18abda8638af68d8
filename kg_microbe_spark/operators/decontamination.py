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


def decontaminate_spans(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Span-level decontamination: EXCISE every token covered by a
    benchmark-overlapping n-gram instead of dropping the document (the
    removal variant of Lee et al.'s dedup criterion, applied to eval
    contamination — keeps the clean remainder of long pages).

    Returns ``(id_col, n_tokens, n_removed, clean_text)``.

    Shape: shingle positions probe the SAME broadcast benchmark set as
    :func:`decontaminate` (corpus side never shuffles on the join); hit
    START positions flow back through ONE combinable
    groupBy(doc).collect_set whose size is bounded by the document's
    own shingle count (boilerplate-reassembly discipline, operators/
    boilerplate.py); token excision and reassembly are IN-ROW
    higher-order expressions — no second shuffle, no window, no UDF.
    A document shorter than ``n`` tokens has one whole-text shingle: a
    hit there removes the entire text (mirrors the drop semantics).
    """
    from kg_microbe_spark.operators.dedup import normalize_doc_text_col

    bset = benchmark_shingles(bench, text_col, n)
    toks = F.split(normalize_doc_text_col(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    size = F.size("_toks")
    span = F.when(size < n, size).otherwise(F.lit(n))
    k = F.greatest(size - F.lit(n - 1), F.lit(1))
    sh = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.struct(
                    i.alias("start"),
                    F.array_join(
                        F.slice("_toks", i, n), " "
                    ).alias("shingle"),
                ),
            )
        ).alias("_s"),
    ).select(F.col(id_col), F.col("_s.start").alias("start"), F.col("_s.shingle").alias("shingle"))
    hit_starts = (
        sh.join(F.broadcast(bset), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("_starts"))
    )
    joined = base.join(hit_starts, id_col, "left").select(
        F.col(id_col),
        F.col("_toks"),
        F.coalesce("_starts", F.array().cast("array<int>")).alias("_starts"),
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), size),
            lambda p: F.struct(
                p.alias("pos"), F.get(F.col("_toks"), p - 1).alias("tok")
            ),
        ),
        lambda s: ~F.exists(
            F.col("_starts"),
            lambda st: (s["pos"] >= st) & (s["pos"] <= st + span - 1),
        ),
    )
    return joined.select(
        F.col(id_col),
        size.cast("long").alias("n_tokens"),
        (size - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda s: s["tok"]), " ").alias(
            "clean_text"
        ),
    )
