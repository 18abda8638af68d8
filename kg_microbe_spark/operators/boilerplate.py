"""Cross-document boilerplate line removal (C4-style).

Web pages carry nav bars, cookie banners and footers that repeat across
a site; C4/Gopher-style corpus builds drop any line that occurs in ≥ N
distinct documents before training. The reference has no analog (curated
ontology inputs), so this is one of the LLM-data operators the task
brief adds as first-class.

Spark-first shape and 100-TB story:
  1. ``posexplode(split(text, sep))`` — narrow map, no shuffle;
  2. ``groupBy(line).agg(countDistinct(doc))`` — compiles to a
     (line, doc) dedup exchange then a line-keyed count exchange; a hub
     boilerplate line is SPREAD across docs on the first key (no
     straggler), and map-side partial dedup eats in-document repeats
     before any shuffle (plan-audited: partial_count + two-phase
     HashAggregate);
  3. line-frequency join back on the SAME key (``line``) — co-located
     with the aggregation's output partitioning, and AQE can take the
     broadcast path when the surviving frequent-line set is small;
  4. per-doc reassembly via ``collect_list(when(keep, struct(pos,line)))``
     (nulls skipped → removed lines vanish) + ``array_sort`` on the
     position — docs whose every line is boilerplate survive with ''.
Shuffle volume is ∝ lines + one doc-keyed agg; nothing is ever all-pairs
and no driver-side state exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frequency: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Drop every line occurring in ≥ ``min_doc_frequency`` distinct
    documents; return one row per input doc with ``clean_text`` (kept
    lines re-joined in original order), ``n_kept`` and ``n_removed``.

    Blank lines participate like any other line (a blank line in ≥ N
    docs is removed) — documented contract, matching the count-based
    rule rather than special-casing whitespace.
    """
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("line_docs")
    )
    tagged = lines.join(freq, "line").withColumn(
        "keep", F.col("line_docs") < F.lit(min_doc_frequency)
    )
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("keep"), F.struct("pos", "line")))
    )
    return tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(kept_structs, lambda x: x["line"]), sep
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
    )


def dedup_lines_keep_first(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Global exact-line deduplication KEEPING the single first
    occurrence — C4's "keep one of every duplicate span" rule at line
    granularity (Raffel et al. 2020 §2.2), the retention-minded sibling
    of ``remove_boilerplate_lines`` (which drops frequent lines from
    EVERY document, including the first).

    The winner of each line is the smallest (``id_col``, pos) pair via
    ``min(struct(...))`` — the A2 skew-absorbing aggregation form: a
    line repeated across a billion pages collapses in map-side
    partials, never through one reducer as a window would route it.
    Repeats of a line WITHIN its winning document also reduce to the
    single earliest position. Reassembly and the returned
    (``clean_text``, n_kept, n_removed) schema match
    ``remove_boilerplate_lines``; a document whose every line lost
    survives with ''.
    """
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    winners = lines.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("wd"), F.col("pos").alias("wp"))).alias(
            "_w"
        )
    )
    tagged = lines.join(winners, "line").withColumn(
        "keep",
        (F.col(id_col) == F.col("_w.wd")) & (F.col("pos") == F.col("_w.wp")),
    )
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("keep"), F.struct("pos", "line")))
    )
    return tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(kept_structs, lambda x: x["line"]), sep
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
    )
