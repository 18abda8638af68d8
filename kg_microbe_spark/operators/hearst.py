"""Hearst-pattern hypernym extraction: typed is-a triples from raw text.

The flagship pipeline emits co-occurrence edges; a KG also needs TYPED
edges, and the classic zero-supervision source is Hearst patterns
("X such as Y", "Y and other X", "Y is an X") — the web-text analogue
of the reference's curated subclass_of rows (kg_microbe ontology
transforms emit biolink:subClassOf edges from OBO is_a axioms; here the
crawl text itself asserts them).

Spark-first shape: each pattern is ONE pair of ``regexp_extract_all``
calls (hypernym group / hyponym-list group of the same regex) zipped
positionally — identical mechanism to operators/anchors.py — then a
conjunction split + explode, all codegen, no Python. Evidence
aggregation is one combinable ``groupBy(hyponym, hypernym)`` carrying
per-doc-deduped rows, so a boilerplate sentence repeated on a billion
pages contributes map-side-shrunk (pair, doc) units, and n_docs is the
spam-robust confidence the fusion operator (operators/fusion.py) can
calibrate downstream.

Patterns use single lowercase words as terms (the no-parser setting);
a production deployment widens the term regex, the plan shape is
unchanged. All regexes are RE2-safe so DuckDB oracles run them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, regex, hypernym_group, hyponym_list_group)
HEARST_PATTERNS = [
    (
        "such_as",
        r"\b([a-z]+) such as ([a-z]+(?:, [a-z]+)*(?:,? and [a-z]+)?)",
        1,
        2,
    ),
    ("and_other", r"\b([a-z]+) and other ([a-z]+)\b", 2, 1),
    ("is_a", r"\b([a-z]+) is an? ([a-z]+)\b", 2, 1),
]

# conjunction separators inside a hyponym list ("w1, w2 and w3")
_LIST_SPLIT = r", | and "


def extract_hearst(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One row per (doc, hyponym, hypernym, pattern) occurrence,
    de-duplicated within each document."""
    parts = []
    for name, pat, hyper_g, hypo_g in HEARST_PATTERNS:
        hypers = F.regexp_extract_all(
            F.col(text_col), F.lit(pat), hyper_g
        )
        hypos = F.regexp_extract_all(F.col(text_col), F.lit(pat), hypo_g)
        pair = F.explode(
            F.arrays_zip(hypers.alias("hyper"), hypos.alias("hypo_list"))
        )
        parts.append(
            docs.select(F.col(id_col), pair.alias("m"))
            .select(
                id_col,
                F.col("m.hyper").alias("hypernym"),
                F.explode(
                    F.split(F.col("m.hypo_list"), _LIST_SPLIT)
                ).alias("hyponym"),
            )
            .withColumn("pattern", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(
        (F.col("hyponym") != "") & (F.col("hyponym") != F.col("hypernym"))
    ).distinct()


def hearst_triples(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Aggregated is-a triples: (hyponym, 'subclass_of', hypernym) with
    ``n_docs`` (distinct supporting documents — the spam-robust count)
    and ``patterns`` (sorted distinct pattern names, provenance)."""
    ev = extract_hearst(docs, id_col, text_col)
    per_doc = ev.select(id_col, "hyponym", "hypernym", "pattern").distinct()
    return per_doc.groupBy("hyponym", "hypernym").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.array_join(F.sort_array(F.collect_set("pattern")), ",").alias(
            "patterns"
        ),
    ).select(
        "hyponym",
        F.lit("subclass_of").alias("predicate"),
        "hypernym",
        "n_docs",
        "patterns",
    )
