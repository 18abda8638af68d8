"""Verb-mediated relation candidates between co-mentioned entities.

KG-construction use: Hearst patterns (operators/hearst.py) yield is-a
edges; everything else the reference's curated transforms assert
(consumes, produces, found_in — the PReGO/BacDive predicate families)
has a crawl-text counterpart: two linked entities in one sentence with
a known relation verb between them. This operator turns the mention
table (operators/mentions.py output, which carries character offsets)
plus a small curated verb→predicate lexicon into candidate triples
with distinct-document evidence counts — the raw material
operators/fusion.py's noisy-OR combines with curated sources.

100-TB shape (the kg_triples discipline, applied to offsets):

* mentions pack per doc into ONE sorted capped array — a single
  combinable groupBy(url); the cap bounds all downstream in-row work
  no matter how mention-dense a page is;
* pair generation + gap window + between-text verb probe are ALL
  in-row higher-order expressions over that array zipped with the
  page text (one co-keyed equi-join on url — mentions derive from
  pages, so AQE co-partitions the two scans); never a mention×mention
  self-join;
* the verb lexicon is a literal array in the plan (curated, dozens of
  entries — the reference's predicate tables are this small), so the
  probe is pure codegen;
* evidence aggregation = in-row per-doc distinct before explode, then
  ONE combinable groupBy(subject, predicate, object).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_VERBS = 512  # literal-array plan budget; curated lexicons are tiny


def relation_candidates(
    mentions: DataFrame,
    pages: DataFrame,
    verbs: Sequence[str],
    url_col: str = "url",
    entity_col: str = "curie",
    start_col: str = "start",
    end_col: str = "end",
    text_col: str = "text",
    max_gap: int = 40,
    max_mentions_per_doc: int = 32,
) -> DataFrame:
    """mentions(url, curie, start, end — 0-based char offsets into the
    page text) + pages(url, text) + relation verbs →
    (subject, predicate, object, n_docs). A candidate fires when two
    DIFFERENT entities appear ≤ ``max_gap`` chars apart and the text
    between them contains a lexicon verb (first lexicon verb in
    between-text order wins — deterministic); subject is the earlier
    mention. Offsets must refer to the passed ``text_col``."""
    if not verbs:
        raise ValueError("verbs must be non-empty")
    if len(verbs) > MAX_VERBS:
        raise ValueError(
            f"{len(verbs)} verbs exceeds the literal-array budget "
            f"{MAX_VERBS}; ship the lexicon as a broadcast join instead"
        )
    verb_arr = F.array(*[F.lit(v.lower()) for v in sorted(set(verbs))])
    cap = max_mentions_per_doc
    packed = (
        mentions.select(
            F.col(url_col).alias("url"),
            F.struct(
                F.col(start_col).cast("long").alias("s"),
                F.col(end_col).cast("long").alias("e"),
                F.col(entity_col).alias("c"),
            ).alias("m"),
        )
        .distinct()
        .groupBy("url")
        .agg(F.slice(F.sort_array(F.collect_set("m")), 1, cap).alias("ms"))
    )
    joined = packed.join(
        pages.select(F.col(url_col).alias("url"), F.col(text_col).alias("_txt")),
        on="url",
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                "ms",
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + F.lit(2), cap),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        ),
        lambda p: (p["b"]["s"] - p["a"]["e"]).between(1, max_gap)
        & (p["a"]["c"] != p["b"]["c"]),
    )
    exploded = joined.select(
        "url", "_txt", F.explode(pairs).alias("p")
    ).select(
        "url",
        F.col("p.a.c").alias("subject"),
        F.col("p.b.c").alias("object"),
        F.lower(
            F.substring(
                "_txt",
                (F.col("p.a.e") + 1).cast("int"),
                (F.col("p.b.s") - F.col("p.a.e")).cast("int"),
            )
        ).alias("between"),
    )
    predicate = F.get(
        F.filter(
            F.split(F.col("between"), r"[^a-z]+"),
            lambda t: F.array_contains(verb_arr, t),
        ),
        0,
    )
    return (
        exploded.select("url", "subject", predicate.alias("predicate"), "object")
        .filter(F.col("predicate").isNotNull())
        .distinct()
        .groupBy("subject", "predicate", "object")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def map_predicates(
    candidates: DataFrame, verb_to_predicate: Mapping[str, str]
) -> DataFrame:
    """Rename lexicon verbs to curated predicate CURIEs (e.g.
    'consumes' → 'biolink:consumes') via an ordered when-chain — the
    F2 prefix-compaction idiom; unmapped verbs pass through."""
    col = F.col("predicate")
    out = None
    for verb, pred in sorted(verb_to_predicate.items()):
        branch = F.when(col == verb.lower(), F.lit(pred))
        out = branch if out is None else out.when(col == verb.lower(), F.lit(pred))
    mapped = out.otherwise(col) if out is not None else col
    return candidates.withColumn("predicate", mapped)
