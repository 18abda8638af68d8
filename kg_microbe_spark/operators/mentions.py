"""Stage 3 — MENTIONS: dictionary/trie mention detection over page text.

The automaton is built once on the driver from the (small) name index,
broadcast, and reconstructed at most once per executor; each Arrow batch of
pages is scanned in C-speed-ish pure Python inside ``mapInPandas``. This is
the N1/N2 operator family (SURVEY.md §2.9) re-expressed for free text: the
reference annotates *distinct terms once* and joins results back (A8); here
the text IS the term stream, and the distinct-join trick reappears at link
time (mentions are aggregated per (url, term) before the lexicon join).

Matching happens on F1-normalized text (lower, Greek→ASCII, punctuation
strip, whitespace collapse) so the pattern space equals the name-index
``term_norm`` space.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.automaton import FirstWordIndex, build_matcher
from kg_microbe_spark.functions.normalize import normalize_name_py
from kg_microbe_spark.schemas import MENTIONS_SCHEMA


def scan_mentions(extracted: DataFrame, name_index: DataFrame) -> DataFrame:
    """extracted(url,text,…) × name_index → mentions(url, surface,
    term_norm, start, end). Offsets refer to the normalized text."""
    spark = extracted.sparkSession
    patterns: List[str] = [r.term_norm for r in name_index.select("term_norm").distinct().collect()]
    matcher = build_matcher(patterns)
    bc = spark.sparkContext.broadcast(matcher)

    import pandas as pd

    def _scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac: FirstWordIndex = bc.value
        for pdf in batches:
            urls: List[str] = []
            surfaces: List[str] = []
            starts: List[int] = []
            ends: List[int] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                norm = normalize_name_py(text)
                for s, e, surface in ac.find_mentions(norm):
                    urls.append(url)
                    surfaces.append(surface)
                    starts.append(s)
                    ends.append(e)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "surface": pd.Series(surfaces, dtype="object"),
                    "term_norm": pd.Series(surfaces, dtype="object"),
                    "start": pd.Series(starts, dtype="int32"),
                    "end": pd.Series(ends, dtype="int32"),
                }
            )

    return extracted.select("url", "text").mapInPandas(_scan, MENTIONS_SCHEMA)


def aggregate_mentions(mentions: DataFrame) -> DataFrame:
    """A8 distinct-mention batching: one row per (url, term_norm) with an
    occurrence count — map-side combinable, shrinks the join input by the
    hub-term factor before the lexicon join."""
    return mentions.groupBy("url", "term_norm").agg(F.count("*").alias("n_mentions"))
