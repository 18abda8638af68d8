"""Explicit per-rule document quality gates (Gopher-style).

``functions/text.py quality_score_col`` ships the composite score; a
production webtext pipeline ALSO needs the rule-by-rule form (Rae et
al. 2021, "Scaling Language Models", Appendix A: word-count bounds,
mean-word-length bounds, alphabetic-word fraction, stopword presence,
symbol-to-word ratio) because filters are tuned, audited, and ablated
PER RULE — a single scalar can't tell you which rule fired.

Exactness contract: every ratio threshold is evaluated as an INTEGER
cross-multiplication (e.g. alpha fraction >= 0.8 as
``10*n_alpha >= 8*n_words``), never as a float comparison — so the
flags are bit-stable across engines and never sit on a rounding
boundary. The reference repo has no document-quality family (static
ontology inputs); this is task-brief webtext scope.

100-TB shape: one pure-projection pass, zero shuffles, zero UDFs —
every rule is a JVM expression over the split-token array, so the
filter whole-stage-codegens and pushes nothing to Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "a", "and", "of", "to", "be", "that", "with",
)


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: w != F.lit("")
    )


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_alpha_word_pct: int = 80,
    max_symbol_pct: int = 10,
    min_stop_hits: int = 2,
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """One row per document with the rule counters, one boolean flag
    per Gopher rule, and the conjunction ``passes``.

    Counters: ``n_words`` (whitespace tokens), ``n_alpha_words``
    (tokens containing an ASCII letter), ``stop_hits`` (DISTINCT
    stopwords present), ``n_symbols`` ('#' characters plus '...'
    occurrences). ``sum_word_len`` is total non-whitespace characters,
    so mean word length bounds become the exact integer comparisons
    ``min*n_words <= sum_word_len <= max*n_words``. Percent thresholds
    are integer percents for the same reason.
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words).cast("long")
    sum_word_len = F.length(F.regexp_replace(text, r"\s", "")).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    ).cast("long")
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / F.lit(3)
    n_symbols = (n_hash + n_ellipsis).cast("long")

    base = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        sum_word_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        stop_hits.alias("stop_hits"),
        n_symbols.alias("n_symbols"),
    )
    nw = F.col("n_words")
    flag_word_count = (nw >= min_words) & (nw <= max_words)
    flag_mean_len = (
        (F.col("sum_word_len") >= F.lit(min_mean_word_len) * nw)
        & (F.col("sum_word_len") <= F.lit(max_mean_word_len) * nw)
        & (nw > 0)
    )
    flag_alpha = F.lit(100) * F.col("n_alpha_words") >= F.lit(
        min_alpha_word_pct
    ) * nw
    flag_stop = F.col("stop_hits") >= min_stop_hits
    flag_symbol = F.lit(100) * F.col("n_symbols") <= F.lit(max_symbol_pct) * nw
    return base.select(
        "*",
        flag_word_count.alias("flag_word_count"),
        flag_mean_len.alias("flag_mean_word_len"),
        flag_alpha.alias("flag_alpha_words"),
        flag_stop.alias("flag_stopwords"),
        flag_symbol.alias("flag_symbols"),
        (
            flag_word_count
            & flag_mean_len
            & flag_alpha
            & flag_stop
            & flag_symbol
        ).alias("passes"),
    )


def flesch_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948: 206.835 −
    1.015·words/sentences − 84.6·syllables/words) — the readability
    dial quality pipelines report beside the Gopher gates (template
    spam scores implausibly high; OCR soup implausibly low).

    Approximations, chosen for ENGINE PORTABILITY (both sides are
    RE2-safe regex counts, so the DuckDB oracle replays them exactly):
    sentences = max(1, number of [.!?]+ runs); syllables = number of
    [aeiouy]+ runs in the lowercased text (vowel runs never span
    whitespace, so the whole-text count equals the per-word sum).
    The score is ONE float dataflow from three exact integer counts,
    rounded to 6 dp; empty documents report NULL.

    Pure codegen projection — zero shuffles, zero UDFs.
    """
    text = F.col(text_col)
    n_words = F.size(_words(text)).cast("long")
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sentences.cast("double"))
        - F.lit(84.6) * (n_syllables.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
        F.when(n_words > 0, F.round(score, 6)).alias("flesch"),
    )
