"""Text-analysis functions for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting. All pure JVM
column expressions (split/regexp/aggregate) — no UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword-ratio
# language-ID heuristic. Deliberately small + deterministic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "on", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"],
    "es": ["el", "la", "los", "que", "de", "es", "para", "con", "una", "por"],
    "pt": ["o", "a", "os", "que", "de", "é", "para", "com", "uma", "não"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


BPE_ISH_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"  # RE2-safe: portable to DuckDB oracles


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: alnum runs + standalone punctuation marks
    (≈ GPT-style pre-tokenizer granularity). No lookarounds → same regex
    runs on Java regex and RE2."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    stops = LANG_STOPWORDS[lang]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stops)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_score_col(text: Column, lang: str) -> Column:
    toks = tokens_col(text)
    stops = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(stops)))


def predict_lang_col(text: Column) -> Column:
    """Language ID = argmax over per-language stopword hit counts; 'und'
    when no profile scores > 0. Deterministic tie-break: language name
    ascending (greatest + ordered when-chain — the same shape an ANSI-SQL
    oracle uses, so both sides break ties identically)."""
    scores = {lang: lang_score_col(text, lang) for lang in sorted(LANG_STOPWORDS)}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in sorted(scores):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def predict_lang_staged(df, text_col: str = "text", out_col: str = "predicted", keep_cols=()):
    """Same classifier as :func:`predict_lang_col`, factored into three
    projections so tokenization runs ONCE per row (optimization r06,
    guide §4.1/§2.3 'project early').

    The inline Column form re-evaluates ``split(lower(text))`` at every
    reference site — ~6 languages × 6 comparison sites ≈ 36 splits per row
    in the physical plan (verified in plans/r06/lang_id_before.txt) —
    because higher-order functions are interpreted expressions with no
    codegen common-subexpression elimination. Staged projections survive
    CollapseProject (the rule refuses to inline non-cheap expressions that
    are referenced more than once), so the plan keeps: tokenize → one
    stopword-count pass per language → cheap argmax over the counts.

    Output rows are identical to ``predict_lang_col`` (same scores, same
    ``und`` rule, same sorted-language tie-break)."""
    langs = sorted(LANG_STOPWORDS)
    keep = list(keep_cols)
    toked = df.select(*keep, tokens_col(F.col(text_col)).alias("_toks"))
    scored = toked.select(
        *keep,
        *[
            F.size(
                F.filter(F.col("_toks"), (lambda stops: (lambda t: t.isin(stops)))(LANG_STOPWORDS[la]))
            ).alias(f"_s_{la}")
            for la in langs
        ],
    )
    best = F.greatest(*[F.col(f"_s_{la}") for la in langs])
    expr = F.when(best <= 0, F.lit("und"))
    for la in langs:
        expr = expr.when(F.col(f"_s_{la}") == best, F.lit(la))
    return scored.select(*keep, expr.alias(out_col))


def punct_ratio_col(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"(?U)[\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def mean_word_len_col(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score_col(text: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    sane punctuation + sane word length. Weights fixed and documented so the
    score is reproducible."""
    n_tok = token_count_col(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio_col(text, lang) >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio_col(text) <= 0.2, 1.0).otherwise(0.0)
    wl = mean_word_len_col(text)
    wl_ok = F.when((wl >= 2.0) & (wl <= 12.0), 1.0).otherwise(0.0)
    return (len_ok * 0.4 + stop_ok * 0.3 + punct_ok * 0.2 + wl_ok * 0.1).cast("double")


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key (portable across engines, unlike xxhash)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), r"(?U)\s+", " "))


def rolling_fingerprints_col(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: md5 of each `window`-token
    span; downstream picks minima per band for robust near-dup detection."""
    toks = tokens_col(text)
    k = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    idx = F.sequence(F.lit(1), k)
    return F.transform(idx, lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")))


def char_entropy_col(text: Column) -> Column:
    """Shannon entropy (nats) of the character distribution — the
    gibberish/encoded-blob detector that complements the word-level
    quality score (base64 dumps and minified JS sit far above prose,
    aaaa-spam far below). Pure higher-order JVM expressions: the char
    histogram is built IN-ROW (array_distinct + per-char filter count),
    so the operator is a narrow zero-shuffle projection at any corpus
    size — the per-row cost is O(distinct_chars × len), with
    distinct_chars bounded by the alphabet, not the document."""
    chars = F.regexp_extract_all(text, F.lit("."), 0)
    n = F.size(chars)
    ent = F.aggregate(
        F.transform(
            F.array_distinct(chars),
            lambda c: F.size(F.filter(chars, lambda x: x == c)),
        ),
        F.lit(0.0),
        lambda acc, cnt: acc
        - (cnt.cast("double") / n) * F.log(cnt.cast("double") / n),
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(ent)
