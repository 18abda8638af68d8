"""Unicode text normalization (NFC, accent strip, casefold-lite).

Step 0 of a web-crawl text pipeline: crawled pages mix precomposed and
combining-mark encodings of the same glyph, so exact dedup, dictionary
matching and token statistics all disagree with themselves until text is
brought to one canonical form. The reference normalizes its curated
names ASCII-side (chemical_mapping_utils-style lowercase/strip, already
shipped as F1 normalize_name); this module adds the Unicode layer a
10^12-document Common-Crawl corpus needs.

Spark-first honesty: the JVM side of stock Spark has NO Unicode
normalizer (java.text.Normalizer is not exposed as a SQL function and
this sandbox can't add ICU jars), so this is a DOCUMENTED Python-boundary
operator — Arrow-batched scalar pandas_udfs (never row-at-a-time), one
vectorized pass per batch, stateless and narrow: no shuffle, column
pruning unaffected, and at 100 TB it pipelines inside whatever scan
already reads the text column. Composition ``fold_text`` crosses the
boundary ONCE (NFC + strip marks + lower in a single UDF), not three
times.

Semantics (byte-parity with DuckDB's utf8proc implementations, proven by
the driver oracle): ``nfc`` = Unicode NFC; ``strip_accents`` = NFD →
drop Mn-category combining marks → NFC; ``fold`` = lower(strip_accents
(nfc)). Simple lowercase, NOT full casefold — ß stays ß — matching
utf8proc's lower() so both engines agree.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _nfc(s):
    return unicodedata.normalize("NFC", s) if s is not None else None


def _strip_accents(s):
    if s is None:
        return None
    bare = "".join(
        ch
        for ch in unicodedata.normalize("NFD", s)
        if unicodedata.category(ch) != "Mn"
    )
    return unicodedata.normalize("NFC", bare)


def _fold(s):
    return _strip_accents(s).lower() if s is not None else None


# pandas_udf resolves its return type against the ACTIVE session, so the
# decorators must run lazily (module import happens before any session in
# pytest collection); one construction per process, cached.
_UDF_CACHE: dict = {}


def _udf(name: str, fn):
    if name not in _UDF_CACHE:

        def _apply(s: pd.Series) -> pd.Series:
            return s.map(fn)

        _UDF_CACHE[name] = F.pandas_udf(_apply, "string")
    return _UDF_CACHE[name]


def nfc_col(text: Column) -> Column:
    """Unicode NFC normal form (Arrow-batched)."""
    return _udf("nfc", _nfc)(text)


def strip_accents_col(text: Column) -> Column:
    """Remove combining marks: NFD → drop Mn → NFC (Arrow-batched)."""
    return _udf("strip", _strip_accents)(text)


def fold_text_col(text: Column) -> Column:
    """lower(strip_accents(nfc(text))) in ONE Python-boundary crossing."""
    return _udf("fold", _fold)(text)
