"""Scalar normalization / canonicalization functions (SURVEY.md §2.8).

Each function exists twice, deliberately:

- a **pure-Python** version (``*_py``) — used by the test oracle and inside
  pandas UDFs; byte-identical to the reference semantics it models;
- a **Spark Column** version — the JVM-side expression used in the hot path
  (whole-stage codegen, no Python), proven equal to the Python version by
  property tests.

Reference analogues (semantics, not code):
- F1 normalize_name: /root/reference/kg_microbe/utils/chemical_mapping_utils.py:92-131
- F2 prefix compaction: /root/reference/kg_microbe/transform_utils/constants.py:907-925
  (insertion-order-sensitive alternation, longest/most-specific first)
- F4 id/label sanitization: constants.py:547-557
- F6 CR/LF strip: /root/reference/kg_microbe/merge_utils/merge_kg.py:202-206
- F7 float parse w/ 0.0 fallback: transform_utils/prego/prego.py:146-160
- F11 taxonomy-string parse: transform_utils/gtdb/gtdb.py:129-169
"""

from __future__ import annotations

import math
import re
from typing import Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1 — normalize_name
# ---------------------------------------------------------------------------

GREEK_MAP = {"α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta", "μ": "mu"}

_HYDRATE_SUFFIX_RE = re.compile(r"\s*[x·*.]\s*(?:\d+|n)\s*h2o\s*$", re.IGNORECASE)
_STEREO_PLUSMINUS_RE = re.compile(r"^\([+-]\)-?\s*")
_STEREO_RS_RE = re.compile(r"^\([rs]\)-?\s*")
_STEREO_DL_RE = re.compile(r"^[dl]-\s*")
_PUNCT_RE = re.compile(r"[^\w\s-]")
_WS_RE = re.compile(r"\s+")


def normalize_name_py(
    name: Optional[str],
    strip_stereochemistry: bool = False,
    strip_hydrate: bool = False,
) -> str:
    """Normalize a name for dictionary matching (F1). Byte-parity with the
    reference's rules: lower+strip, Greek→ASCII, optional stereo-prefix and
    hydrate-suffix strips, punctuation strip (keep word chars/space/hyphen),
    whitespace collapse (no trailing strip after collapse — parity)."""
    if name is None or (isinstance(name, float) and math.isnan(name)) or not name:
        return ""
    normalized = str(name).lower().strip()
    for greek, ascii_form in GREEK_MAP.items():
        if greek in normalized:
            normalized = normalized.replace(greek, ascii_form)
    if strip_stereochemistry:
        normalized = _STEREO_PLUSMINUS_RE.sub("", normalized)
        normalized = _STEREO_RS_RE.sub("", normalized)
        normalized = _STEREO_DL_RE.sub("", normalized)
        normalized = normalized.strip()
    if strip_hydrate:
        normalized = _HYDRATE_SUFFIX_RE.sub("", normalized).strip()
    normalized = _PUNCT_RE.sub("", normalized)
    normalized = _WS_RE.sub(" ", normalized)
    return normalized


def _strip_ws(c: Column) -> Column:
    """Python str.strip() parity: Spark's trim() removes only ASCII spaces,
    Python strips all whitespace — use (?U)\\s anchored regexes instead."""
    return F.regexp_replace(F.regexp_replace(c, r"(?U)^\s+", ""), r"(?U)\s+$", "")


def normalize_name_col(
    col: Column,
    strip_stereochemistry: bool = False,
    strip_hydrate: bool = False,
) -> Column:
    """JVM-side F1. ``(?U)`` makes Java's \\w/\\s Unicode-aware like Python's."""
    c = _strip_ws(F.lower(col))
    for greek, ascii_form in GREEK_MAP.items():
        c = F.replace(c, F.lit(greek), F.lit(ascii_form))
    if strip_stereochemistry:
        c = F.regexp_replace(c, r"(?U)^\([+-]\)-?\s*", "")
        c = F.regexp_replace(c, r"(?U)^\([rs]\)-?\s*", "")
        c = F.regexp_replace(c, r"(?U)^[dl]-\s*", "")
        c = _strip_ws(c)
    if strip_hydrate:
        c = _strip_ws(F.regexp_replace(c, r"(?iU)\s*[x·*.]\s*(?:\d+|n)\s*h2o\s*$", ""))
    c = F.regexp_replace(c, r"(?U)[^\w\s-]", "")
    c = F.regexp_replace(c, r"(?U)\s+", " ")
    return F.coalesce(c, F.lit(""))


# ---------------------------------------------------------------------------
# F2/F3 — CURIE prefix compaction via ordered alternation.
# ---------------------------------------------------------------------------

# Ordered (source_prefix → curie_prefix). Order is load-bearing: the longer /
# more specific URL forms MUST precede bare substrings (the reference's
# `eccode` trap). Kept as a tuple so insertion order is explicit and tested.
DEFAULT_PREFIX_TABLE: Tuple[Tuple[str, str], ...] = (
    ("https://bioregistry.io/eccode:", "EC:"),
    ("https://www.ebi.ac.uk/intenz/query?cmd=SearchEC&ec=", "EC:"),
    ("eccode:", "EC:"),
    ("http://purl.obolibrary.org/obo/NCBITaxon_", "NCBITaxon:"),
    ("http://purl.obolibrary.org/obo/CHEBI_", "CHEBI:"),
    ("http://purl.obolibrary.org/obo/ENVO_", "ENVO:"),
    ("http://purl.obolibrary.org/obo/GO_", "GO:"),
    ("http://identifiers.org/hgnc/", "HGNC:"),
)


def compact_curie_py(value: str, table: Sequence[Tuple[str, str]] = DEFAULT_PREFIX_TABLE) -> str:
    """First matching prefix wins (insertion order), like the reference's
    single compiled alternation."""
    if not value:
        return value
    for src, dst in table:
        if value.startswith(src):
            return dst + value[len(src):]
    return value


def compact_curie_col(col: Column, table: Sequence[Tuple[str, str]] = DEFAULT_PREFIX_TABLE) -> Column:
    """Chained ``when(startswith)`` — whole-stage-codegen friendly, preserves
    first-match-wins ordering exactly (a single regexp alternation would too,
    but `when` chains are cheaper to verify)."""
    expr = None
    for src, dst in table:
        branch = F.concat(F.lit(dst), F.substring(col, len(src) + 1, 2 ** 30))
        cond = col.startswith(src)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return col if expr is None else expr.otherwise(col)


# ---------------------------------------------------------------------------
# F4 — id / label sanitization translation tables.
# ---------------------------------------------------------------------------

TRANSLATION_TABLE_FOR_IDS = {" ": "-", '"': "", "(": "", ")": "", "#": "", ";": "", "{": "", "}": ""}
TRANSLATION_TABLE_FOR_LABELS = {'"': "", "(": "", ")": "", "#": "", ";": "", "{": "", "}": ""}


def sanitize_id_py(value: str) -> str:
    return value.translate(str.maketrans(TRANSLATION_TABLE_FOR_IDS)) if value else value


def sanitize_label_py(value: str) -> str:
    return value.translate(str.maketrans(TRANSLATION_TABLE_FOR_LABELS)) if value else value


def _translate_col(col: Column, table: dict) -> Column:
    src = "".join(table.keys())
    dst = "".join(table.values())  # deletions = chars beyond len(dst)
    return F.translate(col, src, dst)


def sanitize_id_col(col: Column) -> Column:
    # translate() deletes chars with no replacement when `to` is shorter —
    # order the table so the 1:1 mapping (space→dash) comes first.
    return _translate_col(col, TRANSLATION_TABLE_FOR_IDS)


def sanitize_label_col(col: Column) -> Column:
    return _translate_col(col, TRANSLATION_TABLE_FOR_LABELS)


# ---------------------------------------------------------------------------
# F5 — CURIE-suffix percent-encoding (utils/sanitize_curies.py:29-74):
# problematic chars in the suffix only, first colon preserved.
# ---------------------------------------------------------------------------

_CURIE_UNSAFE = ' "#{}|\\^~[]`'


def sanitize_curie_py(curie: str) -> str:
    if not curie or ":" not in curie:
        return curie
    prefix, suffix = curie.split(":", 1)
    encoded = "".join("%%%02X" % ord(c) if c in _CURIE_UNSAFE else c for c in suffix)
    return prefix + ":" + encoded


def sanitize_curie_col(col: Column) -> Column:
    """Chained regexp escapes for the unsafe set — JVM-side equivalent of
    the urllib.quote call for the characters the reference actually
    encounters (space and the bracket/brace family)."""
    prefix = F.substring_index(col, ":", 1)
    suffix = F.regexp_replace(col, r"^[^:]*:", "")
    for ch in _CURIE_UNSAFE:
        pct = "%%%02X" % ord(ch)
        suffix = F.replace(suffix, F.lit(ch), F.lit(pct))
    return F.when(col.contains(":"), F.concat(prefix, F.lit(":"), suffix)).otherwise(col)


# ---------------------------------------------------------------------------
# F6 — CR/LF strip; F7 — safe float.
# ---------------------------------------------------------------------------

def strip_crlf_col(col: Column) -> Column:
    return F.regexp_replace(col, r"[\r\n]", "")


def strip_crlf_py(value: str) -> str:
    return value.replace("\r", "").replace("\n", "") if value else value


def safe_float_py(value) -> float:
    """Float parse with 0.0-on-unparsable and non-finite→0.0 (F7 + the
    calibration non-finite guard)."""
    try:
        f = float(value)
    except (TypeError, ValueError):
        return 0.0
    return f if math.isfinite(f) else 0.0


def safe_float_col(col: Column) -> Column:
    c = col.try_cast("double")  # ANSI-safe: malformed → NULL → 0.0
    return F.when(c.isNull() | F.isnan(c) | (F.abs(c) == float("inf")), F.lit(0.0)).otherwise(c)


# ---------------------------------------------------------------------------
# F11 — GTDB-style taxonomy string parse: `d__X;p__Y;...` → array of
# (rank_code, name) structs.
# ---------------------------------------------------------------------------

TAXONOMY_RANKS = {"d": "domain", "p": "phylum", "c": "class", "o": "order", "f": "family", "g": "genus", "s": "species"}


def parse_taxonomy_py(tax: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    if not tax:
        return out
    for part in tax.split(";"):
        part = part.strip()
        if len(part) >= 3 and part[1:3] == "__":
            code, name = part[0], part[3:]
            if code in TAXONOMY_RANKS and name:
                out.append((TAXONOMY_RANKS[code], name))
    return out


def parse_taxonomy_col(col: Column) -> Column:
    """array<struct<rank,name>> via split + transform + filter, no UDF.

    Byte-parity with ``parse_taxonomy_py``: a segment participates only
    when its 2nd-3rd characters are the literal ``__`` separator — a
    malformed segment like ``domain`` must NOT yield a ghost ('d', 'ain')
    row (the Python twin checks ``part[1:3] == '__'``)."""
    parts = F.split(col, ";")
    structs = F.transform(
        parts,
        lambda p: F.struct(
            F.trim(p).substr(F.lit(1), F.lit(1)).alias("code"),
            F.substring(F.trim(p), 2, 2).alias("sep"),
            F.substring(F.trim(p), 4, 2 ** 30).alias("name"),
        ),
    )
    rank_map = F.create_map(*[F.lit(x) for kv in TAXONOMY_RANKS.items() for x in kv])
    structs = F.filter(
        structs,
        lambda s: (s["sep"] == "__")
        & s["code"].isin(list(TAXONOMY_RANKS))
        & (F.length(s["name"]) > 0),
    )
    return F.transform(structs, lambda s: F.struct(rank_map[s["code"]].alias("rank"), s["name"].alias("name")))


# ---------------------------------------------------------------------------
# Mention-scan text normalization: the page-text analogue of F1, but
# position-preserving is NOT required (we re-locate offsets in the normalized
# string). Matching happens on lowercased text with Greek mapped, so lexicon
# term_norm and page text agree.
# ---------------------------------------------------------------------------

def normalize_text_py(text: Optional[str]) -> str:
    if not text:
        return ""
    t = text.lower()
    for greek, ascii_form in GREEK_MAP.items():
        if greek in t:
            t = t.replace(greek, ascii_form)
    return t


def normalize_text_col(col: Column) -> Column:
    c = F.lower(col)
    for greek, ascii_form in GREEK_MAP.items():
        c = F.replace(c, F.lit(greek), F.lit(ascii_form))
    return c
