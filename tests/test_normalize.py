"""F1/F2/F4/F7 parity: the Spark Column implementations must be
byte-identical to the pure-Python versions (which pin the reference
semantics, chemical_mapping_utils.py:92-131 etc.)."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kg_microbe_spark.functions.normalize import (
    compact_curie_col,
    compact_curie_py,
    normalize_name_col,
    normalize_name_py,
    parse_taxonomy_py,
    safe_float_col,
    safe_float_py,
    sanitize_id_col,
    sanitize_id_py,
)

EDGE_CASES = [
    "4-nitrophenyl β-D-glucopyranoside",
    "(R)-limonene",
    "(+)-camphor",
    "(S)- lactaldehyde",
    "D-xylulose",
    "l-arabinose",
    "calcium chloride x 2 H2O",
    "magnesium sulfate · 7 H2O",
    "sodium acetate . 3H2O",
    "ferric citrate x n H2O",
    'weird "(){};#{} chars',
    "  spaced   out  ",
    "α-ketoglutarate μM δ γ β",
    "",
    "UPPER Case-Mixed",
    "tab\tand\nnewline",
    "ünïcödé wörds",
    "trailing punct !",
]


def _spark_batch(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.o for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


@pytest.mark.parametrize("stereo,hydrate", [(False, False), (True, False), (False, True), (True, True)])
def test_normalize_name_parity_edge_cases(spark, stereo, hydrate):
    expected = [normalize_name_py(v, stereo, hydrate) for v in EDGE_CASES]
    got = _spark_batch(spark, EDGE_CASES, lambda c: normalize_name_col(c, stereo, hydrate))
    assert got == expected


ALPHABET = string.ascii_letters + string.digits + " -()+.·*αβγδμ\"{};#_\t!,'"


def test_normalize_name_parity_bulk(spark):
    """One Spark job over a large deterministic corpus of adversarial
    strings (fragments × positions × whitespace) — cheaper and broader than
    per-example property tests through a Spark roundtrip."""
    import itertools
    import random

    frags = ["(r)-", "(+)-", "d-", "l-", "x 2 h2o", "· n H2O", "β", "μM", "\t", "\n", "  ", "-", "ab", "1.5", '";{}#', "soil"]
    values = ["".join(p) for p in itertools.permutations(frags, 2)]
    rng = random.Random(7)
    values += ["".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 30))) for _ in range(2000)]
    for stereo, hydrate in [(False, False), (True, True)]:
        expected = [normalize_name_py(v, stereo, hydrate) for v in values]
        got = _spark_batch(spark, values, lambda c: normalize_name_col(c, stereo, hydrate))
        mismatches = [(v, e, g) for v, e, g in zip(values, expected, got) if e != g]
        assert not mismatches, mismatches[:5]


def test_compact_curie_order_sensitive(spark):
    # the eccode trap: URL form must win over the bare `eccode:` prefix
    vals = [
        "https://bioregistry.io/eccode:1.1.1.1",
        "eccode:2.3.4.5",
        "http://purl.obolibrary.org/obo/CHEBI_1234",
        "FOO:unmapped",
    ]
    expected = [compact_curie_py(v) for v in vals]
    assert expected[0] == "EC:1.1.1.1" and expected[1] == "EC:2.3.4.5"
    got = _spark_batch(spark, vals, compact_curie_col)
    assert got == expected


def test_sanitize_id_parity(spark):
    vals = ['ab c"(d){e};#f{g}h', "no specials", ""]
    expected = [sanitize_id_py(v) for v in vals]
    assert expected[0] == "ab-cdefgh"
    got = _spark_batch(spark, vals, sanitize_id_col)
    assert got == expected


def test_safe_float(spark):
    vals = ["1.5", "nan", "inf", "-inf", "abc", "", "4.00735"]
    expected = [safe_float_py(v) for v in vals]
    got = _spark_batch(spark, vals, safe_float_col)
    assert got == expected
    assert expected == [1.5, 0.0, 0.0, 0.0, 0.0, 0.0, 4.00735]


def test_sanitize_curie_parity(spark):
    from kg_microbe_spark.functions.normalize import sanitize_curie_col, sanitize_curie_py

    vals = ["CHEBI:12 34", 'X:a"b{c}d', "noprefix", "EC:1.1.1.1", "A:x|y^z", "A:[q]`r~s"]
    expected = [sanitize_curie_py(v) for v in vals]
    assert expected[0] == "CHEBI:12%2034"
    got = _spark_batch(spark, vals, sanitize_curie_col)
    assert got == expected


def test_parse_taxonomy():
    out = parse_taxonomy_py("d__Bacteria;p__Firmicutes;c__Bacilli;o__;s__B subtilis")
    assert out == [
        ("domain", "Bacteria"),
        ("phylum", "Firmicutes"),
        ("class", "Bacilli"),
        ("species", "B subtilis"),
    ]


def test_parse_taxonomy_py_col_parity_on_malformed(spark):
    """Column twin must match the Python twin on malformed segments — a
    segment without the '__' separator (e.g. 'domain') must not yield a
    ghost ('d', 'ain') row (round-1 advice: only the happy path was
    parity-tested)."""
    from pyspark.sql import functions as F

    from kg_microbe_spark.functions.normalize import parse_taxonomy_col

    vals = [
        "d__Bacteria;p__Firmicutes",
        "domain;p__Firmicutes",          # no separator → segment skipped
        "d_Bacteria;dXYBacteria;d__",    # wrong sep / empty name → skipped
        " d__Spaced ; p__Padded ",       # trimmed before separator check
        "x__Unknown;d__Ok",              # unknown rank code → skipped
        "",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "tax string")
    got = [
        [(s["rank"], s["name"]) for s in r.parsed]
        for r in df.select(parse_taxonomy_col(F.col("tax")).alias("parsed")).collect()
    ]
    expected = [parse_taxonomy_py(v) for v in vals]
    assert got == expected
