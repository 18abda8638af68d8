"""unicode_norm (functions/unicode_norm.py) — parity with unicodedata,
decomposed/precomposed convergence, null passthrough, DuckDB agreement."""

import duckdb
import unicodedata

from pyspark.sql import functions as F

from kg_microbe_spark.functions.unicode_norm import (
    fold_text_col,
    nfc_col,
    strip_accents_col,
)

CASES = [
    "Café au lait",          # precomposed é
    "Cafe\u0301 au lait",  # decomposed e + combining acute
    "naïve Ångström",
    "Ñandú PIÑATA",
    "grüße STRASSE",    # ß must survive (simple lower, not casefold)
    "ASCII only 123",
    "",
]


def test_nfc_converges_decomposed_and_precomposed(spark):
    df = spark.createDataFrame([(0, CASES[0]), (1, CASES[1])], "i long, t string")
    got = {r.i: r.n for r in df.select("i", nfc_col(F.col("t")).alias("n")).collect()}
    assert got[0] == got[1] == "Café au lait"


def test_unicode_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "i long, t string"
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            nfc_col(F.col("t")).alias("nfc"),
            strip_accents_col(F.col("t")).alias("stripped"),
            fold_text_col(F.col("t")).alias("folded"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(CASES):
        r = rows[i]
        assert r.nfc == unicodedata.normalize("NFC", s)
        d_nfc, d_strip, d_fold = con.execute(
            "select nfc_normalize(?), strip_accents(?),"
            " lower(strip_accents(nfc_normalize(?)))",
            [s, s, s],
        ).fetchone()
        assert r.nfc == d_nfc, (s, r.nfc, d_nfc)
        assert r.stripped == d_strip, (s, r.stripped, d_strip)
        assert r.folded == d_fold, (s, r.folded, d_fold)


def test_unicode_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "t string")
    r = df.select(
        nfc_col(F.col("t")).alias("a"),
        strip_accents_col(F.col("t")).alias("b"),
        fold_text_col(F.col("t")).alias("c"),
    ).collect()[0]
    assert r.a is None and r.b is None and r.c is None
