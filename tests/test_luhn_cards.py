"""Luhn-validated card detection (operators/redaction.py
card_candidates): candidate regex edges + checksum arithmetic against
hand-checked test numbers."""

from kg_microbe_spark.operators.redaction import card_candidates


def test_known_numbers_and_separator_forms(spark):
    docs = spark.createDataFrame(
        [
            (1, "pay 4111111111111111 now"),          # classic valid test PAN
            (2, "pay 4111111111111112 now"),          # last digit off -> invalid
            (3, "pay 4111-1111-1111-1111 now"),       # dashed, same PAN, valid
            (4, "pay 4111 1111 1111 1111 now"),       # spaced, valid
            (5, "ref 411111111111111 end"),           # 15 digits -> no candidate
            (6, "id 41111111111111112 x"),            # 17 digits -> \b blocks match
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["digits"], r["luhn_valid"])
        for r in card_candidates(docs, "text").collect()
    }
    assert out == {
        1: ("4111111111111111", True),
        2: ("4111111111111112", False),
        3: ("4111111111111111", True),
        4: ("4111111111111111", True),
    }


def test_multiple_candidates_per_row(spark):
    docs = spark.createDataFrame(
        [(1, "a 4111111111111111 b 5500005555555559 c")],
        "doc_id int, text string",
    )
    rows = card_candidates(docs, "text").collect()
    assert sorted((r["digits"], r["luhn_valid"]) for r in rows) == [
        ("4111111111111111", True),
        ("5500005555555559", True),
    ]
