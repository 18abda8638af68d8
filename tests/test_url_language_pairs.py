"""Cross-lingual URL alignment (operators/alignment.py
url_language_pairs): lang-segment keying, template-hub guard, pair
semantics."""

from kg_microbe_spark.operators.alignment import url_language_pairs


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_pairs_align_across_lang_segment(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "https://a.example/en/products/1"),
            (2, "fr", "https://a.example/fr/products/1"),
            (3, "de", "https://a.example/de-AT/products/1"),  # lang-region form
            (4, "en", "https://a.example/en/products/2"),  # different template slot
            (5, "en", "https://b.example/en/products/1"),  # different host
        ],
        "doc_id int, lang string, url string",
    )
    got = _rows(
        url_language_pairs(docs).select("doc_id_a", "doc_id_b", "align_key")
    )
    assert got == {
        (1, 2, "a.example/products/1"),
        (1, 3, "a.example/products/1"),
        (2, 3, "a.example/products/1"),
    }


def test_same_language_collisions_excluded(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "https://a.example/en/x"),
            (2, "en", "https://a.example/en-GB/x"),  # same lang col -> url-dedup's job
            (3, "fr", "https://a.example/fr/x"),
        ],
        "doc_id int, lang string, url string",
    )
    got = _rows(url_language_pairs(docs).select("doc_id_a", "doc_id_b"))
    assert got == {(1, 3), (2, 3)}


def test_non_language_segments_not_stripped(spark):
    # 'en' must be a whole path segment: /end/... and /page/en-suffix stay.
    docs = spark.createDataFrame(
        [
            (1, "en", "https://a.example/end/1"),
            (2, "fr", "https://a.example/fr/end/1"),
        ],
        "doc_id int, lang string, url string",
    )
    # keys differ ('a.example/end/1' vs 'a.example/end/1') — actually the
    # fr segment strips, so these DO align; the en doc's path was never a
    # language segment and is left intact.
    got = _rows(url_language_pairs(docs).select("align_key"))
    assert got == {("a.example/end/1",)}


def test_template_hub_guard_drops_oversized_keys(spark):
    hub = [(i, "en" if i % 2 else "fr", "https://h.example/x/home") for i in range(9)]
    ok = [
        (100, "en", "https://a.example/en/y"),
        (101, "fr", "https://a.example/fr/y"),
    ]
    docs = spark.createDataFrame(
        hub + ok, "doc_id int, lang string, url string"
    )
    out = url_language_pairs(docs, max_variants=8)
    got = _rows(out.select("doc_id_a", "doc_id_b"))
    assert got == {(100, 101)}  # the 9-doc hub key is gone entirely
