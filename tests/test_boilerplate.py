"""remove_boilerplate_lines (operators/boilerplate.py) — parity with a
pure-Python reference, order preservation, all-removed docs survive."""

from collections import Counter

from kg_microbe_spark.operators.boilerplate import remove_boilerplate_lines

DOCS = [
    (0, "HEADER\nalpha unique zero\nFOOTER"),
    (1, "HEADER\nbravo unique one\nFOOTER"),
    (2, "HEADER\ncharlie unique two\nmiddle shared\ntail two"),
    (3, "middle shared\ndelta unique three"),
    (4, "HEADER\nFOOTER"),  # all lines boilerplate -> clean_text ''
    (5, "echo only line"),
    (6, "repeat\nrepeat\nzeta unique six"),  # in-doc repeat: 1 distinct doc
]


def _py_clean(docs, min_df=2):
    df_count = Counter()
    for _, text in docs:
        for line in set(text.split("\n")):
            df_count[line] += 1
    out = {}
    for i, text in docs:
        kept = [l for l in text.split("\n") if df_count[l] < min_df]
        removed = sum(1 for l in text.split("\n") if df_count[l] >= min_df)
        out[i] = ("\n".join(kept), len(kept), removed)
    return out

def test_boilerplate_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_boilerplate_lines(df).collect()
    }
    assert got == _py_clean(DOCS)


def test_boilerplate_all_removed_doc_survives(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate_lines(df).collect()}
    assert set(got) == {i for i, _ in DOCS}
    assert got[4].clean_text == "" and got[4].n_kept == 0 and got[4].n_removed == 2


def test_boilerplate_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_boilerplate_lines(df, min_doc_frequency=3).collect()
    }
    assert got == _py_clean(DOCS, min_df=3)
    # 'middle shared' (2 docs) survives at min_df=3
    assert "middle shared" in got[3][0]
