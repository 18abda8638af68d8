"""The flagship per-doc mention cap (VERDICT r2 'What's wrong' #1).

The in-row pair generation is (|taxa|×|chem| + |env|×|taxa|) per doc; a
pathological page with ~10⁵-10⁶ distinct words would emit 10⁸-10¹¹ structs
from a single row without the MENTION_CAP slice. This test builds such a
page and proves the flagship completes with bounded output.
"""

from __future__ import annotations

import __spark_entry__ as em


def test_monster_page_completes_under_cap(spark, tmp_path):
    # 60k distinct words of mixed lengths (all three length%3 categories):
    # uncapped, this one row would generate ~2·(20k)² ≈ 8×10⁸ pair structs.
    words = ["w" * (i % 3 + 1) + str(i) for i in range(60000)]
    text = " ".join(words)
    docs = spark.createDataFrame(
        [("d1", "s1", "en", text), ("d2", "s1", "en", "aa bbb c")],
        "doc_id string, source string, lang string, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = em.q_kg_triples(spark, str(tmp_path))
    rows = out.collect()  # must complete (seconds, not hours/OOM)

    # monster contributes at most 2·CAP²; d2 contributes exactly two
    # triples (bbb interacts_with c, aa occurs_in bbb)
    assert 2 <= len(rows) <= 2 * em.MENTION_CAP**2 + 2
    spo = {(r.subject, r.predicate, r.object) for r in rows}
    assert ("W:bbb", "biolink:interacts_with", "W:c") in spo
    assert ("W:aa", "biolink:occurs_in", "W:bbb") in spo
