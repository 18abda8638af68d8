"""melt_trait_columns (binning.py), group_quantiles (stats.py),
pmi_bigrams (collocations.py), partitioned parquet pruning (io.py)."""

import math
import shutil
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.binning import melt_trait_columns
from kg_microbe_spark.operators.collocations import pmi_bigrams
from kg_microbe_spark.operators.stats import group_quantiles
from kg_microbe_spark.sources.io import read_partitioned_parquet, write_partitioned_parquet


def test_melt_wide_to_long(spark):
    df = spark.createDataFrame(
        [("org1", 37.0, 7), ("org2", 55.5, None)],
        "organism string, temp double, ph int",
    )
    out = melt_trait_columns(df, ["organism"], ["temp", "ph"])
    rows = {(r.organism, r.trait, r.trait_value) for r in out.collect()}
    assert rows == {
        ("org1", "temp", 37.0),
        ("org1", "ph", 7.0),
        ("org2", "temp", 55.5),
        ("org2", "ph", None),
    }
    # narrow map: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _py_quantile(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * len(s)) - 1]


def test_group_quantiles_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(g, float(rng.randint(0, 1000))) for g in ("a", "b", "c") for _ in range(97)]
    df = spark.createDataFrame(rows, "g string, v double")
    qs = (0.25, 0.5, 0.75, 1.0)
    got = {(r.g, r.q): r.quantile_value for r in group_quantiles(df, ["g"], "v", qs).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for q in qs:
            assert got[(g, q)] == _py_quantile(vals, q), (g, q)
    with pytest.raises(ValueError, match="quantiles"):
        group_quantiles(df, ["g"], "v", (0.0, 0.5))


def test_group_quantiles_ties_deterministic(spark):
    df = spark.createDataFrame([("a", 1.0)] * 5 + [("a", 2.0)] * 5, "g string, v double")
    got = {r.q: r.quantile_value for r in group_quantiles(df, ["g"], "v", (0.5, 1.0)).collect()}
    assert got == {0.5: 1.0, 1.0: 2.0}


def test_pmi_matches_python(spark):
    texts = ["new york city", "new york times", "old york", "new day in new york"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    uni = Counter(w for t in texts for w in t.split())
    bigs = Counter()
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] += 1
    T, B = sum(uni.values()), sum(bigs.values())
    got = {(r.w1, r.w2): (r.n, r.pmi) for r in pmi_bigrams(docs, "text", min_count=1).collect()}
    assert set(got) == set(bigs)
    for (a, b), n in bigs.items():
        want = math.log((n / B) / (uni[a] / T * (uni[b] / T)))
        assert got[(a, b)][0] == n
        assert got[(a, b)][1] == pytest.approx(want, abs=1e-12)
    # min_count prunes before the joins
    got2 = {k for k in pmi_bigrams(docs, "text", min_count=2).collect()}
    assert {(r.w1, r.w2) for r in got2} == {("new", "york")}


def test_partitioned_write_prunes(spark):
    base = tempfile.mkdtemp(prefix="part_prune_")
    try:
        df = spark.createDataFrame(
            [(i, ["en", "de", "fr"][i % 3], float(i)) for i in range(90)],
            "id long, lang string, v double",
        )
        write_partitioned_parquet(df, base, ["lang"])
        back = read_partitioned_parquet(spark, base).filter(F.col("lang") == "en")
        plan = back._jdf.queryExecution().executedPlan().toString()
        # the filter must land in PartitionFilters (directory pruning),
        # not PushedFilters / post-scan Filter
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "lang" in m.group(1), plan
        got = {r.id for r in back.collect()}
        assert got == {i for i in range(90) if i % 3 == 0}
        # partition column type note: comes back as read (string here)
        assert dict(back.dtypes)["lang"] == "string"
    finally:
        shutil.rmtree(base, ignore_errors=True)
