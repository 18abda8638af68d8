"""Count-Min sketch, epsilon band join, MAD robust outliers."""

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.operators.heavyhitters import count_min_estimate
from kg_microbe_spark.operators.ranges import epsilon_band_join
from kg_microbe_spark.operators.stats import mad_outliers


# ---------------------------------------------------------------- CM sketch

def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    stream = [(f"t{i % 20}",) for i in range(400)]  # each key 20×
    df = spark.createDataFrame(stream, "tok string")
    probes = spark.createDataFrame([(f"t{i}",) for i in range(20)], "tok string")
    got = {r.key: r.est_count for r in count_min_estimate(df, "tok", probes, width=512, depth=4).collect()}
    assert set(got) == {f"t{i}" for i in range(20)}
    for k, est in got.items():
        assert est >= 20          # one-sided error
        assert est <= 400         # sanity
    # 20 keys into 512 buckets × 4 rows: collisions essentially impossible
    assert all(est == 20 for est in got.values())


def test_cms_absent_key_reports_collision_floor(spark):
    df = spark.createDataFrame([("a",)] * 7, "tok string")
    probes = spark.createDataFrame([("zz",)], "tok string")
    (row,) = count_min_estimate(df, "tok", probes, width=64, depth=4).collect()
    assert 0 <= row.est_count <= 7


def test_cms_overestimates_under_forced_collision(spark):
    # width=2: every key collides somewhere; min over rows still ≥ truth
    df = spark.createDataFrame(
        [("x",)] * 10 + [("y",)] * 3 + [("z",)] * 1, "tok string"
    )
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "tok string")
    got = {r.key: r.est_count for r in count_min_estimate(df, "tok", probes, width=2, depth=2).collect()}
    assert got["x"] >= 10 and got["y"] >= 3 and got["z"] >= 1


def test_cms_rejects_bad_shape(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        count_min_estimate(df, "tok", df, width=1)


# ---------------------------------------------------------------- band join

def test_band_join_matches_bruteforce(spark):
    lrows = [(f"l{i}", (i * 37) % 100) for i in range(40)]
    rrows = [(f"r{i}", (i * 23 + 5) % 100) for i in range(40)]
    left = spark.createDataFrame(lrows, "lid string, lv long")
    right = spark.createDataFrame(rrows, "rid string, rv long")
    got = {
        (r.lid, r.rid, r.abs_diff)
        for r in epsilon_band_join(left, right, "lv", "rv", 3).collect()
    }
    want = {
        (li, ri, abs(lv - rv))
        for li, lv in lrows
        for ri, rv in rrows
        if abs(lv - rv) <= 3
    }
    assert got == want


def test_band_join_boundary_inclusive(spark):
    left = spark.createDataFrame([("a", 10)], "lid string, lv long")
    right = spark.createDataFrame(
        [("b", 13), ("c", 14), ("d", 7), ("e", 6)], "rid string, rv long"
    )
    got = {r.rid for r in epsilon_band_join(left, right, "lv", "rv", 3).collect()}
    assert got == {"b", "d"}  # |10-13|=3 in, |10-14|=4 out; symmetric below


# ---------------------------------------------------------------- MAD

def test_mad_flags_the_wild_point_std_would_absorb(spark):
    rows = [("k", f"i{j}", float(v)) for j, v in enumerate([10, 11, 12, 10, 11, 12, 10, 500])]
    df = spark.createDataFrame(rows, "k string, id string, v double")
    got = {r.id: (r.robust_z, r.is_outlier) for r in mad_outliers(df, "k", "id", "v").collect()}
    assert got["i7"][1] is True
    assert all(not got[f"i{j}"][1] for j in range(7))


def test_mad_median_definition_matches_rank_ceil(spark):
    # n=4 values [1,2,3,100]: rank ceil(4/2)=2 → med=2; devs [1,0,1,98]
    # sorted devs rank 2 → MAD=1; z(100)=0.6745*98=66.101
    rows = [("k", f"i{j}", float(v)) for j, v in enumerate([1, 2, 3, 100])]
    df = spark.createDataFrame(rows, "k string, id string, v double")
    got = {r.id: r.robust_z for r in mad_outliers(df, "k", "id", "v").collect()}
    assert got["i3"] == round(0.6745 * 98, 6)
    assert got["i1"] == 0.0


def test_mad_zero_mad_yields_null_z_no_flag(spark):
    rows = [("k", f"i{j}", 5.0) for j in range(5)] + [("k", "i9", 9.0)]
    df = spark.createDataFrame(rows, "k string, id string, v double")
    out = mad_outliers(df, "k", "id", "v").collect()
    assert all(r.robust_z is None and r.is_outlier is False for r in out)


def test_mad_keys_are_independent(spark):
    rows = [("a", "x", 1.0), ("a", "y", 2.0), ("a", "w", 3.0), ("a", "z", 50.0)] + [
        ("b", "x", 50.0),
        ("b", "y", 49.0),
        ("b", "w", 48.0),
        ("b", "z", 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, id string, v double")
    got = {(r.k, r.id): r.is_outlier for r in mad_outliers(df, "k", "id", "v").collect()}
    assert got[("a", "z")] is True and got[("b", "z")] is True
    assert got[("a", "x")] is False and got[("b", "x")] is False
