"""Z-order interleave keys (operators/zorder.py): bit layout, quadrant
locality, Column-vs-SQL rendering parity, guard rails."""

import pytest

from kg_microbe_spark.operators.zorder import zorder_key_col, zorder_sql


def test_known_interleave(spark):
    # x=0b11, y=0b01, 2 bits: x bits land at positions 1,3; y at 0,2.
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    (key,) = df.select(zorder_key_col(["x", "y"], bits=2).alias("k")).first()
    assert key == 0b1011  # 11


def test_quadrant_locality(spark):
    # With 2 bits/dim the top interleave bits are a 2x2 block id: every key
    # of the low quadrant [0,2)x[0,2) sorts before every key of [2,4)x[2,4).
    pts = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_key_col(["x", "y"], bits=2).alias("k")).collect()
    low = {r["k"] for r in rows if r["x"] < 2 and r["y"] < 2}
    high = {r["k"] for r in rows if r["x"] >= 2 and r["y"] >= 2}
    assert max(low) < min(high)
    assert len({r["k"] for r in rows}) == 16  # bijective on the grid


def test_column_and_sql_renderings_agree(spark):
    df = spark.createDataFrame(
        [(i * 37 % 256, i * 101 % 256) for i in range(50)], "x long, y long"
    )
    df.createOrReplaceTempView("zq")
    col_keys = sorted(
        r["k"] for r in df.select(zorder_key_col(["x", "y"], bits=8).alias("k")).collect()
    )
    sql_keys = sorted(
        r["k"]
        for r in spark.sql(
            f"SELECT ({zorder_sql(['x', 'y'], bits=8)}) AS k FROM zq"
        ).collect()
    )
    assert col_keys == sql_keys


def test_guards():
    with pytest.raises(ValueError):
        zorder_key_col(["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key_col(["a", "b", "c", "d"], bits=16)  # 64 bits
