"""random_projection (operators/projection.py) vs numpy."""

import hashlib

import numpy as np
import pytest

from kg_microbe_spark.operators.projection import random_projection, random_projection_long


def _matrix(seed, d_in, d_out):
    m = np.zeros((d_out, d_in))
    for j in range(d_out):
        for i in range(d_in):
            h = int(hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
            m[j, i] = 1.0 if h % 2 == 0 else -1.0
    return m


def test_projection_matches_numpy(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 16).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], "id long, v array<double>"
    )
    out = random_projection(df, "v", 16, 4, seed=9).collect()
    m = _matrix(9, 16, 4)
    for r in out:
        want = m @ vecs[r.id]
        got = np.array(r.projected)
        assert np.allclose(got, want, atol=1e-12)


def test_projection_long_and_float_input(spark):
    df = spark.createDataFrame([(1, [1.0, -2.0, 3.0])], "id long, v array<float>")
    rows = random_projection_long(df, "id", "v", 3, 2).collect()
    m = _matrix(7, 3, 2)
    want = m @ np.array([1.0, -2.0, 3.0])
    got = {r.j: r.component for r in rows}
    assert got[0] == pytest.approx(want[0]) and got[1] == pytest.approx(want[1])


def test_projection_sign_balance():
    # sanity: hash signs are roughly balanced (not a constant column)
    m = _matrix(7, 64, 8)
    assert 0.3 < (m > 0).mean() < 0.7


def test_projection_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="dims"):
        random_projection(df, "v", 0, 4)
