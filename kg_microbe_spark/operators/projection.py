"""Random sign-projection embedding reduction (Achlioptas/JL family).

Dimensionality reduction for the embedding column before ANN indexing
or near-dup clustering: out[j] = Σᵢ v[i]·sign(i,j) with sign ∈ {±1}
drawn from a DETERMINISTIC hash of (seed, i, j) — no stored projection
matrix, no RNG state, any engine (and any re-run, any partitioning)
reconstructs the identical projection from the seed alone. Signs come
from the repo's portable md5-60bit hash (functions/text.py trick), so a
DuckDB oracle can recompute every component.

Scale shape: a pure narrow map — the d_out×d_in sign matrix is a plan
literal (d_out·d_in ≤ a few thousand lit values), each row computes its
projection in one JVM `transform`/`aggregate` chain, no shuffle, no
Python, no broadcast. The ±1 scheme needs no 1/√d scaling for ANN use
(cosine is scale-invariant); callers wanting JL-normalized outputs can
multiply by 1/√d_out downstream."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign(seed: int, i: int, j: int) -> float:
    h = int(hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def random_projection(
    df: DataFrame,
    vec_col: str,
    d_in: int,
    d_out: int,
    seed: int = 7,
    out_col: str = "projected",
) -> DataFrame:
    """Append ``out_col`` = array<double> of length ``d_out``. ``d_in``
    must match the stored vector length (checked lazily per row: a
    mismatched vector yields NULL components via element_at overflow —
    validate upstream if mixed lengths are possible)."""
    if d_in < 1 or d_out < 1:
        raise ValueError(f"dims must be ≥ 1, got d_in={d_in}, d_out={d_out}")
    # plan-literal sign matrix, rows = output dims
    sign_rows = [
        F.array(*[F.lit(_sign(seed, i, j)) for i in range(d_in)]) for j in range(d_out)
    ]
    matrix = F.array(*sign_rows)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    proj = F.transform(
        matrix,
        lambda row: F.aggregate(
            F.zip_with(v, row, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(out_col, proj)


def random_projection_long(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    d_in: int,
    d_out: int,
    seed: int = 7,
) -> DataFrame:
    """Long-format twin → (id, j, component): the cross-engine-comparable
    form (no array equality needed), and the shape a downstream
    per-dimension index (IVF cell stats, quantile clipping) consumes."""
    wide = random_projection(df, vec_col, d_in, d_out, seed)
    return wide.select(
        F.col(id_col),
        F.posexplode("projected").alias("j", "component"),
    )
