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


def neighbor_mean_features(
    edges: DataFrame,
    feats: DataFrame,
    src_col: str,
    dst_col: str,
    id_col: str,
    vec_col: str,
    dims: int | None = None,
) -> DataFrame:
    """One GraphSAGE-style message-passing layer: for every destination
    node, the element-wise MEAN of its in-neighbors' feature vectors —
    the preprocessing step that turns the KG + embedding table into
    GNN training features. Returns LONG format ``(id, pos, n_neighbors,
    mean_val)`` with 1-based component positions (array-repr-free, the
    random_projection_embed output discipline).

    Scale shape: features are pos-exploded BEFORE the join, so the
    aggregation key is (dst, pos) — a hub node's work spreads over
    ``dims`` reducer keys instead of one (built-in skew spreading), and
    the per-key state is a running (sum, count), never a collected
    neighbor list. One equi-join + one combinable groupBy; parallel
    edges collapse (distinct) so each neighbor votes once."""
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    vec = F.col(vec_col) if dims is None else F.slice(F.col(vec_col), 1, dims)
    f = feats.select(
        F.col(id_col).alias("_src"),
        F.posexplode(vec).alias("_pos0", "_val"),
    )
    return (
        e.join(f, "_src")
        .groupBy(F.col("_dst").alias("id"), (F.col("_pos0") + 1).alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            (F.round(F.avg(F.col("_val").cast("double")), 6) + F.lit(0.0))
            .alias("mean_val"),
        )
    )
