"""Embedding scalar quantization — int8 compression for ANN at scale.

At 10¹²-document scale the float32 embedding column IS the storage and
shuffle bill (64 dims × 4 B × 10¹² = 256 TB before replication).
Symmetric per-vector int8 quantization cuts that 4× with bounded
recall loss, and is the standard precursor to IVF/LSH candidate
generation (operators/similarity.py): candidates are found over the
quantized vectors, the exact re-rank reads the float originals.

Spark shape: everything is IN-ROW higher-order array expressions —
array_max for the per-vector scale, transform for the quantize, a
deterministic left fold (the transe_energy discipline, kge.py) for the
reconstruction error. Zero shuffles, zero UDFs, zero state: the
operator is a narrow projection at any corpus size.

Determinism: quantized values are ROUND-half-away-from-zero doubles
cast to int (both engines round identically on integral doubles);
the MSE fold is a left-to-right in-row sum — no aggregation-order
exposure. The all-zero vector quantizes to zeros with scale 0 rather
than dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    embeddings: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric per-vector int8 quantization + reconstruction MSE.

    Returns (``id_col``, scale, q, mse): ``scale`` = max|x|/127 (0 for
    the zero vector), ``q`` = round(x/scale) clamped to [-127, 127] as
    int (zeros when scale is 0), ``mse`` = mean of (x − q·scale)² via
    an in-row left fold — the per-vector quantization error an ANN
    recall budget is set against.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = (F.array_max(F.transform(x, F.abs)) / F.lit(127.0)).alias("scale")
    df = embeddings.select(F.col(id_col), x.alias("_x"), scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("_x"),
            lambda v: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(v / F.col("scale"), 0).cast("int")),
            ),
        ),
    ).otherwise(F.transform(F.col("_x"), lambda v: F.lit(0)))
    df = df.withColumn("q", q)
    diff_sq = F.zip_with(
        F.col("_x"),
        F.col("q"),
        lambda v, qi: (v - qi.cast("double") * F.col("scale"))
        * (v - qi.cast("double") * F.col("scale")),
    )
    mse = F.aggregate(
        diff_sq, F.lit(0.0), lambda acc, d: acc + d
    ) / F.size(F.col("_x"))
    return df.select(id_col, "scale", "q", mse.alias("mse"))
