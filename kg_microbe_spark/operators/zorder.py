"""Z-order (Morton) interleave keys for multi-dimensional data layout.

At 100 TB the dominant query cost is the scan, and the scan's cost is
decided at WRITE time: sorting a table by a single column clusters one
predicate dimension and scatters every other, while writing it ordered
by an interleaved-bit key clusters ALL participating dimensions at once
— a parquet file then holds a small hyper-rectangle of the key space,
and min/max footer stats prune files for range predicates on ANY of the
interleaved columns (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; public literature: Morton 1966, Bayer's UB-tree).

Spark-first shape: the key is a pure-JVM bitwise expression —
``aggregate(sequence(...))`` folding shifted bit extracts — inside one
whole-stage-codegen projection; building the layout is then just
``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")``
followed by the parquet write, all engine-native. No UDF, no shuffle
beyond the one the re-layout itself IS.

Inputs must already be quantized to ``[0, 2**bits)`` integers — rank or
min-max quantization is the caller's step (``percentile_normalize`` /
histogram cutoffs ship separately); this operator owns only the
interleave, so the bit arithmetic stays exact and oracle-replayable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key_col(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (each an integer in ``[0, 2**bits)``)
    into one BIGINT: bit ``i`` of column ``j`` lands at position
    ``i * n + (n - 1 - j)`` — column 0 owns the most-significant slot of
    each group, so equal-prefix runs of the key correspond to aligned
    hyper-rectangles of the input space. ``n * bits`` must fit 63 bits."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    key = F.lit(0).cast("long")
    # Unrolled in Python (n*bits <= 63 terms): each term is a literal-shift
    # bit extract, so the whole key is one flat codegen expression —
    # deliberately NOT aggregate()-over-sequence, whose per-row array
    # allocation costs more than the arithmetic it folds.
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        slot = n - 1 - j
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + slot))
    return key


def zorder_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as one ANSI-SQL expression (unrolled —
    portable to engines without higher-order functions), for oracles and
    for pushing the layout key into external writers."""
    n = len(cols)
    # Mirror zorder_key_col's guards (ADVICE r5): without them, e.g.
    # 4 cols × 16 bits silently generates a '<< 63' term that overflows
    # into the signed BIGINT sign bit.
    if n < 2:
        raise ValueError("z-order needs at least 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    terms = []
    for j, c in enumerate(cols):
        slot = n - 1 - j
        terms.extend(
            f"((({c} >> {i}) & 1) << {i * n + slot})" for i in range(bits)
        )
    return " | ".join(terms)
