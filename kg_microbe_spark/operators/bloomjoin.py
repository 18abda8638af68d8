"""Bloom-filter join prefiltering.

The classic distributed-join optimization: before shuffling a 100-TB
fact table to join a selective dimension subset, probe every fact key
against a tiny Bloom bitmap built from the dimension keys — rows whose
keys cannot possibly match are dropped AT THE SCAN, so the shuffle
carries only (matches + a tunable false-positive sliver). Spark's
engine applies this internally for some shuffle joins (runtime row
filtering); this module makes it an explicit, portable operator with a
deterministic hash family so an oracle can replay it bit-for-bit.

Design:

- ``k`` hash positions per key via the repo's cross-engine md5-60bit
  hash with the probe index concatenated INTO the string (multi-arg
  seeded xxhash is not an independent family — round-2 lesson), so
  DuckDB reproduces every position.
- ``build_bloom_words`` folds the dimension's bit positions into
  ``m_bits/64`` longs engine-side (groupBy word index + bit_or — the
  only collect is ≤ m/64 rows, driver-safe by construction).
- ``bloom_probe`` embeds the words as an array literal — a broadcast
  in the truest sense: serialized once into the task closure — and
  tests all k bits in one whole-stage-codegen projection. No join, no
  shuffle, no UDF on the fact side.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the caller picks
``m_bits`` for the dimension cardinality (10M keys × 10 bits/key =
12.5 MB — trivially broadcastable).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key: Column, probe: int, m_bits: int) -> Column:
    """Deterministic bit position in [0, m_bits) for probe index i:
    md5_60bit(key || ':' || i) % m_bits."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f":{probe}"))), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(int(m_bits))


def build_bloom_words(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3
) -> List[int]:
    """Fold the distinct keys' k bit positions into m_bits/64 longs.
    Returns the dense word list (index w = bits [64w, 64w+64))."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col).cast("string")
    pos = keys.select(
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k)])
        ).alias("p")
    ).distinct()
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, int(p % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()  # ≤ m_bits/64 rows — bitmap-sized, not data-sized
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    return dense


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: List[int],
    k: int = 3,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Add ``out_col``: true iff all k bit positions of the key are set
    in ``words``. Pure projection — the bitmap rides the task closure."""
    m_bits = len(words) * 64
    key = F.col(key_col).cast("string")
    probe = df
    terms = []
    for i in range(k):
        pcol = f"_bf_p{i}"
        probe = probe.withColumn(pcol, _position(key, i, m_bits))
        terms.append(
            F.expr(
                f"(get(_bf_words, int({pcol} / 64)) & shiftleft(1L, int({pcol} % 64))) != 0"
            )
        )
    test = terms[0]
    for t in terms[1:]:
        test = test & t
    return (
        probe.withColumn("_bf_words", F.lit(words))
        .withColumn(out_col, test)
        .drop("_bf_words", *[f"_bf_p{i}" for i in range(k)])
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Prefilter ``fact`` by a Bloom bitmap of ``dim``'s keys, then
    finish with the exact (semi) join. Returns the fact rows that truly
    match; only bloom-passing rows ever reach the join's shuffle."""
    words = build_bloom_words(dim.select(dim_key).distinct(), dim_key, m_bits, k)
    passed = bloom_probe(fact, fact_key, words, k).filter(F.col("bloom_pass"))
    return passed.drop("bloom_pass").join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
