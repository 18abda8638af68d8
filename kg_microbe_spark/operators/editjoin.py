"""Blocked edit-distance self-join: typo-variant candidate pairs.

KG-construction use: web surface forms carry typos and near-spellings
("Lactobacilus" for "Lactobacillus") that token-set entity resolution
(operators/entity_resolution.py — Jaccard over token sets) cannot see:
a one-letter typo changes the whole token. Character edit distance is
the complementary matcher; these pairs feed the same
alternating-star components the ER operator uses.

100-TB shape (the blocking pattern every similarity join here uses):

* an ALL-PAIRS Levenshtein is n² — never materialized. Candidates
  come from equi-join BLOCKS (normalized prefix); within a block the
  join is quadratic in BLOCK size only;
* the MAX-BLOCK-SIZE guard drops pathological blocks before the
  self-join (the prefix "st" block of a billion-name table) — same
  role as pairwise_jaccard's hub-item cap and alignment.py's term-DF
  guard. Dropped blocks are a documented recall tradeoff: production
  re-blocks them on a longer prefix;
* `levenshtein(a, b) <= k` evaluates JVM-side post-join; the
  |len(a) − len(b)| ≤ k length filter prunes pairs BEFORE the
  distance computation (a necessary condition of edit distance —
  cheap int compare vs O(len²) DP);
* output is canonical (a < b) so the downstream distinct is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_distance_pairs(
    names: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    prefix_len: int = 2,
    max_block_size: int = 1000,
) -> DataFrame:
    """names(id, name) → (id_a, id_b, name_a, name_b, distance) for
    distinct-id pairs with the same lowercase ``prefix_len``-prefix and
    Levenshtein distance ≤ ``max_distance``; id_a < id_b. Blocks
    larger than ``max_block_size`` are dropped (re-block on a longer
    prefix for those)."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be ≥ 1, got {max_distance}")
    n = (
        names.select(
            F.col(id_col).alias("id"),
            F.lower(F.trim(F.col(name_col))).alias("name"),
        )
        .filter(F.length("name") >= prefix_len)
        .distinct()
        .withColumn("blk", F.substring("name", 1, prefix_len))
    )
    ok_blocks = (
        n.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") <= max_block_size)
        .select("blk")
    )
    n = n.join(ok_blocks, on="blk", how="left_semi")
    a = n.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk")
    b = n.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )
