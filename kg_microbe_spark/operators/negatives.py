"""Negative sampling for KG-embedding training.

Training TransE/DistMult-style embeddings over the merged KG needs k
corrupted triples (s, p, o′) per true triple, sampled uniformly from the
entity vocabulary, reproducibly (the same epoch seed must regenerate the
same negatives on any cluster). The reference emits the positive triples
(merge step); this module adds the training-data side.

Spark-first shapes:

``dense_index`` — a 0..n-1 dense id per entity WITHOUT the classic
single-partition ``row_number() OVER (ORDER BY ...)`` scale trap:
phase 1 hash-buckets entities (B-way shuffle) and ranks within buckets,
phase 2 broadcasts the B cumulative bucket offsets. The total order is
(bucket, entity) — fully deterministic, so any engine reproduces the
mapping with one global sort at oracle scale.

``corrupt_triples`` — the replacement index is ``md5_60bit(s:p:o:j:seed)
% n``: a pure projection per negative (narrow ×k explode), one equi-join
against the indexed vocabulary (broadcast when the vocabulary is
dimension-sized, shuffle otherwise), and an optional left-anti join back
to the positives to discard accidental true triples (the standard
"filtered" negative-sampling setting). No RNG state anywhere — the seed
is in the hash string, the same trick the MinHash permutations use
(operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_microbe_spark.operators.sampling import hash_bucket


def dense_index(
    entities: DataFrame, entity_col: str, n_buckets: int = 256
) -> DataFrame:
    """Assign a deterministic dense 0..n-1 ``idx`` to each distinct
    entity, ordered by (md5-bucket, entity). Distributed: per-bucket
    rank + broadcast cumulative offsets — no single-partition window."""
    ents = entities.select(entity_col).distinct()
    bucketed = ents.withColumn(
        "_b", hash_bucket(F.col(entity_col).cast("string"), n_buckets)
    )
    w = Window.partitionBy("_b").orderBy(F.col(entity_col).asc())
    ranked = bucketed.withColumn("_rn", F.row_number().over(w))
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    # B rows: the running offset of each bucket (tiny, driver-safe window)
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_c").over(
                Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_b", "_off")
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .select(
            entity_col,
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias("idx"),
        )
    )


def corrupt_triples(
    triples: DataFrame,
    entities: DataFrame,
    entity_col: str = "entity",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    k: int = 1,
    seed: int = 7,
    filter_positives: bool = True,
) -> DataFrame:
    """Emit k deterministic negatives per triple: the object replaced by
    the vocabulary entity at ``md5_60bit(s:p:o:j:seed) % n``. Returns
    (subj, pred, neg_obj, neg_rank). ``filter_positives`` drops corrupted
    triples that happen to exist in the positive set (left-anti join)."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    indexed = dense_index(entities, entity_col)
    n = indexed.count()  # dimension-scale vocabulary; one cheap agg
    with_j = triples.select(subj_col, pred_col, obj_col).withColumn(
        "neg_rank", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    key = F.concat_ws(
        ":",
        F.col(subj_col),
        F.col(pred_col),
        F.col(obj_col),
        F.col("neg_rank").cast("string"),
        F.lit(str(seed)),
    )
    picked = with_j.withColumn("idx", hash_bucket(key, n))
    neg = (
        picked.join(F.broadcast(indexed), "idx")
        .select(
            subj_col,
            pred_col,
            F.col(entity_col).alias("neg_obj"),
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )
    if filter_positives:
        pos = triples.select(
            F.col(subj_col),
            F.col(pred_col),
            F.col(obj_col).alias("neg_obj"),
        )
        neg = neg.join(pos, [subj_col, pred_col, "neg_obj"], "left_anti")
    return neg
