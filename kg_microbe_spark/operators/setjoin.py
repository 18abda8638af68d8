"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin
family) — every document pair with Jaccard(token-set) ≥ t, EXACTLY.

The third member of the near-dup toolkit next to MinHash-LSH
(probabilistic candidates, operators/dedup.py) and embedding near-dup
(operators/similarity.py): when the dedup policy is a hard Jaccard
threshold, prefix filtering gives the exact answer WITHOUT the n²
all-pairs join. Canonical ordering + prefix theorem: order every set by
ascending global token frequency (rarest first, ties by token); for
Jaccard ≥ t a set of size n can miss at most n - ceil(t·n) tokens of
any qualifying partner, so two qualifying sets MUST share a token
inside both of their length-(n - ceil(t·n) + 1) prefixes. Candidates =
the equi-join of exploded prefixes — shuffle ∝ prefix postings (rare
tokens → tiny posting lists), never |docs|².

Shape: one doc-frequency groupBy (dimension-sized output), one
collect-per-doc sort (combinable), the prefix equi-join, then an exact
verify on the candidate pairs. All JVM; the verify division
(|∩| / |∪|) is one int/int→double op, bit-identical across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_set_join(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
) -> DataFrame:
    """(id_a, id_b, jac) for all pairs with Jaccard ≥ ``threshold``
    (id_a < id_b). ``set_col`` must be array<string>; duplicates are
    removed and empty sets dropped (Jaccard undefined)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0,1], got {threshold}")
    t = float(threshold)
    sets = df.select(
        F.col(id_col).alias("_id"), F.array_distinct(F.col(set_col)).alias("_s")
    ).filter(F.size("_s") > 0)
    tok = sets.select("_id", F.explode("_s").alias("_w"))
    freq = tok.groupBy("_w").agg(F.count("*").alias("_f"))
    # canonical order: rarest-first, token asc; prefix of length
    # n - ceil(t*n) + 1 in that order
    ordered = (
        tok.join(freq, on="_w")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("_f", "_w"))).alias("_st"))
        .select(
            "_id",
            F.transform("_st", lambda x: x["_w"]).alias("_sorted"),
        )
        .withColumn(
            "_prefix",
            F.slice(
                "_sorted",
                1,
                F.size("_sorted") - F.ceil(F.lit(t) * F.size("_sorted")).cast("int") + 1,
            ),
        )
    )
    pref = ordered.select("_id", F.explode("_prefix").alias("_w"))
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), on="_w")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("_ia"), F.col("b._id").alias("_ib"))
        .distinct()
    )
    sa = sets.select(F.col("_id").alias("_ia"), F.col("_s").alias("_sa"))
    sb = sets.select(F.col("_id").alias("_ib"), F.col("_s").alias("_sb"))
    return (
        cand.join(sa, on="_ia")
        .join(sb, on="_ib")
        .withColumn(
            "jac",
            F.size(F.array_intersect("_sa", "_sb")) / F.size(F.array_union("_sa", "_sb")),
        )
        .filter(F.col("jac") >= F.lit(t))
        .select(F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"), "jac")
    )
