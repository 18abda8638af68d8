"""Entity resolution: block, match, and canonicalize duplicate entities.

A web-extracted KG names the same real-world entity many ways across
pages ("Acme Corp", "acme corporation", "Acme Corporation Ltd"); before
the merge step can aggregate evidence per entity, surface variants must
collapse to one canonical id. The reference resolves duplicates through
curated xref equivalence chains (kg_microbe merge step); open-web
extraction has no curated xrefs, so equivalence must be INFERRED from
name similarity — this module is that inference, composed entirely from
the repo's scale-shaped primitives:

1. name → normalized token set (lower, whitespace split, distinct) —
   codegen projection;
2. ``jaccard_set_join`` (operators/setjoin.py) — PPJoin-style prefix
   filter: candidate pairs share a token from the rarest-first prefix,
   so the self-join touches O(pairs-sharing-rare-token), never all
   pairs; the filter is COMPLETE (any pair ≥ t shares a prefix token),
   so semantics equal the all-pairs join the oracle runs;
3. ``connected_components`` (operators/components.py, alternating
   star) — transitive closure of matches in O(log² n) rounds, hub-safe;
4. canonical_id = component minimum (stable across runs/partitionings),
   with singletons mapping to themselves via left-join coalesce.

100-TB shape: every stage is an equi-join or combinable aggregation;
skew concentrates in stop-tokens ("inc", "ltd"), which the rarest-first
prefix ordering systematically avoids putting in prefixes of long
names, and token-frequency hubs shrink map-side in the candidate
distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kg_microbe_spark.operators.components import connected_components
from kg_microbe_spark.operators.setjoin import jaccard_set_join


def name_token_set(name: Column) -> Column:
    """Lowercased, whitespace-split, de-duplicated token array."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.trim(name)), r"\s+"),
            lambda w: w != F.lit(""),
        )
    )


def sorted_neighborhood_pairs(
    entities: DataFrame,
    id_col: str,
    key_col,
    window: int,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): sort all
    records by a blocking key and emit each record paired with the next
    ``window`` records in sort order — the classic complement to
    token-prefix blocking (``jaccard_set_join``) for typo-heavy keys
    where variants sort adjacently but share no rare token.

    ``key_col`` is a Column expression (e.g. a normalized-name prefix).
    Output: (id_a, id_b, key_a, key_b) with the LOWER-rank record as
    ``a`` — each unordered pair appears exactly once.

    Spark shape: the global sort assigns a dense rank (ties broken by
    id so the pairing is deterministic), then the self-pairing is an
    EQUI-join on block = floor(rank / window): each row joins its own
    block and the next one, and the |rank difference| ≤ window filter
    lands post-join. That keeps the candidate join an equi-join of
    ~2·window rows per row — never a cross join, never a range join —
    at the cost of one rank window over the sorted frame. At 100 TB the
    rank's single-partition bottleneck is avoided the standard way:
    sort-within-range-partitions and offset ranks by per-partition
    counts; at driver-test scale the plain window is exact and the
    semantics are identical, which is what the oracle checks.
    """
    ranked = entities.select(
        F.col(id_col), key_col.alias("_key")
    ).withColumn(
        "_rank",
        F.row_number().over(
            W.orderBy(F.col("_key"), F.col(id_col))
        )
        - 1,
    )
    blocked = ranked.select(
        "*", F.floor(F.col("_rank") / window).alias("_block")
    )
    # Each left row meets its own block and the following block: any pair
    # with rank difference in [1, window] lives in the same or adjacent
    # blocks, so the union of the two equi-joins is COMPLETE.
    right = blocked.select(
        F.col(id_col).alias("id_b"),
        F.col("_key").alias("key_b"),
        F.col("_rank").alias("_rank_b"),
        F.col("_block").alias("_block_b"),
    )
    pairs = None
    for shift in (0, 1):
        leg = blocked.join(
            right, blocked["_block"] + shift == right["_block_b"], "inner"
        )
        pairs = leg if pairs is None else pairs.unionByName(leg)
    return (
        pairs.filter(
            (F.col("_rank_b") > F.col("_rank"))
            & (F.col("_rank_b") - F.col("_rank") <= window)
        )
        .select(
            F.col(id_col).alias("id_a"),
            "id_b",
            F.col("_key").alias("key_a"),
            "key_b",
        )
    )


def resolve_entities(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    threshold: float,
    max_iterations: int = 25,
) -> DataFrame:
    """One row per input entity: ``(id_col, canonical_id,
    cluster_size)`` where canonical_id is the minimum entity id among
    all entities transitively connected by name-token Jaccard ≥
    ``threshold``, and singletons are their own canonical."""
    toks = entities.select(
        F.col(id_col), name_token_set(F.col(name_col)).alias("_tokens")
    )
    matches = jaccard_set_join(toks, id_col, "_tokens", threshold)
    comp = connected_components(
        matches, "id_a", "id_b", max_iterations=max_iterations
    )
    labeled = (
        entities.select(id_col)
        .join(comp, on=F.col(id_col) == F.col("node"), how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
        )
    )
    sizes = labeled.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, on="canonical_id").select(
        id_col, "canonical_id", "cluster_size"
    )
