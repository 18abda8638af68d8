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


def skeleton_key(name: Column, length: int = 6) -> Column:
    """Phonetic-skeleton blocking key: first letter + the consonants of
    the rest of the lowercased, letters-only name, truncated to
    ``length`` — the classic cheap blocking key (Pollock & Zamora 1984
    SPEEDCOP skeleton key, minus the reorder step) that survives vowel
    typos and inflection ("acme corporation" / "acm corpratin" block
    together) where token-prefix blocking needs a shared whole token.

    RE2-portable on purpose (character classes only, no lookahead), so
    the DuckDB oracle replays it verbatim. Pure codegen projection.
    """
    s = F.regexp_replace(F.lower(name), "[^a-z]", "")
    rest = F.substring(s, F.lit(2), F.length(s))
    return F.concat(
        F.substring(s, 1, 1),
        F.substring(F.regexp_replace(rest, "[aeiou]", ""), F.lit(1), F.lit(length - 1)),
    )


def skeleton_blocking_pairs(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    key_length: int = 6,
    max_block_size: int = 50,
) -> DataFrame:
    """Candidate duplicate pairs = all unordered id pairs sharing a
    skeleton key, from blocks of size 2..``max_block_size``.

    The size cap is the scale contract: a block of b rows emits
    b·(b−1)/2 pairs, so one stop-key block ("john smith" skeletons)
    can dominate the whole join; blocks over the cap are EXCLUDED
    (their names need a more selective key — callers route them
    through ``jaccard_set_join`` or sorted-neighborhood instead), which
    bounds the equi-join fan-out at max_block_size² per key. The block
    census is a combinable count; the pair join is a same-key
    self-equi-join, never a cross join. Returns
    (block_key, id_a, id_b) with id_a < id_b.
    """
    if max_block_size < 2:
        raise ValueError(f"max_block_size must be ≥ 2, got {max_block_size}")
    keyed = entities.select(
        F.col(id_col), skeleton_key(F.col(name_col), key_length).alias("_bk")
    ).filter(F.col("_bk") != "")
    ok = (
        keyed.groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_b"))
        .filter((F.col("_b") >= 2) & (F.col("_b") <= max_block_size))
        .select("_bk")
    )
    inb = keyed.join(ok, "_bk")
    left = inb.select(F.col("_bk"), F.col(id_col).alias("id_a"))
    right = inb.select(F.col("_bk"), F.col(id_col).alias("id_b"))
    return left.join(right, "_bk").filter(F.col("id_a") < F.col("id_b")).select(
        F.col("_bk").alias("block_key"), "id_a", "id_b"
    )


def fellegi_sunter_scores(
    pairs: DataFrame,
    field_weights: list[tuple[str, str, int, int]],
    threshold_microbits: int,
) -> DataFrame:
    """Fellegi–Sunter (1969) record-linkage scoring over candidate
    pairs: each field contributes log2(m/u) micro-bits on agreement and
    log2((1−m)/(1−u)) on disagreement; the pair matches when the summed
    score clears the threshold.

    ``field_weights`` rows are (col_a, col_b, agree_w, disagree_w) with
    the weights ALREADY integerized to microbits (floor(1e6·log2)) by
    the caller — the m/u probabilities are model constants, so the
    integerization happens once at plan-build time and the per-row
    score is an exact BIGINT sum, bit-stable across engines. NULL on
    either side contributes 0 (missing-at-random, the standard
    treatment). Pure projection over the candidate frame — the
    expensive part of linkage is pair generation (the blocking
    operators), never this scoring pass. Appends (fs_score, is_match).
    """
    score = F.lit(0).cast("long")
    for col_a, col_b, w_agree, w_disagree in field_weights:
        a, b = F.col(col_a), F.col(col_b)
        score = score + (
            F.when(a.isNull() | b.isNull(), F.lit(0))
            .when(a == b, F.lit(int(w_agree)))
            .otherwise(F.lit(int(w_disagree)))
            .cast("long")
        )
    return pairs.select(
        "*",
        score.alias("fs_score"),
        (score >= F.lit(int(threshold_microbits))).alias("is_match"),
    )


def blocking_metrics(
    entities: DataFrame,
    id_col: str,
    key: Column,
    gold_pairs: DataFrame,
) -> DataFrame:
    """Blocking-scheme quality report WITHOUT materializing the
    candidate pairs: reduction ratio (1 − candidates/all-pairs) and
    pairs completeness (fraction of gold duplicate pairs whose two ids
    share a block) — the two numbers every ER paper tunes blocking by
    (Christen 2012).

    Scale shape: candidate count = Σ b·(b−1)/2 over the block census
    (combinable groupBy — the pairs themselves are NEVER generated, so
    this audits a blocking key far too hot to expand); total pairs from
    the 1-row entity count; completeness joins the gold pairs (id_a,
    id_b) to the per-id key frame TWICE on the id keys. The scalar
    frames combine via broadcast keyless aggregates. Returns one row:
    (n_entities, n_candidate_pairs, n_total_pairs, n_gold,
    n_gold_covered, reduction_ratio, pairs_completeness), ratios 6 dp.
    """
    keyed = entities.select(F.col(id_col).alias("_id"), key.alias("_bk"))
    census = keyed.groupBy("_bk").agg(F.count(F.lit(1)).alias("_b"))
    cand = F.broadcast(
        census.agg(
            (F.sum(F.col("_b") * (F.col("_b") - 1)) / 2)
            .cast("long")
            .alias("n_candidate_pairs")
        )
    )
    tot = F.broadcast(
        keyed.agg(
            F.count(F.lit(1)).cast("long").alias("n_entities"),
            (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
            .cast("long")
            .alias("n_total_pairs"),
        )
    )
    g = gold_pairs.select(F.col("id_a").alias("_ga"), F.col("id_b").alias("_gb"))
    ga = keyed.select(F.col("_id").alias("_ga"), F.col("_bk").alias("_ka"))
    gb = keyed.select(F.col("_id").alias("_gb"), F.col("_bk").alias("_kb"))
    gold = F.broadcast(
        g.join(ga, "_ga").join(gb, "_gb").agg(
            F.count(F.lit(1)).cast("long").alias("n_gold"),
            F.sum(
                F.when(F.col("_ka") == F.col("_kb"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_gold_covered"),
        )
    )
    return (
        tot.crossJoin(cand)
        .crossJoin(gold)
        .select(
            "n_entities",
            "n_candidate_pairs",
            "n_total_pairs",
            "n_gold",
            "n_gold_covered",
            F.round(
                1.0 - F.col("n_candidate_pairs") / F.col("n_total_pairs"), 6
            ).alias("reduction_ratio"),
            F.when(
                F.col("n_gold") > 0,
                F.round(F.col("n_gold_covered") / F.col("n_gold"), 6),
            ).alias("pairs_completeness"),
        )
    )
