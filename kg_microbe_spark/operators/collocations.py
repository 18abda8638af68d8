"""PMI bigram collocations — corpus-level phrase mining.

Pointwise mutual information over adjacent token pairs finds the
multiword units ("new york", "machine learning") a lexicon/tokenizer
pipeline should treat as one term — the corpus-statistics complement of
the dictionary-driven mention scan (operators/mentions.py), and the
standard phrase-induction step of a web-text training pipeline.

    pmi(a,b) = ln( (c_ab / B) / ((c_a / T) · (c_b / T)) )

Shape: one explode+groupBy for unigrams, one for bigrams (both map-side
combinable), totals as broadcast 1-row aggregates, then the bigram
frame joins the unigram counts twice on token — the unigram side is
vocabulary-sized (dimension-like after aggregation), the bigram side is
pre-shrunk by its groupBy and by ``min_count`` BEFORE the joins, so
nothing fact-sized shuffles twice. The PMI expression is written in the
identical association order on both engines (double divisions, then
ln) so values agree to the comparison precision."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.functions.text import tokens_col
from kg_microbe_spark.operators.repetition import _bigrams_col


def pmi_bigrams(
    docs: DataFrame,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Corpus bigram PMI → (w1, w2, n, pmi) for bigrams with
    count ≥ ``min_count`` (the filter runs before the unigram joins)."""
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1, got {min_count}")
    toks = tokens_col(F.col(text_col))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    big = (
        docs.select(F.explode(_bigrams_col(toks)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(int(min_count)))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n",
        )
    )
    t_uni = F.broadcast(uni.agg(F.sum("c").cast("long").alias("_t")))
    t_big = F.broadcast(
        docs.select(F.size(_bigrams_col(toks)).alias("k")).agg(F.sum("k").cast("long").alias("_b"))
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("_c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("_c2"))
    return (
        big.join(c1, on="w1")
        .join(c2, on="w2")
        .crossJoin(t_uni)
        .crossJoin(t_big)
        .select(
            "w1",
            "w2",
            "n",
            F.log(
                (F.col("n") / F.col("_b"))
                / (F.col("_c1") / F.col("_t") * (F.col("_c2") / F.col("_t")))
            ).alias("pmi"),
        )
    )


def _capped_unit_sets(
    df: DataFrame, unit_col: str, entity_col: str, cap: int
) -> DataFrame:
    """Per-unit sorted distinct entity array, capped (kg_triples
    discipline: a hub unit can never explode downstream pair work)."""
    return (
        df.select(F.col(unit_col).alias("u"), F.col(entity_col).alias("e"))
        .distinct()
        .groupBy("u")
        .agg(F.slice(F.sort_array(F.collect_set("e")), 1, cap).alias("es"))
    )


def _pair_counts(sets: DataFrame, cap: int, min_pair_count: int) -> DataFrame:
    """IN-ROW unordered pair generation over the capped arrays + one
    combinable count: (ea, eb, n_pair) with ea < eb."""
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "es",
                    lambda x, i: F.transform(
                        F.slice(F.col("es"), i + F.lit(2), cap),
                        lambda y: F.struct(x.alias("ea"), y.alias("eb")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.ea", "p.eb")
    return (
        pairs.groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )


def cooccurrence_pairs(
    df: DataFrame,
    unit_col: str,
    entity_col: str,
    min_pair_count: int = 1,
    max_entities_per_unit: int = 64,
) -> DataFrame:
    """Raw co-occurrence pair counts (ea, eb, n_pair), ea < eb — the
    integer-weighted prior the collective-disambiguation rerank
    (operators/disambiguation.py) consumes; ``cooccurrence_pmi`` below
    turns the same counts into PMI scores."""
    sets = _capped_unit_sets(df, unit_col, entity_col, max_entities_per_unit)
    return _pair_counts(sets, max_entities_per_unit, min_pair_count)


def cooccurrence_pmi(
    df: DataFrame,
    unit_col: str,
    entity_col: str,
    min_pair_count: int = 2,
    max_entities_per_unit: int = 64,
) -> DataFrame:
    """Set-based co-occurrence PMI: association strength between
    entities that appear in the SAME unit (page, order, document) — the
    edge-weighting step that turns co-mention pairs (operators/
    triples.py) into a weighted entity graph, where ``pmi_bigrams``
    above handles token ADJACENCY.

        pmi(a,b) = ln( (c_ab · n) / (c_a · c_b) )   over n units

    Shape (kg_triples discipline): per-unit entity sets are collected
    once, sorted, and CAPPED at ``max_entities_per_unit`` — pair
    generation is IN-ROW (flatten/transform over the capped array), so
    a hub unit can never explode the shuffle; marginal counts c_a come
    from the same capped sets, keeping the probability space consistent
    with the pair universe. Two combinable groupBys + one broadcast
    1-row n; the pair→marginal joins run on aggregated
    (vocabulary-sized) frames only."""
    sets = _capped_unit_sets(df, unit_col, entity_col, max_entities_per_unit)
    pair_counts = _pair_counts(sets, max_entities_per_unit, min_pair_count)
    ent_counts = (
        sets.select(F.explode("es").alias("e"))
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_units = F.broadcast(sets.agg(F.count(F.lit(1)).alias("_n")))
    return (
        pair_counts.join(
            ent_counts.select(F.col("e").alias("ea"), F.col("c").alias("_ca")),
            "ea",
        )
        .join(
            ent_counts.select(F.col("e").alias("eb"), F.col("c").alias("_cb")),
            "eb",
        )
        .crossJoin(n_units)
        .select(
            "ea",
            "eb",
            "n_pair",
            (
                F.round(
                    F.log(
                        (F.col("n_pair").cast("double") * F.col("_n"))
                        / (F.col("_ca").cast("double") * F.col("_cb"))
                    ),
                    6,
                )
                # + 0.0 folds IEEE -0.0 (a barely-negative PMI rounds to
                # zero from below) to +0.0 — cross-engine hash stability
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


def llr_bigrams(
    docs: DataFrame,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Dunning log-likelihood-ratio collocations — the significance-
    aware alternative to :func:`pmi_bigrams` (PMI over-ranks rare
    pairs; LLR is the test statistic phrase miners actually threshold,
    Dunning 1993). Returns (w1, w2, n, llr) for bigrams with
    count ≥ ``min_count``.

    The 2×2 table comes from bigram-TABLE marginals (k11 = c(w1 w2),
    row = c(w1 ·), col = c(· w2), N = total bigrams) and
    LLR = 2·(Σ xlogx(k) − Σ xlogx(row) − Σ xlogx(col) + xlogx(N)).

    Scale shape: one combinable bigram groupBy; the two marginals are
    combinable re-aggregations of THAT count frame (never a second
    corpus pass); each joins back by its own single key; N rides a
    broadcast. Every cell is an exact BIGINT, so the only float ops
    are ln on integer-valued doubles — libm-stable — and the final
    rounding.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1, got {min_count}")
    toks = tokens_col(F.col(text_col))
    big = (
        docs.select(F.explode(_bigrams_col(toks)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n",
        )
    )
    row = big.groupBy("w1").agg(F.sum("n").cast("long").alias("_r"))
    col = big.groupBy("w2").agg(F.sum("n").cast("long").alias("_c"))
    tot = F.broadcast(big.agg(F.sum("n").cast("long").alias("_n")))

    def _xlogx(c):
        return F.when(c > 0, c * F.log(c.cast("double"))).otherwise(F.lit(0.0))

    j = (
        big.filter(F.col("n") >= F.lit(int(min_count)))
        .join(row, "w1")
        .join(col, "w2")
        .crossJoin(tot)
    )
    k11 = F.col("n")
    k12 = F.col("_r") - k11
    k21 = F.col("_c") - k11
    k22 = F.col("_n") - F.col("_r") - k21
    llr = 2.0 * (
        _xlogx(k11) + _xlogx(k12) + _xlogx(k21) + _xlogx(k22)
        - _xlogx(F.col("_r")) - _xlogx(F.col("_n") - F.col("_r"))
        - _xlogx(F.col("_c")) - _xlogx(F.col("_n") - F.col("_c"))
        + _xlogx(F.col("_n"))
    )
    return j.select("w1", "w2", "n", F.round(llr, 6).alias("llr"))


def assoc_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_item_frequency: int | None = None,
) -> DataFrame:
    """Association-rule mining over (basket, item) facts — support,
    both directed confidences, and lift per co-occurring item pair
    (Agrawal et al. 1993, restricted to the 1-item-antecedent rules
    that cover the KG use: "pages mentioning entity A also mention B",
    "orders with part-family X carry Y").

    Scale shape: the (basket, item) distinct collapses map-side; pair
    generation is the same-basket self-equi-join (item_a < item_b),
    whose fan-out is Σ b_k² over basket sizes — bounded by the basket
    cardinality, never |items|²; ``max_item_frequency`` is the
    pairwise_jaccard-style hub-item guard (an item in half the baskets
    makes every pair "associated" and dominates Σ b²; drop it BEFORE
    the join). Supports/counts stay exact BIGINT; support, confidences
    and lift are single float dataflows (lift's n·n_ab/(n_a·n_b)
    multiplies exact integers inside the double). min_pair_count
    prunes the pair tail before the dimension joins. Returns
    (item_a, item_b, n_ab, n_a, n_b, support, conf_a_to_b, conf_b_to_a,
    lift), 6 dp floats.
    """
    fact = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    item_counts = fact.groupBy("_i").agg(
        F.count(F.lit(1)).cast("long").alias("_n_i")
    )
    if max_item_frequency is not None:
        keep = item_counts.filter(F.col("_n_i") <= max_item_frequency)
        fact = fact.join(keep.select("_i"), "_i")
        item_counts = keep
    n_baskets = F.broadcast(
        baskets.select(F.col(basket_col).alias("_b"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    left = fact.select("_b", F.col("_i").alias("item_a"))
    right = fact.select("_b", F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("_i").alias("item_a"), F.col("_n_i").alias("n_a")
    )
    cb = item_counts.select(
        F.col("_i").alias("item_b"), F.col("_n_i").alias("n_b")
    )
    j = pairs.join(ca, "item_a").join(cb, "item_b").crossJoin(n_baskets)
    nd = F.col("_n").cast("double")
    return j.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab") / nd, 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
            "conf_a_to_b"
        ),
        F.round(F.col("n_ab") / F.col("n_b").cast("double"), 6).alias(
            "conf_b_to_a"
        ),
        F.round(
            (nd * F.col("n_ab").cast("double"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("lift"),
    )
