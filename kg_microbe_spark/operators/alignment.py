"""Ontology / lexicon alignment: suggest cross-ontology xrefs from
shared surface forms.

KG-construction use: the reference merges 20+ sources whose curated
xref tables are incomplete; entities the xref router
(operators/lexicon.py xref routing) cannot connect stay duplicated in
the merged KG. Candidate alignments between two lexicons — pairs whose
normalized label+synonym sets overlap — are the standard lexical
first pass of ontology matching, reviewed and then fed back as xref
rows.

100-TB shape (the set-similarity family, operators/setjoin.py's
discipline applied across two ontologies):

* each side flattens to (term_norm, curie) — explode + distinct,
  map-side combinable;
* TERM-DF HUB GUARD: terms appearing in more than ``max_term_df``
  curies on either side are dropped BEFORE the join ("protein",
  "acid" — the stopword-shaped terms that would otherwise create a
  df² pair blowup). This bounds the inverted-index join fanout per
  term, the same f² guard as pairwise_jaccard;
* ONE equi-join on term_norm → ONE combinable
  groupBy(a_curie, b_curie) shared-count;
* marginals join on aggregated (per-curie set-size) frames only;
* existing xrefs leave via ONE anti-join at the end.

Jaccard threshold applied by integer cross-multiplication
(100·shared ≥ pct·union) so the cut is exact; the reported score is
rounded for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_sets(lexicon: DataFrame, max_term_df: int) -> DataFrame:
    terms = (
        lexicon.select(
            "curie",
            F.explode(
                F.array_union(F.array(F.lower("label")), F.transform(
                    F.coalesce("synonyms", F.array()), F.lower
                ))
            ).alias("term_norm"),
        )
        .filter(F.col("term_norm") != "")
        .distinct()
    )
    df = terms.groupBy("term_norm").agg(F.count(F.lit(1)).alias("_df"))
    return terms.join(
        F.broadcast(df.filter(F.col("_df") > max_term_df).select("term_norm")),
        on="term_norm",
        how="left_anti",
    )


def align_lexicons(
    lex_a: DataFrame,
    lex_b: DataFrame,
    known_xrefs: DataFrame | None = None,
    min_jaccard_pct: int = 50,
    max_term_df: int = 20,
) -> DataFrame:
    """lex_a/lex_b(curie, label, synonyms) → suggested alignments
    (a_curie, b_curie, n_shared, n_a, n_b, jaccard_pct) with
    100·shared ≥ min_jaccard_pct·|union|, minus pairs already present
    in known_xrefs(a_curie, b_curie). Set sizes count the SURVIVING
    (post hub-guard) terms on each side so the ratio is internally
    consistent."""
    ta = _term_sets(lex_a, max_term_df).withColumnRenamed("curie", "a_curie")
    tb = _term_sets(lex_b, max_term_df).withColumnRenamed("curie", "b_curie")
    shared = (
        ta.join(tb, on="term_norm")
        .groupBy("a_curie", "b_curie")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = ta.groupBy("a_curie").agg(F.count(F.lit(1)).alias("n_a"))
    nb = tb.groupBy("b_curie").agg(F.count(F.lit(1)).alias("n_b"))
    scored = (
        shared.join(F.broadcast(na), on="a_curie")
        .join(F.broadcast(nb), on="b_curie")
        .withColumn(
            "_union", F.col("n_a") + F.col("n_b") - F.col("n_shared")
        )
        .filter(
            F.lit(100) * F.col("n_shared")
            >= F.lit(min_jaccard_pct) * F.col("_union")
        )
        .select(
            "a_curie",
            "b_curie",
            "n_shared",
            "n_a",
            "n_b",
            # floor, not cast: Spark's double→long cast truncates while
            # DuckDB's rounds — FLOOR agrees on both engines, and the
            # k·d/d boundary case divides exactly in IEEE so the floor
            # is stable
            F.floor(
                (F.lit(100) * F.col("n_shared")) / F.col("_union")
            ).alias("jaccard_pct"),
        )
    )
    if known_xrefs is not None:
        scored = scored.join(
            known_xrefs.select("a_curie", "b_curie"),
            on=["a_curie", "b_curie"],
            how="left_anti",
        )
    return scored


def reciprocal_best_match(
    scores: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
) -> DataFrame:
    """Reciprocal best match over a scored candidate table — keep
    (l, r) only when r is l's best right AND l is r's best left; the
    mutual-argmax filter that turns a noisy similarity table into
    high-precision 1:1 alignments (ortholog-style RBM; the precision
    step after :func:`align_lexicons`' candidate generation).

    Both argmaxes are the A2 skew-absorbing ``min_by`` struct form
    (ties break to the smaller partner id, fully deterministic) — two
    combinable aggregations + one equi-join of the two winner frames
    on the agreeing pair. Never a window over the full candidate
    table. Returns (``left_col``, ``right_col``, ``score_col``) for
    mutual pairs only.
    """
    s = scores.select(
        F.col(left_col).alias("_l"),
        F.col(right_col).alias("_r"),
        F.col(score_col).alias("_sc"),
    )
    best_r = s.groupBy("_l").agg(
        F.min(
            F.struct(
                (-F.col("_sc")).alias("_ns"),
                F.col("_r").alias("r"),
                F.col("_sc").alias("sc"),
            )
        ).alias("_w")
    ).select("_l", F.col("_w.r").alias("_r"), F.col("_w.sc").alias("_sc"))
    best_l = s.groupBy("_r").agg(
        F.min(
            F.struct((-F.col("_sc")).alias("_ns"), F.col("_l").alias("l"))
        ).alias("_w")
    ).select(F.col("_w.l").alias("_l"), "_r")
    return (
        best_r.join(best_l, ["_l", "_r"], "left_semi")
        .select(
            F.col("_l").alias(left_col),
            F.col("_r").alias(right_col),
            F.col("_sc").alias(score_col),
        )
    )


def url_language_pairs(
    docs: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    max_variants: int = 8,
) -> DataFrame:
    """Cross-lingual document alignment by URL structure (the CCAligned
    first pass, El-Kishky et al. 2020): two pages whose URLs are identical
    except for one language path segment (``/en/`` vs ``/fr/`` …) are
    translations of the same template slot — the standard web-scale bitext
    candidate generator, and the webtext analog of the reference's
    cross-source xref alignment (uniprot/mediadive share entities under
    per-source id schemes the same way translated pages share a template).

    100-TB shape:

    * the alignment key — host + path with the FIRST language segment
      stripped — is a pure-JVM whole-stage-codegen projection
      (``parse_url`` + one anchored regex, RE2-portable, no lookbehind);
    * ONE shuffle: groupBy(align_key) with in-row pair generation
      (the kg_triples pattern) — never a self-join that would shuffle the
      corpus twice;
    * TEMPLATE-HUB GUARD: keys collecting more than ``max_variants`` docs
      are calendar/pagination artifacts, not language variants (a real
      template has at most #languages-served versions); they are dropped
      BEFORE pair generation, bounding per-key work at
      C(max_variants, 2) and per-group state at ``max_variants`` structs.

    Emits one row per unordered pair (id_a < id_b) with differing
    ``lang_col``; same-language collisions under one key (mirrors,
    tracking variants) are excluded — those belong to url-dedup, not
    alignment.
    """
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    stripped = F.regexp_replace(path, r"^/[a-z]{2}(-[a-zA-Z]{2})?/", "/")
    key = F.concat(F.parse_url(F.col(url_col), F.lit("HOST")), stripped)
    keyed = docs.select(
        key.alias("align_key"),
        F.struct(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            F.col(url_col).alias("url"),
        ).alias("_d"),
    )
    grouped = (
        keyed.groupBy("align_key")
        .agg(F.collect_list("_d").alias("_docs"))
        .filter(F.size("_docs") <= max_variants)
    )
    pairs = grouped.select(
        "align_key",
        F.explode(
            F.expr(
                "filter(flatten(transform(_docs, a -> transform(_docs, b -> struct(a as a, b as b)))), "
                "p -> p.a.doc_id < p.b.doc_id AND p.a.lang != p.b.lang)"
            )
        ).alias("_p"),
    )
    return pairs.select(
        "align_key",
        F.col("_p.a.doc_id").alias("doc_id_a"),
        F.col("_p.a.lang").alias("lang_a"),
        F.col("_p.a.url").alias("url_a"),
        F.col("_p.b.doc_id").alias("doc_id_b"),
        F.col("_p.b.lang").alias("lang_b"),
        F.col("_p.b.url").alias("url_b"),
    )
