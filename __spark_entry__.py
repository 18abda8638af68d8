"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG co-occurrence triple extraction on
sf0.001. ``queries()`` exposes one entry per implemented operator family
from SURVEY.md §2 over the driver testdata tables; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL for each (column names aligned).

Determinism conventions used throughout (so Spark and DuckDB value-hashes
match): money is summed as integer cents (``CAST(ROUND(x*100) AS BIGINT)``
— double sums are order-dependent, bigint sums are not); collected sets
are sorted and pipe-joined; every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DEFAULT = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


# ===========================================================================
# Flagship: KG co-occurrence triple extraction over `documents`, lexicon
# derived from `part` names (the testdata analog of the pages pipeline —
# the full multi-word automaton path is oracle-verified in tests/).
# ===========================================================================

KG_STOPWORDS = ("the", "a", "of", "and")  # P10 exclusion list


def _kg_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon = corpus vocabulary (minus stopwords), CURIE = the word,
    category assigned deterministically by word length (taxon/chem/env)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        (F.col("word") != "") & ~F.col("word").isin(list(KG_STOPWORDS))
    )
    return words.distinct().select(
        "word",
        F.concat(F.lit("W:"), F.col("word")).alias("curie"),
        F.when(F.length("word") % 3 == 0, "taxon")
        .when(F.length("word") % 3 == 1, "chem")
        .otherwise("env")
        .alias("category"),
    )


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = F.broadcast(_kg_lexicon(spark, sf_dir))
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    words = docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("word"))
    mentions = (
        words.join(lex, "word")
        .groupBy("doc_id", "source", "curie", "category")
        .agg(F.count("*").alias("n"))
    )
    a = mentions.select("doc_id", "source", F.col("curie").alias("s_curie"), F.col("category").alias("s_cat"))
    b = mentions.select("doc_id", F.col("curie").alias("o_curie"), F.col("category").alias("o_cat"))
    pairs = a.join(b, "doc_id").filter(F.col("s_curie") != F.col("o_curie"))
    kept = pairs.withColumn(
        "predicate",
        F.when((F.col("s_cat") == "taxon") & (F.col("o_cat") == "chem"), "biolink:interacts_with")
        .when((F.col("s_cat") == "env") & (F.col("o_cat") == "taxon"), "biolink:occurs_in"),
    ).filter(F.col("predicate").isNotNull())
    return (
        kept.select(
            F.col("s_curie").alias("subject"),
            "predicate",
            F.col("o_curie").alias("object"),
            "source",
        )
        .groupBy("subject", "predicate", "object")
        .agg(F.count("*").alias("n_docs"), F.min("source").alias("provenance"))
    )


_KG_TRIPLES_SQL = """
WITH vocab AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents WHERE lang = 'en'
  ) WHERE word <> '' AND word NOT IN ('the', 'a', 'of', 'and')
),
lex AS (
  SELECT word, 'W:' || word AS curie,
         CASE WHEN length(word) % 3 = 0 THEN 'taxon'
              WHEN length(word) % 3 = 1 THEN 'chem' ELSE 'env' END AS category
  FROM vocab
),
words AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE lang = 'en'
),
mentions AS (
  SELECT w.doc_id, w.source, l.curie, l.category, COUNT(*) AS n
  FROM words w JOIN lex l USING (word)
  GROUP BY w.doc_id, w.source, l.curie, l.category
),
pairs AS (
  SELECT a.doc_id, a.source, a.curie AS s_curie, a.category AS s_cat,
         b.curie AS o_curie, b.category AS o_cat
  FROM mentions a JOIN mentions b ON a.doc_id = b.doc_id AND a.curie <> b.curie
),
kept AS (
  SELECT *, CASE WHEN s_cat = 'taxon' AND o_cat = 'chem' THEN 'biolink:interacts_with'
                 WHEN s_cat = 'env' AND o_cat = 'taxon' THEN 'biolink:occurs_in' END AS predicate
  FROM pairs
)
SELECT s_curie AS subject, predicate, o_curie AS object,
       COUNT(*) AS n_docs, MIN(source) AS provenance
FROM kept WHERE predicate IS NOT NULL
GROUP BY subject, predicate, object
"""


# ===========================================================================
# TPC-H-ish relational core (joins / aggs / windows / sorts)
# ===========================================================================

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
        F.count("*").alias("count_order"),
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qty_cents,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
    )
    return j.orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc()).limit(10)


_SHIPPING_SQL = """
SELECT o_orderkey, o_orderpriority,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    j = (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .join(c, n["n_nationkey"] == c["c_nationkey"])
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
    )
    return j.groupBy("r_name").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
        F.count("*").alias("n_rows"),
    )


_REGION_REVENUE_SQL = """
SELECT r_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents,
       COUNT(*) AS n_rows
FROM region JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
GROUP BY r_name
"""


def q_broadcast_brand_counts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lineitems"), F.sum(_cents(F.col("l_extendedprice"))).alias("rev_cents"))
    )


_BRAND_COUNTS_SQL = """
SELECT p_brand, COUNT(*) AS n_lineitems,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_two_hop_suppliers(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


_TWO_HOP_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_dedup_most_complete(spark, sf_dir):
    """A2-style keyed dedup: deterministic best-row-per-key via ranked
    window (acctbal desc, custkey asc)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", _cents(F.col("c_acctbal")).alias("acctbal_cents"))
    )


_DEDUP_SQL = """
SELECT c_nationkey, c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn = 1
"""


def q_cumulative_acctbal(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.sum(_cents(F.col("c_acctbal"))).over(w).alias("cum_acctbal_cents"),
    )


_CUMSUM_SQL = """
SELECT c_nationkey, c_custkey,
       SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
         OVER (PARTITION BY c_nationkey ORDER BY c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_acctbal_cents
FROM customer
"""


def q_topk_per_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", _cents(F.col("o_totalprice")).alias("total_cents"))
    )


_TOPK_SQL = """
SELECT o_orderpriority, rn, o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_group_collect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments"),
        F.count("*").alias("n_customers"),
    )


_GROUP_COLLECT_SQL = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
       COUNT(*) AS n_customers
FROM customer GROUP BY c_nationkey
"""


def q_pairwise_jaccard(spark, sf_dir):
    """A4: Jaccard overlap of part-type sets between brand pairs."""
    p = _t(spark, sf_dir, "part")
    items = p.select(F.col("p_brand").alias("k"), F.col("p_type").alias("item")).distinct()
    sizes = items.groupBy("k").agg(F.count("*").alias("n"))
    a = items.select(F.col("k").alias("brand_a"), "item")
    b = items.select(F.col("k").alias("brand_b"), "item")
    inter = (
        a.join(b, "item")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("k").alias("brand_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("k").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        inter.join(sa, "brand_a")
        .join(sb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )


_JACCARD_SQL = """
WITH items AS (SELECT DISTINCT p_brand AS k, p_type AS item FROM part),
sizes AS (SELECT k, COUNT(*) AS n FROM items GROUP BY k),
inter AS (
  SELECT a.k AS brand_a, b.k AS brand_b, COUNT(*) AS n_inter
  FROM items a JOIN items b ON a.item = b.item AND a.k < b.k
  GROUP BY a.k, b.k
)
SELECT brand_a, brand_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.k = brand_a JOIN sizes sb ON sb.k = brand_b
"""


def q_anti_join_unordered_parts(spark, sf_dir):
    """Left-anti join (the except-like 'unmatched report' shape): parts
    never shipped in high-quantity lineitems."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_unordered"))
    )


_ANTI_SQL = """
SELECT p_brand, COUNT(*) AS n_unordered
FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
GROUP BY p_brand
"""


# ===========================================================================
# Reference-semantics operators (P4 / F9 / F12 / A6 / F1 / F11)
# ===========================================================================

def q_canonical_direction(spark, sf_dir):
    """P4 classify_row over synthesized entity-type codes (exact reference
    shape table, prego/utils.py:71-98)."""
    from kg_microbe_spark.operators.prego_rows import classify_row_col

    e = _t(spark, sf_dir, "events")
    codes1 = F.array(*[F.lit(x) for x in (-2, -21, -2, -27, -25, -2)])
    codes2 = F.array(*[F.lit(x) for x in (-21, -2, -26, -2, -25, -27)])
    df = e.select(
        codes1[(F.col("user_id") % 6).cast("int")].alias("e1"),
        codes2[(F.col("event_id") % 6).cast("int")].alias("e2"),
    )
    return df.withColumn("outcome", classify_row_col(F.col("e1"), F.col("e2"))).groupBy("outcome").agg(
        F.count("*").alias("n")
    )


_P4_SQL = """
WITH coded AS (
  SELECT ([-2,-21,-2,-27,-25,-2])[(user_id % 6) + 1] AS e1,
         ([-21,-2,-26,-2,-25,-27])[(event_id % 6) + 1] AS e2
  FROM events
)
SELECT CASE
      WHEN e1 = -2  AND e2 IN (-21,-22,-23) THEN 'taxon_to_go'
      WHEN e1 = -27 AND e2 = -2  THEN 'envo_to_taxon'
      WHEN e1 = -2  AND e2 = -26 THEN 'taxon_to_doid'
      WHEN e1 = -2  AND e2 = -25 THEN 'taxon_to_bto'
      WHEN e1 IN (-21,-22,-23) AND e2 = -2 THEN 'inverse_go_to_taxon'
      WHEN e1 = -2  AND e2 = -27 THEN 'inverse_taxon_to_envo'
      WHEN e1 = -25 AND e2 = -2  THEN 'inverse_bto_to_taxon'
      WHEN e1 = -2  AND e2 = -2  THEN 'taxon_taxon_host'
      ELSE 'unknown_shape'
    END AS outcome, COUNT(*) AS n
FROM coded GROUP BY 1
"""


def q_evidence_metadata(spark, sf_dir):
    """F9 evidence classification + F12 (knowledge_level, agent_type) over
    synthesized evidence strings and channels."""
    from kg_microbe_spark.operators.prego_rows import classify_evidence_col, edge_metadata_cols

    e = _t(spark, sf_dir, "events")
    ev = (
        F.when(F.col("event_type") == "signup", F.concat(F.lit("PMID:"), F.col("user_id").cast("string")))
        .when(
            F.col("event_type") == "click",
            F.concat(F.col("user_id").cast("string"), F.lit(" of "), (F.col("user_id") + 10).cast("string"), F.lit(" samples")),
        )
        .when(F.col("event_type") == "error", F.concat(F.lit("Isolates "), F.col("user_id").cast("string")))
        .otherwise(F.lit("forest soil"))
    )
    channel = (
        F.when(F.col("user_id") % 3 == 0, "environmental_samples")
        .when(F.col("user_id") % 3 == 1, "genomes_isolates")
        .otherwise("literature")
    )
    df = e.select(ev.alias("ev"), channel.alias("channel"))
    df = df.withColumn("evidence_class", classify_evidence_col(F.col("ev")))
    kl, at = edge_metadata_cols(F.col("channel"), F.col("evidence_class"))
    return (
        df.withColumn("knowledge_level", kl)
        .withColumn("agent_type", at)
        .groupBy("channel", "evidence_class", "knowledge_level", "agent_type")
        .agg(F.count("*").alias("n"))
    )


_EVIDENCE_SQL = """
WITH base AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'PMID:' || CAST(user_id AS VARCHAR)
              WHEN event_type = 'click' THEN CAST(user_id AS VARCHAR) || ' of ' || CAST(user_id + 10 AS VARCHAR) || ' samples'
              WHEN event_type = 'error' THEN 'Isolates ' || CAST(user_id AS VARCHAR)
              ELSE 'forest soil' END AS ev,
         CASE WHEN user_id % 3 = 0 THEN 'environmental_samples'
              WHEN user_id % 3 = 1 THEN 'genomes_isolates'
              ELSE 'literature' END AS channel
  FROM events
),
classed AS (
  SELECT channel,
    CASE
      WHEN ev IS NULL OR ev = '' THEN 'unknown'
      WHEN regexp_matches(ev, '^[0-9]+ of [0-9]+ samples$') THEN 'sample_count'
      WHEN ev LIKE 'PMID:%' THEN 'publication'
      WHEN ev LIKE 'Isolates%' OR ev LIKE 'Genome annotation%'
        OR ev LIKE 'Metagenome-Assembled Genome%' OR ev LIKE 'Single Amplified Genome%'
        THEN 'resource_class'
      ELSE 'habitat'
    END AS evidence_class
  FROM base
)
SELECT channel, evidence_class,
    CASE
      WHEN evidence_class = 'publication' OR channel = 'literature' THEN 'prediction'
      WHEN channel = 'environmental_samples' THEN 'statistical_association'
      WHEN channel = 'genomes_isolates' AND evidence_class = 'habitat' THEN 'observation'
      WHEN channel = 'genomes_isolates' THEN 'knowledge_assertion'
      ELSE 'not_provided'
    END AS knowledge_level,
    CASE
      WHEN evidence_class = 'publication' OR channel = 'literature' THEN 'text_mining_agent'
      WHEN channel = 'environmental_samples' THEN 'data_analysis_pipeline'
      WHEN channel = 'genomes_isolates' THEN 'automated_agent'
      ELSE 'not_provided'
    END AS agent_type,
    COUNT(*) AS n
FROM classed GROUP BY 1, 2, 3, 4
"""


def q_histogram_cutoff(spark, sf_dir):
    """A6: deterministic fixed-width histogram → smallest bin with CDF ≥
    0.75·n, per event_type (exact, order-independent — no percentile_approx)."""
    e = _t(spark, sf_dir, "events")
    width = 10.0
    binned = e.select(
        "event_type", F.floor(F.greatest(F.col("value"), F.lit(0.0)) / width).cast("long").alias("bin")
    )
    hist = binned.groupBy("event_type", "bin").agg(F.count("*").alias("cnt"))
    w_cdf = Window.partitionBy("event_type").orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy("event_type")
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cdf)).withColumn("n", F.sum("cnt").over(w_tot))
    return (
        cum.filter(F.col("cum") >= 0.75 * F.col("n"))
        .groupBy("event_type")
        .agg(F.min("bin").alias("cutoff_bin"), F.max("n").alias("n"))
    )


_HISTOGRAM_SQL = """
WITH hist AS (
  SELECT event_type, CAST(FLOOR(GREATEST(value, 0.0) / 10.0) AS BIGINT) AS bin, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type, MIN(bin) AS cutoff_bin, MAX(n) AS n
FROM cum WHERE cum >= 0.75 * n
GROUP BY event_type
"""


def q_normalize_names(spark, sf_dir):
    """F1-style normalization (ASCII subset) applied JVM-side, grouped."""
    p = _t(spark, sf_dir, "part")
    norm = F.regexp_replace(
        F.regexp_replace(F.trim(F.lower(F.col("p_name"))), r"[^a-z0-9 \-]", ""), r"\s+", " "
    )
    return p.select(norm.alias("norm_name")).groupBy("norm_name").agg(F.count("*").alias("n"))


_NORMALIZE_SQL = """
SELECT regexp_replace(regexp_replace(trim(lower(p_name)), '[^a-z0-9 \\-]', '', 'g'), '\\s+', ' ', 'g') AS norm_name,
       COUNT(*) AS n
FROM part GROUP BY 1
"""


def q_taxonomy_parse(spark, sf_dir):
    """F11: parse 'd__X;p__Y' strings built from region/nation."""
    from kg_microbe_spark.functions.normalize import parse_taxonomy_col

    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    tax = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
        F.concat(F.lit("d__"), F.col("r_name"), F.lit(";p__"), F.col("n_name")).alias("tax")
    )
    parsed = tax.select(F.explode(parse_taxonomy_col(F.col("tax"))).alias("x"))
    return parsed.select(F.col("x.rank").alias("rank"), F.col("x.name").alias("name")).groupBy(
        "rank", "name"
    ).agg(F.count("*").alias("n"))


_TAXONOMY_SQL = """
WITH tax AS (
  SELECT r_name, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
),
parts AS (
  SELECT 'domain' AS rank, r_name AS name FROM tax
  UNION ALL
  SELECT 'phylum' AS rank, n_name AS name FROM tax
)
SELECT rank, name, COUNT(*) AS n FROM parts GROUP BY rank, name
"""


# ===========================================================================
# Document dedup / text analysis / similarity (training-data operators)
# ===========================================================================

def q_exact_text_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    return d.select(h.alias("text_hash"), "doc_id").groupBy("text_hash").agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id")
    )


_EXACT_DEDUP_SQL = """
SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS text_hash,
       COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


def q_minhash_signature(spark, sf_dir):
    """Single-permutation MinHash per doc over distinct words (md5-based so
    it is portable across engines)."""
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")).filter(F.col("w") != "")
    return words.groupBy("doc_id").agg(F.min(F.md5(F.col("w"))).alias("minhash"))


_MINHASH_SQL = """
SELECT doc_id, MIN(md5(w)) AS minhash
FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents)
WHERE w <> ''
GROUP BY doc_id
"""


def q_ngram_jaccard_docs(spark, sf_dir):
    """Exact word-3-gram Jaccard for doc pairs sharing a (cheap) blocking
    key: the single-perm minhash — LSH-style candidate restriction."""
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")).filter(F.col("w") != "")
    mh = words.groupBy("doc_id").agg(F.min(F.md5("w")).alias("mh"))
    from kg_microbe_spark.operators.dedup import shingles_col

    sh = d.select("doc_id", F.array_distinct(shingles_col(F.col("text"), 3)).alias("sh"))
    base = sh.join(mh, "doc_id")
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "mh")
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "mh")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "mh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(inter.cast("double") / union, 6).alias("jaccard"))
    )


_NGRAM_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
  ) WHERE w <> ''
),
mh AS (SELECT doc_id, MIN(md5(w)) AS mh FROM words GROUP BY doc_id),
toks AS (SELECT doc_id, regexp_split_to_array(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS l FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
              ELSE list_distinct(list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' ')))
         END AS sh
  FROM toks
),
base AS (SELECT sh.doc_id, sh.sh, mh.mh FROM sh JOIN mh ON sh.doc_id = mh.doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM base a JOIN base b ON a.mh = b.mh AND a.doc_id < b.doc_id
"""


def q_simhash_buckets(spark, sf_dir):
    """SimHash table (xxhash64-based; engine-specific hash → rows-only
    check, no SQL oracle by design)."""
    from kg_microbe_spark.operators.dedup import simhash_table

    d = _t(spark, sf_dir, "documents")
    return simhash_table(d, "doc_id", "text", bits=32, shingle_n=2)


def q_token_counts(spark, sf_dir):
    from kg_microbe_spark.functions.text import bpe_ish_token_count_col, token_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
    )


_TOKEN_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens
FROM documents
"""


def q_lang_id(spark, sf_dir):
    from kg_microbe_spark.functions.text import predict_lang_col

    d = _t(spark, sf_dir, "documents")
    return d.select("lang", predict_lang_col(F.col("text")).alias("predicted")).groupBy(
        "lang", "predicted"
    ).agg(F.count("*").alias("n"))


def _lang_id_sql() -> str:
    from kg_microbe_spark.functions.text import LANG_STOPWORDS

    score_exprs = []
    for lang in sorted(LANG_STOPWORDS):
        stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_exprs.append(
            f"len(list_filter(toks, w -> w IN ({stops}))) AS s_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    best = "GREATEST(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    for la in langs:
        case += f"WHEN s_{la} = {best} THEN '{la}' "
    case += "END"
    return f"""
WITH toked AS (
  SELECT lang, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS toks
  FROM documents
),
scored AS (SELECT lang, {', '.join(score_exprs)} FROM toked)
SELECT lang, {case} AS predicted, COUNT(*) AS n
FROM scored GROUP BY 1, 2
"""


def q_quality_score(spark, sf_dir):
    from kg_microbe_spark.functions.text import quality_score_col, token_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.round(quality_score_col(F.col("text")), 2).alias("quality"),
    )


_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS toks,
         text
  FROM documents
),
c AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END AS len_ok,
         CASE WHEN CAST(len(list_filter(toks, w -> w IN ('the','and','of','to','in','is','for','with','on','that'))) AS DOUBLE)
                   / GREATEST(len(toks), 1) >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok,
         CASE WHEN CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
                   / GREATEST(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
         CASE WHEN CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
                   / GREATEST(len(toks), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END AS wl_ok
  FROM base
)
SELECT doc_id, n_tokens,
       ROUND(CAST(len_ok * 0.4 + stop_ok * 0.3 + punct_ok * 0.2 + wl_ok * 0.1 AS DOUBLE), 2) AS quality
FROM c
"""


def q_fingerprint(spark, sf_dir):
    from kg_microbe_spark.functions.text import fingerprint_col

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))


_FINGERPRINT_SQL = """
SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 3 vectors (ranking on rounded
    cosine so float/double differences across engines cannot flip ranks)."""
    from kg_microbe_spark.operators.similarity import cosine_col

    emb = _t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    c = emb.select(F.col("vec_id").alias("doc_id"), dv.alias("dv"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), dv.alias("qv"))
    )
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("doc_id")).select(
        "query_id", "doc_id", F.round(cosine_col(F.col("qv"), F.col("dv")), 4).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


_ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 4) AS cosine
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def q_embedding_nearest_neighbor(spark, sf_dir):
    """Embedding near-dup detection: each vector's single nearest neighbor
    by cosine (the exact-pass primitive behind embedding-cosine dedup;
    the LSH-bucketed scale path lives in operators/similarity.py)."""
    from kg_microbe_spark.operators.similarity import cosine_col

    emb = _t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    a = emb.select(F.col("vec_id").alias("vec_a"), dv.alias("va")).filter(F.col("vec_a") < 200)
    b = emb.select(F.col("vec_id").alias("vec_b"), dv.alias("vb")).filter(F.col("vec_b") < 200)
    scored = a.join(b, F.col("vec_a") != F.col("vec_b")).select(
        "vec_a", "vec_b", F.round(cosine_col(F.col("va"), F.col("vb")), 4).alias("cosine")
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cosine").desc(), F.col("vec_b").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_a", "vec_b", F.col("cosine").alias("nn_cosine"))
    )


_EMB_NN_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 200),
scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS rn
  FROM scored
)
SELECT vec_a, vec_b, cosine AS nn_cosine FROM ranked WHERE rn = 1
"""


def q_json_error_buckets(spark, sf_dir):
    """P2/P3 + JSON path: prefix filter + get_json_object bucket counts."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").startswith("err"))
        .select((F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket, COUNT(*) AS n
FROM events WHERE event_type LIKE 'err%'
GROUP BY 1
"""


def q_graph_stats(spark, sf_dir):
    """A7 graph-stats shape: counts + distincts + money by type."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


_GRAPH_STATS_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
FROM events GROUP BY event_type
"""


def q_two_hop_composition(spark, sf_dir):
    """J5 2-hop CTE shape (region → customers → orders) with COUNT DISTINCT
    + deterministic STRING_AGG analogue."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .join(c, n["n_nationkey"] == c["c_nationkey"])
        .join(o, c["c_custkey"] == o["o_custkey"])
    )
    return j.groupBy("r_name").agg(
        F.count_distinct("o_orderkey").alias("n_orders"),
        F.count_distinct("c_custkey").alias("n_customers"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias("priorities"),
    )


_TWO_HOP_COMP_SQL = """
SELECT r_name, COUNT(DISTINCT o_orderkey) AS n_orders, COUNT(DISTINCT c_custkey) AS n_customers,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities
FROM region JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
GROUP BY r_name
"""


# ===========================================================================
# Contract functions
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG co-occurrence triples on sf0.001."""
    return q_kg_triples(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples": q_kg_triples,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "region_revenue": q_region_revenue,
        "broadcast_brand_counts": q_broadcast_brand_counts,
        "two_hop_suppliers": q_two_hop_suppliers,
        "dedup_most_complete": q_dedup_most_complete,
        "cumulative_acctbal": q_cumulative_acctbal,
        "topk_per_priority": q_topk_per_priority,
        "group_collect": q_group_collect,
        "pairwise_jaccard": q_pairwise_jaccard,
        "anti_join_unordered_parts": q_anti_join_unordered_parts,
        "canonical_direction": q_canonical_direction,
        "evidence_metadata": q_evidence_metadata,
        "histogram_cutoff": q_histogram_cutoff,
        "normalize_names": q_normalize_names,
        "taxonomy_parse": q_taxonomy_parse,
        "exact_text_dedup": q_exact_text_dedup,
        "minhash_signature": q_minhash_signature,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        "simhash_buckets": q_simhash_buckets,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_nearest_neighbor": q_embedding_nearest_neighbor,
        "json_error_buckets": q_json_error_buckets,
        "graph_stats": q_graph_stats,
        "two_hop_composition": q_two_hop_composition,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_triples": _KG_TRIPLES_SQL,
        "pricing_summary": _PRICING_SQL,
        "shipping_priority": _SHIPPING_SQL,
        "region_revenue": _REGION_REVENUE_SQL,
        "broadcast_brand_counts": _BRAND_COUNTS_SQL,
        "two_hop_suppliers": _TWO_HOP_SQL,
        "dedup_most_complete": _DEDUP_SQL,
        "cumulative_acctbal": _CUMSUM_SQL,
        "topk_per_priority": _TOPK_SQL,
        "group_collect": _GROUP_COLLECT_SQL,
        "pairwise_jaccard": _JACCARD_SQL,
        "anti_join_unordered_parts": _ANTI_SQL,
        "canonical_direction": _P4_SQL,
        "evidence_metadata": _EVIDENCE_SQL,
        "histogram_cutoff": _HISTOGRAM_SQL,
        "normalize_names": _NORMALIZE_SQL,
        "taxonomy_parse": _TAXONOMY_SQL,
        "exact_text_dedup": _EXACT_DEDUP_SQL,
        "minhash_signature": _MINHASH_SQL,
        "ngram_jaccard_docs": _NGRAM_JACCARD_SQL,
        # simhash_buckets: xxhash64 is engine-specific → rows-only check
        "token_counts": _TOKEN_SQL,
        "lang_id": _lang_id_sql(),
        "quality_score": _QUALITY_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        "ann_cosine_topk": _ANN_SQL,
        "embedding_nearest_neighbor": _EMB_NN_SQL,
        "json_error_buckets": _JSON_SQL,
        "graph_stats": _GRAPH_STATS_SQL,
        "two_hop_composition": _TWO_HOP_COMP_SQL,
    }
