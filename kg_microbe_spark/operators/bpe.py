"""BPE merge-candidate statistics: the counting round of byte-pair
encoding, at corpus scale.

Training-pipeline use: tokenizer vocabulary induction over a new
corpus starts with exactly this job — count adjacent symbol pairs
weighted by word frequency and rank merge candidates (Sennrich et al.
2016's first iteration). Re-running the operator after applying the
winning merge to the word list reproduces the full BPE loop; the
scalable, driver-verifiable unit is one counting round, because each
round is the same plan over a re-symbolized vocabulary.

100-TB shape:

* word counting is ONE combinable groupBy over the tokenized scan —
  the corpus-sized shuffle, partials eat Zipf's head map-side;
* everything after runs on the VOCABULARY (millions of rows, not
  trillions): per-word adjacent pairs are generated IN-ROW via
  transform over the char array — no explode-join, no window over
  the corpus;
* pair aggregation is again combinable (sum of word counts);
* top-k ranks on the pair-vocabulary frame (|alphabet|²-bounded) —
  the only window in the plan sorts a frame that fits in one task by
  construction. Ranking keys are INTEGERS (count desc, then the pair
  itself) so the order is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bpe_pair_candidates(
    docs: DataFrame, text_col: str, top_k: int = 20
) -> DataFrame:
    """docs(text) → (rank, left, right, n): the ``top_k`` adjacent
    character pairs by frequency-weighted count over
    whitespace-tokenized words (words shorter than 2 symbols carry no
    pair). rank is 1-based, ordered by (n desc, left, right)."""
    if top_k < 1:
        raise ValueError(f"top_k must be ≥ 1, got {top_k}")
    wc = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.length("word") >= 2)
    )
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(chars) - 1),
        lambda i: F.struct(
            F.get(chars, i - 1).alias("left"), F.get(chars, i).alias("right")
        ),
    )
    pair_counts = (
        wc.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
    return (
        pair_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "left", "right", "n")
    )
