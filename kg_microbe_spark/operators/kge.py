"""Knowledge-graph-embedding scoring: TransE energy over the triple
table.

KG-construction use: link-prediction triage — scoring candidate triples
(the outputs of operators/relations.py and operators/negatives.py's
corrupted negatives) against trained entity/relation embeddings ranks
which extracted edges are plausible and which corrupted ones are hard
negatives. TransE (Bordes et al. 2013): energy(h, r, t) =
‖E[h] + R[r] − E[t]‖₁ — low energy ⇒ plausible.

100-TB shape:

* TWO equi-joins against the entity-embedding table (head side, tail
  side) — at production scale the entity table is billions of rows, so
  these are honest shuffle joins on the entity id, NOT broadcasts; AQE
  re-uses the embedding exchange across the two probes;
* the RELATION table is registry-sized (dozens-thousands) →
  broadcast;
* the energy itself is an IN-ROW left fold over the index sequence —
  element order fixed, every term cast to double BEFORE accumulation,
  so the sum is bit-identical on any engine that folds left (the
  cross-engine float discipline from the ANN operators);
* zero UDFs, zero per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _l1_energy(h: Column, r: Column, t: Column, dim: int) -> Column:
    """Σ_i |h_i + r_i − t_i| as a deterministic left fold in double."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.abs(
            F.get(h, i).cast("double")
            + F.get(r, i).cast("double")
            - F.get(t, i).cast("double")
        ),
    )


def transe_energy(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    dim: int,
    head_col: str = "h",
    rel_col: str = "r",
    tail_col: str = "t",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """triples(h, r, t) + ent_emb(id, vec) + rel_emb(id, vec) →
    (h, r, t, energy) for triples whose h, r, AND t all resolve
    (inner joins: an unresolvable id cannot be scored). ``dim`` is the
    embedding width; shorter vectors score NULL energies rather than
    failing (F.get is null-tolerant past the end)."""
    e = ent_emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    rel = rel_emb.select(F.col(id_col).alias("_rid"), F.col(vec_col).alias("_rv"))
    joined = (
        triples.select(
            F.col(head_col).alias("h"),
            F.col(rel_col).alias("r"),
            F.col(tail_col).alias("t"),
        )
        .join(e.select(F.col("_id").alias("h"), F.col("_v").alias("_hv")), on="h")
        .join(e.select(F.col("_id").alias("t"), F.col("_v").alias("_tv")), on="t")
        .join(F.broadcast(rel.withColumnRenamed("_rid", "r")), on="r")
    )
    return joined.select(
        "h",
        "r",
        "t",
        _l1_energy(F.col("_hv"), F.col("_rv"), F.col("_tv"), dim).alias("energy"),
    )
