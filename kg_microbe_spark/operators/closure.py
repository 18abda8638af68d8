"""J3 — transitive relationship closure via iterated self-joins.

Reference: pandas_utils.py:69-165 builds a dict(object→subject) and maps it
over the frame, chained K times for multi-hop. Spark shape: K chained
``edges ⋈ edges`` self-joins (shuffle hash / sort-merge; AQE picks), or a
loop-to-fixpoint for full closure. Edge frames are (subject, predicate,
object)-shaped; closure is computed within one predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def one_hop(edges: DataFrame, predicate: str) -> DataFrame:
    """A→B, B→C (same predicate) ⇒ A→C."""
    e = edges.filter(F.col("predicate") == predicate).select("subject", "object")
    l = e.alias("l")
    r = e.alias("r")
    return (
        l.join(r, F.col("l.object") == F.col("r.subject"))
        .select(
            F.col("l.subject").alias("subject"),
            F.lit(predicate).alias("predicate"),
            F.col("r.object").alias("object"),
        )
        .filter(F.col("subject") != F.col("object"))
        .distinct()
    )


def multi_hop(edges: DataFrame, predicate: str, hops: int) -> DataFrame:
    """Fixed-K closure: union of paths of length 1..hops (reference's
    establish_transitive_relationship_multiple chains single hops)."""
    base = edges.filter(F.col("predicate") == predicate).select(
        "subject", F.lit(predicate).alias("predicate"), "object"
    )
    acc = base
    frontier = base
    for _ in range(hops - 1):
        l = frontier.alias("l")
        r = base.alias("r")
        frontier = (
            l.join(r, F.col("l.object") == F.col("r.subject"))
            .select(
                F.col("l.subject").alias("subject"),
                F.lit(predicate).alias("predicate"),
                F.col("r.object").alias("object"),
            )
            .filter(F.col("subject") != F.col("object"))
            .distinct()
        )
        acc = acc.unionByName(frontier).distinct()
    return acc


def incremental_closure(
    closure: DataFrame, delta: DataFrame, max_iterations: int = 12
) -> DataFrame:
    """Incremental closure maintenance: given an ALREADY-CLOSED
    reachability set ``closure(subject, object)`` and a batch of new
    edges ``delta(subject, object)``, return exactly the NEW pairs that
    joining the batch creates — without recomputing the closure.

    Scale rationale (the whole point): a daily crawl adds |Δ| ≪ |C|
    edges. Every new path decomposes as C* (Δ C*)+ with C closed, so

        D′ = C*·Δ·C*   (TWO equi-joins against C, |Δ|-proportional)

    captures one-Δ-edge paths, and closure(D′) — the doubling fixpoint
    run on the |D′|-sized frame, NOT on C — captures all multi-Δ-edge
    paths (the C segment between two Δ edges is absorbed by the second
    factor's leading C*). The full closure table participates in two
    joins and one final anti-join; the iterated shuffles touch only
    delta-derived rows. Output feeds downstream incremental consumers
    (rollups, routing) as the to-process delta."""
    c = closure.select("subject", "object").distinct()
    d = delta.select("subject", "object").distinct()
    left = d.unionByName(
        c.alias("c").join(
            d.alias("d"), F.col("c.object") == F.col("d.subject")
        ).select(
            F.col("c.subject").alias("subject"),
            F.col("d.object").alias("object"),
        )
    ).distinct()
    dp = (
        left.unionByName(
            left.alias("l").join(
                c.alias("c2"), F.col("l.object") == F.col("c2.subject")
            ).select(
                F.col("l.subject").alias("subject"),
                F.col("c2.object").alias("object"),
            )
        )
        .filter(F.col("subject") != F.col("object"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = dp
    for _ in range(max_iterations):
        l = cur.alias("l")
        r = cur.alias("r")
        nxt = (
            cur.unionByName(
                l.join(r, F.col("l.object") == F.col("r.subject")).select(
                    F.col("l.subject").alias("subject"),
                    F.col("r.object").alias("object"),
                )
            )
            .filter(F.col("subject") != F.col("object"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    return cur.join(c, on=["subject", "object"], how="left_anti")


def transitive_closure(edges: DataFrame, predicate: str, max_iterations: int = 20) -> DataFrame:
    """Full closure to fixpoint with doubling (each iteration squares path
    length → log₂ diameter shuffles, not diameter). Checkpoint-free loop;
    callers at scale should localCheckpoint() every few iterations to cut
    lineage."""
    cur = edges.filter(F.col("predicate") == predicate).select("subject", "object").distinct()
    cur = cur.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        l = cur.alias("l")
        r = cur.alias("r")
        nxt = (
            cur.unionByName(
                l.join(r, F.col("l.object") == F.col("r.subject")).select(
                    F.col("l.subject").alias("subject"), F.col("r.object").alias("object")
                )
            )
            .filter(F.col("subject") != F.col("object"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    return cur.select("subject", F.lit(predicate).alias("predicate"), "object")
