"""Alias / redirect chain resolution via pointer doubling.

KG-construction use: web sources assert aliases as CHAINS — a page
redirect points at another redirect, an ontology term is replaced_by a
term that was itself replaced (the reference's deprecated-node handling
keeps only one hop; crawls produce arbitrary depth). Every alias must
resolve to its terminal canonical id before xref routing, or merged
entities split across chain positions.

This is NOT transitive closure (operators/closure.py): the edge
relation is FUNCTIONAL (one outgoing pointer per alias), so the state
stays one row per alias and path doubling resolves depth-2^k chains in
k rounds:

    ptr ← ptr ∘ ptr   (each round: ONE self equi-join on a
                       linear-size frame + coalesce for already-
                       terminal pointers)

versus closure's frontier that can grow to |V|² pairs. ``rounds``
bounds resolvable depth at 2^rounds; cyclic pointer groups (redirect
loops — always data bugs) never stabilize and are reported, not
silently half-resolved.

100-TB shape: per round one shuffle join keyed by the pointer target,
localCheckpoint lineage cuts; state never exceeds the input row count.
The duplicate-src guard is one combinable count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_aliases(
    redirects: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """redirects(src, dst), functional (one row per src; duplicate
    srcs raise) → (alias, canonical) resolving chains up to depth
    2^rounds. ``canonical`` for a chain longer than that (or a cycle)
    is the pointer reached after 2^rounds hops — callers detecting
    canonical ∈ aliases know the chain did not terminate."""
    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1, got {rounds}")
    ptr = redirects.select(
        F.col(src).alias("alias"), F.col(dst).alias("canonical")
    )
    dup = (
        ptr.groupBy("alias")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"redirects not functional: alias {dup[0]['alias']!r} has "
            f"{dup[0]['c']} outgoing pointers"
        )
    ptr = ptr.localCheckpoint(eager=True)
    for _ in range(rounds):
        p, q = ptr.alias("p"), ptr.alias("q")
        ptr = (
            p.join(q, F.col("p.canonical") == F.col("q.alias"), "left")
            .select(
                F.col("p.alias").alias("alias"),
                F.coalesce(
                    F.col("q.canonical"), F.col("p.canonical")
                ).alias("canonical"),
            )
            .localCheckpoint(eager=True)
        )
    return ptr
