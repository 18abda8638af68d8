"""S12 + S14 — KG publish sinks.

S12: tar.gz KGX bundle (reference Makefile `merge` publishes
merged-kg.tar.gz with merged-kg_nodes.tsv / merged-kg_edges.tsv). The
TSVs are written DISTRIBUTED and globally sorted (repartitionByRange +
sortWithinPartitions, io.py:write_kgx_tsv); only the final tar framing is
driver-side — tar is a sequential container, so packaging is inherently
single-stream in every engine. At 100 TB you publish parquet/Iceberg and
produce the tar.gz bundle only as a KGX interchange export.

S14: Neo4j bulk-import CSVs. The reference uploads with
`kgx neo4j-upload` over bolt (Makefile:64-68) — row-at-a-time, fine for
its single-node outputs. The engine's scale path is the neo4j-admin
import format (`id:ID`, `:LABEL`, `:START_ID`, `:END_ID`, `:TYPE`
headers), written distributed as N csv parts that neo4j-admin consumes
directly — bulk import is the only Neo4j load that survives web-scale
graphs.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil
import tarfile
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_microbe_spark.sources.io import write_edges, write_nodes


def _concat_parts(parts_dir: str, dest_path: str) -> None:
    """Merge sorted csv part files (lexicographic part order == global
    order after repartitionByRange) into one TSV, keeping one header."""
    parts = sorted(glob.glob(os.path.join(parts_dir, "part-*")))
    with open(dest_path, "wb") as out:
        for i, p in enumerate(parts):
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rb") as f:
                if i > 0:
                    f.readline()  # drop repeated header
                shutil.copyfileobj(f, out)


def write_kgx_tar(nodes: DataFrame, edges: DataFrame, out_tar_gz: str, work_dir: str) -> None:
    """S12: publish <name>_nodes.tsv + <name>_edges.tsv inside a tar.gz,
    atomically (write to .tmp, rename last — the reference's atomic_io
    publish contract)."""
    os.makedirs(work_dir, exist_ok=True)
    nodes_dir = os.path.join(work_dir, "nodes_tsv")
    edges_dir = os.path.join(work_dir, "edges_tsv")
    write_nodes(nodes, nodes_dir)
    write_edges(edges, edges_dir)
    base = os.path.basename(out_tar_gz).replace(".tar.gz", "")
    nodes_tsv = os.path.join(work_dir, f"{base}_nodes.tsv")
    edges_tsv = os.path.join(work_dir, f"{base}_edges.tsv")
    _concat_parts(nodes_dir, nodes_tsv)
    _concat_parts(edges_dir, edges_tsv)
    tmp = out_tar_gz + ".tmp"
    with tarfile.open(tmp, "w:gz") as tar:
        tar.add(nodes_tsv, arcname=os.path.basename(nodes_tsv))
        tar.add(edges_tsv, arcname=os.path.basename(edges_tsv))
    os.replace(tmp, out_tar_gz)


def write_neo4j_bulk(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    node_label_col: str = "category",
    rel_type_col: str = "predicate",
    node_props: Sequence[str] = ("name", "description"),
    edge_props: Sequence[str] = ("relation", "primary_knowledge_source"),
) -> None:
    """S14: neo4j-admin bulk-import CSV layout — the STANDARD split-header
    form: one driver-written single-line header file per entity plus
    HEADERLESS distributed data parts, consumed as

        neo4j-admin database import full \\
          --nodes=nodes_header.csv,nodes/part-.* \\
          --relationships=edges_header.csv,edges/part-.*

    (With the common single-argument regex invocation, a header baked into
    every part would only be honored for the first file and imported as
    bogus data rows from every other part — hence the split layout.)"""
    n = nodes.select(
        F.col("id").alias("id:ID"),
        F.regexp_replace(F.coalesce(F.col(node_label_col), F.lit("NamedThing")), "^biolink:", "").alias(":LABEL"),
        *[F.col(c) for c in node_props if c in nodes.columns],
    )
    e = edges.select(
        F.col("subject").alias(":START_ID"),
        F.col("object").alias(":END_ID"),
        F.regexp_replace(F.col(rel_type_col), "^biolink:", "").alias(":TYPE"),
        *[F.col(c) for c in edge_props if c in edges.columns],
    )
    n.write.mode("overwrite").option("header", "false").csv(os.path.join(out_dir, "nodes"))
    e.write.mode("overwrite").option("header", "false").csv(os.path.join(out_dir, "edges"))
    os.makedirs(out_dir, exist_ok=True)
    for fname, cols in (("nodes_header.csv", n.columns), ("edges_header.csv", e.columns)):
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(",".join(cols) + "\n")
