"""Query layer — the reference's five organism-query SQL shapes
(query_utils/organism_queries.py) over the merged nodes/edges views.

DuckDB → Spark SQL translation notes: ``STRING_AGG`` becomes
``array_join(sort_array(collect_set(...)), ...)`` for deterministic
ordering; everything else runs verbatim. Register with
``register_views(spark, nodes, edges)`` then call each query.

At scale: ``nodes`` is the small side of every join here → broadcast;
the engine relies on AQE + the session-level broadcast threshold rather
than per-query hints, matching the reference's index-free DuckDB setup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(spark: SparkSession, nodes: DataFrame, edges: DataFrame) -> None:
    nodes.createOrReplaceTempView("nodes")
    edges.createOrReplaceTempView("edges")


def resolve_organism(spark: SparkSession, q: str, limit: int = 10) -> DataFrame:
    """J7/W3: fuzzy name resolution ranked exact > prefix > substring."""
    ql = q.lower().replace("'", "''")
    return spark.sql(
        f"""
        SELECT id, name,
               CASE WHEN lower(name) = '{ql}' THEN 0
                    WHEN lower(name) LIKE '{ql}%' THEN 1
                    ELSE 2 END AS match_rank
        FROM nodes
        WHERE id LIKE 'NCBITaxon:%'
          AND (lower(name) LIKE '%{ql}%')
        ORDER BY match_rank, id
        LIMIT {limit}
        """
    )


def organism_traits(spark: SparkSession, organism_id: str) -> DataFrame:
    """J4: 1-hop traits = edges LEFT JOIN nodes ON e.object = n.id."""
    oid = organism_id.replace("'", "''")
    return spark.sql(
        f"""
        SELECT e.predicate, e.object, n.name AS object_name, n.category AS object_category
        FROM edges e LEFT JOIN nodes n ON e.object = n.id
        WHERE e.subject = '{oid}'
        ORDER BY e.predicate, e.object
        """
    )


def organism_environments(spark: SparkSession, organism_id: str) -> DataFrame:
    """media-preference analogue: incoming ENVO edges by relation."""
    oid = organism_id.replace("'", "''")
    return spark.sql(
        f"""
        SELECT e.subject AS environment, n.name AS environment_name, e.predicate, e.relation
        FROM edges e JOIN nodes n ON e.subject = n.id
        WHERE e.object = '{oid}' AND e.subject LIKE 'ENVO:%'
        ORDER BY e.subject
        """
    )


def environment_chemical_profile(spark: SparkSession, environment_id: str) -> DataFrame:
    """J5: 2-hop CTE — environment → taxa → chemicals, with counts and a
    deterministic STRING_AGG analogue."""
    eid = environment_id.replace("'", "''")
    return spark.sql(
        f"""
        WITH taxa AS (
            SELECT e.object AS taxon
            FROM edges e
            WHERE e.subject = '{eid}' AND e.object LIKE 'NCBITaxon:%'
        ),
        chems AS (
            SELECT e2.object AS chem, t.taxon
            FROM taxa t JOIN edges e2 ON e2.subject = t.taxon
            WHERE e2.object LIKE 'CHEBI:%'
        )
        SELECT c.chem AS chemical,
               n.name AS chemical_name,
               COUNT(DISTINCT c.taxon) AS n_taxa,
               array_join(sort_array(collect_set(c.taxon)), '|') AS taxa
        FROM chems c LEFT JOIN nodes n ON c.chem = n.id
        GROUP BY c.chem, n.name
        ORDER BY n_taxa DESC, chemical
        """
    )


def provenance_summary(spark: SparkSession) -> DataFrame:
    """A7 graph-stats shape: counts by predicate × provenance prefix."""
    return spark.sql(
        """
        SELECT predicate, primary_knowledge_source, COUNT(*) AS n_edges
        FROM edges
        GROUP BY predicate, primary_knowledge_source
        ORDER BY n_edges DESC, predicate, primary_knowledge_source
        """
    )
