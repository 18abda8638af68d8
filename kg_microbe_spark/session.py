"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests / bench / driver all get
the same plan behavior. Tuned for the patterns this engine relies on
(reference analogue: kg-microbe's hand-rolled idioms, SURVEY.md §4):

- AQE on, including skew-join splitting — the north rule names hub
  entities / skewed predicates explicitly; at 100 TB the mention→lexicon
  and triple-dedup shuffles are the skew surfaces.
- Arrow on — every Python boundary in this engine is an Arrow-batched
  pandas UDF (no per-row Python anywhere, per BASELINE.json.input_hint).
- shuffle partitions default sized for local[32]; a real cluster would set
  this (or rely on AQE coalescing, which is enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg_microbe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2k-row Arrow batches + explicit direct-memory headroom: with wide
        # binary columns (html), 10k-row batches across 32 concurrent Python
        # channels exhausted netty direct memory and triggered System.gc()
        # storms (measured 93s → 6.6s on a 400k-page scan). On a cluster the
        # same options belong in spark.executor.extraJavaOptions.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:MaxDirectMemorySize=24g"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Guide §3.1/§9: allow shuffled-hash join when its size conditions
        # fit instead of always sort-merge — the engine's joins are
        # equi-joins whose build sides are bounded (dimension frames or
        # post-shuffle partitions), and SHJ skips both sorts. Production
        # keeps the same setting; the per-partition build-side OOM risk is
        # bounded by AQE partition sizing. Env-overridable for A/B.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # Let AQE rewrite a planned sort-merge join to shuffled-hash when
        # every post-shuffle partition is under this bound (default 0 =
        # off upstream; 64 MB matches the broadcast budget above).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", str(64 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
