"""North-rule resumability: kill between stages → rerun resumes
idempotently from the last complete checkpoint, with per-partition lineage
rows recorded."""

import shutil

import pytest
from pyspark.sql import functions as F

from kg_microbe_spark.plans.checkpoint import CheckpointManager
from kg_microbe_spark.plans.pipeline import run_pipeline
from kg_microbe_spark.sources import synthetic

N = 120


def test_stage_idempotent_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    cm = CheckpointManager(spark, root, run_id="r1")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(10).withColumn("v", F.col("id") * 2)

    a = cm.run_stage("stage_a", compute)
    assert a.count() == 10 and calls["n"] == 1
    # rerun: must read, not recompute
    b = cm.run_stage("stage_a", compute)
    assert b.count() == 10 and calls["n"] == 1

    lineage = cm.lineage().collect()
    assert {r.stage for r in lineage} == {"stage_a"}
    assert sum(r.row_count for r in lineage) == 10
    assert all(r.run_id == "r1" for r in lineage)


def test_pipeline_kill_and_resume_same_output(spark, tmp_path):
    pages = synthetic.pages_df(spark, N, num_partitions=4)
    lexicon = synthetic.lexicon_df(spark)

    # full run without checkpoints = ground truth
    full = run_pipeline(spark, pages, lexicon)
    want = {(r.subject, r.predicate, r.object) for r in full.triples.collect()}

    # run 1 with checkpoints, then simulate a crash by deleting LATER stages
    root = str(tmp_path / "ck2")
    cm1 = CheckpointManager(spark, root, run_id="run1")
    res1 = run_pipeline(spark, pages, lexicon, checkpoint=cm1)
    res1.triples.count()  # materialize all stages
    for stage in ("s6_edges", "s7_edges_merged", "s7_nodes_merged"):
        shutil.rmtree(cm1.stage_path(stage), ignore_errors=True)

    # run 2 resumes: s1/s3/s5 read from checkpoint, later stages recompute
    cm2 = CheckpointManager(spark, root, run_id="run2")
    assert cm2.is_complete("s1_extract") and cm2.is_complete("s5_entities")
    assert not cm2.is_complete("s7_edges_merged")
    res2 = run_pipeline(spark, pages, lexicon, checkpoint=cm2)
    got = {(r.subject, r.predicate, r.object) for r in res2.triples.collect()}
    assert got == want

    # running a third time over a complete checkpoint set changes nothing
    cm3 = CheckpointManager(spark, root, run_id="run3")
    res3 = run_pipeline(spark, pages, lexicon, checkpoint=cm3)
    got3 = {(r.subject, r.predicate, r.object) for r in res3.triples.collect()}
    assert got3 == want
