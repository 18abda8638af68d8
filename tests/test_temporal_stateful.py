"""As-of join (operators/temporal.py) + stateful streaming dedup
(streaming/stateful.py)."""

import os
import time

from pyspark.sql import functions as F

from kg_microbe_spark.operators.temporal import asof_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c"), (3, 7, "d")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 6, 300.0)],
        "k long, rts long, payload double",
    )
    got = {
        r.name: r.payload
        for r in asof_join(left, right, ["k"], "ts", "rts", ["payload"]).collect()
    }
    # a: exact-ts match (inclusive); b: latest of the two prior; c: right row
    # is LATER than the left ts -> no match; d: key has no right rows at all
    assert got == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_asof_join_strict(spark):
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, name string")
    right = spark.createDataFrame([(1, 10, 7.0), (1, 9, 5.0)], "k long, rts long, payload double")
    strict = asof_join(left, right, ["k"], "ts", "rts", ["payload"], inclusive=False).collect()
    assert strict[0].payload == 5.0  # equal-ts right row excluded


def test_asof_join_matches_argmax_semantics(spark):
    # property check vs the quadratic argmax formulation on random-ish data
    left = spark.createDataFrame(
        [(i % 5, 3 * i + 1, i) for i in range(40)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(i % 5, 2 * i, float(i)) for i in range(60)], "k long, rts long, payload double"
    )
    got = {
        r.lid: r.payload for r in asof_join(left, right, ["k"], "ts", "rts", ["payload"]).collect()
    }
    naive = (
        left.join(right, "k")
        .filter(F.col("rts") <= F.col("ts"))
        .groupBy("lid")
        .agg(F.max_by("payload", "rts").alias("payload"))
    )
    expected = {r.lid: r.payload for r in naive.collect()}
    for lid, p in expected.items():
        assert got[lid] == p, (lid, got[lid], p)
    assert all(got[lid] is None for lid in got if lid not in expected)


def test_asof_join_single_shuffle(spark):
    # the whole point of the tagged-union form: one Exchange (the window
    # partition), vs inequality-join-then-argmax which shuffles twice and
    # amplifies rows
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, name string")
    right = spark.createDataFrame([(1, 9, 5.0)], "k long, rts long, payload double")
    plan = (
        asof_join(left, right, ["k"], "ts", "rts", ["payload"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_sessionize_basic(spark):
    from kg_microbe_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (1, 100.0), (1, 105.0), (2, 0.0), (2, 300.0)],
        "k long, ts double",
    )
    got = {(r.k, r.ts): r.session_id for r in sessionize(df, ["k"], "ts", 30.0).collect()}
    assert got == {
        (1, 0.0): 0, (1, 10.0): 0,        # within gap
        (1, 100.0): 1, (1, 105.0): 1,     # 90s gap -> new session
        (2, 0.0): 0, (2, 300.0): 1,       # independent key
    }


def test_sessionize_gap_boundary_inclusive(spark):
    from kg_microbe_spark.operators.temporal import sessionize

    # diff EXACTLY equal to the gap stays in the same session (<= contract)
    df = spark.createDataFrame([(1, 0.0), (1, 30.0), (1, 60.1)], "k long, ts double")
    got = sorted(r.session_id for r in sessionize(df, ["k"], "ts", 30.0).collect())
    assert got == [0, 0, 1]


def test_sessionize_single_shuffle(spark):
    from kg_microbe_spark.operators.temporal import sessionize

    df = spark.createDataFrame([(1, 0.0)], "k long, ts double")
    plan = sessionize(df, ["k"], "ts", 30.0)._jdf.queryExecution().executedPlan().toString()
    # lag-flag and running-sum share one Window spec -> exactly one exchange
    assert plan.count("Exchange") == 1, plan


def test_time_rollup_matches_unioned_groupbys(spark):
    from kg_microbe_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [(f"2024-01-01 0{h}:{m}:00", t) for h in range(3) for m in (5, 35) for t in ("a", "b")],
        "s string, etype string",
    ).select(F.col("s").cast("timestamp").alias("ts"), "etype")
    out = time_rollup(df, "ts", ["etype"], bucket="hour").collect()
    # lattice: (bucket, etype) 3*2=6 rows gid=0; (bucket) 3 rows gid=1; () 1 row gid=3
    by_gid = {}
    for r in out:
        by_gid.setdefault(r.grouping_id, []).append(r)
    assert {g: len(v) for g, v in by_gid.items()} == {0: 6, 1: 3, 3: 1}
    assert all(r.n_rows == 2 for r in by_gid[0])
    assert all(r.n_rows == 4 for r in by_gid[1])
    assert by_gid[3][0].n_rows == 12 and by_gid[3][0].bucket_ts is None


def test_streaming_dedup_first(spark, tmp_path):
    from kg_microbe_spark.streaming.stateful import streaming_dedup_first

    # three files = three micro-batches; contiguous id ranges so the first
    # batch containing a key also holds its minimal id
    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [(i, i % 7, f"t{i}") for i in range(90)]
    for b in range(3):
        chunk = [r for r in rows if b * 30 <= r[0] < (b + 1) * 30]
        spark.createDataFrame(chunk, "rid long, dkey long, txt string").coalesce(1).write.parquet(
            f"{src}/f{b}"
        )
        time.sleep(0.05)
    stream = (
        spark.readStream.schema("rid long, dkey long, txt string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sink = str(tmp_path / "out")
    q = (
        streaming_dedup_first(stream, "dkey", "rid")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink).collect()
    assert {(r.dkey, r.rid) for r in out} == {(k, k) for k in range(7)}
    # restart with no new input: state checkpoint prevents re-emission
    q2 = (
        streaming_dedup_first(stream, "dkey", "rid")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 7
