"""scd2_versions (operators/temporal.py) vs python replication; plan shape."""

import datetime

from pyspark.sql import functions as F

from kg_microbe_spark.operators.temporal import scd2_versions


def _fixture(spark):
    base = datetime.datetime(2024, 1, 1)
    # (key, sec, attr): runs AAB per key 1, single run per key 2,
    # flip-flop ABA per key 3 (three versions, A twice — SCD2 must NOT
    # merge the two A runs), null attr handling per key 4.
    rows = [
        (1, 0, "A"), (1, 10, "A"), (1, 20, "B"),
        (2, 5, "X"),
        (3, 0, "A"), (3, 1, "B"), (3, 2, "A"),
        (4, 0, None), (4, 1, None), (4, 2, "C"),
    ]
    data = [
        (k, base + datetime.timedelta(seconds=s), i, a)
        for i, (k, s, a) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "k long, ts timestamp, rid long, attr string"), rows


def _py_scd2(rows):
    from collections import defaultdict

    by_key = defaultdict(list)
    base_ep = int(datetime.datetime(2024, 1, 1).timestamp())
    for k, s, a in rows:
        by_key[k].append((base_ep + s, a))
    out = []
    for k, obs in by_key.items():
        obs.sort()
        runs = [obs[0]]
        for ep, a in obs[1:]:
            if a != runs[-1][1]:
                runs.append((ep, a))
        for v, (ep, a) in enumerate(runs):
            to_ep = runs[v + 1][0] if v + 1 < len(runs) else None
            out.append((k, a, ep, to_ep, v, to_ep is None))
    return sorted(out, key=lambda r: (r[0], r[4]))


def test_scd2_matches_python(spark):
    df, rows = _fixture(spark)
    got = sorted(
        (
            (r.k, r.attr, r.effective_from_epoch, r.effective_to_epoch,
             r.version_num, r.is_current)
            for r in scd2_versions(df, ["k"], "ts", ["attr"], ["rid"]).collect()
        ),
        key=lambda r: (r[0], r[4]),
    )
    assert got == _py_scd2(rows)


def test_scd2_single_exchange(spark):
    df, _ = _fixture(spark)
    plan = (
        scd2_versions(df, ["k"], "ts", ["attr"], ["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scd2_multi_attr_and_intervals_tile(spark):
    """Multi-column attrs change when ANY column changes; consecutive
    intervals tile the key's timeline exactly."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (1, base + dt.timedelta(seconds=s), i, a, b)
        for i, (s, a, b) in enumerate(
            [(0, "A", 1), (1, "A", 1), (2, "A", 2), (3, "B", 2)]
        )
    ]
    df = spark.createDataFrame(data, "k long, ts timestamp, rid long, a string, b long")
    rows = sorted(
        scd2_versions(df, ["k"], "ts", ["a", "b"], ["rid"]).collect(),
        key=lambda r: r.version_num,
    )
    assert [(r.a, r.b) for r in rows] == [("A", 1), ("A", 2), ("B", 2)]
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.effective_to_epoch == nxt.effective_from_epoch
    assert rows[-1].is_current and rows[-1].effective_to_epoch is None
