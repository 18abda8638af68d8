"""Temporal joins — as-of (point-in-time) matching.

The reference has no temporal operator family (its tables are static
ontology snapshots); this is one of the custom-operator families the
task brief names (as-of join / range join) for the training-data
pipeline: attribute each observation to the latest prior state row per
key (event attribution, slowly-changing dimensions, market-data joins).

Spark-first shape — NOT a range join: a naive `left.ts >= right.ts`
join explodes to |left|×|right-per-key| rows and then needs an argmax.
The scalable form is the tagged-union window trick:

  1. union left and right rows (right rows carry their payload columns,
     left rows carry NULLs for them) with a side tag,
  2. one window per key ordered by (ts, side) where the right side sorts
     BEFORE a left row at the same timestamp (inclusive match),
  3. `last(payload, ignorenulls=True)` over ROWS UNBOUNDED PRECEDING —
     each left row sees exactly the most recent right payload,
  4. keep the left rows.

One shuffle (the window partition by key), zero row amplification, and
the sort is per-key — the plan survives 100 TB as long as no single key
holds a material fraction of rows (hub keys: pre-filter or salt by
coarse time bucket with boundary replication)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: List[str],
    left_ts: str,
    right_ts: str,
    payload_cols: List[str],
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` (or < when ``inclusive=False``)
    sharing ``key_cols``; NULL payload when no prior right row exists.

    Output: all left columns + ``payload_cols`` (nullable). Left columns
    and payload columns must not collide — alias payloads first."""
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")
    # side tag: at equal ts the right row must be visible to the left row
    # iff inclusive — window order (ts, side) with right side sorting first
    # (0 < 1) gives inclusive; swapping gives strict precedence.
    r_side, l_side = (0, 1) if inclusive else (1, 0)
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in key_cols],
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(r_side).alias("_side"),
        *[F.col(c) for c in payload_cols],
    ).select(l_tagged.columns)  # align column order for the union
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_asof_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).select(
        *[c for c in l_tagged.columns if c not in payload_cols and c not in ("_asof_ts", "_side")],
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return matched.filter(F.col("_side") == l_side).drop("_side")


def sessionize(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows sharing ``key_cols`` whose
    consecutive ``ts_col`` differences stay <= ``gap_seconds`` share a
    session. Adds ``session_col`` = 0-based session ordinal per key.

    Spark-first shape: ONE shuffle (the per-key window), two chained
    window expressions in the same window frame — a new-session flag from
    ``lag`` then a running ``sum`` of the flags — no self-join, no
    row amplification. At 100 TB the sort is per-key; a hub key (one user
    holding a material fraction of events) is the only straggler risk —
    the same mitigation as every per-key window here: pre-filter bot keys
    or coarse-bucket them by day before sessionizing.

    The streaming twin of this operator is
    ``F.session_window(ts, gap)`` in a watermarked streaming groupBy
    (streaming/ingest.py exercises the windowed-agg surface); this batch
    form exists because training-data pipelines sessionize *historical*
    crawls where a deterministic, oracle-checkable result matters."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    ts_type = df.schema[ts_col].dataType.typeName()
    if ts_type.startswith("timestamp"):
        # timestamp / timestamp_ntz: ANSI mode forbids casting NTZ to a
        # numeric, and unix_micros rejects NTZ too; timestampdiff accepts
        # both and keeps microsecond precision (whole-second diffs would
        # misclassify fractional gaps straddling the threshold).
        gap = F.expr(f"timestampdiff(MICROSECOND, `_prev_ts`, `{ts_col}`)") / F.lit(1e6)
    else:
        gap = F.col(ts_col).cast("double") - F.col("_prev_ts").cast("double")
    new_session = F.when(F.col("_prev_ts").isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    # Three projections (a window function can't nest inside another's
    # argument), but ONE Window physical node: same partition + order spec,
    # so Catalyst collapses both into a single shuffle + per-key sort.
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_prev_ts", prev_ts)
        .withColumn("_new_session", new_session)
        .withColumn(session_col, F.sum("_new_session").over(running) - F.lit(1))
        .drop("_prev_ts", "_new_session")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    dim_cols: Sequence[str],
    agg_exprs: Optional[dict] = None,
    bucket: str = "hour",
) -> DataFrame:
    """Hypertable-style rollup: truncate ``ts_col`` to ``bucket`` and
    aggregate over GROUPING SETS of (bucket, *dims) — the multi-resolution
    summary a time-series store materializes continuously, produced here
    in ONE pass with Spark's native ``rollup`` (Expand + single hash
    aggregate, map-side combinable; NOT one job per grouping level).

    ``agg_exprs`` maps output name -> Column; default counts rows.
    Output carries ``grouping_id`` so consumers (and the DuckDB oracle's
    GROUP BY ROLLUP, which computes the identical lattice) can separate
    the levels. 100-TB shape: Expand multiplies rows by the number of
    grouping sets BEFORE the shuffle, but partial aggregation collapses
    them map-side — the shuffle carries one row per (set, group), same as
    running the levels separately, with one scan instead of N."""
    aggs = agg_exprs or {"n_rows": F.count(F.lit(1))}
    # withColumn (not a narrowing select) so agg_exprs can reference any
    # input column; Catalyst prunes the unused ones from the scan.
    return (
        df.withColumn("bucket_ts", F.date_trunc(bucket, F.col(ts_col)))
        .rollup("bucket_ts", *dim_cols)
        .agg(F.grouping_id().alias("grouping_id"), *[c.alias(n) for n, c in aggs.items()])
    )


def scd2_versions(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    attr_cols: List[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse the raw
    per-key observation stream into change intervals. One output row per
    RUN of identical ``attr_cols`` values per key, carrying
    ``effective_from_epoch`` (first observation of the run),
    ``effective_to_epoch`` (start of the next run, NULL for the open
    current version), ``version_num`` (0-based per key) and ``is_current``.

    This is the page-history shape for a recrawled web corpus (url ×
    warc_ts → content versions) and the provenance shape for KG node
    attributes that drift across source releases. The reference rebuilds
    its ontology tables from scratch per release (SURVEY §2.1 — no
    incremental path); SCD2 is the incremental-materialization operator a
    100 TB pipeline needs instead.

    Spark-first shape: two window passes over the SAME (key, order) spec —
    change-flag via ``lag`` + run filter, then ``lead``/``row_number`` for
    interval bounds — so the hash partitioning from the first shuffle is
    reused by the second window (one Exchange in the plan; the
    mid-pipeline filter only shrinks rows). No self-join, no row
    amplification; per-key sort is the only skew surface, same mitigation
    as sessionize above. Epoch outputs use the timezone-independent
    timestamp→long cast (truncation; oracles must floor() before casting
    — DuckDB's cast rounds)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first_in_key = F.row_number().over(w) == 1
    runs = df.withColumn("_chg", F.when(first_in_key, True).otherwise(changed)).filter(
        F.col("_chg")
    )
    return (
        runs.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).cast("timestamp").cast("long").alias("effective_from_epoch"),
            F.lag(F.col(ts_col).cast("timestamp").cast("long"), -1)
            .over(w)
            .alias("effective_to_epoch"),
            (F.row_number().over(w) - F.lit(1)).cast("long").alias("version_num"),
        )
        .withColumn("is_current", F.col("effective_to_epoch").isNull())
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_sec: int,
    slide_sec: int,
    dim_cols: Sequence[str] = (),
    agg_exprs: Optional[dict] = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: every row lands in the
    window_sec/slide_sec epoch-aligned windows that contain it; output one
    row per (window_start_epoch, *dims) with ``agg_exprs`` (default row
    count) plus ``window_end_epoch``.

    Implemented as the explicit explode `F.window` performs internally —
    each row computes its window_sec/slide_sec candidate starts with pure
    epoch arithmetic (a narrow ×(w/s) amplification) and the groupBy
    collapses them map-side — but on INTEGER epoch seconds end to end, so
    the result is identical for TIMESTAMP and TIMESTAMP_NTZ inputs and
    reproducible by any engine (the session-timezone trap that made
    time_rollup above epoch-cast its buckets; `F.window` returns
    zone-dependent struct bounds). Windows align to the 1970 epoch grid,
    matching `F.window`'s convention.
    """
    if window_sec < 1 or slide_sec < 1:
        raise ValueError(f"window/slide must be ≥ 1s, got {window_sec}/{slide_sec}")
    if window_sec % slide_sec != 0:
        raise ValueError(
            f"window_sec must be a multiple of slide_sec, got {window_sec}/{slide_sec}"
        )
    n = window_sec // slide_sec
    aggs = agg_exprs or {"n_rows": F.count(F.lit(1))}
    # timestamp→long truncates to whole epoch seconds and is timezone-
    # independent for NTZ inputs (same convention as time_rollup's
    # bucket_epoch; an oracle must floor() before its BIGINT cast —
    # DuckDB's cast ROUNDS).
    epoch = F.col(ts_col).cast("timestamp").cast("long").alias("_ep")
    with_starts = (
        df.withColumn("_ep", epoch)
        .withColumn(
            "window_start_epoch",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n - 1)),
                    lambda j: F.floor(F.col("_ep") / slide_sec) * slide_sec - j * F.lit(slide_sec),
                )
            ),
        )
        # containment holds for every candidate by construction (ep-grid
        # offset < slide, j ≤ n-1 ⇒ offset + j·slide < window); the filter
        # states the invariant in the plan and guards future edits.
        .filter(
            (F.col("window_start_epoch") <= F.col("_ep"))
            & (F.col("_ep") < F.col("window_start_epoch") + F.lit(window_sec))
        )
    )
    return (
        with_starts.groupBy("window_start_epoch", *list(dim_cols))
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .withColumn(
            "window_end_epoch", F.col("window_start_epoch") + F.lit(window_sec)
        )
    )


def native_session_window(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    agg_exprs: Optional[dict] = None,
) -> DataFrame:
    """Gap-based session aggregation via Spark's BUILT-IN
    ``F.session_window`` — the engine's own merging-sessions operator (the
    batch twin of the streaming session window, so the same call works
    under ``readStream``). Complements :func:`sessionize` above, which
    labels individual events; this collapses straight to one row per
    session with ``session_start`` / ``session_end``.

    Boundary convention (probed, not assumed): Spark merges TOUCHING
    windows — an event exactly ``gap_seconds`` after the previous one
    EXTENDS the session; only a strictly-greater silence starts a new one
    (relational restatement: new session iff ts - lag(ts) > gap).
    ``session_end`` = last event + gap. One shuffle on the grouping keys;
    the merge is Spark's specialized sessions iterator, no self-join.
    """
    aggs = agg_exprs or {"n_rows": F.count(F.lit(1))}
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    out = df.groupBy(*[F.col(k) for k in keys], sw).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return out.select(
        *keys,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *aggs.keys(),
    )


def decay_sum(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    ref_ts: str,
    half_life_s: float,
    weight_col: Optional[str] = None,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exponential recency-weighted aggregation per key —
    score(k) = Σ w·2^(−age/half_life), the freshness prior a KG built
    from a rolling crawl puts on fact confidence (an assertion seen
    daily last week outweighs one seen hourly last year; complements
    the count-only ``time_rollup``).

    Determinism contract: each event's contribution is integerized
    ONCE — floor(scale · w · exp(−ln2 · age_us / (h·1e6))) as BIGINT,
    with age in exact integer microseconds — so the per-key sum is
    map-combinable and addition-order-exact (a float sum across
    partitions is not reproducible). ``ref_ts`` is an explicit ISO
    timestamp, never now(): the same input always scores the same.
    Events after ``ref_ts`` get decay > 1 (age < 0) rather than being
    dropped — filter upstream if the ref is a hard cutoff.

    Returns (``key_col``, n_events, decayed_sum) with decayed_sum =
    SUM/scale rounded to 6 dp. One combinable groupBy; the decay
    factor is a narrow projection.
    """
    import math

    c = -math.log(2.0) / (float(half_life_s) * 1e6)
    # NTZ columns cast through TIMESTAMP (sessions here pin UTC, so the
    # instant is unchanged); unix_micros keeps the age an exact integer
    age_us = F.unix_micros(F.lit(ref_ts).cast("timestamp")) - F.unix_micros(
        F.col(ts_col).cast("timestamp")
    )
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    contrib = F.floor(
        F.lit(float(scale)) * w * F.exp(age_us.cast("double") * F.lit(c))
    ).cast("long")
    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.round(F.sum(contrib) / F.lit(float(scale)), 6) + F.lit(0.0)
        ).alias("decayed_sum"),
    )


def burst_zscores(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-key activity-burst detection: z-score of each time bucket's
    event count against that key's own mean/std across its ACTIVE
    buckets — the cheap Kleinberg-style first pass that flags which
    (entity, hour) cells deserve the expensive state-machine treatment
    (a crawl pipeline uses it to spot scraper loops and event-driven
    topic spikes before aggregation budgets are assigned).

    Semantics contract: the baseline is over buckets WHERE THE KEY HAS
    ≥1 EVENT (absent buckets are not zero-filled — densifying every
    key × bucket combination is exactly the blow-up this operator
    avoids at 100 TB; callers who need silence-aware baselines window
    a dense rollup instead). Keys with one active bucket or zero
    variance report z = 0.0.

    Scale shape: bucket index = floor(epoch_µs / bucket_µs) computed
    in-row as exact integers; (key, bucket) counts then per-key
    (m, Σc, Σc²) are both combinable groupBys; the join-back is keyed
    by the key alone. All moments are exact BIGINTs; z is one fixed
    float dataflow (two divisions, one IEEE sqrt). Returns
    (``key_col``, bucket, n_events, zscore) rounded to 6 dp.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    bucket_us = int(bucket_seconds) * 1_000_000
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bucket_us)
    ).cast("long")
    per_bucket = events.select(
        F.col(key_col).alias("_k"), bucket.alias("bucket")
    ).groupBy("_k", "bucket").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    moments = per_bucket.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("n_events").cast("long").alias("_s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("_s2"),
    )
    j = per_bucket.join(moments, "_k")
    mu = F.col("_s1") / F.col("_m")
    var = F.col("_s2") / F.col("_m") - mu * mu
    return j.select(
        F.col("_k").alias(key_col),
        "bucket",
        "n_events",
        F.when(
            (F.col("_m") > 1) & (var > 0),
            F.round((F.col("n_events") - mu) / F.sqrt(var), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("zscore"),
    )


def inter_arrival_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key inter-arrival-gap profile in EXACT integer microseconds:
    (key, n_events, n_gaps, min_gap_us, max_gap_us, mean_gap_s) — the
    bot/scraper fingerprint (machine traffic has near-constant gaps;
    humans are heavy-tailed) and the crawl-rate sanity check.

    Determinism: gaps are diffs of exact unix_micros over the per-key
    (ts) order; simultaneous events produce 0-gaps whose value is
    independent of tie order, so the gap MULTISET — and therefore
    every statistic here — is deterministic without a tiebreaker.
    mean = Σgap/n_gaps/1e6 is the single float chain, reported in
    SECONDS: a µs-scale mean (~10¹⁰) has more magnitude than 6 decimal
    places can carry in a double, so rounding it is not engine-stable;
    the seconds value is, and min/max stay exact integer µs.

    Scale shape: ONE window partitioned by the key (the natural
    shuffle key; a key's partition holds its own events only), then a
    combinable groupBy. Keys with one event report n_gaps 0 and null
    gap stats (honest absence, not zeros).
    """
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = W.partitionBy(F.col(key_col)).orderBy(us.asc())
    gap = us - F.lag(us).over(w)
    g = events.select(F.col(key_col).alias("_k"), gap.alias("_gap"))
    return (
        g.groupBy("_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_gap").cast("long").alias("n_gaps"),
            F.min("_gap").cast("long").alias("min_gap_us"),
            F.max("_gap").cast("long").alias("max_gap_us"),
            F.when(
                F.count("_gap") > 0,
                F.round(F.sum("_gap") / F.count("_gap") / F.lit(1e6), 6),
            ).alias("mean_gap_s"),
        )
        .select(
            F.col("_k").alias(key_col),
            "n_events",
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
            "mean_gap_s",
        )
    )


def coalesce_intervals(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    islands (gaps-and-islands): a temporal KG stores per-fact validity
    intervals from many extractions, and the merge step needs each
    (subject, predicate) claim's CONSOLIDATED validity windows — this
    collapses [1,5),[4,9),[9,12) to one island and leaves [20,25)
    separate. Also the session/uptime consolidation primitive for web
    event logs.

    Inputs are exact integer interval bounds (the caller integerizes,
    e.g. unix_micros) with start <= end; intervals merge when
    ``start <= max(prior ends)`` (closed-interval overlap OR adjacency).

    Determinism: the window orders by (start, end); rows tying on both
    are interchangeable (the later one can never start a new island,
    since its own end >= its start <= the tied row's end), so island
    assignment is invariant to physical tie order — no tiebreaker id
    needed.

    Scale shape: ONE window partitioned by the key (the natural shuffle
    key) computing the running max-end and the island counter, then a
    combinable groupBy(key, island). No self-join, no range join — the
    naive interval-overlap self-join is O(n_k^2) per key; this is
    O(n_k log n_k). Returns (key, island_start, island_end,
    n_intervals), all exact integers.
    """
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    base = intervals.select(F.col(key_col).alias("_k"), s.alias("_s"), e.alias("_e"))
    w = Window.partitionBy("_k").orderBy(F.col("_s").asc(), F.col("_e").asc())
    prior_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.select(
        "_k",
        "_s",
        "_e",
        F.when(
            prior_max_end.isNull() | (F.col("_s") > prior_max_end), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    islanded = flagged.select(
        "_k",
        "_s",
        "_e",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_island"),
    )
    return (
        islanded.groupBy("_k", "_island")
        .agg(
            F.min("_s").cast("long").alias("island_start"),
            F.max("_e").cast("long").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .select(
            F.col("_k").alias(key_col),
            "island_start",
            "island_end",
            "n_intervals",
        )
    )


def event_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed step 1, then
    step 2 STRICTLY AFTER their first step 1, then step 3 strictly
    after that first qualifying step 2, ... — the signup -> engage ->
    convert report every web-events pipeline runs, and (on a KG build)
    the extraction-stage attrition report (page fetched -> mention
    found -> triple accepted per source).

    Semantics: per user, t_1 = min ts of a step-1 event; t_i = min ts
    of a step-i event with ts > t_{i-1}. A user counts for step i iff
    t_i exists. First-qualifying (not any-qualifying) matching, strict
    >, deterministic regardless of event tie order because only MIN
    timestamps are kept at each stage.

    Scale shape: stage i is a combinable groupBy(user).min over the
    type-filtered fact slice joined to the (already user-unique)
    stage-(i-1) frame on the user key — every join and every groupBy
    shares ONE shuffle key (the user), so AQE reuses the exchange; the
    per-stage frames only shrink. K steps = K filtered passes; no
    window over the whole event stream, no per-user event collection.
    Returns one row per step: (step, step_name, n_users).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_t"), us.alias("_us")
    )
    prev = (
        base.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_ts"))
    )
    stage_frames = [prev]
    for step_name in steps[1:]:
        nxt = (
            base.filter(F.col("_t") == step_name)
            .join(prev.select("_u", F.col("_ts").alias("_prev_ts")), "_u")
            .filter(F.col("_us") > F.col("_prev_ts"))
            .groupBy("_u")
            .agg(F.min("_us").alias("_ts"))
        )
        stage_frames.append(nxt)
        prev = nxt
    out = None
    for i, (name, frame) in enumerate(zip(steps, stage_frames), start=1):
        row = frame.agg(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Cohort-retention triangle: users grouped by the time bucket of
    their FIRST event (the cohort), counted in every later bucket they
    were active in — the week-over-week retention matrix for web
    traffic, and for a crawl corpus the domain-freshness report (first
    seen vs still emitting documents N weeks later).

    Exactness: bucket index = epoch_µs DIV bucket_µs — INTEGER
    division, not floor(double /), so a timestamp landing exactly on a
    bucket boundary can never round across it.

    Scale shape: per-user first bucket is a combinable groupBy.min;
    activity is the distinct (user, bucket) frame (distinct collapses
    map-side); the join-back is keyed by the user; the final count
    needs no count_distinct because (user, bucket) is already unique.
    Returns (cohort_bucket, bucket_offset, n_users).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    bucket_us = int(bucket_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = events.select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"unix_micros(cast(`{ts_col}` as timestamp)) div {bucket_us}"
        ).alias("_bk"),
    )
    first = b.groupBy("_u").agg(F.min("_bk").alias("_cohort"))
    active = b.distinct()
    return (
        active.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_bucket"),
            (F.col("_bk") - F.col("_cohort")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def markov_transitions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive states per key: the page-category clickstream model
    (P(next page type | current)), and on a KG-construction pipeline
    the per-source extraction-state transition audit (what follows an
    'error' event?).

    Determinism: consecutive-ness needs a TOTAL per-key order, so ties
    on the timestamp are broken by ``tiebreak_col`` (a unique event
    id) — unlike the gap multiset in ``inter_arrival_stats``, the
    PAIRING here is tie-order-sensitive, so the tiebreaker is part of
    the contract, not an option.

    Scale shape: ONE window partitioned by the key for the lag, a
    combinable groupBy(prev, next) count, and the per-prev totals are
    re-aggregated FROM THAT state²-bounded frame (never a second pass
    over the facts); the totals join is on a state-vocabulary-sized
    frame. p = n/total is the single float chain, rounded to 6 dp.
    Returns (prev_state, next_state, n_transitions, p).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(F.col(key_col)).orderBy(
        us.asc(), F.col(tiebreak_col).asc()
    )
    paired = events.select(
        F.lag(F.col(state_col)).over(w).alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).filter(F.col("prev_state").isNotNull())
    counts = paired.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    totals = counts.groupBy("prev_state").agg(
        F.sum("n_transitions").cast("long").alias("_tot")
    )
    return counts.join(totals, "prev_state").select(
        "prev_state",
        "next_state",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("_tot"), 6).alias("p"),
    )


def path_ngrams(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top-k most common length-``n`` state paths across all keys —
    the "common user journeys" report (view>click>purchase) that
    ``markov_transitions`` (first-order) can't see, and on a crawl the
    dominant fetch->parse->error signatures per source.

    Paths are consecutive runs WITHIN a key's (ts, tiebreak)-ordered
    stream; runs never cross keys because the leads are evaluated over
    the key-partitioned window (trailing rows with <n successors emit
    no path). Determinism: same tiebreaker contract as
    markov_transitions; top-k orders by (count DESC, path ASC).

    Scale shape: ONE key-partitioned window evaluates the n-1 leads,
    one combinable groupBy over the |states|^n-bounded path vocabulary,
    and the top-k rank window runs over THAT bounded histogram (the
    vocab_coverage pattern) — never over the fact stream. Returns
    (path, n_occurrences).
    """
    if n < 2:
        raise ValueError(f"n must be ≥ 2, got {n}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(F.col(key_col)).orderBy(
        us.asc(), F.col(tiebreak_col).asc()
    )
    steps = [F.col(state_col)] + [
        F.lead(F.col(state_col), i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(">", *steps)
    complete = F.lead(F.col(state_col), n - 1).over(w).isNotNull()
    hist = (
        events.select(path.alias("path"), complete.alias("_ok"))
        .filter(F.col("_ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    ranked = hist.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        )
        .alias("_rk"),
    )
    return ranked.filter(F.col("_rk") <= top_k).select("path", "n_occurrences")


def gapfill_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid with
    forward fill — the resample step every monitoring/feature pipeline
    runs before windowed math (downsample + gap-fill; the reference has
    no time axis, this extends the temporal family asof_join opened).

    Three stages, all JVM: (1) truncate ts to the grid and reduce each
    (key, bucket) with a combinable MAX (any combinable agg works and
    max needs no tie-break, unlike "last value in bucket" which would
    hide a nondeterministic order dependence); (2) per key, explode
    ``sequence(min_bucket, max_bucket)`` into the dense grid — row
    amplification is bounded by span/unit per key, the explode runs
    AFTER the aggregation so it amplifies one row per key, not raw
    events; (3) one per-key window ordered by bucket carries
    ``last(value, ignorenulls=True)`` into the gaps.

    The window is the scale hot spot (per-key sort over grid rows); grid
    rows per key = time span / unit, so size the unit to the span — a
    year of hourly buckets is 8.8k rows per key, trivially sortable, and
    a hub key costs the same because the grid, not the event count,
    bounds the partition after stage 1.

    Returns (key, bucket_ts, value, filled_value, is_gap).
    """
    grid_step = {"hour": "interval 1 hour", "day": "interval 1 day"}[unit]
    bucket = F.date_trunc(unit, F.col(ts_col))
    per_bucket = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("bucket_ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("_k", "bucket_ts")
        .agg(F.max("_v").alias("value"))
    )
    spans = per_bucket.groupBy("_k").agg(
        F.min("bucket_ts").alias("_b0"), F.max("bucket_ts").alias("_b1")
    )
    grid = spans.select(
        "_k",
        F.explode(F.expr(f"sequence(_b0, _b1, {grid_step})")).alias("bucket_ts"),
    )
    filled = grid.join(per_bucket, ["_k", "bucket_ts"], "left")
    w = (
        Window.partitionBy("_k")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("_k").alias(key_col),
        "bucket_ts",
        "value",
        F.last("value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("value").isNull().alias("is_gap"),
    )


def touch_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    order_col: str,
) -> DataFrame:
    """First-touch vs last-touch conversion attribution — per user
    journey (the rows since the previous conversion), credit the
    journey's earliest and latest touchpoint channel for the
    conversion that closes it. The marketing-analytics companion to
    event_funnel/markov_transitions: those describe flows, this
    assigns credit.

    Shape: ONE per-key window ordered by (ts, ``order_col``) computes
    the running count of PRIOR conversions — the journey id — so
    journeys need no self-join; then one combinable
    groupBy(key, journey) reduces each journey to
    (min/max touch struct, converted?) via min/max of a
    (ts, order, channel) struct over touch rows only (NULL for
    conversion rows, and min/max skip NULLs); finally two combinable
    channel counts. Ties on ts break on ``order_col`` — the output is
    a total function of the input. Journeys without a conversion (the
    tail after the last purchase) or without a touch (back-to-back
    conversions) credit nothing.

    Returns (channel, model, conversions) with model ∈
    {'first_touch', 'last_touch'}.
    """
    w = (
        Window.partitionBy(F.col(key_col))
        .orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_conv = F.col(type_col) == conversion_type
    touch = F.when(
        ~is_conv,
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(order_col).alias("o"),
            F.col(type_col).alias("channel"),
        ),
    )
    journeys = (
        events.select(
            F.col(key_col).alias("_k"),
            F.coalesce(
                F.sum(is_conv.cast("long")).over(w), F.lit(0)
            ).alias("_j"),
            is_conv.cast("long").alias("_c"),
            touch.alias("_t"),
        )
        .groupBy("_k", "_j")
        .agg(
            F.max("_c").alias("_converted"),
            F.min("_t").alias("_first"),
            F.max("_t").alias("_last"),
        )
        .filter((F.col("_converted") == 1) & F.col("_first").isNotNull())
    )
    first = journeys.groupBy(
        F.col("_first.channel").alias("channel")
    ).agg(F.count(F.lit(1)).alias("conversions"))
    last = journeys.groupBy(F.col("_last.channel").alias("channel")).agg(
        F.count(F.lit(1)).alias("conversions")
    )
    return first.select(
        "channel", F.lit("first_touch").alias("model"), "conversions"
    ).unionByName(
        last.select("channel", F.lit("last_touch").alias("model"), "conversions")
    )
