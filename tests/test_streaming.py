"""Streaming/batch equivalence (SURVEY §5): the streaming rollup and
alert stream must produce exactly the batch operator's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics, monitoring
from real_time_database_monitoring_system_spark.sources.registry import load_table
from real_time_database_monitoring_system_spark.streaming import rollup as sr


def test_stream_rollup_equals_batch_downsample(spark, sf_dir):
    batch = monitoring.downsample_5min(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_rollup(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_watermarked_rollup_subset_of_batch(spark, sf_dir):
    """Append-mode windows must agree with the batch rollup wherever
    emitted, and be complete for all windows older than the final
    watermark (max ts - lateness)."""
    batch = {
        r.bucket_s: (r.n_points, r.sum_value)
        for r in monitoring.downsample_5min(load_table(spark, sf_dir, "events")).collect()
    }
    emitted = {
        r.bucket_s: (r.n_points, r.sum_value)
        for r in sr.stream_rollup_watermarked(spark, sf_dir).collect()
    }
    assert emitted, "no windows emitted"
    for b, v in emitted.items():
        assert batch[b] == v, f"window {b}: stream {v} != batch {batch[b]}"
    # completeness: every batch window except the watermark tail emitted
    max_bucket = max(batch)
    tail_cutoff = max_bucket - 2 * 300  # lateness 10 min = 2 buckets
    missing = [b for b in batch if b < tail_cutoff and b not in emitted]
    assert not missing, f"windows missing before watermark: {missing[:5]}"


def test_stateful_tracker_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.streaming import stateful

    events = load_table(spark, sf_dir, "events")
    batch = {
        r.user_id: (r.n, r.mx, r.last)
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"), F.max("event_id").alias("last"))
        .collect()
    }
    tracked = {
        r.user_id: (r.n_events, r.max_value, r.last_event_id)
        for r in stateful.stream_user_tracker(spark, sf_dir).collect()
    }
    assert tracked == batch


def test_stream_alerts_equals_batch_filter(spark, sf_dir):
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    batch = (
        events.filter(F.col("value") > 99.0)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )
    stream = sr.stream_alerts(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_approx_percentiles_near_exact(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {r.event_type: (r.p50, r.p95) for r in monitoring.value_percentiles(events).collect()}
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in monitoring.value_percentiles_approx(events).collect()
    }
    for et, (e50, e95) in exact.items():
        a50, a95 = approx[et]
        assert abs(a50 - e50) / max(e50, 1) < 0.05
        assert abs(a95 - e95) / max(e95, 1) < 0.05


def test_foreachbatch_alert_sink(spark, sf_dir):
    import uuid

    from pyspark.sql import functions as F

    table = f"alerts_{uuid.uuid4().hex[:8]}"
    try:
        sr.stream_alerts_to_table(spark, sf_dir, table)
        sunk = spark.table(table)
        batch_n = (
            load_table(spark, sf_dir, "events").filter(F.col("value") > 99.0).count()
        )
        assert sunk.count() == batch_n
        assert "batch_id" in sunk.columns
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_sessions_equals_batch_sessionize(spark, sf_dir):
    """Session windows (stateful streaming) must produce exactly the
    sessions the batch lag/cumsum sessionizer finds: same (user, start,
    end, count) tuples, including the gap-subtraction on window end."""
    batch = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in monitoring.sessionize(load_table(spark, sf_dir, "events")).collect()
    }
    stream = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in sr.stream_sessions(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stream_dedup_collapses_doubled_replay(spark, sf_dir):
    """The twice-replayed feed deduped within the watermark must be
    exactly the original feed — at-least-once in, exactly-once out."""
    out = sr.stream_dedup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()
    # spot-check content equality on a value aggregate
    a = out.agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s")).collect()[0].s
    b = events.agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s")).collect()[0].s
    assert a == b


def test_incremental_rollup_table_equals_batch(spark, sf_dir):
    """foreachBatch MERGE maintenance: after the replay, the persistent
    rollup table must equal the batch downsample exactly."""
    table = "rollup_incr_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        out = sr.stream_rollup_incremental(spark, sf_dir, table).collect()
        batch = monitoring.downsample_5min(load_table(spark, sf_dir, "events")).collect()
        assert sorted(map(tuple, batch)) == sorted(map(tuple, out))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_enrich_static_equals_batch_join(spark, sf_dir):
    """Stream–static enrichment must equal the identical batch left
    join row for row (the static side broadcasts per micro-batch)."""
    out = sr.stream_enrich_static(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    profile = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") >= 5000.0, "gold")
        .when(F.col("c_acctbal") >= 0.0, "standard")
        .otherwise("delinquent")
        .alias("tier"),
    )
    batch = events.join(profile, "user_id", "left").select(
        "event_id", "user_id", "event_type", "value", "segment", "tier"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))
    # enrichment is total on this data (every user has a profile)
    assert out.filter(F.col("tier").isNull()).count() == 0


def test_stream_rollup_batch_count_independent(spark, sf_dir, tmp_path):
    """The rollup must not depend on how the files were batched into
    triggers: 4 files × maxFilesPerTrigger ∈ {1, 2} (4 and 2 micro-
    batches) must equal the single-file single-batch result."""
    multi = str(tmp_path / "events_multi")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(multi)
    schema = spark.read.parquet(multi).schema
    baseline = sr.stream_rollup(spark, sf_dir).collect()
    for mfpt in (1, 2):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", mfpt)
            .parquet(multi)
        )
        got = sr.stream_rollup(spark, sf_dir, source=src).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, baseline)), (
            f"rollup diverged at maxFilesPerTrigger={mfpt}"
        )


def test_stream_join_outer_matches_deterministic_model(spark, sf_dir):
    """LEFT OUTER stream-stream join: emitted rows must equal inner
    matches ∪ NULL rows for unmatched alerts expired against the final
    global watermark min(max alert ts, max ctx ts) − lateness — and
    nothing else (fresher unmatched alerts stay withheld)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.expr("unix_micros(cast(ts as timestamp))")
    )
    alerts = ev.filter(F.col("value") > 99.0).select(
        F.col("event_id").alias("alert_id"),
        F.col("user_id").alias("au"),
        F.col("us").alias("aus"),
    )
    ctx = ev.select(
        F.col("event_id").alias("ctx_id"),
        F.col("user_id").alias("cu"),
        F.col("us").alias("cus"),
    )
    horizon, lateness = 300_000_000, 600_000_000
    matches = alerts.join(
        ctx,
        (F.col("au") == F.col("cu"))
        & (F.col("cus") >= F.col("aus"))
        & (F.col("cus") <= F.col("aus") + horizon)
        & (F.col("alert_id") != F.col("ctx_id")),
    )
    expected = {(r.alert_id, r.ctx_id) for r in matches.collect()}
    wm = min(
        alerts.agg(F.max("aus")).first()[0], ev.agg(F.max("us")).first()[0]
    ) - lateness
    matched_ids = {a for a, _ in expected}
    for r in alerts.collect():
        if r.alert_id not in matched_ids and r.aus + horizon < wm:
            expected.add((r.alert_id, None))

    got = {
        (r.alert_id, r.ctx_id)
        for r in sr.stream_join_alert_context_outer(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(c is None for _, c in got), "no outer rows emitted"


def test_stream_join_full_outer_matches_deterministic_model(spark, sf_dir):
    """FULL OUTER stream-stream join: inner matches ∪ expired
    unmatched alerts (aus + horizon < wm, as in left outer) ∪ expired
    unmatched ctx rows — a ctx row can only be matched by alerts with
    aus ≤ cus, so it becomes decidable once the watermark passes cus
    itself. Nothing fresher emits."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.expr("unix_micros(cast(ts as timestamp))")
    )
    alerts = ev.filter(F.col("value") > 99.0).select(
        F.col("event_id").alias("alert_id"),
        F.col("user_id").alias("au"),
        F.col("us").alias("aus"),
    )
    ctx = ev.select(
        F.col("event_id").alias("ctx_id"),
        F.col("user_id").alias("cu"),
        F.col("us").alias("cus"),
    )
    horizon, lateness = 300_000_000, 600_000_000
    matches = alerts.join(
        ctx,
        (F.col("au") == F.col("cu"))
        & (F.col("cus") >= F.col("aus"))
        & (F.col("cus") <= F.col("aus") + horizon)
        & (F.col("alert_id") != F.col("ctx_id")),
    )
    expected = {(r.alert_id, r.ctx_id) for r in matches.collect()}
    wm = min(
        alerts.agg(F.max("aus")).first()[0], ev.agg(F.max("us")).first()[0]
    ) - lateness
    matched_alerts = {a for a, _ in expected}
    matched_ctx = {c for _, c in expected}
    for r in alerts.collect():
        if r.alert_id not in matched_alerts and r.aus + horizon < wm:
            expected.add((r.alert_id, None))
    for r in ctx.collect():
        if r.ctx_id not in matched_ctx and r.cus < wm:
            expected.add((None, r.ctx_id))

    got = {
        (r.alert_id, r.ctx_id)
        for r in sr.stream_join_alert_context_full(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(a is None for a, _ in got), "no right-outer rows emitted"
    assert any(c is None for _, c in got), "no left-outer rows emitted"


def test_stream_sliding_rollup_equals_batch(spark, sf_dir):
    batch = monitoring.sliding_rollup(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_sliding_rollup(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_value_histogram_equals_batch(spark, sf_dir):
    batch = analytics.value_histogram(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_value_histogram(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_trending_types_equals_batch(spark, sf_dir):
    batch = monitoring.trending_types(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_trending_types(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_contract_audit_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import curation

    batch = curation.data_contract_audit(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_contract_audit(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_resumes_from_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Failure-recovery contract: stop a stateful stream mid-feed and
    restart it against the SAME checkpoint — the restarted query must
    (a) resume from the recorded offsets instead of reprocessing the
    feed, and (b) restore its aggregation state so the final result
    equals the batch answer. This is the exactly-once story a 100 TB
    ingest relies on after an executor/driver loss."""
    import time as _time

    multi = str(tmp_path / "events_multi")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.parquet(multi)
    schema = spark.read.parquet(multi).schema
    total_rows = events.count()

    def agg_of(src):
        return src.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    # phase 1: process at least one (but not all) micro-batches, stop
    src1 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    q1 = (
        agg_of(src1)
        .writeStream.format("memory")
        .queryName("ckpt_phase1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = _time.time() + 60
    while _time.time() < deadline:
        prog = q1.recentProgress
        if prog and sum(p["numInputRows"] for p in prog) > 0:
            break
        _time.sleep(0.1)
    q1.stop()
    q1.awaitTermination()
    done_rows = sum(p["numInputRows"] for p in q1.recentProgress)
    assert 0 < done_rows, "phase 1 made no progress"

    # phase 2: restart on the same checkpoint, drain the remainder
    src2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    q2 = (
        agg_of(src2)
        .writeStream.format("memory")
        .queryName("ckpt_phase2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    resumed_rows = sum(p["numInputRows"] for p in q2.recentProgress)
    # offsets were honored: the two phases together read the feed once
    assert done_rows + resumed_rows == total_rows
    if done_rows < total_rows:
        assert resumed_rows < total_rows, "restart reprocessed the whole feed"

    got = spark.sql("SELECT * FROM ckpt_phase2").collect()
    want = agg_of(events).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_period_over_period_equals_batch(spark, sf_dir):
    batch = monitoring.period_over_period(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_period_over_period(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_rfm_segments_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import event_analytics

    batch = event_analytics.rfm_segments(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_rfm_segments(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_user_features_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import event_analytics

    batch = event_analytics.user_feature_table(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_user_feature_table(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_slo_burn_equals_batch(spark, sf_dir):
    batch = monitoring.slo_burn(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_slo_burn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_bounce_rate_equals_batch(spark, sf_dir):
    batch = monitoring.bounce_rate_daily(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_bounce_rate(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_trend_slope_equals_batch(spark, sf_dir):
    batch = analytics.trend_slope_panel(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_trend_slope(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_funnel_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import event_analytics
    from real_time_database_monitoring_system_spark.streaming import stateful

    batch = event_analytics.funnel_counts(load_table(spark, sf_dir, "events")).collect()
    stream = stateful.stream_funnel(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_funnel_watermarked_survives_shuffled_feed(spark, sf_dir, tmp_path):
    """The watermarked funnel must equal the batch funnel even when the
    feed arrives event-time-SHUFFLED across micro-batches — the exact
    failure mode the plain `stream_funnel` documents as out of scope.
    The feed is split into four part files by event_id % 4 (each file
    spans the whole time range, so with maxFilesPerTrigger=1 every
    micro-batch after the first delivers events older than instants
    already emitted), with a lateness bound covering the span so no
    event is dropped."""
    from real_time_database_monitoring_system_spark.operators import event_analytics
    from real_time_database_monitoring_system_spark.streaming import stateful

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    feed = str(tmp_path / "shuffled")
    for i in range(4):
        raw.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode("append").parquet(
            f"{feed}/events.parquet"
        )
    batch = event_analytics.funnel_counts(load_table(spark, sf_dir, "events")).collect()
    stream = stateful.stream_funnel_watermarked(
        spark, feed, lateness_us=60 * 24 * 3600 * 1_000_000
    ).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


class _FakeState:
    """Minimal GroupState stand-in for unit-driving the stateful fn."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _drive_wm_funnel(fn, state, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["us", "event_id", "event_type"])
    (out,) = fn((7,), iter([pdf]), state)
    return out.iloc[0]


def test_watermarked_funnel_commits_and_corrects():
    """Unit-level contract: (a) a late in-bound click regresses the
    chain and is repaired through the buffered purchase (retraction +
    re-fold); (b) events older than the watermark horizon commit out
    of the buffer, bounding state; (c) emission version is monotone."""
    from real_time_database_monitoring_system_spark.streaming import stateful

    fn = stateful._make_watermarked_funnel(lateness_us=100)
    st = _FakeState()
    # batch 1: view@10, purchase@30 — optimistic chain stops at t1
    r1 = _drive_wm_funnel(fn, st, [(10, 1, "view"), (30, 2, "purchase")])
    assert (r1.t1, r1.t2, r1.t3, r1.ver) == (10, -1, -1, 1)
    # batch 2: click@20 arrives LATE (in-bound: horizon = 30-100 < 20);
    # the buffered purchase must now complete the chain
    r2 = _drive_wm_funnel(fn, st, [(20, 3, "click")])
    assert (r2.t1, r2.t2, r2.t3, r2.ver) == (10, 20, 30, 2)
    # batch 3: an event far in the future pushes the horizon past the
    # whole buffer — everything commits, buffer drains to 1 entry
    r3 = _drive_wm_funnel(fn, st, [(500, 4, "view")])
    t1, t2, t3, wm, ver, buf_us, buf_et = st.get
    assert (t1, t2, t3) == (10, 20, 30)
    assert wm == 500 and ver == 3
    assert list(buf_us) == [500]
    assert (r3.t1, r3.t2, r3.t3) == (10, 20, 30)
    # batch 4: an event BELOW the horizon (500-100=400) violates the
    # lateness bound and is dropped per the watermark contract
    r4 = _drive_wm_funnel(fn, st, [(350, 5, "purchase")])
    assert (r4.t1, r4.t2, r4.t3, r4.ver) == (10, 20, 30, 4)


def test_stream_ks_drift_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.ks_drift(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_ks_drift(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_changepoint_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.changepoint_detect(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_changepoint(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_line_boilerplate_equals_batch(spark, sf_dir):
    """availableNow replay of the injected corpus through the
    (line, doc) state equals dedup.boilerplate_lines row for row."""
    import __spark_entry__ as entry
    from real_time_database_monitoring_system_spark.operators import dedup

    batch = dedup.boilerplate_lines(
        entry._inject_boilerplate(load_table(spark, sf_dir, "documents"))
    ).collect()
    stream = sr.stream_line_boilerplate(
        spark, sf_dir, mutate=entry._inject_boilerplate
    ).collect()
    assert len(batch) >= 2  # both planted lines cross the threshold
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_psi_drift_equals_batch(spark, sf_dir):
    """The integer cross-multiplication decile replication + shared
    bin CASE reproduce anomaly.psi_drift exactly under availableNow."""
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.psi_drift(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_psi_drift(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_mannwhitney_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.mannwhitney_u(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_mannwhitney(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_welch_equals_batch(spark, sf_dir):
    """Per-distinct-value decimal sufficient statistics reproduce the
    batch row-wise sums digit for digit under availableNow."""
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.welch_ttest(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_welch(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_moment_stats_equals_batch(spark, sf_dir):
    """Per-distinct-value decimal power sums reproduce the batch
    row-wise sums digit for digit under availableNow."""
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.moment_stats(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_moment_stats(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_cramers_v_equals_batch(spark, sf_dir):
    """#types×7-bounded cell-count state reproduces the batch
    contingency core exactly under availableNow."""
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.cramers_v_stat(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_cramers_v(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_mutual_information_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.mutual_information_stat(
        load_table(spark, sf_dir, "events")
    ).collect()
    stream = sr.stream_mutual_information(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_alerts_to_maildir_delivers_rfc822(spark, sf_dir, tmp_path):
    """foreachBatch delivery: every alert the batch filter finds lands
    as a parseable .eml; replaying the stream is byte-idempotent per
    batch directory."""
    import glob
    from email import message_from_bytes

    from real_time_database_monitoring_system_spark.sources.registry import load_table

    out = str(tmp_path / "mail")
    n = sr.stream_alerts_to_maildir(spark, sf_dir, out, threshold=99.0)
    batch = (
        load_table(spark, sf_dir, "events").filter("value > 99.0").count()
    )
    assert n == batch and n > 0
    files = sorted(glob.glob(out + "/batch-*/*.eml"))
    assert len(files) == n
    msg = message_from_bytes(open(files[0], "rb").read())
    assert msg["Subject"] == "Database Monitoring Alert"


def test_stream_anderson_darling_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.anderson_darling(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_anderson_darling(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_cramer_von_mises_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.cramer_von_mises(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_cramer_von_mises(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_kuiper_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import anomaly

    batch = anomaly.kuiper_drift(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_kuiper(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_hodges_lehmann_equals_batch(spark, sf_dir):
    """The grid-and-order-statistics coda over the streamed half-count
    state reproduces the batch table digit for digit (the NULL-valued
    events stay in the state so the midpoint matches the batch
    whole-feed convention)."""
    from real_time_database_monitoring_system_spark.operators import analytics

    batch = analytics.hodges_lehmann(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_hodges_lehmann(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
