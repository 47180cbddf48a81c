from __future__ import annotations

from real_time_database_monitoring_system_spark.operators import monitoring
from real_time_database_monitoring_system_spark.operators.dashboard import snapshot_dashboard
from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_dashboard_panels_share_cached_scan(spark, sf_dir):
    panels = snapshot_dashboard(spark, sf_dir)
    try:
        # materialize the cache, then every panel reads InMemoryRelation
        panels["_events"].count()
        plan = checks.explain_str(panels["slow_sessions"], "simple")
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        # cached results equal the uncached operator
        fresh = monitoring.slow_sessions(load_table(spark, sf_dir, "events"))
        assert sorted(map(tuple, panels["slow_sessions"].collect())) == sorted(
            map(tuple, fresh.collect())
        )
        assert panels["session_summary"].count() == 5
    finally:
        panels["_events"].unpersist()


def test_variant_stats_match_json_path_and_handle_missing_keys(spark):
    """VARIANT typed extraction must agree with the get_json_object
    path, including typed-NULL for documents without the key."""
    from real_time_database_monitoring_system_spark.operators import monitoring

    ev = spark.createDataFrame(
        [
            (1, "view", '{"k": 5}'),
            (2, "view", '{"k": 7}'),
            (3, "view", "{}"),
            (4, "click", '{"k": 0}'),
            (5, "view", "not json {{"),  # malformed: NULL, never an abort
        ],
        "event_id long, event_type string, props string",
    )
    out = {r.event_type: r for r in monitoring.variant_props_stats(ev).collect()}
    assert (out["view"].n, out["view"].n_with_k) == (4, 2)
    assert (out["view"].min_k, out["view"].max_k, out["view"].sum_k) == (5, 7, 12)
    assert (out["click"].n, out["click"].n_with_k, out["click"].sum_k) == (1, 1, 0)


def test_multi_grain_daily_equals_cascade_daily(spark, sf_dir):
    """Cross-operator consistency: the GROUPING SETS rollup's daily
    grain must equal the cascade's daily level on counts and sums —
    two independent plans, one truth."""
    from real_time_database_monitoring_system_spark.operators import monitoring
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    cascade = {
        r.bucket_d: (r.n_points, round(r.sum_value, 6))
        for r in monitoring.rollup_cascade(events).collect()
    }
    grains = {
        r.bucket_s: (r.n_points, round(r.sum_value, 6))
        for r in monitoring.multi_grain_rollup(events)
        .filter("grain = '1d'")
        .collect()
    }
    assert grains == cascade


def test_multi_grain_rollup_shuffles_once_on_raw(spark, sf_dir):
    """The Expand must run over the finest-grain partials: exactly two
    exchanges total (raw→5min tuple agg, partials→grain agg), never an
    Expand of the raw feed into three copies."""
    from real_time_database_monitoring_system_spark.operators import monitoring
    from real_time_database_monitoring_system_spark.plans import checks
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    df = monitoring.multi_grain_rollup(load_table(spark, sf_dir, "events"))
    n = checks.count_exchanges(df)
    assert n <= 3, f"expected partial-agg-then-expand shape, got {n} exchanges"
    plan = checks.explain_str(df, "simple")
    expand_before_agg = plan.index("Expand") if "Expand" in plan else -1
    assert expand_before_agg >= 0, "grouping-sets Expand missing from plan"
