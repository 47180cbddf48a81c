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


def test_rank_window_predicate_is_falsifiable(spark):
    """Drive the ACTUAL verdict predicate (`sketches.rank_window_ok`,
    the one both checked forms call) with broken and correct
    estimates: the max posing as the median must fail, the true
    discrete median must pass, and boundary slack must behave. Guards
    against the predicate degenerating into always-TRUE — which would
    turn every verdict column into the constant the oracle emits."""
    from pyspark.sql import functions as F

    # n=1000 distinct values 0..999: true p50 = 500 (ceil(0.5*1000));
    # for value v, lt = v, le = v + 1
    cases = [
        # (lt, le, p, expect) at eps=0.005 → tol = 6.0, target t = 500
        (500, 501, 0.5, True),    # exact discrete median
        (999, 1000, 0.5, False),  # max posing as median
        (0, 1, 0.5, False),       # min posing as median
        (505, 506, 0.5, True),    # inside the rank window
        (506, 507, 0.5, False),   # just outside (lt >= t + tol)
        (949, 1000, 0.95, True),  # p95 with heavy ties still feasible
    ]
    got = (
        spark.range(1)
        .select(
            *[
                sketches.rank_window_ok(
                    F.lit(lt), F.lit(le), F.lit(1000), p, eps=0.005
                ).alias(f"c{i}")
                for i, (lt, le, p, _) in enumerate(cases)
            ]
        )
        .collect()[0]
    )
    for i, (lt, le, p, expect) in enumerate(cases):
        assert got[f"c{i}"] == expect, f"lt={lt} le={le} p={p}: got {got[f'c{i}']}"


def test_checked_forms_keep_null_key_groups(spark):
    """GROUP BY keeps NULL keys in both engines, so the checked forms'
    verification join-back must be null-SAFE — an inner equi-join
    would silently drop the NULL event_type / NULL ts group and
    hash-mismatch against the oracle on any feed containing them."""
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import analytics, monitoring

    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0),
        (2, "2024-01-01 11:00:00", 8, None, 2.0),
        (3, None, 9, "view", 3.0),
        (4, "2024-01-02 10:00:00", 7, None, 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    vpa = monitoring.value_percentiles_approx_checked(ev).collect()
    assert any(r.event_type is None for r in vpa), "NULL event_type group dropped"
    assert {r.event_type: r.n_events for r in vpa}[None] == 2

    hll = analytics.hll_user_rollup_checked(ev).collect()
    assert any(r.day_bucket is None for r in hll), "NULL ts group dropped (hll)"

    kll = sketches.kll_value_rollup_checked(ev).collect()
    assert any(r.day_bucket is None for r in kll), "NULL ts group dropped (kll)"
    assert all(
        r.p50_in_rank_bound and r.p95_in_rank_bound and r.p99_in_rank_bound for r in kll
    )


def test_checked_rank_target_ignores_null_values(spark):
    """The rank-bound target n must be the NON-NULL value count:
    percentile()/percentile_disc and the lt/le counters all skip NULL
    values, so a count(*) target shifts the expected rank by the NULL
    fraction and falsely reddens a correct sketch once that fraction
    exceeds the eps tolerance (ADVICE r4). Regression feed: one group
    where half the values are NULL — far beyond any eps."""
    from real_time_database_monitoring_system_spark.operators import monitoring

    rows = []
    for i in range(200):
        # 100 real values 1..100, 100 NULLs, all in one group
        rows.append(
            (i, "2024-01-01 10:00:00", i % 7, "click",
             float(i + 1) if i < 100 else None)
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    vpa = monitoring.value_percentiles_approx_checked(ev).collect()
    assert len(vpa) == 1
    assert vpa[0].n_events == 200  # hashed column stays count(*)
    assert vpa[0].p50_in_rank_bound and vpa[0].p95_in_rank_bound

    kll = sketches.kll_value_rollup_checked(ev).collect()
    assert len(kll) == 1
    assert kll[0].n_points == 200
    assert (
        kll[0].p50_in_rank_bound
        and kll[0].p95_in_rank_bound
        and kll[0].p99_in_rank_bound
    )


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
