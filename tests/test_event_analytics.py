"""Funnel order-constraint and cohort-offset semantics on handcrafted
event sequences (oracle parity is covered generically)."""

from __future__ import annotations

import datetime as dt

from real_time_database_monitoring_system_spark.operators import event_analytics


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, 0), u, et, 1.0, "{}")
            for i, (u, d, h, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_enforces_step_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
        # user 2: clicked BEFORE first view — click must not count
        (2, 1, 1, "click"), (2, 1, 2, "view"),
        # user 3: view then click, purchase BEFORE click — no step 3
        (3, 1, 0, "view"), (3, 1, 2, "click"), (3, 1, 1, "purchase"),
        # user 4: never viewed
        (4, 1, 0, "purchase"),
    ]
    out = {r.step: r for r in event_analytics.funnel_counts(_ev(spark, rows)).collect()}
    assert out["view"].n_users == 3        # users 1, 2, 3
    assert out["click"].n_users == 2       # users 1, 3 (user 2 out of order)
    assert out["purchase"].n_users == 1    # user 1 only
    assert out["view"].conversion is None
    assert abs(out["click"].conversion - 2 / 3) < 1e-9
    assert out["purchase"].conversion == 0.5


def test_cohort_offsets_count_returning_users(spark):
    # weeks are epoch-aligned; Jan 2024 days 1-28 span several weeks.
    # user 1 active day 1 and day 15 (offset 2 weeks); user 2 only day 1
    rows = [(1, 1, 0, "view"), (1, 15, 0, "view"), (2, 1, 0, "view")]
    out = {
        (r.cohort_wk, r.week_offset): r.n_users
        for r in event_analytics.cohort_retention(_ev(spark, rows)).collect()
    }
    offsets = sorted(k[1] for k in out)
    assert offsets == [0, 2]
    base = next(k[0] for k in out)
    assert out[(base, 0)] == 2
    assert out[(base, 2)] == 1


def test_transition_matrix_rows_and_probs(spark):
    # user 1: a→b→a→b ; user 2: a→a   → from 'a': {b:2, a:1}, from 'b': {a:1}
    rows = [
        (1, 1, 0, "a"), (1, 1, 1, "b"), (1, 1, 2, "a"), (1, 1, 3, "b"),
        (2, 1, 0, "a"), (2, 1, 1, "a"),
    ]
    out = {
        (r.from_type, r.to_type): r
        for r in event_analytics.transition_matrix(_ev(spark, rows)).collect()
    }
    assert out[("a", "b")].n_transitions == 2
    assert out[("a", "a")].n_transitions == 1
    assert out[("b", "a")].n_transitions == 1
    assert abs(out[("a", "b")].p - 2 / 3) < 1e-9
    assert out[("b", "a")].p == 1.0
    # probabilities sum to 1 per from_type
    for ft in ("a", "b"):
        assert abs(sum(r.p for (f, _), r in out.items() if f == ft) - 1.0) < 1e-8


def test_conversion_latency_conditions_on_first_view(spark):
    # user 1: view @h0, purchase @h2 → 2h latency
    # user 2: purchase @h0 BEFORE view @h1 → not converted
    # user 3: view @h0, purchases @h1 and @h5 → counts the FIRST (1h)
    rows = [
        (1, 1, 0, "view"), (1, 1, 2, "purchase"),
        (2, 1, 1, "view"), (2, 1, 0, "purchase"),
        (3, 1, 0, "view"), (3, 1, 1, "purchase"), (3, 1, 5, "purchase"),
    ]
    r = event_analytics.conversion_latency(_ev(spark, rows)).collect()[0]
    hour_us = 3600 * 1_000_000
    assert r.n_converted == 2
    assert r.p25_us == 1 * hour_us
    assert r.p90_us == 2 * hour_us


def test_user_entropy_degenerate_and_uniform(spark):
    """Entropy contract on constructed users: single-behavior users
    score exactly 0.0; a perfectly uniform two-type user scores
    ln(2) (to the operator's 9-dp contract)."""
    import math

    from real_time_database_monitoring_system_spark.operators import event_analytics

    rows = []
    eid = 0
    for _ in range(4):  # user 1: only views
        rows.append((eid, 1, "view", "2024-01-01 00:00:00", 1.0)); eid += 1
    for t in ("view", "click") * 3:  # user 2: 50/50
        rows.append((eid, 2, t, "2024-01-01 00:00:00", 1.0)); eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r.user_id: r for r in event_analytics.user_entropy(df).collect()}
    assert out[1].entropy == 0.0 and out[1].n_types == 1
    assert abs(out[2].entropy - math.log(2)) < 1e-8 and out[2].n_types == 2


def test_attribution_last_and_first_touch_semantics(spark):
    """User 1: view@1h, click@2h, purchase@2h30 → last touch = click,
    first = view (both inside the 30-min... no — use 30-min lookback:
    only the click@2h is within 30min of 2h30? 2h30-30min = 2h, strict
    > means click@2h is EXCLUDED, so widen: purchase@2h15). User 2
    purchases with no prior touch → NULL columns, n_touches 0."""
    ev = _ev(
        spark,
        [
            (1, 1, 1, "view"),      # id 0: 01:00 (outside lookback)
            (1, 1, 2, "click"),     # id 1: 02:00 (inside)
            (1, 1, 2, "purchase"),  # id 2: 02:00 — same-hour granularity
            (2, 1, 5, "purchase"),  # id 3: untouched user
            (1, 1, 3, "view"),      # id 4: AFTER the purchase — ignored
        ],
    )
    out = {r.conv_id: r for r in event_analytics.attribution(ev).collect()}
    assert set(out) == {2, 3}
    hit = out[2]
    # click@02:00 and purchase@02:00: touch_us <= conv_us includes it
    assert hit.last_touch_id == 1 and hit.last_touch_type == "click"
    assert hit.first_touch_id == 1 and hit.n_touches == 1
    miss = out[3]
    assert miss.last_touch_id is None and miss.first_touch_id is None
    assert miss.n_touches == 0


def test_attribution_rejects_bad_params(spark):
    import pytest

    ev = _ev(spark, [(1, 1, 1, "view")])
    with pytest.raises(ValueError):
        event_analytics.attribution(ev, lookback_minutes=0)
    with pytest.raises(ValueError):
        event_analytics.attribution(ev, touch_types=())


def test_attribution_no_self_attribution_with_overlapping_types(spark):
    """When the conversion type is ALSO a touch type (repeat-purchase
    attribution), a conversion must not attribute to itself — only to
    the user's EARLIER purchase."""
    ev = _ev(
        spark,
        [
            (1, 1, 1, "purchase"),  # id 0: 01:00
            (1, 1, 1, "purchase"),  # id 1: 01:00 same time, higher id
        ],
    )
    out = {
        r.conv_id: r
        for r in event_analytics.attribution(
            ev, conversion="purchase", touch_types=("purchase",)
        ).collect()
    }
    # each attributes to the OTHER (same ts, ids differ), never itself
    assert out[0].last_touch_id == 1 and out[1].last_touch_id == 0


def test_rfm_scores_are_quintile_consistent(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import event_analytics
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    out = event_analytics.rfm_segments(load_table(spark, sf_dir, "events")).collect()
    assert out
    for r in out:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.rec_us >= 0 and r.freq >= 1 and r.mon_cents > 0
    # monotonicity: a user with strictly higher spend never has a
    # strictly lower m_score
    rows = sorted(out, key=lambda r: r.mon_cents)
    for a, b in zip(rows, rows[1:]):
        assert a.m_score <= b.m_score
    # every named segment rule is honored
    for r in out:
        if r.r_score >= 4 and r.f_score >= 4:
            assert r.segment == "champion"
        elif r.f_score >= 4:
            assert r.segment == "loyal"


def test_ab_panel_on_planted_experiment(spark):
    import datetime as dt
    import hashlib

    from real_time_database_monitoring_system_spark.operators import event_analytics

    # find users for each arm by replicating the md5 assignment
    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    arm0 = [u for u in range(1, 100) if arm(u) == 0][:4]
    arm1 = [u for u in range(1, 100) if arm(u) == 1][:4]
    rows = []
    eid = 0
    # arm0: 1/4 convert; arm1: 3/4 convert
    for i, u in enumerate(arm0):
        rows.append((eid, dt.datetime(2024, 1, 1), u,
                     "purchase" if i == 0 else "view", 1.0, "{}")); eid += 1
    for i, u in enumerate(arm1):
        rows.append((eid, dt.datetime(2024, 1, 1), u,
                     "purchase" if i < 3 else "view", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    r = event_analytics.ab_test_panel(events).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 1, 4, 3)
    assert r.rate_a == 0.25 and r.rate_b == 0.75
    assert r.relative_lift == 2.0
    assert r.z_stat > 1.0  # direction and magnitude sanity


def test_survival_curve_known_km_values(spark):
    import datetime as dt

    from real_time_database_monitoring_system_spark.operators import event_analytics

    # 4 users: lifetimes 0, 10, 20 days (churned) and one active user
    # spanning the full 40-day window (censored at 40)
    def u(uid, days):
        return [
            (uid * 100, dt.datetime(2024, 1, 1), uid, "view", 1.0, "{}"),
            (uid * 100 + 1, dt.datetime(2024, 1, 1) + dt.timedelta(days=days),
             uid, "view", 1.0, "{}"),
        ]

    rows = u(1, 0)[:1] + u(2, 10) + u(3, 20) + u(4, 40)
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.lifetime_day: r for r in
           event_analytics.survival_curve(events, censor_days=7).collect()}
    # day 0: 4 at risk, 1 death → S = 3/4; day 10: 3 at risk, 1 death
    # → S = 1/2; day 20: 2 at risk, 1 death → S = 1/4; day 40: user 4
    # is censored (last event at the feed max) — no death, S unchanged
    assert out[0].n_risk == 4 and out[0].n_deaths == 1
    assert abs(out[0].survival - 0.75) < 1e-6
    assert abs(out[10].survival - 0.5) < 1e-6
    assert abs(out[20].survival - 0.25) < 1e-6
    assert out[40].n_censored == 1 and out[40].n_deaths == 0
    assert out[40].survival == out[20].survival  # censoring moves no mass


def test_funnel_window_drops_stale_conversions(spark):
    import datetime as dt

    from real_time_database_monitoring_system_spark.operators import event_analytics

    # user 1: view → click 10 min later (inside a 60-min window)
    # user 2: view → click 2 days later (outside the window)
    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 0), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9, 10), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 9, 0), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 3, 9, 0), 2, "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    un = {r.step: r.n_users for r in
          event_analytics.funnel_counts(events, ["view", "click"]).collect()}
    wi = {r.step: r for r in
          event_analytics.funnel_windowed(events, ["view", "click"],
                                          max_lag_minutes=60).collect()}
    assert un["click"] == 2          # unbounded funnel credits both
    assert wi["click"].n_users == 1  # windowed drops the stale one
    assert wi["click"].median_lag_us == 10 * 60 * 1_000_000
    import pytest

    with pytest.raises(ValueError):
        event_analytics.funnel_windowed(events, ["view"], max_lag_minutes=0)


def test_user_feature_table_accounting(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import event_analytics
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    out = event_analytics.user_feature_table(events)
    rows = out.collect()
    assert len(rows) == events.select("user_id").distinct().count()
    # feature totals reconcile with the feed
    assert sum(r.n_events for r in rows) == events.count()
    for r in rows:
        assert r.n_view + r.n_click + r.n_purchase + r.n_signup + r.n_error == r.n_events
        assert 1 <= r.active_days <= r.span_days
        assert 0.0 < r.activity_density <= 1.0
        assert r.recency_us >= 0
    # spend reconciles against a direct decimal sum
    direct = events.filter(F.col("event_type") == "purchase").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("bigint").alias("s")
    ).collect()[0].s
    assert sum(r.spend_cents for r in rows) == direct
