"""Robust anomaly operators: MAD flags resist the outliers they hunt;
the seasonal baseline answers per-time-of-day, not globally."""

from __future__ import annotations

import datetime as dt

from real_time_database_monitoring_system_spark.operators import anomaly


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + d, h, 0), 7, et, v, "{}")
            for i, (d, h, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_mad_flags_extreme_value_but_not_cluster(spark):
    # nine values near 10, one at 1000: mean/std would be dragged to
    # ~109/~300; MAD stays ~1 and flags only the extreme
    rows = [(0, h, "cpu", 10.0 + (h % 3)) for h in range(9)] + [(0, 9, "cpu", 1000.0)]
    out = {r.event_id: r for r in anomaly.mad_outliers(_ev(spark, rows)).collect()}
    assert out[9].is_outlier
    assert not any(out[i].is_outlier for i in range(9))
    assert out[9].robust_z > 100


def test_mad_zero_spread_flags_any_deviation(spark):
    rows = [(0, h, "mem", 50.0) for h in range(6)] + [(0, 6, "mem", 50.5)]
    out = {r.event_id: r for r in anomaly.mad_outliers(_ev(spark, rows)).collect()}
    assert out[6].is_outlier  # mad = 0 → any deviation exceeds 0
    assert not out[0].is_outlier
    assert out[6].robust_z is None  # no scale to score against


def test_seasonal_baseline_is_per_time_of_day(spark):
    # value 10 every day at 02:00, value 90 every day at 14:00 —
    # a 90 reading at 14:00 is typical (ratio 1.0), not an anomaly,
    # even though the GLOBAL median is far below it
    rows = []
    for d in range(5):
        rows.append((d, 2, "cpu", 10.0))
        rows.append((d, 14, "cpu", 90.0))
    out = anomaly.seasonal_baseline(_ev(spark, rows)).collect()
    for r in out:
        assert r.vs_typical == 1.0
        assert r.n_baseline == 5
    assert {r.tod_bucket for r in out} == {2, 14}


def test_stream_mad_alerts_equal_batch_flags(spark, sf_dir):
    """The stream-static alert join is stateless, so its emitted rows
    must equal the batch operator's flagged subset exactly."""
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup

    streamed = sorted(
        (r.event_id, r.event_type, r.value)
        for r in rollup.stream_mad_alerts(spark, sf_dir).collect()
    )
    batch = sorted(
        (r.event_id, r.event_type, r.value)
        for r in anomaly.mad_outliers(load_table(spark, sf_dir, "events"))
        .filter("is_outlier")
        .collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_dispersion_separates_bursty_from_regular(spark):
    import datetime as dt

    from real_time_database_monitoring_system_spark.operators import anomaly

    rows = []
    eid = 0
    # 'regular': exactly 1 event per minute for 60 minutes → Fano 0
    for m in range(60):
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
                     1, "regular", 1.0, "{}")); eid += 1
    # 'bursty': 30 events in one minute, 1 in each of 30 others
    for i in range(30):
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                     1, "bursty", 1.0, "{}")); eid += 1
    for m in range(1, 31):
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
                     1, "bursty", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_type: r for r in anomaly.dispersion_panel(events).collect()}
    assert out["regular"].fano_factor == 0.0
    assert out["regular"].arrival_class == "regular"
    assert out["bursty"].fano_factor > 10.0
    assert out["bursty"].arrival_class == "bursty"
