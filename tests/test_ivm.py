"""Incremental view maintenance (operators/ivm.py): the maintained
rollup must be bit-identical to a from-scratch recompute for inserts,
deletes, group birth, and group death — and an empty delta must be a
no-op."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import ivm


def _ev(spark, rows):
    """rows: (event_id, minute_offset, event_type, value)."""
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), 1, et, v, "{}")
            for eid, m, et, v in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def _direct(events):
    return (
        ivm.bucket_rollup(events)
        .select(
            "bucket_s",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("sum_raw").cast("double").alias("sum_value"),
        )
        .orderBy("bucket_s", "event_type")
    )


def test_delta_apply_equals_recompute(spark):
    base = [
        (1, 0, "view", 1.0),
        (2, 1, "view", 2.5),
        (3, 6, "click", 4.0),
        (4, 6, "error", 0.5),
        (5, 12, "view", 3.25),
    ]
    old = _ev(spark, base)
    # delete id 2 (shrinks a group) and id 4 (kills its group); insert
    # id 6 into an existing group and id 7 into a brand-new bucket
    new = _ev(
        spark,
        [r for r in base if r[0] not in (2, 4)]
        + [(6, 6, "click", 1.75), (7, 20, "purchase", 9.0)],
    )
    got = ivm.delta_rollup_apply(old, new).collect()
    want = _direct(new).collect()
    assert got == want
    # the dead (error) group is gone, the new bucket exists
    types = {(r.bucket_s, r.event_type) for r in got}
    assert all(t != "error" for _, t in types)
    assert any(t == "purchase" for _, t in types)


def test_empty_delta_is_noop(spark):
    old = _ev(spark, [(1, 0, "view", 1.0), (2, 6, "click", 2.0)])
    assert ivm.delta_rollup_apply(old, old).collect() == _direct(old).collect()


def test_all_rows_deleted_yields_empty_view(spark):
    old = _ev(spark, [(1, 0, "view", 1.0), (2, 0, "view", 2.0)])
    new = old.filter(F.col("event_id") < 0)
    assert ivm.delta_rollup_apply(old, new).collect() == []


def test_testdata_fixture_matches_recompute(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    old = events.filter(F.col("event_id") % 10 != 0)
    new = events.filter(F.col("event_id") % 7 != 0)
    got = ivm.delta_rollup_apply(old, new)
    want = _direct(new)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_forget_users_matches_recompute_and_removes_cohort(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    got = ivm.forget_users(events, modulus=97)
    want = _direct(events.filter(F.col("user_id") % 97 != 0))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_forget_users_drops_groups_owned_by_cohort(spark):
    # user 97 owns the whole 'error' group; after erasure it must not
    # linger as a zero-count tombstone
    rows = [
        (1, 0, 97, "error", 1.0),
        (2, 0, 1, "view", 2.0),
        (3, 6, 97, "view", 3.0),
        (4, 6, 2, "view", 4.0),
    ]
    events = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime(2024, 1, 1)
             + __import__("datetime").timedelta(minutes=m), u, et, v, "{}")
            for eid, m, u, et, v in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = ivm.forget_users(events, modulus=97).collect()
    assert all(r.event_type != "error" for r in out)
    by_key = {(r.bucket_s, r.event_type): r for r in out}
    assert len(by_key) == 2  # the two view buckets survive
    assert all(r.n_events == 1 for r in out)
    import pytest

    with pytest.raises(ValueError):
        ivm.forget_users(events, modulus=0)


def test_random_snapshot_pairs_match_recompute(spark):
    """Seeded randomized CDC shapes: arbitrary insert/delete mixes over
    arbitrary bucket/type layouts must maintain exactly (the
    self-maintainability algebra has no data-shape assumptions)."""
    import random

    for seed in (7, 41, 1337):
        rng = random.Random(seed)
        ids = list(range(60))
        rows = [
            (
                i,
                rng.randrange(0, 30),  # minute offset → ~6 buckets
                rng.choice(["view", "click", "error"]),
                round(rng.uniform(-50, 50), 2),
            )
            for i in ids
        ]
        old_ids = set(rng.sample(ids, 40))
        new_ids = set(rng.sample(ids, 40))
        df = _ev(spark, rows)
        old = df.filter(F.col("event_id").isin(list(old_ids)))
        new = df.filter(F.col("event_id").isin(list(new_ids)))
        got = ivm.delta_rollup_apply(old, new).collect()
        want = _direct(new).collect()
        assert got == want, f"seed {seed}"
