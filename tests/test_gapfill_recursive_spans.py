"""Semantics tests for this session's operators on handcrafted
fixtures: gap-filled LOCF rollup, exact substring-dup spans, and the
recursive-CTE day streaks (plus a cross-algorithm equivalence check of
the recursion against a single-pass gaps-and-islands computation).

Oracle parity at corpus scale is covered generically by
test_oracle_parity.py; these pin the behaviors parity alone would not
explain on failure (gap rows, LOCF carry, span merging, recursion
depth).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics, dedup, gapfill
from real_time_database_monitoring_system_spark.sources.registry import load_table


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, mi), u, et, v, "{}")
            for i, (d, h, mi, u, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_gapfill_fills_missing_buckets_with_locf(spark):
    # one key, observations in buckets 0 and 3 (5-min buckets) → gap
    # rows for buckets 1 and 2 carrying value 10.0 forward
    ev = _events(
        spark,
        [
            (1, 0, 1, 1, "cpu", 10.0),
            (1, 0, 16, 1, "cpu", 40.0),
        ],
    )
    out = gapfill.gapfill_locf(ev).collect()
    assert len(out) == 4  # buckets 0..3 inclusive
    by_bucket = {r.bucket_s: r for r in out}
    base = min(by_bucket)
    assert [by_bucket[base + 300 * i].is_gap for i in range(4)] == [
        False,
        True,
        True,
        False,
    ]
    assert [by_bucket[base + 300 * i].n_points for i in range(4)] == [1, 0, 0, 1]
    assert [by_bucket[base + 300 * i].value_locf for i in range(4)] == [
        10.0,
        10.0,
        10.0,
        40.0,
    ]


def test_gapfill_spine_is_per_key(spark):
    # keys with disjoint extents get their own spines — no cross-key
    # bucket bleed (mem's extent must not widen cpu's spine)
    ev = _events(
        spark,
        [
            (1, 0, 1, 1, "cpu", 1.0),
            (1, 0, 6, 1, "cpu", 2.0),
            (2, 12, 1, 1, "mem", 9.0),
        ],
    )
    out = gapfill.gapfill_locf(ev)
    assert out.filter("event_type = 'cpu'").count() == 2
    assert out.filter("event_type = 'mem'").count() == 1
    assert out.filter("is_gap").count() == 0


def test_substring_spans_cross_doc_and_merge(spark):
    # docs 1 and 2 share tokens 0..9 (10 tokens → three overlapping
    # 8-windows each, merged into ONE span [0, 10)); doc 3 is unique
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, shared + " aaa bbb ccc"),
            (2, shared + " ddd eee fff"),
            (3, " ".join(f"u{i}" for i in range(15))),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.substring_dup_spans(docs, k=8).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert (out[d].span_start, out[d].span_end) == (0, 10)
        assert out[d].n_dup_windows == 3


def test_substring_spans_within_doc_repeat_two_spans(spark):
    # the same 8 tokens twice inside ONE doc, separated by unique
    # filler > k tokens → two disjoint spans in that doc
    block = " ".join(f"b{i}" for i in range(8))
    filler = " ".join(f"f{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, f"{block} {filler} {block}")],
        "doc_id long, text string",
    )
    spans = sorted(
        (r.span_start, r.span_end)
        for r in dedup.substring_dup_spans(docs, k=8).collect()
    )
    assert spans == [(0, 8), (20, 28)]


def test_substring_spans_short_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    assert dedup.substring_dup_spans(docs, k=8).count() == 0


def test_streaks_handcrafted(spark):
    # user 1: days 1,2,3 + 5  → streaks {3, 1}; user 2: days 2,4,6 → 1s
    rows = [
        (d, 0, 1, u, "view", 1.0)
        for u, days in ((1, [1, 2, 3, 5]), (2, [2, 4, 6]))
        for d in days
    ]
    out = {r.user_id: r for r in analytics.user_day_streaks(_events(spark, rows)).collect()}
    assert (out[1].n_active_days, out[1].n_streaks, out[1].max_streak) == (4, 2, 3)
    assert (out[2].n_active_days, out[2].n_streaks, out[2].max_streak) == (3, 3, 1)


def test_streaks_recursion_matches_gaps_and_islands(spark, sf_dir):
    """Cross-algorithm equivalence on real data: the recursive closure
    must equal the single-pass groupBy over date_sub(day, dense_rank)
    (the classic gaps-and-islands identity)."""
    ev = load_table(spark, sf_dir, "events")
    recursive = {
        (r.user_id, r.n_active_days, r.n_streaks, r.max_streak)
        for r in analytics.user_day_streaks(ev).collect()
    }
    days = ev.select(
        "user_id", F.expr("date(cast(ts as timestamp))").alias("day")
    ).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("day")
    islands = (
        days.withColumn("rk", F.dense_rank().over(w))
        .withColumn("anchor", F.expr("date_sub(day, rk)"))
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count("*").alias("n_streaks"),
            F.max("len").alias("max_streak"),
        )
    )
    onepass = {
        (r.user_id, r.n_active_days, r.n_streaks, int(r.max_streak))
        for r in islands.collect()
    }
    assert recursive == onepass


def test_gapfill_interpolate_linear_values(spark):
    # observations 10.0 at bucket 0 and 40.0 at bucket 3 → gaps at
    # buckets 1, 2 interpolate to 20.0, 30.0; observed rows keep their
    # own value
    ev = _events(
        spark,
        [
            (1, 0, 1, 1, "cpu", 10.0),
            (1, 0, 16, 1, "cpu", 40.0),
        ],
    )
    out = gapfill.gapfill_interpolate(ev).collect()
    by_bucket = {r.bucket_s: r for r in out}
    base = min(by_bucket)
    assert [by_bucket[base + 300 * i].value_interp for i in range(4)] == [
        10.0,
        20.0,
        30.0,
        40.0,
    ]
    assert [by_bucket[base + 300 * i].is_gap for i in range(4)] == [
        False,
        True,
        True,
        False,
    ]


def test_session_operators_exchange_budgets(spark, sf_dir):
    """Shuffle budgets for this session's operators: the gap-fills pay
    the (materialized) bucket agg separately, so their visible plans
    hold only spine-join + window/sort exchanges; spans pays dup-count
    agg, rejoin, and the per-doc window; RANGE frames pay one window
    hash plus the presentation sort."""
    from real_time_database_monitoring_system_spark.operators import analytics as an
    from real_time_database_monitoring_system_spark.plans import checks

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    assert checks.count_exchanges(gapfill.gapfill_locf(ev)) <= 2
    assert checks.count_exchanges(gapfill.gapfill_interpolate(ev)) <= 2
    assert checks.count_exchanges(dedup.substring_dup_spans(docs)) <= 3
    assert checks.count_exchanges(an.range_frame_stats(ev)) <= 2


def test_session_operators_handle_empty_and_degenerate_input(spark):
    """Empty feeds and single-row feeds must flow through every new
    operator without error: empty → empty, singleton → one non-gap
    bucket / no spans / one 1-day streak."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics as an,
        runtime_filter as rf,
        sketches,
    )

    empty = _events(spark, [])
    one = _events(spark, [(1, 0, 1, 7, "view", 5.0)])
    assert gapfill.gapfill_locf(empty).count() == 0
    assert gapfill.gapfill_interpolate(empty).count() == 0
    assert an.user_day_streaks(empty).count() == 0
    assert an.range_frame_stats(empty).count() == 0
    assert sketches.theta_user_overlap(empty).count() == 0
    assert sketches.kll_value_rollup(empty).count() == 0

    g = gapfill.gapfill_locf(one).collect()
    assert len(g) == 1 and not g[0].is_gap and g[0].value_locf == 5.0
    s = an.user_day_streaks(one).collect()
    assert len(s) == 1 and s[0].max_streak == 1 and s[0].n_streaks == 1
    r = an.range_frame_stats(one).collect()
    assert len(r) == 1 and r[0].n_10min == 1

    docs_empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.substring_dup_spans(docs_empty).count() == 0

    # bloom over an empty FACT (keys non-empty) and vice versa
    keys = one.select(F.col("event_id").alias("k"))
    fact_empty = empty.select(F.col("event_id").alias("k"))
    assert rf.bloom_semi_join(fact_empty, keys, "k").count() == 0
