"""Edge semantics of the round-3 late additions: containment vs
Jaccard asymmetry, fuzzy blocking, overlap-join boundary exclusion,
EWMA head normalization, degenerate normalization groups, winsorized
tails, and profile NULL accounting."""

from __future__ import annotations

import datetime as dt

from real_time_database_monitoring_system_spark.operators import (
    analytics,
    anomaly,
    dedup,
    monitoring,
    pipeline,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _ev(spark, rows):
    """rows: (minute_offset, user, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, et, v, "{}")
            for i, (m, u, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_containment_catches_excerpt_jaccard_misses(spark):
    # B embeds A verbatim inside much longer text: containment of the
    # excerpt is 1.0 while Jaccard is diluted by B's extra shingles
    a = "alpha beta gamma delta epsilon"
    filler = " ".join(f"word{i} filler{i} extra{i}" for i in range(20))
    docs = _docs(spark, [(a, "s"), (a + " " + filler, "s")])
    pairs = dedup.containment_pairs(docs, threshold=0.9).collect()
    assert len(pairs) == 1 and pairs[0].containment == 1.0
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert jac == []  # symmetric measure misses the excerpt


def test_fuzzy_prefix_match_blocks_then_measures(spark):
    shared = "identical sixteen"  # >16 chars: same blocking key
    docs = _docs(
        spark,
        [
            (shared + " tail one x", "s"),
            (shared + " tail twoo y", "s"),
            ("completely different prefix text", "s"),
        ],
    )
    got = dedup.fuzzy_prefix_match(docs, max_dist=12).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, 1)]
    assert 0 < got[0].edit_dist <= 12


def test_interval_overlap_join_excludes_touching_endpoints(spark):
    # hour 0 is busy for type "error" (12 events vs 1 in each of 5
    # other hours); user 1's session ends exactly at the window start
    # (measure-zero → excluded), user 2's session crosses into it
    rows = [(m, 9, "error", 1.0) for m in range(0, 60, 5)]  # busy hour 0
    rows += [(60 * h, 9, "error", 1.0) for h in range(1, 6)]  # quiet tail
    # user 1: session [h-2, h0start] touching only (ends at 0:00? use
    # minutes before hour 0 is impossible — instead end exactly at a
    # later busy-window boundary). Build user sessions around hour 0:
    rows += [(120, 1, "click", 1.0), (180, 1, "click", 1.0)]  # outside hour 0
    rows += [(30, 2, "click", 1.0), (50, 2, "click", 1.0)]  # inside hour 0
    out = monitoring.interval_overlap_join(_ev(spark, rows), gap_minutes=90).collect()
    users = {(r.user_id, r.event_type) for r in out}
    assert (2, "error") in users
    assert all(u != 1 for u, _ in users)
    assert all(r.overlap_us > 0 for r in out)


def test_ewma_head_normalizes_over_present_lags(spark):
    rows = [(i, 1, "cpu", float(v)) for i, v in enumerate([10.0, 20.0])]
    out = {r.event_id: r.ewma for r in monitoring.ewma_smooth(_ev(spark, rows)).collect()}
    assert out[0] == 10.0  # single lag present → its own value
    # second row: (20*128 + 10*64) / (128 + 64)
    assert abs(out[1] - (20 * 128 + 10 * 64) / 192) < 1e-12


def test_minmax_normalize_degenerate_group_is_null(spark):
    rows = [(0, 1, "flat", 5.0), (1, 1, "flat", 5.0), (2, 1, "var", 0.0), (3, 1, "var", 10.0)]
    out = {r.event_id: r.norm01 for r in pipeline.minmax_normalize(_ev(spark, rows)).collect()}
    assert out[0] is None and out[1] is None
    assert out[2] == 0.0 and out[3] == 1.0


def test_winsorized_stats_clips_tails(spark):
    rows = [(i, 1, "cpu", float(i)) for i in range(1, 100)] + [(100, 1, "cpu", 10000.0)]
    r = anomaly.winsorized_stats(_ev(spark, rows)).collect()[0]
    assert r.n_above >= 1 and r.p_hi < 10000.0
    assert r.win_mean < 200  # the outlier no longer owns the mean


def test_column_profile_counts_nulls_and_distincts(spark):
    df = _ev(spark, [(0, 1, "a", 1.0), (1, 1, "a", 2.0), (2, 2, "b", 1.0)])
    df = df.withColumn(
        "props",
        (df.event_id % 2 == 0).cast("boolean").cast("string"),
    )
    prof = {r.col_name: r for r in analytics.column_profile(df).collect()}
    assert prof["event_id"].n_distinct == 3 and prof["event_id"].n_nulls == 0
    assert prof["event_type"].n_distinct == 2
    assert prof["value"].n_distinct == 2


def test_skew_profile_ranks_hot_key_first(spark):
    rows = [(0, 99, "click", 1.0)] * 0  # placeholder for clarity
    data = [(m, 99, "click", 1.0) for m in range(8)] + [
        (m, u, "click", 1.0) for m, u in enumerate(range(1, 5))
    ]
    from real_time_database_monitoring_system_spark.operators import skew

    out = skew.skew_profile(_ev(spark, data), "user_id").collect()
    assert out[0].user_id == 99 and out[0].cnt == 8
    # 12 rows over 5 keys → hot key ratio = 8*5/12
    assert abs(out[0].skew_ratio - 8 * 5 / 12) < 1e-12
    assert abs(sum(r.share for r in out) - 1.0) < 1e-12


def test_temporal_split_embargo_separates_train_eval(spark):
    # 100 events ten minutes apart: cutoff = p80 = minute 790; embargo
    # covers (790, 850] → minutes 800..850; eval strictly after
    from real_time_database_monitoring_system_spark.operators import curation

    rows = [(10 * m, 1, "view", 1.0) for m in range(100)]
    out = {r.event_id: r.split for r in curation.temporal_split(_ev(spark, rows)).collect()}
    labels = [out[i] for i in range(100)]
    # ordered: all train, then embargo, then eval — never interleaved
    assert labels == sorted(labels, key=["train", "embargo", "eval"].index)
    assert labels.count("train") == 80
    assert labels.count("embargo") == 6  # minutes 800..850
    assert labels.count("eval") == 14
    assert labels[0] == "train" and labels[-1] == "eval"


def test_pagerank_hub_outranks_spokes(spark):
    # every user's journey funnels into "hub": spoke -> hub repeatedly
    rows = []
    m = 0
    for u in range(1, 4):
        for _ in range(5):
            rows += [(m, u, f"spoke{u}", 1.0), (m + 1, u, "hub", 1.0)]
            m += 2
    from real_time_database_monitoring_system_spark.operators import event_analytics

    ranks = {r.node: r.rank_ppm for r in
             event_analytics.pagerank_transitions(_ev(spark, rows)).collect()}
    assert ranks["hub"] > max(v for k, v in ranks.items() if k != "hub")
    # mass stays bounded: total ≤ 1e6 (truncation only loses mass)
    assert sum(ranks.values()) <= 1_000_000


def test_freshness_audit_flags_silent_source(spark):
    # "error" stopped sending 3 hours before the snapshot instant
    rows = [(m, 1, "click", 1.0) for m in range(0, 300, 10)]
    rows += [(m, 2, "error", 1.0) for m in range(0, 120, 10)]
    out = {r.event_type: r for r in monitoring.freshness_audit(_ev(spark, rows)).collect()}
    assert out["error"].is_stale and not out["click"].is_stale
    assert out["click"].lag_us == 0  # the freshest source defines as-of
    assert out["error"].lag_us == (290 - 110) * 60_000_000


def test_class_balance_chi2_zero_when_uniform(spark):
    rows = [(m, 1, t, 1.0) for m, t in enumerate(["a", "b", "c"] * 4)]
    out = analytics.class_balance(_ev(spark, rows)).collect()
    assert all(r.chi2_uniform == 0.0 for r in out)
    assert all(abs(r.share - 1 / 3) < 1e-12 for r in out)
    # skewed mix: chi2 = sum((obs*k-total)^2)/(k*total) for obs 6,3,3
    skewed = [(m, 1, t, 1.0) for m, t in enumerate(["a"] * 6 + ["b"] * 3 + ["c"] * 3)]
    out2 = analytics.class_balance(_ev(spark, skewed)).collect()
    expected = ((6 * 3 - 12) ** 2 + (3 * 3 - 12) ** 2 * 2) / (3 * 12)
    assert all(abs(r.chi2_uniform - expected) < 1e-12 for r in out2)


def test_join_cardinality_estimate_equals_actual_join_size(spark):
    """The estimator's whole contract: Σ cnt_a·cnt_b must equal the
    ACTUAL inner-join row count, and top_key_share must spot the hot
    key."""
    from real_time_database_monitoring_system_spark.operators import skew

    rows = (
        [(m, 1, "purchase", 1.0) for m in range(3)]
        + [(m, 1, "view", 1.0) for m in range(10)]   # user 1: 3×10 = 30
        + [(m, 2, "purchase", 1.0) for m in range(1)]
        + [(m, 2, "click", 1.0) for m in range(2)]   # user 2: 1×2 = 2
        + [(m, 3, "view", 1.0) for m in range(5)]    # unmatched
    )
    ev = _ev(spark, rows)
    left = ev.filter(ev.event_type == "purchase")
    right = ev.filter(ev.event_type.isin("view", "click"))
    est = skew.join_cardinality_estimate(left, right, "user_id").first()
    actual = left.select("user_id").join(right.select("user_id"), "user_id").count()
    assert est.est_rows == actual == 32
    assert est.n_matched_keys == 2
    assert est.max_key_pairs == 30
    assert abs(est.top_key_share - 30 / 32) < 1e-12


def test_latency_panel_and_trending_invariants(spark):
    ev = _ev(
        spark,
        [(m, 1, "view" if m % 3 else "click", float(m)) for m in range(180)],
    )
    panel = monitoring.latency_percentile_panel(ev).collect()
    assert len(panel) == 3  # 180 minutes = 3 hourly buckets
    for r in panel:
        assert r.p50 <= r.p95 <= r.p99
        assert r.n == 60
    trend = monitoring.trending_types(ev, k=2).collect()
    assert [(r.day_no, r.rnk) for r in trend] == [(19723, 1), (19723, 2)]
    assert trend[0].event_type == "view" and trend[0].n == 120
    import pytest

    with pytest.raises(ValueError):
        monitoring.latency_percentile_panel(ev, bucket_seconds=0)
    with pytest.raises(ValueError):
        monitoring.trending_types(ev, k=0)
