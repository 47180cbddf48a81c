"""Behavior tests for the round-5 operators: Benford audit, Gini
concentration, KS drift, ACF panel, Heaps-law vocab growth, and the
blocked edit-distance join — planted fixtures with hand-computable
truth, plus the exclusion/edge semantics the sf tables never exercise
(NULL/zero values, constant series, hot blocking keys)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics, anomaly, dedup, text


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_benford_excludes_nonpositive_and_null_but_counts_them(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 123.45),  # digit 1
        (2, "2024-01-01 10:01:00", 1, "click", 19.99),   # digit 1
        (3, "2024-01-01 10:02:00", 1, "click", 0.42),    # digit 4 (42 cents)
        (4, "2024-01-01 10:03:00", 1, "click", 0.0),     # excluded: zero
        (5, "2024-01-01 10:04:00", 1, "click", -5.0),    # excluded: negative
        (6, "2024-01-01 10:05:00", 1, "click", None),    # excluded: NULL
    ]
    out = analytics.benford_audit(_events(spark, rows)).collect()
    assert len(out) == 9  # dense spine: all digits, one type
    by_digit = {r.digit: r for r in out}
    assert by_digit[1].n_obs == 2 and by_digit[4].n_obs == 1
    assert all(by_digit[d].n_obs == 0 for d in (2, 3, 5, 6, 7, 8, 9))
    assert all(r.n_excluded == 3 for r in out)
    assert abs(sum(r.share for r in out) - 1.0) < 1e-8
    # expectations are the shared literals, deviation = share − expected
    for r in out:
        assert abs(r.expected - round(math.log10(1 + 1 / r.digit), 9)) < 1e-9
        assert abs(r.dev - round(r.share - r.expected, 9)) < 2e-9


def test_gini_zero_when_equal_and_high_for_whale(spark):
    equal = [
        (i, "2024-01-01 10:00:00", i, "click", 10.0) for i in range(10)
    ]
    out = analytics.value_concentration(_events(spark, equal)).collect()
    assert len(out) == 1
    assert out[0].n_users == 10 and out[0].gini == 0.0
    assert abs(out[0].top_user_share - 0.1) < 1e-9

    whale = [(i, "2024-01-01 10:00:00", i, "buy", 0.01) for i in range(9)]
    whale.append((99, "2024-01-01 10:00:00", 99, "buy", 9999.99))
    w = analytics.value_concentration(_events(spark, whale)).collect()[0]
    assert w.gini > 0.85
    assert w.top_user_share > 0.99


def test_ks_drift_zero_for_identical_halves_and_one_for_disjoint(spark):
    # hour 0-1 = ref, hour 2-3 = cur (midpoint split); same values in
    # both halves -> D = 0
    same = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        same.append((i, "2024-01-01 00:30:00", 1, "a", v))
        same.append((100 + i, "2024-01-01 03:30:00", 1, "a", v))
    out = anomaly.ks_drift(_events(spark, same)).collect()
    assert out[0].ks_d == 0.0 and out[0].n_ref == 4 and out[0].n_cur == 4

    # disjoint supports -> D = 1
    disj = [(i, "2024-01-01 00:30:00", 1, "a", float(i)) for i in range(1, 5)]
    disj += [(100 + i, "2024-01-01 03:30:00", 1, "a", 100.0 + i) for i in range(4)]
    out = anomaly.ks_drift(_events(spark, disj)).collect()
    assert out[0].ks_d == 1.0


def test_acf_alternating_series_negative_lag1_positive_lag2(spark):
    # daily counts alternate 3,1,3,1,... over 10 days: lag-1 strongly
    # negative, lag-2 strongly positive; exact values computed in
    # Python with the same n-scaled integer formula
    rows = []
    eid = 0
    for d in range(10):
        n_ev = 3 if d % 2 == 0 else 1
        for _ in range(n_ev):
            rows.append((eid, f"2024-01-{d+1:02d} 12:00:00", 1, "a", 1.0))
            eid += 1
    out = anomaly.acf_panel(_events(spark, rows), max_lag=3).collect()
    by_lag = {r.lag: r.acf for r in out}
    y = [3 if d % 2 == 0 else 1 for d in range(10)]
    n, s = len(y), sum(y)
    dev = [n * v - s for v in y]
    den = sum(d * d for d in dev)

    def expected(k):
        return round(sum(dev[t] * dev[t + k] for t in range(n - k)) / den, 9)

    assert by_lag[1] == expected(1) and by_lag[1] < -0.7
    assert by_lag[2] == expected(2) and by_lag[2] > 0.7
    assert all(r.n_days == 10 for r in out)


def test_acf_constant_series_reports_null(spark):
    rows = [
        (i, f"2024-01-{d+1:02d} 12:00:00", 1, "a", 1.0)
        for i, d in enumerate(range(5))
    ]
    out = anomaly.acf_panel(_events(spark, rows), max_lag=2).collect()
    assert out and all(r.acf is None for r in out)


def test_vocab_growth_saturates_on_repetitive_corpus(spark):
    # 20 docs, all the same token -> cum_vocab pins at 1; 20 docs of
    # fresh vocabulary -> cum_vocab == cum distinct terms
    rep = [(i, "tok tok tok", "en", "s", 11) for i in range(20)]
    out = text.vocab_growth(_docs(spark, rep), n_buckets=5).collect()
    assert len(out) == 5
    assert out[0].cum_vocab == 1 and out[-1].cum_vocab == 1
    assert out[-1].cum_tokens == 60
    assert out[-1].ttr == round(1 / 60, 9)

    fresh = [(i, f"w{i}a w{i}b", "en", "s", 7) for i in range(20)]
    out = text.vocab_growth(_docs(spark, fresh), n_buckets=5).collect()
    assert out[-1].cum_vocab == 40
    assert [r.new_terms for r in out] == [8, 8, 8, 8, 8]


def test_vocab_growth_empty_buckets_surface_as_zero(spark):
    # sparse doc_ids: docs only in the low range -> top buckets empty
    rows = [(i, f"w{i}", "en", "s", 3) for i in range(5)] + [
        (100, "w100", "en", "s", 4)
    ]
    out = text.vocab_growth(_docs(spark, rows), n_buckets=4).collect()
    assert len(out) == 4
    assert out[1].n_docs == 0 and out[1].bucket_tokens == 0
    assert out[1].cum_vocab == out[0].cum_vocab  # flat through the gap


def test_edit_distance_finds_planted_typo_and_respects_block(spark):
    base = "the quick brown fox jumps over the lazy dog"
    typo = "the quick brawn fox jumps over the lazy dog"  # 1 sub, same prefix
    other = "zzz quick brown fox jumps over the lazy dog"  # different block
    rows = [
        (1, base, "en", "s", len(base)),
        (2, typo, "en", "s", len(typo)),
        (3, other, "en", "s", len(other)),
    ]
    out = dedup.edit_distance_pairs(_docs(spark, rows)).collect()
    pairs = {(r.a_id, r.b_id): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].edit_dist == 1
    assert pairs[(1, 2)].similarity == round(1 - 1 / 32, 9)
    # doc 3 differs inside the 12-char blocking key: out of scope by
    # definition (the recall contract is conditional on the block)
    assert not any(3 in p for p in pairs)


def test_edit_distance_hot_key_cutoff_bounds_blocks(spark):
    # 30 docs share one blocking prefix; max_df=10 must drop the whole
    # hot block (no quadratic pair stage), while a cold pair survives
    rows = [(i, "common prefix words here filler", "en", "s", 30) for i in range(30)]
    rows += [
        (100, "rare prefix one two three", "en", "s", 25),
        (101, "rare prefix one two threx", "en", "s", 25),
    ]
    out = dedup.edit_distance_pairs(_docs(spark, rows), max_df=10).collect()
    ids = {i for r in out for i in (r.a_id, r.b_id)}
    assert ids == {100, 101}
    assert len(out) == 1 and out[0].edit_dist == 1


def test_edit_distance_cleaning_pins_ascii_domain(spark):
    # punctuation and case differences vanish in the cleaned domain:
    # distance is 0 even though the raw strings differ
    rows = [
        (1, "Hello, World! one two three four", "en", "s", 32),
        (2, "hello world one two three four", "en", "s", 30),
    ]
    out = dedup.edit_distance_pairs(_docs(spark, rows)).collect()
    assert len(out) == 1 and out[0].edit_dist == 0 and out[0].similarity == 1.0


def test_changepoint_locates_planted_level_shift(spark):
    # 10 days at ~2 events/day then 10 days at ~8/day: the best split
    # must be the boundary (day index 9, i.e. the last low day)
    rows = []
    eid = 0
    for d in range(20):
        n_ev = 2 if d < 10 else 8
        for _ in range(n_ev):
            rows.append((eid, f"2024-01-{d+1:02d} 12:00:00", 1, "a", 1.0))
            eid += 1
    out = anomaly.changepoint_detect(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    base_day = 19723  # 2024-01-01 epoch day
    assert r.break_day == base_day + 9
    assert r.mean_before == 2.0 and r.mean_after == 8.0
    assert r.n_days == 20


def test_changepoint_single_day_type_drops_out(spark):
    rows = [(1, "2024-01-01 10:00:00", 1, "only", 1.0)]
    assert anomaly.changepoint_detect(_events(spark, rows)).collect() == []


def test_theil_sen_ignores_single_outlier_day(spark):
    # perfect slope-2 line over 15 days with ONE corrupted day: OLS
    # would move; the pairwise median must stay exactly 2.0
    rows = []
    eid = 0
    for d in range(15):
        n_ev = 2 * d + 1 if d != 7 else 500
        for _ in range(n_ev):
            rows.append((eid, f"2024-01-{d+1:02d} 12:00:00", 1, "a", 1.0))
            eid += 1
    out = anomaly.theil_sen_trend(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].sen_slope == 2.0
    assert out[0].n_pairs == 15 * 14 // 2


def test_zipf_fit_flags_uniform_vs_skewed(spark):
    # geometric frequencies (true Zipf-ish) vs perfectly uniform: the
    # skewed source must fit a steep negative slope, the uniform one a
    # ~0 slope (every term equal -> y constant)
    rows = []
    did = 0
    for i in range(8):  # term i appears 2^(8-i) times
        for _ in range(2 ** (8 - i)):
            rows.append((did, f"s{i}", "en", "skew", 2))
            did += 1
    for i in range(8):
        for _ in range(10):
            rows.append((did, f"u{i}", "en", "unif", 2))
            did += 1
    out = {r.source: r for r in text.zipf_fit(_docs(spark, rows)).collect()}
    assert out["skew"].zipf_slope < -1.5 and out["skew"].r2 > 0.9
    assert abs(out["unif"].zipf_slope) < 1e-9
    assert out["skew"].n_terms == 8 and out["unif"].n_terms == 8


def test_pca_power_iter_recovers_dominant_axis(spark):
    # vectors concentrated on axis 3 with small noise on axis 10: the
    # dominant loading must sit on dim 3 with |loading| ~ 1
    rows = []
    for i in range(50):
        v = [0.0] * 64
        v[3] = 1.0
        v[10] = 0.01 * (i % 5)
        rows.append((i, v, "a"))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    from real_time_database_monitoring_system_spark.operators import clustering

    out = clustering.pca_power_iter(emb).collect()
    assert len(out) == 64
    by_dim = {r.dim: r.loading for r in out}
    assert abs(by_dim[3]) > 0.999
    assert all(
        abs(by_dim[d]) < 0.03 for d in range(64) if d not in (3, 10)
    )


def test_pca_power_iter_empty_input_yields_null_loadings(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    )
    from real_time_database_monitoring_system_spark.operators import clustering

    out = clustering.pca_power_iter(emb).collect()
    assert len(out) == 64 and all(r.loading is None for r in out)
