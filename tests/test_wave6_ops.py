"""Wave-6 operator semantics: least-squares trend recovery and its
degenerate guards, the k-anonymity lattice decision panel, KL
divergence identities, and the logistic quality gate's scoring
contract."""

from __future__ import annotations

import datetime as dt
import math

from real_time_database_monitoring_system_spark.operators import (
    analytics,
    curation,
    pipeline,
)
from real_time_database_monitoring_system_spark.operators import text as text_ops


def _ev(spark, rows):
    """rows: (minute_offset, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), 1, et, v, "{}")
            for i, (m, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_trend_recovers_exact_line(spark):
    # value = 2·(hour offset) + 3 → slope 2/hour, R² = 1
    rows = [(60 * h, "lin", 2.0 * h + 3.0) for h in range(6)]
    # constant series over many hours: slope 0, R² undefined
    rows += [(60 * h, "flat", 7.25) for h in range(6)]
    # single-hour series: no x-variance, whole fit undefined
    rows += [(0, "point", 1.0), (1, "point", 9.0)]
    out = {r.event_type: r for r in analytics.trend_slope_panel(_ev(spark, rows)).collect()}
    assert out["lin"].slope_per_hour == 2.0 and out["lin"].r2 == 1.0
    assert out["flat"].slope_per_hour == 0.0 and out["flat"].r2 is None
    assert out["point"].slope_per_hour is None and out["point"].intercept is None


def test_k_anonymity_lattice_decisions(spark):
    # nation 1 × segment A has a singleton cell → full QI fails k=2;
    # dropping either column generalizes every group to ≥ 2
    rows = [
        (1, "c1", 1, 10.0, "A"),
        (2, "c2", 1, 10.0, "A"),
        (3, "c3", 1, 10.0, "B"),
        (4, "c4", 2, 10.0, "B"),
        (5, "c5", 2, 10.0, "B"),
        (6, "c6", 2, 10.0, "A"),
    ]
    cust = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    out = {r.qi_set: r for r in curation.k_anonymity_audit(cust, k=2).collect()}
    full = out["nationkey+mktsegment"]
    assert not full.k_anonymous and full.min_group_n == 1
    # rows_at_risk counts MEMBERS of below-k groups: the (1,B) and
    # (2,A) singletons
    assert full.rows_at_risk == 2
    assert out["nationkey"].k_anonymous and out["mktsegment"].k_anonymous
    import pytest

    with pytest.raises(ValueError):
        curation.k_anonymity_audit(cust, k=0)


def test_kl_zero_for_identical_mix_positive_for_skew(spark):
    # two sources with the same token distribution → both KL = 0
    docs = _docs(spark, [("aa bb aa cc", "s1"), ("aa bb aa cc", "s2")])
    out = pipeline.source_kl_divergence(docs).collect()
    assert [r.kl_nats for r in out] == [0.0, 0.0]
    # a source with disjoint vocabulary diverges strictly
    docs2 = _docs(spark, [("aa aa bb bb", "s1"), ("zz zz yy yy", "s2")])
    out2 = {r.source: r.kl_nats for r in pipeline.source_kl_divergence(docs2).collect()}
    # each source holds half the corpus mass over its exclusive terms:
    # KL = ln(2) exactly (up to the per-term 9-dp rounding)
    assert abs(out2["s1"] - math.log(2)) < 1e-8
    assert abs(out2["s2"] - math.log(2)) < 1e-8


def test_kl_nonnegative_on_testdata(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    out = pipeline.source_kl_divergence(load_table(spark, sf_dir, "documents")).collect()
    assert out and all(r.kl_nats >= -1e-6 for r in out)


def test_quality_logit_scoring_contract(spark):
    docs = _docs(
        spark,
        [
            ("the and is of to the and common words here now", "s"),
            ("x", "s"),
            ("", "s"),  # zero tokens → dropped
        ],
    )
    out = pipeline  # noqa: F841  (keep import grouping honest)
    rows = {r.doc_id: r for r in text_ops.quality_logit(docs).collect()}
    assert 2 not in rows  # empty doc dropped
    for r in rows.values():
        assert 0.0 < r.keep_p < 1.0
        assert r.keep == (r.keep_p >= 0.5)
    # manual recomputation of doc 1 ("x": 1 token, unique, no stopword,
    # 1 non-space char) through the published formula
    z = -2.0 + 3.0 * 1.0 + 2.5 * 0.0 + 0.08 * (1 / 100.0) - 0.35 * (1.0 - 5.0)
    assert abs(rows[1].keep_p - round(1.0 / (1.0 + math.exp(-z)), 6)) <= 1e-6


def test_dup_rate_by_source_attributes_blame(spark):
    from real_time_database_monitoring_system_spark.operators import dedup

    docs = _docs(
        spark,
        [
            ("same text", "a"),     # cross-source dup with c's copy
            ("only in a", "a"),     # unique
            ("internal twin", "b"),  # internal dup ×2
            ("internal twin", "b"),
            ("same text", "c"),     # cross-source dup with a's copy
        ],
    )
    out = {r.source: r for r in dedup.dup_rate_by_source(docs).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a.n_docs, a.n_dup_docs, a.n_cross_source_docs) == (2, 1, 1)
    assert (b.n_docs, b.n_dup_docs, b.n_cross_source_docs) == (2, 2, 0)
    assert (c.n_docs, c.n_dup_docs, c.n_cross_source_docs) == (1, 1, 1)
    assert a.dup_rate == 0.5 and b.dup_rate == 1.0 and c.dup_rate == 1.0
    # whitespace/case normalization folds near-identical bytes
    docs2 = _docs(spark, [("A  b", "s"), ("a b ", "s")])
    assert dedup.dup_rate_by_source(docs2).collect()[0].n_dup_docs == 2


def test_data_contract_counts_violations_exactly(spark):
    import datetime as _dt

    rows = [
        # duplicate key, null user, negative + oversized values, alien
        # type, pre-2020 timestamp
        (1, _dt.datetime(2024, 1, 1), 1, "view", 1.0),
        (1, _dt.datetime(2024, 1, 1), 2, "view", 2.0),
        (2, _dt.datetime(2024, 1, 1), None, "click", -3.0),
        (3, _dt.datetime(2019, 12, 31), 4, "teleport", 500.0),
    ]
    events = spark.createDataFrame(
        [(e, t, u, et, v, "{}") for e, t, u, et, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.expectation: r for r in curation.data_contract_audit(events).collect()}
    got = {k: (v.observed, v["pass"]) for k, v in out.items()}
    assert got["event_id_unique"] == (1.0, False)
    assert got["user_id_not_null"] == (1.0, False)
    assert got["value_non_negative"] == (1.0, False)
    assert got["value_below_400"] == (1.0, False)
    assert got["event_type_in_domain"] == (1.0, False)
    assert got["ts_in_2020_2035"] == (1.0, False)
    assert got["event_id_not_null"] == (0.0, True)
    assert got["row_count_min_1"] == (4.0, True)


def test_psi_zero_for_identical_halves_positive_for_shift(spark):
    from real_time_database_monitoring_system_spark.operators import anomaly

    # both halves draw the same 100-value pattern → every bin count
    # matches → every smoothed term is exactly 0
    base = [float(1 + (i * 37) % 100) for i in range(100)]
    rows = [(m, "view", v) for m, v in enumerate(base)]
    rows += [(10_000 + m, "view", v) for m, v in enumerate(base)]
    out = anomaly.psi_drift(_ev(spark, rows)).collect()
    assert sum(r.psi_term for r in out) == 0.0
    assert sum(r.n_ref for r in out) == 100 and sum(r.n_cur for r in out) == 100
    # second half shifted up by 100 → mass leaves the low bins: PSI > 0.25
    rows_shift = [(m, "view", v) for m, v in enumerate(base)]
    rows_shift += [(10_000 + m, "view", v + 100.0) for m, v in enumerate(base)]
    out2 = anomaly.psi_drift(_ev(spark, rows_shift)).collect()
    assert sum(r.psi_term for r in out2) > 0.25
    import pytest

    with pytest.raises(ValueError):
        anomaly.psi_drift(_ev(spark, rows), nbins=1)


def test_lateral_topk_equals_window_rank(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from real_time_database_monitoring_system_spark.operators import relational
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    got = relational.lateral_topk(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    want = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", F.desc("c_acctbal"), "c_custkey")
        .collect()
    )
    assert got == want


def test_blocking_stats_pair_arithmetic(spark):
    from real_time_database_monitoring_system_spark.operators import dedup

    # block 'aaaa...' holds 3 docs (3 pairs), one other block holds 2
    # (1 pair), plus a singleton: 4 candidate pairs of C(6,2)=15 total
    docs = _docs(
        spark,
        [
            ("aaaaaaaaaaaaaaaa one", "s"),
            ("aaaaaaaaaaaaaaaa two", "s"),
            ("aaaaaaaaaaaaaaaa three", "s"),
            ("bbbbbbbbbbbbbbbb one", "s"),
            ("bbbbbbbbbbbbbbbb two", "s"),
            ("cccccccccccccccc", "s"),
        ],
    )
    r = dedup.blocking_stats(docs).collect()[0]
    assert (r.n_blocks, r.n_docs, r.max_block) == (3, 6, 3)
    assert (r.candidate_pairs, r.singleton_blocks) == (4, 1)
    assert r.reduction_ratio == round(1.0 - 4.0 / 15.0, 9)
    # the candidate count equals what the blocked join would produce
    pairs = dedup.fuzzy_prefix_match(docs, max_dist=60).count()
    assert pairs <= r.candidate_pairs


def test_bigram_sees_word_order_unigram_cannot(spark):
    # ten fluent docs establish the bigram stats; doc 10 re-uses the
    # SAME multiset of tokens in scrambled order. Unigram scores the
    # scramble identically to fluency; the bigram model must not.
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    docs = _docs(spark, [(fluent, "s")] * 10 + [(scrambled, "s")])
    uni = {r.doc_id: r.avg_logprob for r in
           pipeline.unigram_logprob_score(docs).collect()}
    bi = {r.doc_id: r.avg_logprob for r in
          pipeline.bigram_logprob_score(docs).collect()}
    assert uni[10] == uni[0]          # unigram is order-blind
    assert bi[10] < bi[0]             # bigram penalizes the scramble
    # per-doc token accounting matches the tokenizer
    out = pipeline.bigram_logprob_score(docs).collect()
    assert all(r.n_tokens == 6 for r in out)


def test_robust_trend_shrugs_off_outlier_burst(spark):
    # clean linear drift with one catastrophic outlier burst in hour 2:
    # the raw fit bends, the bucket-median fit recovers the true slope
    rows = []
    for h in range(6):
        for rep in range(5):
            rows.append((60 * h + rep, "m", 2.0 * h + 3.0))
    rows += [(60 * 2 + 10 + i, "m", 5000.0) for i in range(2)]  # burst
    ev = _ev(spark, rows)
    raw = analytics.trend_slope_panel(ev).collect()[0]
    robust = analytics.robust_trend_panel(ev).collect()[0]
    assert robust.slope_per_hour == 2.0 and robust.r2 == 1.0
    assert abs(raw.slope_per_hour - 2.0) > 10.0  # the burst wrecked raw
    assert robust.n_hours == 6


def test_market_share_sums_to_one_per_market(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import relational
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    out = relational.market_share_panel(
        *[load_table(spark, sf_dir, t)
          for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")]
    ).collect()
    assert out
    by_market = {}
    for r in out:
        by_market.setdefault((r.r_name, r.o_year), []).append(r)
    for rows in by_market.values():
        assert abs(sum(r.market_share for r in rows) - 1.0) < 1e-9
        assert all(r.revenue > 0 for r in rows)


def test_trigram_regex_extraction_matches_indexed_substring(spark):
    """char_trigram_langid's regexp_extract_all lookahead must produce
    exactly the overlapping code-point trigrams of the O(n²) indexed
    reference form — including multi-byte unicode, newlines (the (?s)
    flag), regex metacharacters in the data, and sub-3-char edge
    cases. Pins the round-4 perf rewrite against silent semantic
    drift."""
    texts = [
        "hello world",
        "ab",
        "abc",
        "a\nb\ncd",
        "naïve café — ünïcodé",
        "日本語のテキストです",
        "dots... and (parens) [brackets] {braces} * + ? | ^ $",
        "x" * 300,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    from pyspark.sql import functions as F

    ref = F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
    new = F.expr(r"regexp_extract_all(text, '(?s)(?=(.{3})).', 1)")
    rows = (
        df.filter(F.length("text") >= 3)
        .select("i", ref.alias("ref"), new.alias("new"))
        .collect()
    )
    assert rows
    for r in rows:
        assert list(r.ref) == list(r.new), f"text #{r.i}: {r.ref[:5]} != {r.new[:5]}"
    # Sub-3-char docs are where the forms deliberately DIFFER: the old
    # indexed form descends sequence(1, len-2) into [1, 0] and emits
    # padded sub-'trigrams', while the regex form (correctly, matching
    # the oracle's len>=3 semantics) emits an empty array. Pin the new
    # behavior so round-over-round hashes can't drift on short docs.
    short = (
        df.filter(F.length("text") < 3).select("i", new.alias("new")).collect()
    )
    assert short, "fixture must include a sub-3-char doc"
    for r in short:
        assert list(r.new) == [], f"text #{r.i}: expected no trigrams, got {r.new}"


def test_trigram_langid_learns_separable_profiles(spark, sf_dir):
    # two "languages" with disjoint character distributions: the
    # learned profiles must classify every doc onto the diagonal
    la = ["aba cab bac abc", "bca cba abc acb", "cab abc bca bac"]
    lz = ["zyx xyz yzx zxy", "xzy zxy yxz xyz", "yzx zyx xyz zyx"]
    rows = [(i, t, "aa", "s", len(t)) for i, t in enumerate(la)]
    rows += [(10 + i, t, "zz", "s", len(t)) for i, t in enumerate(lz)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.lang_true, r.lang_pred): r.n_docs
           for r in text_ops.char_trigram_langid(docs, k=20).collect()}
    assert out == {("aa", "aa"): 3, ("zz", "zz"): 3}
    # structural invariant on real data: every doc classified exactly once
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs_sf = load_table(spark, sf_dir, "documents")
    cm = text_ops.char_trigram_langid(docs_sf).collect()
    assert sum(r.n_docs for r in cm) == docs_sf.filter("length(text) >= 3").count()


def test_period_over_period_is_gap_safe(spark):
    from real_time_database_monitoring_system_spark.operators import monitoring

    # days 0, 1, 3 (day 2 missing): day 3's DoD must be NULL (no day 2),
    # not a silent comparison against day 1
    rows = []
    rows += [(24 * 60 * 0 + i, "view", 1.0) for i in range(4)]
    rows += [(24 * 60 * 1 + i, "view", 1.0) for i in range(8)]
    rows += [(24 * 60 * 3 + i, "view", 1.0) for i in range(2)]
    out = {r.day_no - 19723: r for r in
           monitoring.period_over_period(_ev(spark, rows)).collect()}
    assert out[0].dod_change is None and out[0].wow_change is None
    assert out[1].dod_change == 1.0          # 4 → 8
    assert out[3].dod_change is None         # gap: day 2 absent
    assert out[3].wow_change is None


def test_wave6_7_operators_tolerate_empty_and_singleton_inputs(spark):
    """Empty-feed robustness battery for the session's operators: no
    crashes, and degenerate outputs are sane (empty panels, NULL
    guards engaged) — the same contract the earlier waves pin."""
    from real_time_database_monitoring_system_spark.operators import (
        anomaly,
        dedup,
        event_analytics,
        ivm,
        monitoring,
        relational,
    )

    no_ev = _ev(spark, []).filter("event_id < 0")
    no_docs = _docs(spark, []).filter("doc_id < 0")
    one_ev = _ev(spark, [(0, "view", 1.0)])
    one_doc = _docs(spark, [("hello tiny world", "s")])

    assert analytics.trend_slope_panel(no_ev).collect() == []
    row = analytics.trend_slope_panel(one_ev).collect()
    assert len(row) == 1 and row[0].slope_per_hour is None
    assert analytics.robust_trend_panel(no_ev).collect() == []
    assert pipeline.source_kl_divergence(no_docs).collect() == []
    assert pipeline.source_kl_divergence(one_doc).collect()[0].kl_nats == 0.0
    assert pipeline.bigram_logprob_score(no_docs).collect() == []
    assert text_ops.quality_logit(no_docs).collect() == []
    assert text_ops.char_trigram_langid(no_docs).collect() == []
    assert dedup.dup_rate_by_source(no_docs).collect() == []
    assert dedup.blocking_stats(no_docs).collect()[0].n_blocks == 0
    assert ivm.delta_rollup_apply(no_ev, no_ev).collect() == []
    assert ivm.forget_users(no_ev).collect() == []
    assert monitoring.period_over_period(no_ev).collect() == []
    pp = monitoring.period_over_period(one_ev).collect()
    assert len(pp) == 1 and pp[0].dod_change is None
    assert event_analytics.rfm_segments(no_ev).collect() == []
    # contract/psi panels over an empty feed: the shapes stay fixed
    from real_time_database_monitoring_system_spark.operators import curation as cur

    panel = cur.data_contract_audit(no_ev).collect()
    got = {r.expectation: r["pass"] for r in panel}
    assert got["row_count_min_1"] is False and got["event_id_unique"] is True
    assert anomaly.psi_drift(one_ev).collect()  # single row: no crash


def test_chi2_independence_identities(spark):
    from real_time_database_monitoring_system_spark.operators import analytics as an

    # perfectly independent layout: obs == expected → all terms 0
    rows = []
    for d in range(2):            # two weekdays
        for t, mult in (("view", 2), ("click", 1)):
            rows += [(24 * 60 * d + i, t, 1.0) for i in range(10 * mult)]
    out = an.independence_chi2(_ev(spark, rows)).collect()
    assert all(r.chi2_term == 0.0 for r in out)
    assert all(r.obs == r.expected for r in out)
    # perfectly dependent: each type occurs on its own day → χ² = N
    rows2 = [(0 + i, "view", 1.0) for i in range(10)]
    rows2 += [(24 * 60 + i, "click", 1.0) for i in range(10)]
    out2 = an.independence_chi2(_ev(spark, rows2)).collect()
    assert abs(sum(r.chi2_term for r in out2) - 20.0) < 1e-6


def test_slo_burn_budget_accounting(spark):
    from real_time_database_monitoring_system_spark.operators import monitoring

    # day 0: 1 error in 100 (exactly on a 1% budget → burn 1.0);
    # day 1: 4 errors in 100 (burn 4.0); cumulative: 5/200 → 2.5×
    rows = [(m, "error" if m < 1 else "view", 1.0) for m in range(100)]
    rows += [(24 * 60 + m, "error" if m < 4 else "view", 1.0) for m in range(100)]
    out = {r.day_no - 19723: r for r in
           monitoring.slo_burn(_ev(spark, rows)).collect()}
    assert out[0].burn_rate == 1.0 and out[0].cum_budget_used == 1.0
    assert out[1].burn_rate == 4.0 and out[1].cum_budget_used == 2.5
    import pytest

    with pytest.raises(ValueError):
        monitoring.slo_burn(_ev(spark, rows), budget_pct=0)


def test_bounce_rate_counts_single_event_sessions(spark):
    from real_time_database_monitoring_system_spark.operators import monitoring

    # user 1: two events 5 min apart (one session, not a bounce);
    # user 2: one event (bounce); user 3: two events 2.5 h apart (two
    # bounce sessions)
    ev = spark.createDataFrame(
        [
            (1, __import__("datetime").datetime(2024, 1, 1, 9, 0), 1, "view", 1.0, "{}"),
            (2, __import__("datetime").datetime(2024, 1, 1, 9, 5), 1, "view", 1.0, "{}"),
            (3, __import__("datetime").datetime(2024, 1, 1, 9, 0), 2, "view", 1.0, "{}"),
            (4, __import__("datetime").datetime(2024, 1, 1, 9, 0), 3, "view", 1.0, "{}"),
            (5, __import__("datetime").datetime(2024, 1, 1, 11, 30), 3, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    r = monitoring.bounce_rate_daily(ev).collect()[0]
    assert (r.n_sessions, r.n_bounces) == (4, 3)
    assert r.bounce_rate == 0.75


def test_trend_forecast_extrapolates_the_exact_line(spark):
    from real_time_database_monitoring_system_spark.operators import analytics as an

    # value = 2·h + 3 over 6 hours → forecast at h_max + 24 = 2·29 + 3
    # in RELATIVE terms; absolute hours shift both fit and projection
    # identically, so the projected value is exact
    rows = [(60 * h, "lin", 2.0 * h + 3.0) for h in range(6)]
    r = an.trend_forecast(_ev(spark, rows), horizon_hours=24).collect()[0]
    assert r.slope_per_hour == 2.0
    # hour h in the fixture maps to absolute epoch hour; the line
    # passes through (h_abs, value) with slope 2, so at +24h past the
    # last point the value is last + 2·24 = 13 + 48
    assert abs(r.forecast_value - 61.0) < 1e-6
    import pytest

    with pytest.raises(ValueError):
        an.trend_forecast(_ev(spark, rows), horizon_hours=0)


def test_topk_with_ties_keeps_boundary_ties(spark):
    from real_time_database_monitoring_system_spark.operators import relational

    # values: 9, 8, 8, 8, 7 — top-2 WITH TIES must return 4 rows
    # (rank of every 8 is 2); plain LIMIT 2 would drop two arbitrarily
    rows = [(m, "view", v) for m, v in enumerate([9.0, 8.0, 8.0, 8.0, 7.0])]
    out = relational.topk_with_ties(_ev(spark, rows), k=2).collect()
    assert [r.value for r in out] == [9.0, 8.0, 8.0, 8.0]
    assert {r.rnk for r in out} == {1, 2}
    import pytest

    with pytest.raises(ValueError):
        relational.topk_with_ties(_ev(spark, rows), k=0)


def test_nearest_join_picks_closer_side_and_breaks_ties_backward(spark):
    import datetime as _dt

    from real_time_database_monitoring_system_spark.operators import monitoring

    base = _dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # user 1: views at 11:50 and 12:03; purchase at 12:00 → next
        # view (3 min) beats prev view (10 min): forward match
        (1, base - _dt.timedelta(minutes=10), 1, "view"),
        (2, base + _dt.timedelta(minutes=3), 1, "view"),
        (3, base, 1, "purchase"),
        # user 2: views equidistant (±5 min) → tie prefers backward
        (4, base - _dt.timedelta(minutes=5), 2, "view"),
        (5, base + _dt.timedelta(minutes=5), 2, "view"),
        (6, base, 2, "purchase"),
        # user 3: only a later view → forward is the only option
        (7, base + _dt.timedelta(minutes=30), 3, "view"),
        (8, base, 3, "purchase"),
        # user 4: no views at all → NULL match
        (9, base, 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_id: r for r in monitoring.nearest_event_join(ev).collect()}
    assert out[3].nearest_id == 2 and out[3].signed_gap_us == -3 * 60_000_000
    assert out[6].nearest_id == 4 and out[6].signed_gap_us == 5 * 60_000_000
    assert out[8].nearest_id == 7 and out[8].signed_gap_us == -30 * 60_000_000
    assert out[9].nearest_id is None and out[9].signed_gap_us is None


def test_health_score_bands_and_penalties(spark):
    import datetime as _dt

    from real_time_database_monitoring_system_spark.operators import monitoring

    base = _dt.datetime(2024, 1, 1, 12, 0)
    # healthy feed: 1000 views, 1 error, everything fresh
    rows = [(i, base, 1, "view") for i in range(1000)]
    rows.append((2000, base, 1, "error"))
    ev = spark.createDataFrame(
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    r = monitoring.health_score(ev).collect()[0]
    assert r.band == "healthy" and r.n_stale == 0
    # degraded: same feed but the view source went silent 2 h before
    # the error (stale source) and errors are 5% of traffic
    rows2 = [(i, base - _dt.timedelta(hours=2), 1, "view") for i in range(95)]
    rows2 += [(1000 + i, base, 1, "error") for i in range(5)]
    ev2 = spark.createDataFrame(
        [(e, t, u, et, 1.0, "{}") for e, t, u, et in rows2],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    r2 = monitoring.health_score(ev2).collect()[0]
    assert r2.n_stale == 1 and r2.band == "critical"
    assert r2.score < r.score
