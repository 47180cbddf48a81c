"""Round-10 operators and guards.

Wave 0 here: the untracked-artifact guard (VERDICT r9 task 1) and the
ANSI-overflow pin (ADVICE r9: the kruskal/anova/brown_forsythe family
casts DECIMAL(38,0) sums to BIGINT at the edge — both engines must
fail LOUDLY past the documented exactness bound, never diverge
silently).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import stray_artifacts


class TestArtifactGuard:
    def test_flags_each_artifact_pattern(self):
        untracked = [
            "CORRECTNESS_r10.json",
            "BENCH_r10.json",
            "BENCH_DETAIL_r10.json",
            "NOTES.md",
            "real_time_database_monitoring_system_spark/operators/new.py",
        ]
        assert stray_artifacts(untracked) == [
            "CORRECTNESS_r10.json",
            "BENCH_r10.json",
            "BENCH_DETAIL_r10.json",
        ]

    def test_clean_tree_passes(self):
        assert stray_artifacts(["src/x.py", "BENCH_DETAIL.json"]) == []

    def test_non_artifact_json_ignored(self):
        # BENCH_DETAIL.json (the mutable latest-run copy) is tracked
        # and mutable by design; only the per-round archives gate.
        assert stray_artifacts(["COPYCHECK.json", "LEAKCHECK.json"]) == []


class TestAnsiOverflowIsLoud:
    """Pin the session contract the stats family's edge casts rely on:
    ANSI mode ON (Spark 4 default, never overridden by the session
    factory), so DECIMAL(38,0)→BIGINT past ±2^63 raises CAST_OVERFLOW
    — the same loud failure DuckDB's HUGEINT→BIGINT cast gives —
    instead of non-ANSI's silent NULL (which would silently diverge
    from the oracle past the documented exactness bounds of
    kruskal_from_value_counts / brown_forsythe / anova_oneway)."""

    def test_ansi_enabled(self, spark):
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    def test_ansi_overflow_is_loud(self, spark):
        df = spark.range(1).select(
            F.expr(
                "CAST(CAST('99999999999999999999999999' AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("x")
        )
        with pytest.raises(Exception, match="CAST_OVERFLOW|overflow"):
            df.collect()

    def test_duckdb_overflow_is_loud(self):
        import duckdb

        with pytest.raises(Exception, match="[Oo]ut of [Rr]ange|[Oo]verflow"):
            duckdb.sql(
                "SELECT CAST(CAST('99999999999999999999999999' AS HUGEINT)"
                " AS BIGINT)"
            ).fetchall()


# ---- wave 1: two-sample panel completion + robust shift ----

from real_time_database_monitoring_system_spark.operators import analytics, anomaly  # noqa: E402


def _half_pv(spark, rows):
    """(event_type, value, d_ref, d_cur) rows -> per_value DF."""
    return spark.createDataFrame(
        rows, "event_type string, value double, d_ref long, d_cur long"
    )


class TestAndersonDarling:
    # ref=[1,2,3], cur=[2,3,4]: pooled l=(1,2,2,1), B=(1,3,5,6),
    # gap=3 at the first three values, 0 at the last. Terms at
    # SCALE=1e4: 9/(1·5)=1.8→18000, 18/(3·3)=2→20000, 18/(5·1)=3.6
    # →36000; A² = 74000/(3·3·10⁴) = 0.8222…
    def test_hand_values(self, spark):
        pv = _half_pv(
            spark,
            [("a", 1.0, 1, 0), ("a", 2.0, 1, 1), ("a", 3.0, 1, 1), ("a", 4.0, 0, 1)],
        )
        [r] = anomaly.ad_from_value_counts(pv).collect()
        assert (r["n_ref"], r["n_cur"], r["ad_scaled"]) == (3, 3, 74000)
        assert r["ad_stat"] == 74000 / (9 * 10000)

    def test_identical_halves_zero(self, spark):
        pv = _half_pv(spark, [("a", 1.0, 2, 2), ("a", 5.0, 3, 3)])
        [r] = anomaly.ad_from_value_counts(pv).collect()
        assert r["ad_scaled"] == 0 and r["ad_stat"] == 0.0

    def test_empty_half_null_stat(self, spark):
        pv = _half_pv(spark, [("a", 1.0, 2, 0), ("a", 5.0, 3, 0)])
        [r] = anomaly.ad_from_value_counts(pv).collect()
        assert r["n_cur"] == 0 and r["ad_stat"] is None


class TestCramerVonMises:
    def test_hand_values(self, spark):
        # same fixture: cvm_num = Σ l·gap² = 9+18+18+0 = 45;
        # T = 45 / (6²·3·3) = 0.138888889
        pv = _half_pv(
            spark,
            [("a", 1.0, 1, 0), ("a", 2.0, 1, 1), ("a", 3.0, 1, 1), ("a", 4.0, 0, 1)],
        )
        [r] = anomaly.cvm_from_value_counts(pv).collect()
        assert (r["n_ref"], r["n_cur"]) == (3, 3)
        assert r["cvm_stat"] == 45 / (36 * 9)

    def test_identical_halves_zero(self, spark):
        pv = _half_pv(spark, [("a", 1.0, 2, 2), ("a", 5.0, 3, 3)])
        [r] = anomaly.cvm_from_value_counts(pv).collect()
        assert r["cvm_stat"] == 0.0


class TestKuiper:
    def test_hand_values(self, spark):
        # same fixture: all signed gaps ≥ 0 → D⁺num=3, D⁻num=0,
        # V = 3/9
        pv = _half_pv(
            spark,
            [("a", 1.0, 1, 0), ("a", 2.0, 1, 1), ("a", 3.0, 1, 1), ("a", 4.0, 0, 1)],
        )
        [r] = anomaly.kuiper_from_value_counts(pv).collect()
        assert (r["d_plus_num"], r["d_minus_num"]) == (3, 0)
        assert r["kuiper_v"] == 3 / 9

    def test_bidirectional_beats_ks(self, spark):
        # mass moved both down AND up: ref all at 2, cur split to 1
        # and 3 → gaps: at 1: 0·2−1·2=−2; at 2: 2·2−1·2=+2; at 3: 0.
        # D⁺num = D⁻num = 2 → V = 4/4 = 1.0 while KS D = 0.5.
        pv = _half_pv(spark, [("a", 1.0, 0, 1), ("a", 2.0, 2, 0), ("a", 3.0, 0, 1)])
        [r] = anomaly.kuiper_from_value_counts(pv).collect()
        assert (r["d_plus_num"], r["d_minus_num"]) == (2, 2)
        assert r["kuiper_v"] == 1.0


class TestHodgesLehmann:
    def _pv(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, cents long, c_ref long, c_cur long"
        )

    def test_hand_values(self, spark):
        # ref=[1,2], cur=[4,6] → diffs sorted [2,3,4,5]; npairs=4,
        # k1=2, k2=3 → hl=(3,4), shift 3.5; k_ci = max(1, ⌊2 −
        # 1.96·√(4·5/12)⌋) = 1 → CI = (rank 1, rank 4) = (2, 5)
        pv = self._pv(
            spark,
            [("a", 1, 1, 0), ("a", 2, 1, 0), ("a", 4, 0, 1), ("a", 6, 0, 1)],
        )
        [r] = analytics.hl_from_value_counts(pv).collect()
        assert (r["hl_lo_cents"], r["hl_hi_cents"]) == (3, 4)
        assert r["hl_shift_cents"] == 3.5
        assert (r["ci_lo_cents"], r["ci_hi_cents"]) == (2, 5)

    def test_odd_pairs_single_median(self, spark):
        # ref=[0], cur=[7,7,9] → diffs [7,7,9]; npairs=3, k1=k2=2 →
        # hl_lo=hl_hi=7
        pv = self._pv(spark, [("a", 0, 1, 0), ("a", 7, 0, 2), ("a", 9, 0, 1)])
        [r] = analytics.hl_from_value_counts(pv).collect()
        assert (r["hl_lo_cents"], r["hl_hi_cents"]) == (7, 7)
        assert r["hl_shift_cents"] == 7.0

    def test_shift_recovered_exactly(self, spark):
        # cur = ref + 250 cents elementwise → every pairwise diff
        # distribution is symmetric around 250; HL recovers 250
        ref = [100, 150, 225, 300, 475]
        rows = [("a", v, 1, 0) for v in ref] + [("a", v + 250, 0, 1) for v in ref]
        pv = self._pv(spark, rows)
        [r] = analytics.hl_from_value_counts(pv).collect()
        assert r["hl_shift_cents"] == 250.0

    def test_one_sided_type_absent(self, spark):
        pv = self._pv(spark, [("a", 1, 1, 0), ("b", 1, 1, 0), ("b", 3, 0, 1)])
        rows = {r["event_type"] for r in analytics.hl_from_value_counts(pv).collect()}
        assert rows == {"b"}


# ---- wave 2: windowed tail/effect-size members, per-source audit,
#      weekly-shape twin ----

import pyspark.sql.functions as _F  # noqa: E402


def _day_events(spark, rows):
    """rows of (day, event_type, value) -> events frame (5 µs apart)."""
    us = 86400000000
    return spark.createDataFrame(
        [(i, d * us + 5 * i, t, v) for i, (d, t, v) in enumerate(rows)],
        "event_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        _F.expr("timestamp_micros(us)").cast("timestamp_ntz").alias("ts"),
        "event_type",
        "value",
    )


class TestWindowedAndersonDarling:
    def test_hand_values(self, spark):
        # day0: [1,2,3]; day1: [2,3,4] — the TestAndersonDarling
        # fixture as consecutive days: ad_scaled=74000, A²=0.82222…;
        # day2 == day1 → A²=0; day0 absent (no previous day)
        rows = (
            [(0, "a", 1.0), (0, "a", 2.0), (0, "a", 3.0)]
            + [(1, "a", 2.0), (1, "a", 3.0), (1, "a", 4.0)]
            + [(2, "a", 2.0), (2, "a", 3.0), (2, "a", 4.0)]
        )
        got = {
            r["day"]: r
            for r in anomaly.windowed_anderson_darling(
                _day_events(spark, rows)
            ).collect()
        }
        assert set(got) == {1, 2}
        assert got[1]["ad_scaled"] == 74000
        assert got[1]["ad_stat"] == 74000 / (9 * 10000)
        assert got[2]["ad_scaled"] == 0 and got[2]["ad_stat"] == 0.0


class TestWindowedCliffsDelta:
    def test_hand_values(self, spark):
        # day0: [1,2]; day1: [3,4] → every cur value beats every ref
        # (ref=prev day): gt=0, lt=4, ties=0, δ = (0−4)/4 = −1
        # (δ = P(ref>cur) − P(ref<cur)); day2: [3,4] == day1 → all
        # pair classes split 1/1/2, δ=0
        rows = (
            [(0, "a", 0.01), (0, "a", 0.02)]
            + [(1, "a", 0.03), (1, "a", 0.04)]
            + [(2, "a", 0.03), (2, "a", 0.04)]
        )
        got = {
            r["day"]: r
            for r in analytics.windowed_cliffs_delta(
                _day_events(spark, rows)
            ).collect()
        }
        assert set(got) == {1, 2}
        assert (got[1]["gt_pairs"], got[1]["lt_pairs"], got[1]["tie_pairs"]) == (0, 4, 0)
        assert got[1]["delta"] == -1.0
        assert (got[2]["gt_pairs"], got[2]["lt_pairs"], got[2]["tie_pairs"]) == (1, 1, 2)
        assert got[2]["delta"] == 0.0


class TestDedupAgreementBySource:
    def test_cells_sum_to_global(self, spark, sf_dir):
        """Doc-level verdicts partition by source, so the per-source
        2×2 cells must sum exactly to the global audit's cells."""
        from real_time_database_monitoring_system_spark.operators import dedup
        from real_time_database_monitoring_system_spark.sources.registry import load_table

        docs = load_table(spark, sf_dir, "documents")
        [g] = dedup.dedup_agreement_kappa(docs).collect()
        per = dedup.dedup_agreement_by_source(docs).collect()
        assert len(per) >= 2
        for col in ("n_docs", "both_dup", "sig_only", "exact_only"):
            assert sum(r[col] for r in per) == g[col]


def test_stream_dow_gof_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup as sr

    batch = analytics.dow_activity_gof(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_dow_gof(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


# ---- wave 3: cycle-aware and ordered-alternative trend tests ----


class TestSeasonalMannKendall:
    def test_weekly_sawtooth_flat_within_seasons(self, spark):
        # 28 days of a pure weekly cycle (no trend): counts depend on
        # dow only → within every weekday subseries all y equal → S=0
        # everywhere, full ties; plain MK would see the sawtooth.
        rows = []
        for d in range(28):
            for _ in range(1 + (d + 4) % 7):  # dow-shaped volume
                rows.append((d, "a", 1.0))
        got = anomaly.seasonal_mann_kendall(_day_events(spark, rows)).collect()
        assert len(got) == 7
        for r in got:
            assert r["s_stat"] == 0 and r["n_days"] == 4
            # all 4 same-dow days tie: 4·3·13 = 156
            assert r["tie_term"] == 156

    def test_within_season_trend_detected(self, spark):
        # counts strictly increase across same-dow days → S = C(4,2)
        # = +6 in every season (28 days, volume = week index + 1)
        rows = []
        for d in range(28):
            for _ in range(d // 7 + 1):
                rows.append((d, "a", 1.0))
        got = anomaly.seasonal_mann_kendall(_day_events(spark, rows)).collect()
        assert [r["s_stat"] for r in got] == [6] * 7
        assert all(r["tie_term"] == 0 for r in got)


class TestJonckheereTerpstra:
    def _ev(self, spark, rows):
        """rows of (hour, event_type, value) -> events frame."""
        return spark.createDataFrame(
            [(i, h * 3600000000 + i, t, v) for i, (h, t, v) in enumerate(rows)],
            "event_id long, us long, event_type string, value double",
        ).select(
            "event_id",
            _F.expr("timestamp_micros(us)").cast("timestamp_ntz").alias("ts"),
            "event_type",
            "value",
        )

    def test_perfect_ascending_trend(self, spark):
        # hours 0,1,2 with values 1<2<3, one obs each: every cross
        # pair is an ascent → jt2 = 2·3 = 6 (3 pairs, all lt)
        ev = self._ev(spark, [(0, "a", 0.01), (1, "a", 0.02), (2, "a", 0.03)])
        [r] = analytics.jonckheere_terpstra(ev).collect()
        assert r["jt2"] == 6 and r["n_total"] == 3
        assert r["sum_n2"] == 3 and r["grp_t3"] == 0 and r["val_t3"] == 0

    def test_perfect_descending_trend(self, spark):
        ev = self._ev(spark, [(0, "a", 0.03), (1, "a", 0.02), (2, "a", 0.01)])
        [r] = analytics.jonckheere_terpstra(ev).collect()
        assert r["jt2"] == 0  # no ascending pair

    def test_ties_count_half(self, spark):
        # two hours, same value → jt2 = 2·lt + eq = 0 + 1
        ev = self._ev(spark, [(0, "a", 0.05), (5, "a", 0.05)])
        [r] = analytics.jonckheere_terpstra(ev).collect()
        assert r["jt2"] == 1 and r["val_t3"] == 2  # pooled tie 2·1

    def test_null_under_h0_expectation(self, spark):
        # groups of equal size with identical value multisets:
        # jt2 = 2·E[JT] exactly (every cross pair splits evenly)
        rows = [(h, "a", v) for h in (0, 1, 2) for v in (0.01, 0.02)]
        ev = self._ev(spark, rows)
        [r] = analytics.jonckheere_terpstra(ev).collect()
        n, sum_n2 = r["n_total"], r["sum_n2"]
        assert r["jt2"] == (n * n - sum_n2) // 2  # 2·(N²−Σn²)/4


def test_stream_seasonal_mk_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup as sr

    batch = anomaly.seasonal_mann_kendall(
        load_table(spark, sf_dir, "events")
    ).collect()
    stream = sr.stream_seasonal_mann_kendall(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_jonckheere_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup as sr

    batch = analytics.jonckheere_terpstra(
        load_table(spark, sf_dir, "events")
    ).collect()
    stream = sr.stream_jonckheere(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


# ---- wave 4: two-sample scale test + boilerplate mass ----


class TestAnsariBradley:
    def test_hand_values_no_ties(self, spark):
        # ref=[2,3], cur=[1,4] (cur wider): pooled ranks 1..4, scores
        # 1,2,2,1 → AB_ref = 2+2 = 4 → ab_scaled = 40000
        pv = _half_pv(
            spark,
            [("a", 1.0, 0, 1), ("a", 2.0, 1, 0), ("a", 3.0, 1, 0), ("a", 4.0, 0, 1)],
        )
        [r] = anomaly.ab_from_value_counts(pv).collect()
        assert (r["n_ref"], r["n_cur"], r["ab_scaled"]) == (2, 2, 40000)
        assert r["ab_stat"] == 4.0

    def test_tied_span_average_score(self, spark):
        # pooled = [1,1,2] (N=3, scores 1,2,1 → wait: scores by rank:
        # r=1→1, r=2→min(2,2)=2, r=3→1). Values: v=1 ties ranks 1-2
        # (avg score 1.5), v=2 rank 3 (score 1). ref holds one of the
        # tied 1s and the 2 → AB_ref = 1.5 + 1 = 2.5 → 25000.
        pv = _half_pv(spark, [("a", 1.0, 1, 1), ("a", 2.0, 1, 0)])
        [r] = anomaly.ab_from_value_counts(pv).collect()
        assert r["ab_scaled"] == 25000
        assert r["ab_stat"] == 2.5

    def test_wider_half_scores_lower(self, spark):
        # same median, ref tight [5,5], cur wide [1,9]: pooled scores
        # 1,2,2,1 → ref takes the middle (2+2=4), cur the ends (1+1=2)
        pv = _half_pv(
            spark,
            [("a", 1.0, 0, 1), ("a", 5.0, 2, 0), ("a", 9.0, 0, 1)],
        )
        [r] = anomaly.ab_from_value_counts(pv).collect()
        assert r["ab_stat"] == 4.0  # tight half collects the high scores


class TestBoilerplateMass:
    def test_planted_boilerplate(self, spark):
        from real_time_database_monitoring_system_spark.operators import dedup

        # source s1: the same 5-gram sentence in two docs (all grams
        # dup) + one unique doc; s2: all unique
        docs = spark.createDataFrame(
            [
                (1, "s1", "alpha beta gamma delta epsilon"),
                (2, "s1", "alpha beta gamma delta epsilon"),
                (3, "s1", "zeta eta theta iota kappa"),
                (4, "s2", "one two three four five"),
            ],
            "doc_id long, source string, text string",
        )
        got = {r["source"]: r for r in dedup.boilerplate_mass_by_source(docs).collect()}
        # each 5-token doc yields exactly one 5-gram
        assert got["s1"]["n_grams"] == 3
        assert got["s1"]["dup_gram_occurrences"] == 2
        assert got["s1"]["n_distinct_grams"] == 2
        assert got["s1"]["dup_mass_share"] == 2 / 3
        assert got["s2"]["dup_gram_occurrences"] == 0
        assert got["s2"]["dup_mass_share"] == 0.0

    def test_cross_source_repeat_not_dup(self, spark):
        from real_time_database_monitoring_system_spark.operators import dedup

        # the same sentence in two DIFFERENT sources is not
        # boilerplate for either (the per-source criterion)
        docs = spark.createDataFrame(
            [
                (1, "s1", "alpha beta gamma delta epsilon"),
                (2, "s2", "alpha beta gamma delta epsilon"),
            ],
            "doc_id long, source string, text string",
        )
        got = {r["source"]: r for r in dedup.boilerplate_mass_by_source(docs).collect()}
        assert all(r["dup_gram_occurrences"] == 0 for r in got.values())


def test_stream_ansari_bradley_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup as sr

    batch = anomaly.ansari_bradley(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_ansari_bradley(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


# ---- wave 5: windowed panel completion (L2 + rotation-invariant) ----


class TestWindowedCvmKuiper:
    def _got(self, spark, fn):
        rows = (
            [(0, "a", 1.0), (0, "a", 2.0), (0, "a", 3.0)]
            + [(1, "a", 2.0), (1, "a", 3.0), (1, "a", 4.0)]
            + [(2, "a", 2.0), (2, "a", 3.0), (2, "a", 4.0)]
        )
        return {r["day"]: r for r in fn(_day_events(spark, rows)).collect()}

    def test_windowed_cvm_hand_values(self, spark):
        got = self._got(spark, anomaly.windowed_cramer_von_mises)
        assert set(got) == {1, 2}
        assert got[1]["cvm_stat"] == 45 / (36 * 9)  # the AD fixture pair
        assert got[2]["cvm_stat"] == 0.0

    def test_windowed_kuiper_hand_values(self, spark):
        got = self._got(spark, anomaly.windowed_kuiper)
        assert set(got) == {1, 2}
        assert (got[1]["d_plus_num"], got[1]["d_minus_num"]) == (3, 0)
        assert got[1]["kuiper_v"] == 3 / 9
        assert got[2]["kuiper_v"] == 0.0


# ---- wave 6: the dispersion pair's tail-weighted member ----


class TestMoodScale:
    def test_hand_values(self, spark):
        # pooled [1,2,3,4], N=4: dev = 2r−5 ∈ {−3,−1,1,3}. ref={2,3}
        # → m4 = 1+1 = 2; s2 = 9+1+1+9 = 20; s4 = 81+1+1+81 = 164
        pv = _half_pv(
            spark,
            [("a", 1.0, 0, 1), ("a", 2.0, 1, 0), ("a", 3.0, 1, 0), ("a", 4.0, 0, 1)],
        )
        [r] = anomaly.mood_scale_from_value_counts(pv).collect()
        assert (r["n_ref"], r["n_cur"]) == (2, 2)
        assert (r["m4"], r["s2_pool"], r["s4_pool"]) == (2, 20, 164)

    def test_tied_span_midrank(self, spark):
        # pooled [1,1,2], N=3: value 1 spans ranks 1-2, midrank dev =
        # 2·0+2−3 = −1; value 2 dev = 2·2+1−3 = 2. ref = one tied 1 +
        # the 2 → m4 = 1+4 = 5; s2 = 2·1+1·4 = 6; s4 = 2+16 = 18
        pv = _half_pv(spark, [("a", 1.0, 1, 1), ("a", 2.0, 1, 0)])
        [r] = anomaly.mood_scale_from_value_counts(pv).collect()
        assert (r["m4"], r["s2_pool"], r["s4_pool"]) == (5, 6, 18)

    def test_wide_half_scores_higher(self, spark):
        # ref tight at the middle, cur at the ends: Mood's m4 for the
        # TIGHT half is minimal (ends carry the big squared devs)
        pv = _half_pv(
            spark,
            [("a", 1.0, 0, 1), ("a", 5.0, 2, 0), ("a", 9.0, 0, 1)],
        )
        [r] = anomaly.mood_scale_from_value_counts(pv).collect()
        # pooled [1,5,5,9]: devs −3, (2·1+2−4)=0, 2·3+1−4=3 →
        # ref (the two 5s) m4 = 0; E[m4] = n·s2/N = 2·18/4 = 9
        assert r["m4"] == 0
        assert r["s2_pool"] == 18  # 9 + 0 + 9


def test_stream_mood_scale_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import load_table
    from real_time_database_monitoring_system_spark.streaming import rollup as sr

    batch = anomaly.mood_scale_test(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_mood_scale(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
