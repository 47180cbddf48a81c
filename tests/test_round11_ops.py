"""Round-11 operators: planted-fixture checks against brute-force or
closed-form references (the SURVEY §5 strategy — every new statistic
gets an independent small-N recomputation, not just oracle parity,
because the oracle shares the operator's own SQL fragments)."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from real_time_database_monitoring_system_spark.operators import anomaly


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=int(i))


def _two_half_df(spark, ref: np.ndarray, cur: np.ndarray, etype: str = "t"):
    """Events frame whose integer-µs midpoint cleanly splits ref|cur
    (ref in the first 500 s, cur after 1000 s → midpoint ≈ 630 s)."""
    rows = [(etype, _ts(i), float(v)) for i, v in enumerate(ref)] + [
        (etype, _ts(1000 + i), float(v)) for i, v in enumerate(cur)
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def brute_lepage(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float]:
    """Independent O(N log N) Lepage: pooled midranks, tie-aware
    Wilcoxon moments, Ansari–Bradley with span-averaged scores and
    the general linear-rank-statistic null moments."""
    pooled = np.concatenate([x, y])
    N, n, m = len(pooled), len(x), len(y)
    order = np.argsort(pooled, kind="stable")
    sv = pooled[order]
    ranks = np.empty(N)
    ab_s = np.empty(N)
    base = np.minimum(np.arange(1, N + 1), N + 1 - np.arange(1, N + 1)).astype(
        float
    )
    i = 0
    while i < N:
        j = i
        while j < N and sv[j] == sv[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        ab_s[i:j] = base[i:j].mean()
        i = j
    r = np.empty(N)
    r[order] = ranks
    s = np.empty(N)
    s[order] = ab_s
    W = r[:n].sum()
    _, t = np.unique(pooled, return_counts=True)
    tie_cube = float(np.sum(t.astype(np.float64) ** 3 - t))
    var_w = n * m / 12 * ((N + 1) - tie_cube / (N * (N - 1)))
    zw2 = (W - n * (N + 1) / 2) ** 2 / var_w
    AB = s[:n].sum()
    S1, S2 = ab_s.sum(), (ab_s**2).sum()
    var_ab = n * m * (N * S2 - S1**2) / (N**2 * (N - 1))
    zab2 = (AB - n * S1 / N) ** 2 / var_ab
    return zw2, zab2, zw2 + zab2


class TestLepage:
    def test_matches_bruteforce_with_ties(self, spark):
        rng = np.random.default_rng(7)
        ref = np.round(rng.normal(10, 2, 300), 1)  # heavy ties
        cur = np.round(rng.normal(11, 3.5, 260), 1)  # shift AND spread
        zw2, zab2, lp = brute_lepage(ref, cur)
        row = anomaly.lepage_test(_two_half_df(spark, ref, cur)).collect()[0]
        assert row["n_ref"] == 300 and row["n_cur"] == 260
        # AB second moment carries a 1e-4 fixed-point term per distinct
        # value — agreement bound reflects that, not float noise
        assert row["w_z2"] == pytest.approx(zw2, rel=1e-12)
        assert row["ab_z2"] == pytest.approx(zab2, rel=1e-6)
        assert row["lepage_stat"] == pytest.approx(lp, rel=1e-6)

    def test_null_case_is_small(self, spark):
        """Identical halves → both z² ≈ 0 (location and scale agree)."""
        rng = np.random.default_rng(11)
        vals = np.round(rng.normal(5, 1, 400), 2)
        row = anomaly.lepage_test(
            _two_half_df(spark, vals[:200], vals[200:])
        ).collect()[0]
        assert row["lepage_stat"] < 8.0  # χ²₂ 98th pct ≈ 7.8

    def test_scale_only_shift_moves_ab_component(self, spark):
        """Same median, doubled spread: the AB half must dominate —
        the regression MWU alone misses (the operator's raison
        d'être)."""
        rng = np.random.default_rng(3)
        ref = np.round(rng.normal(0, 1, 500), 2)
        cur = np.round(rng.normal(0, 3, 500), 2)
        row = anomaly.lepage_test(_two_half_df(spark, ref, cur)).collect()[0]
        assert row["ab_z2"] > 30.0
        assert row["ab_z2"] > 5 * row["w_z2"]

    def test_degenerate_all_tied_yields_null_components(self, spark):
        """Every pooled value identical → tie_term = 0 and Var(AB) = 0:
        both guards must emit NULL, not divide by zero."""
        ref = np.full(50, 2.5)
        cur = np.full(60, 2.5)
        row = anomaly.lepage_test(_two_half_df(spark, ref, cur)).collect()[0]
        assert row["w_z2"] is None
        assert row["ab_z2"] is None
        assert row["lepage_stat"] is None

    def test_single_half_type_drops(self, spark):
        """A type living entirely in one temporal half has no
        two-sample statistic — the mannwhitney_u drop convention."""
        rows = [("only_ref", _ts(i), float(i)) for i in range(10)] + [
            ("both", _ts(i), float(i)) for i in range(10)
        ] + [("both", _ts(1000 + i), float(i)) for i in range(10)]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        out = {r["event_type"] for r in anomaly.lepage_test(df).collect()}
        assert out == {"both"}


class TestWindowedByCohort:
    def _planted(self, spark):
        """Three days × two cohorts: cohort 0 stays N(10,1)-ish every
        day; cohort 1 jumps by +5 on day 2 — only cohort 1's day-2
        rows should light up. Cohort comes from props {"k": ...}
        (k<25 → cohort 0, 25≤k<50 → cohort 1); one props-less row
        lands in cohort -1."""
        rng = np.random.default_rng(5)
        rows = []
        for day in range(3):
            base = datetime.datetime(2024, 3, 1 + day)
            for i in range(120):
                ts = base + datetime.timedelta(seconds=int(i))
                v0 = float(np.round(rng.normal(10, 1), 1))
                shift = 5.0 if day == 2 else 0.0
                v1 = float(np.round(rng.normal(10 + shift, 1), 1))
                rows.append(("t", ts, v0, '{"k": 3}'))
                rows.append(("t", ts, v1, '{"k": 30}'))
        rows.append(("t", datetime.datetime(2024, 3, 1), 9.9, None))
        return spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double, props string"
        )

    def test_ks_names_the_drifting_cohort(self, spark):
        from real_time_database_monitoring_system_spark.operators.anomaly import (
            windowed_ks_by_cohort,
        )

        out = {
            (r["cohort"], r["day"]): r["ks_d"]
            for r in windowed_ks_by_cohort(self._planted(spark)).collect()
        }
        days = sorted({d for _, d in out})
        assert len(days) == 2  # day 1 vs 0, day 2 vs 1
        d2 = days[1]
        assert out[(1, d2)] > 0.9  # the +5 jump saturates KS
        assert out[(0, d2)] < 0.35  # stable cohort stays quiet
        assert (-1, d2) not in out  # props-less cohort: day-0 only

    def test_w1_magnitude_matches_the_planted_shift(self, spark):
        from real_time_database_monitoring_system_spark.operators.analytics import (
            windowed_wasserstein_by_cohort,
        )

        out = {
            (r["cohort"], r["day"]): r["w1_value"]
            for r in windowed_wasserstein_by_cohort(
                self._planted(spark)
            ).collect()
        }
        days = sorted({d for _, d in out})
        d2 = days[1]
        assert out[(1, d2)] == pytest.approx(5.0, abs=0.6)
        assert out[(0, d2)] < 0.6

    def test_cohort_panel_refines_the_global_panel(self, spark):
        """Summing each cohort's (n_ref, n_cur) per day must reproduce
        the global windowed_ks day totals — the cohort axis partitions
        the feed, it must not drop or double-count rows."""
        from real_time_database_monitoring_system_spark.operators.anomaly import (
            windowed_ks,
            windowed_ks_by_cohort,
        )

        df = self._planted(spark)
        by_c = windowed_ks_by_cohort(df).collect()
        tot: dict[int, tuple[int, int]] = {}
        for r in by_c:
            a, b = tot.get(r["day"], (0, 0))
            tot[r["day"]] = (a + r["n_ref"], b + r["n_cur"])
        glob = {
            r["day"]: (r["n_ref"], r["n_cur"])
            for r in windowed_ks(df).collect()
        }
        # the props-less row exists only on day 0, so every scored
        # day's totals match exactly... except day 1 whose REF side
        # includes day 0 (240 + the 1 props-less ref row)
        days = sorted(glob)
        assert tot[days[1]] == glob[days[1]]
        d1_by_c = tot[days[0]]
        d1_glob = glob[days[0]]
        assert d1_glob[0] - d1_by_c[0] == 1  # the cohort -1 ref row
        assert d1_by_c[1] == d1_glob[1]


def _level_shift_df(spark, days=40, rows_per_day=50, shift_day=25, shift=3.0,
                    seed=13):
    rng = np.random.default_rng(seed)
    rows, planted = [], []
    for d in range(days):
        mu = 10.0 + (shift if d >= shift_day else 0.0)
        vals = np.round(rng.normal(mu, 1.0, rows_per_day), 2)
        planted.append(vals)
        base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        rows += [
            ("t", base + datetime.timedelta(seconds=int(i)), float(v))
            for i, v in enumerate(vals)
        ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    ), planted


DAY0 = 19723  # 2024-01-01 as integer day


class TestPettitt:
    def test_matches_bruteforce_and_finds_the_shift(self, spark):
        df, planted = _level_shift_df(spark)
        # brute force on exact scaled daily means (sign algebra only)
        s = [int(np.round(v * 100).sum()) for v in planted]
        c = [len(v) for v in planted]
        T = len(s)

        def sgn(i, j):
            a, b = s[j] * c[i], s[i] * c[j]
            return (a > b) - (a < b)

        U = [
            sum(sgn(i, j) for i in range(t) for j in range(t, T))
            for t in range(1, T + 1)
        ]
        K = max(abs(u) for u in U)
        tau = min(t for t, u in enumerate(U) if abs(u) == K)
        p = round(min(1.0, 2 * np.exp(-6 * K * K / (T**3 + T**2))), 9)
        row = anomaly.pettitt_test(df).collect()[0]
        assert row["k_stat"] == K
        assert row["change_day"] == DAY0 + tau
        assert row["n_days"] == T
        assert row["p_approx"] == pytest.approx(p, abs=1e-9)
        # the planted break is at day index 25 → split at 24
        assert row["change_day"] == DAY0 + 24

    def test_no_change_is_insignificant(self, spark):
        df, _ = _level_shift_df(spark, shift=0.0, seed=21)
        row = anomaly.pettitt_test(df).collect()[0]
        assert row["p_approx"] > 0.05


class TestPageHinkley:
    def test_matches_bruteforce_sequential_replay(self, spark):
        df, planted = _level_shift_df(spark)
        s = [int(np.round(v * 100).sum()) for v in planted]
        c = [len(v) for v in planted]
        mu = [(si * 10000) // ci for si, ci in zip(s, c)]
        cum = cumxb = 0
        mn = mx = None
        phu_max = phd_max = 0
        first = None
        nal = 0
        for t, m_ in enumerate(mu, 1):
            cum += m_
            cumxb += cum // t
            m_up = (cum - cumxb) - t * 250000
            m_dn = (cum - cumxb) + t * 250000
            mn = m_up if mn is None else min(mn, m_up)
            mx = m_dn if mx is None else max(mx, m_dn)
            phu, phd = m_up - mn, mx - m_dn
            phu_max, phd_max = max(phu_max, phu), max(phd_max, phd)
            if phu > 2000000 or phd > 2000000:
                nal += 1
                first = first if first is not None else t
        row = anomaly.page_hinkley(df).collect()[0]
        assert row["ph_up_max"] == pytest.approx(phu_max / 1e6, abs=1e-9)
        assert row["ph_dn_max"] == pytest.approx(phd_max / 1e6, abs=1e-9)
        assert row["first_alarm_day"] == DAY0 + first - 1
        assert row["n_alarm_days"] == nal
        # the upward shift must alarm shortly after the planted break
        assert DAY0 + 25 <= row["first_alarm_day"] <= DAY0 + 27

    def test_downward_shift_alarms_the_other_side(self, spark):
        df, _ = _level_shift_df(spark, shift=-3.0, seed=9)
        row = anomaly.page_hinkley(df).collect()[0]
        assert row["ph_dn_max"] > row["ph_up_max"]
        assert row["first_alarm_day"] is not None

    def test_stable_series_never_alarms(self, spark):
        df, _ = _level_shift_df(spark, shift=0.0, seed=4)
        row = anomaly.page_hinkley(df).collect()[0]
        assert row["n_alarm_days"] == 0
        assert row["first_alarm_day"] is None


class TestWindowedLepage:
    def test_day_pair_matches_the_two_sample_operator(self, spark):
        """Each (day, previous-day) row must equal lepage_test run on
        the same two samples directly — the windowed variant is the
        two-sample statistic under a sliding pairing, nothing else."""
        rng = np.random.default_rng(17)
        day_vals = [
            np.round(rng.normal(10, 1, 150), 1),       # day 0
            np.round(rng.normal(10, 1, 140), 1),       # day 1: null
            np.round(rng.normal(12, 2.5, 160), 1),     # day 2: shift+scale
        ]
        rows = []
        for d, vals in enumerate(day_vals):
            base = datetime.datetime(2024, 5, 1) + datetime.timedelta(days=d)
            rows += [
                ("t", base + datetime.timedelta(seconds=int(i)), float(v))
                for i, v in enumerate(vals)
            ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        win = {
            r["day"]: r for r in anomaly.windowed_lepage(df).collect()
        }
        assert len(win) == 2  # day1 vs day0, day2 vs day1
        for d in (1, 2):
            ref, cur = day_vals[d - 1], day_vals[d]
            direct = anomaly.lepage_test(
                _two_half_df(spark, ref, cur)
            ).collect()[0]
            got = win[min(win) + (d - 1)]
            assert got["n_ref"] == len(ref) and got["n_cur"] == len(cur)
            assert got["lepage_stat"] == pytest.approx(
                direct["lepage_stat"], rel=1e-12
            )
        # and the day-2 row must dwarf the null day-1 row
        days = sorted(win)
        assert win[days[1]]["lepage_stat"] > 10 * win[days[0]]["lepage_stat"]


class TestFriedman:
    @staticmethod
    def _brute(mat: np.ndarray):
        n, k = mat.shape
        ranks = np.zeros_like(mat, dtype=float)
        for d in range(n):
            row = mat[d]
            order = np.argsort(row, kind="stable")
            r = np.empty(k)
            sv = row[order]
            i = 0
            while i < k:
                j = i
                while j < k and sv[j] == sv[i]:
                    j += 1
                r[i:j] = (i + 1 + j) / 2.0
                i = j
            rr = np.empty(k)
            rr[order] = r
            ranks[d] = rr
        R = ranks.sum(axis=0)
        A = (ranks**2).sum()
        C = n * k * (k + 1) ** 2 / 4
        num = (k - 1) * ((R - n * (k + 1) / 2) ** 2).sum()
        return R, (num / (A - C) if A > C else None)

    def _build(self, spark, seed=23, favored=3, n_days=30, k=4):
        from real_time_database_monitoring_system_spark.operators import (
            analytics,
        )

        rng = np.random.default_rng(seed)
        rows = []
        mat = np.zeros((n_days, k))
        for d in range(n_days):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            daylevel = rng.normal(0, 5)  # strong shared day effect
            for j in range(k):
                mu = 20 + daylevel + (2.0 if j == favored else 0.0)
                vals = np.round(rng.normal(mu, 1, 40), 2)
                s = int(np.round(vals * 100).sum())
                mat[d, j] = s / len(vals)
                rows += [
                    (
                        f"t{j}",
                        base + datetime.timedelta(seconds=int(i) + 100 * j),
                        float(v),
                    )
                    for i, v in enumerate(vals)
                ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        return analytics.friedman_test(df), mat

    def test_matches_bruteforce_and_classical_form(self, spark):
        out, mat = self._build(spark)
        R, chi2 = self._brute(mat)
        n, k = mat.shape
        chi2_classic = 12 / (n * k * (k + 1)) * (R**2).sum() - 3 * n * (k + 1)
        rows = {r["event_type"]: r for r in out.collect()}
        assert len(rows) == k
        for j in range(k):
            assert rows[f"t{j}"]["r2_sum"] == int(round(2 * R[j]))
            assert rows[f"t{j}"]["chi2_f"] == pytest.approx(chi2, rel=1e-12)
        # no ties in this fixture → the classical form must agree too
        assert rows["t0"]["chi2_f"] == pytest.approx(chi2_classic, rel=1e-9)
        # the favored type consistently ranks top despite the ±5 day
        # effect (exactly the signal kruskal_wallis would drown)
        assert rows["t3"]["mean_rank"] == max(
            rows[f"t{j}"]["mean_rank"] for j in range(k)
        )
        assert chi2 > 20

    def test_incomplete_blocks_drop(self, spark):
        """A day missing one type must not contribute to any rank sum
        (complete-block requirement): n_blocks excludes it."""
        from real_time_database_monitoring_system_spark.operators import (
            analytics,
        )

        rows = []
        for d in range(4):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            for j in range(3):
                if d == 2 and j == 1:
                    continue  # day 2 missing t1
                rows += [
                    (f"t{j}", base + datetime.timedelta(seconds=i), float(10 + j))
                    for i in range(5)
                ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        out = analytics.friedman_test(df).collect()
        assert all(r["n_blocks"] == 3 for r in out)
        # constant per-type values → untied ranks 1,2,3 per day:
        # doubled rank sums = 3 days × (2, 4, 6)
        rows_d = {r["event_type"]: r["r2_sum"] for r in out}
        assert rows_d == {"t0": 3 * 2, "t1": 3 * 4, "t2": 3 * 6}


class TestCohortChangepointAndSummary:
    def _planted(self, spark):
        """Two cohorts, 20 days: cohort 0 flat at 10; cohort 1 jumps
        +4 from day 12 — attribution must name cohort 1 with a break
        at the last pre-shift day, and the summary must name cohort 1
        as the worst mover on the jump day."""
        rng = np.random.default_rng(31)
        rows = []
        for d in range(20):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            for i in range(60):
                ts = base + datetime.timedelta(seconds=int(i))
                rows.append(
                    ("t", ts, float(np.round(rng.normal(10, 0.5), 1)),
                     '{"k": 3}')
                )
                mu = 14.0 if d >= 12 else 10.0
                rows.append(
                    ("t", ts, float(np.round(rng.normal(mu, 0.5), 1)),
                     '{"k": 30}')
                )
        return spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double, props string"
        )

    def test_pettitt_by_cohort_names_the_cohort_and_day(self, spark):
        out = {
            r["cohort"]: r
            for r in anomaly.pettitt_by_cohort(self._planted(spark)).collect()
        }
        assert out[1]["change_day"] == DAY0 + 11  # split after day 11
        assert out[1]["p_approx"] < 0.005  # saturated K at T=20 days
        assert out[0]["p_approx"] > 0.05
        # the +4σ·8 jump separates every pre/post day pair: K saturates
        # at 12·8 = 96; the flat cohort's K is random-walk noise with an
        # insignificant p (asserted above), not a comparable magnitude
        assert out[1]["k_stat"] == 96

    def test_summary_names_the_worst_cohort(self, spark):
        from real_time_database_monitoring_system_spark.operators.analytics import (
            cohort_drift_summary,
        )

        rows = {
            r["day"]: r
            for r in cohort_drift_summary(self._planted(spark)).collect()
        }
        jump_day = DAY0 + 12
        assert rows[jump_day]["worst_cohort"] == 1
        assert rows[jump_day]["w1_max"] == pytest.approx(4.0, abs=0.4)
        # one cohort owns the drift → spread ≈ the whole magnitude
        assert rows[jump_day]["w1_spread"] > 3.0
        # a quiet day: both cohorts near zero
        quiet = rows[DAY0 + 5]
        assert quiet["w1_max"] < 0.5
        assert quiet["n_cohorts"] == 2


class TestPageHinkleyByCohort:
    def test_only_the_shifted_cohort_alarms(self, spark):
        """Cohort 1 drifts upward by +4 from day 12 (≫ λ = 2.0 value
        units); cohort 0 stays flat with tiny noise — the attribution
        monitor must alarm on cohort 1 shortly after the break and
        stay silent on cohort 0."""
        rng = np.random.default_rng(41)
        rows = []
        for d in range(25):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            for i in range(80):
                ts = base + datetime.timedelta(seconds=int(i))
                rows.append(
                    ("t", ts, float(np.round(rng.normal(10, 0.2), 2)),
                     '{"k": 3}')
                )
                mu = 14.0 if d >= 12 else 10.0
                rows.append(
                    ("t", ts, float(np.round(rng.normal(mu, 0.2), 2)),
                     '{"k": 30}')
                )
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double, props string"
        )
        out = {
            r["cohort"]: r for r in anomaly.page_hinkley_by_cohort(df).collect()
        }
        assert out[0]["n_alarm_days"] == 0
        assert out[1]["n_alarm_days"] > 0
        assert DAY0 + 12 <= out[1]["first_alarm_day"] <= DAY0 + 14
        assert out[1]["ph_up_max"] > out[1]["ph_dn_max"]


class TestQuade:
    def test_matches_bruteforce_and_weights_informative_days(self, spark):
        from real_time_database_monitoring_system_spark.operators import (
            analytics,
        )

        def midranks(vals):
            order = np.argsort(vals, kind="stable")
            r = np.empty(len(vals))
            sv = np.asarray(vals, dtype=float)[order]
            i = 0
            while i < len(vals):
                j = i
                while j < len(vals) and sv[j] == sv[i]:
                    j += 1
                r[i:j] = (i + 1 + j) / 2.0
                i = j
            out = np.empty(len(vals))
            out[order] = r
            return out

        rng_g = np.random.default_rng(29)
        n_days, k = 24, 4
        rows = []
        mat = np.zeros((n_days, k), dtype=np.int64)
        for d in range(n_days):
            base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            daylevel = rng_g.normal(0, 3)
            sep = 3.0 if d % 3 == 0 else 0.3  # informative vs quiet days
            for j in range(k):
                mu = 20 + daylevel + sep * j / 2
                vals = np.round(rng_g.normal(mu, 0.5, 30), 2)
                s = int(np.round(vals * 100).sum())
                mat[d, j] = (s * 10000) // len(vals)
                rows += [
                    (
                        f"t{j}",
                        base + datetime.timedelta(seconds=int(i) + 100 * j),
                        float(v),
                    )
                    for i, v in enumerate(vals)
                ]
        ranks = np.array([midranks(row) for row in mat])
        rng_d = mat.max(axis=1) - mat.min(axis=1)
        Q = midranks(rng_d)
        S = Q[:, None] * (ranks - (k + 1) / 2)
        Sj = S.sum(axis=0)
        A, B = (S**2).sum(), (Sj**2).sum() / n_days
        f_ref = (n_days - 1) * B / (A - B)
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        out = {r["event_type"]: r for r in analytics.quade_test(df).collect()}
        for j in range(k):
            assert out[f"t{j}"]["s4_sum"] == int(round(4 * Sj[j]))
            assert out[f"t{j}"]["quade_f"] == pytest.approx(f_ref, rel=1e-12)
        # the ordered separation on informative days must surface:
        # monotone weighted scores across the planted order
        s4s = [out[f"t{j}"]["s4_sum"] for j in range(k)]
        assert s4s == sorted(s4s)
        assert f_ref > 10

    def test_no_information_yields_null_f(self, spark):
        """All types identical every day → every rank tied at the
        center, every S4 = 0 → n·a16 = b16n = 0 → NULL F."""
        from real_time_database_monitoring_system_spark.operators import (
            analytics,
        )

        rows = []
        for d in range(5):
            base = datetime.datetime(2024, 2, 1) + datetime.timedelta(days=d)
            for j in range(3):
                rows += [
                    (f"t{j}", base + datetime.timedelta(seconds=i), 7.0)
                    for i in range(4)
                ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        out = analytics.quade_test(df).collect()
        assert all(r["quade_f"] is None for r in out)
        assert all(r["s4_sum"] == 0 for r in out)


class TestSourceLengthDrift:
    def test_matches_bruteforce_one_vs_rest(self, spark):
        from real_time_database_monitoring_system_spark.operators import (
            pipeline,
        )

        rng = np.random.default_rng(47)
        rows = []
        lengths = {}
        # srcA long-shifted, srcB matches the rest
        for s, mu in [("a", 140), ("b", 100), ("c", 100), ("d", 101)]:
            ls = np.maximum(1, rng.normal(mu, 10, 200).astype(int))
            lengths[s] = ls
            rows += [(f"doc{(s,i)}", "x" * 3, "en", s, int(v))
                     for i, v in enumerate(ls)]
        df = spark.createDataFrame(
            rows, "doc_id string, text string, lang string, source string,"
            " n_chars long"
        )

        def brute(src):
            own = np.sort(lengths[src])
            rest = np.sort(
                np.concatenate([v for k, v in lengths.items() if k != src])
            )
            allv = np.unique(np.concatenate([own, rest]))
            Fo = np.searchsorted(own, allv, side="right") / len(own)
            Fr = np.searchsorted(rest, allv, side="right") / len(rest)
            ks = np.max(np.abs(Fo - Fr))
            gt = sum((rest > v).sum() for v in own)  # rest above own
            lt = sum((rest < v).sum() for v in own)
            delta = (gt - lt) / (len(own) * len(rest))
            return ks, delta

        out = {
            r["source"]: r
            for r in pipeline.source_length_drift(df).collect()
        }
        for s in "abcd":
            ks, delta = brute(s)
            assert out[s]["n_cur"] == 200
            assert out[s]["n_ref"] == 600
            assert out[s]["ks_d"] == pytest.approx(ks, rel=1e-12)
            # operator delta = P(ref > cur) - P(ref < cur): rest vs own
            assert out[s]["delta"] == pytest.approx(delta, rel=1e-9)
        # the long source must dominate the panel, signed the right way
        # (note: a's shift contaminates every OTHER source's "rest",
        # so b/c/d read nonzero too — one-vs-rest semantics)
        assert out["a"]["ks_d"] == max(out[s]["ks_d"] for s in "abcd")
        assert out["a"]["ks_d"] > 2 * out["b"]["ks_d"]
        assert out["a"]["delta"] < -0.8  # rest is BELOW the long source
