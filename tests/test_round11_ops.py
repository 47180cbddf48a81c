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
