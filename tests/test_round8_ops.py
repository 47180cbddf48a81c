"""Behavior tests for the round-8 operators: interpolated
counts-based quantiles, day-over-day windowed PSI (batch + the
watermarked streaming twin), perplexity outliers, quality×dup
calibration, winnowing longest-run, embedding norm audit, and the
mix rebalance plan — planted fixtures with hand-computable truth,
plus plan budgets (exchange counts, no cartesian products)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import (
    anomaly,
    curation,
    dedup,
    pipeline,
    similarity,
)
from real_time_database_monitoring_system_spark.operators.util import (
    cont_quantiles_from_counts,
)
from real_time_database_monitoring_system_spark.plans import checks


# ------------------------------------------------------------------
# cont_quantiles_from_counts
# ------------------------------------------------------------------


def _vals(spark, rows):
    return spark.createDataFrame(
        [(g, float(v)) if v is not None else (g, None) for g, v in rows],
        "g string, x double",
    )


def test_cont_quantiles_matches_builtin_percentile(spark):
    """The counts replica must reproduce Spark's own `percentile`
    aggregate (the SQL continuous/type-7 definition) on an irregular
    multiset — including tied values, which is where rank bookkeeping
    slips first."""
    data = [("a", v) for v in [1.0, 2.0, 2.0, 2.0, 7.5, 9.0, 10.0]] + [
        ("b", v) for v in [5.0, 1.0]
    ]
    df = _vals(spark, data)
    got = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in cont_quantiles_from_counts(
            df, ["g"], "x", [("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)]
        ).collect()
    }
    ref = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(x, 0.25)").alias("p25"),
            F.expr("percentile(x, 0.5)").alias("p50"),
            F.expr("percentile(x, 0.95)").alias("p95"),
        )
        .collect()
    }
    for g in ref:
        for a, b in zip(got[g], ref[g]):
            assert a == pytest.approx(b, rel=1e-12), (g, got[g], ref[g])


def test_cont_quantiles_exact_interpolation_closed_form(spark):
    """n=4 values 0,10,20,30: p50 rank h=1.5 → 10 + 0.5·10 = 15;
    p25 h=0.75 → 7.5; q=1 → max. Exact doubles, no tolerance."""
    df = _vals(spark, [("a", 0.0), ("a", 10.0), ("a", 20.0), ("a", 30.0)])
    row = cont_quantiles_from_counts(
        df, ["g"], "x", [("p25", 1, 4), ("p50", 1, 2), ("p100", 1, 1)]
    ).collect()[0]
    assert (row["p25"], row["p50"], row["p100"]) == (7.5, 15.0, 30.0)


def test_cont_quantiles_null_group_emits_null(spark):
    df = _vals(spark, [("a", 1.0), ("b", None)])
    rows = {
        r["g"]: r["p50"]
        for r in cont_quantiles_from_counts(
            df, ["g"], "x", [("p50", 1, 2)]
        ).collect()
    }
    assert rows["a"] == 1.0 and rows["b"] is None


# ------------------------------------------------------------------
# windowed PSI
# ------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _events(spark, rows):
    """rows: (event_id, day, value) → events-shaped frame (NTZ ts)."""
    return spark.createDataFrame(
        [
            (eid, d * _DAY_US + 1_000_000 * eid, "t", float(v))
            for eid, d, v in rows
        ],
        "event_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        F.expr("cast(timestamp_micros(us) as timestamp_ntz)").alias("ts"),
        "event_type",
        "value",
    )


def test_windowed_psi_identical_days_score_zero(spark):
    """Two days with the identical value distribution → every PSI
    term is exactly 0 (equal smoothed shares, ln(1) = 0)."""
    rows = [(i, 0, 10.0 * (i % 5)) for i in range(20)] + [
        (100 + i, 1, 10.0 * (i % 5)) for i in range(20)
    ]
    out = anomaly.windowed_psi(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0 and out[0]["drift_class"] == "stable"
    assert out[0]["n_ref"] == 20 and out[0]["n_cur"] == 20


def test_windowed_psi_shifted_day_scores_positive_and_gaps_skip(spark):
    """Day 2 moves all mass to a different bin → large PSI. Day 5
    (after a gap — day 4 missing) must NOT be scored: a sliding
    reference is the PREVIOUS day, not the previous observation."""
    rows = (
        [(i, 1, 10.0) for i in range(10)]
        + [(100 + i, 2, 450.0) for i in range(10)]
        + [(200 + i, 3, 450.0) for i in range(10)]
        + [(300 + i, 5, 450.0) for i in range(10)]
    )
    out = {r["day"]: r for r in anomaly.windowed_psi(_events(spark, rows)).collect()}
    base_day = min(out)  # day index of the first SCORED day (=2)
    assert sorted(d - base_day for d in out) == [0, 1]
    assert out[base_day]["psi"] > 0.25
    assert out[base_day]["drift_class"] == "drifted"
    assert out[base_day + 1]["psi"] == 0.0  # day3 vs day2: identical


def test_stream_windowed_psi_equals_batch_on_finalized_days(spark, sf_dir):
    """availableNow append-mode result == the batch operator
    restricted to days finalized by the final watermark; the trailing
    day is withheld by design (watermark semantics, probed: a window
    emits iff end ≤ max event time − lateness)."""
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )
    from real_time_database_monitoring_system_spark.streaming import rollup

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["event_type"], r["day"]): (r["n_ref"], r["n_cur"], r["psi"])
        for r in anomaly.windowed_psi(events).collect()
    }
    stream = {
        (r["event_type"], r["day"]): (r["n_ref"], r["n_cur"], r["psi"])
        for r in rollup.stream_windowed_psi(spark, sf_dir).collect()
    }
    wm_ms = (
        events.filter(F.col("value").isNotNull())
        .agg(F.expr("max(unix_micros(cast(ts as timestamp))) div 1000").alias("m"))
        .collect()[0]["m"]
        - 3_600_000
    )
    finalized = {
        k: v for k, v in batch.items() if (k[1] + 1) * 86_400_000 <= wm_ms
    }
    assert stream == finalized
    assert len(batch) > len(finalized)  # the trailing day was withheld


# ------------------------------------------------------------------
# doc_perplexity_outliers
# ------------------------------------------------------------------


def test_doc_perplexity_outlier_flags_planted_garble(spark):
    """One source: many typical docs sharing a vocabulary, one doc of
    unique gibberish tokens (each appears once in the corpus → lowest
    possible token probabilities). The gibberish doc must be the one
    outlier; a clean twin corpus must flag none."""
    typical = [
        (i, "the cat sat on the mat and the dog sat too", "s0")
        for i in range(30)
    ]
    garble = [(99, "zq9 xv7 qqj kkz wypt vvx mmq ppz", "s0")]
    df = spark.createDataFrame(
        typical + garble, "doc_id long, text string, source string"
    )
    out = pipeline.doc_perplexity_outliers(df).collect()
    assert len(out) == 1
    assert out[0]["n_outliers"] == 1
    assert out[0]["outlier_rate"] == pytest.approx(1 / 31)
    clean = spark.createDataFrame(typical, "doc_id long, text string, source string")
    out2 = pipeline.doc_perplexity_outliers(clean).collect()
    assert out2[0]["n_outliers"] == 0


# ------------------------------------------------------------------
# quality_calibration_curve
# ------------------------------------------------------------------


def test_quality_calibration_totals_and_dup_mass(spark):
    """Decile doc counts must sum to the corpus; planted exact
    duplicates (and only they) must appear as dup mass."""
    base = [
        (i, f"alpha beta gamma delta w{i} x{i} y{i} z{i} unique tokens here now", "s", "en")
        for i in range(40)
    ]
    dups = [(100 + i, "copy copy copy copy copy", "s", "en") for i in range(4)]
    df = spark.createDataFrame(
        base + dups, "doc_id long, text string, source string, lang string"
    )
    out = curation.quality_calibration_curve(df).collect()
    assert sum(r["n_docs"] for r in out) == 44
    assert sum(r["n_dup"] for r in out) == 4
    for r in out:
        assert r["dup_rate"] == pytest.approx(r["n_dup"] / r["n_docs"])
    # the 4 copies are identical → identical quality → one decile
    assert sum(1 for r in out if r["n_dup"] > 0) == 1


# ------------------------------------------------------------------
# winnow_longest_run
# ------------------------------------------------------------------


def test_winnow_longest_run_contiguous_beats_scattered(spark):
    """Doc pair A/B shares one long verbatim passage; pair A/C shares
    the same number of fingerprints but scattered (no adjacency).
    longest_run must separate them while n_matches alone cannot."""
    passage = "one two three four five six seven eight nine ten eleven twelve"
    a = (1, f"{passage} tail0 tail1 tail2")
    b = (2, f"head0 head1 head2 {passage}")
    # C interleaves the passage's trigram sources so fingerprints may
    # match individually but never consecutively
    c = (3, "one two three zz1 five six seven zz2 nine ten eleven zz3")
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.winnow_longest_run(
            spark.createDataFrame([a, b, c], "doc_id long, text string")
        ).collect()
    }
    ab = out[(1, 2)]
    assert ab["longest_run"] >= 3
    assert ab["est_run_tokens"] == ab["longest_run"] - 1 + 6
    if (1, 3) in out:
        assert out[(1, 3)]["longest_run"] < ab["longest_run"]


def test_winnow_longest_run_verbatim_copy_spans_doc(spark):
    """An exact copy shares every fingerprint consecutively: the
    longest run is the whole collapsed fingerprint sequence."""
    text = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 a13 a14"
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    out = dedup.winnow_longest_run(df).collect()
    assert len(out) == 1
    assert out[0]["longest_run"] == out[0]["n_matches"]


# ------------------------------------------------------------------
# embedding_norm_audit
# ------------------------------------------------------------------


def test_embedding_norm_audit_closed_form(spark):
    """Hand-computed norms, a planted zero vector, and a mixed-dim
    label."""
    rows = [
        (1, [3.0, 4.0], 0),      # norm 5
        (2, [0.0, 0.0], 0),      # zero vector
        (3, [1.0, 0.0, 0.0], 1),  # dim mismatch vs row 4
        (4, [2.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in similarity.embedding_norm_audit(df).collect()}
    assert out[0]["n_vecs"] == 2 and out[0]["n_zero"] == 1
    assert out[0]["min_norm"] == 0.0 and out[0]["max_norm"] == 5.0
    assert out[0]["avg_norm"] == pytest.approx(2.5)
    assert out[1]["n_dims"] == 2  # mixed dims detected
    assert out[1]["n_zero"] == 0


# ------------------------------------------------------------------
# mix_rebalance_plan
# ------------------------------------------------------------------


def test_mix_rebalance_equalizes_and_respects_supply(spark):
    """3 sources with 100/200/700 tokens, equal target → the scarcest
    source caps the budget: B = min(n·10⁶ div ppm) with ppm=333333 →
    B = 300000·... per-source keep ≤ supply, keeps equal within
    rounding, rate ≤ 1."""
    rows = []
    did = 0
    for src, n in (("a", 100), ("b", 200), ("c", 700)):
        rows.append((did, " ".join(f"t{i}" for i in range(n)), src))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in pipeline.mix_rebalance_plan(df).collect()}
    assert {r["ppm"] for r in out.values()} == {333333}
    budget = {r["budget_tokens"] for r in out.values()}
    assert len(budget) == 1
    b = budget.pop()
    assert b == min(n * 1_000_000 // 333333 for n in (100, 200, 700))
    keeps = {s: r["keep_tokens"] for s, r in out.items()}
    assert len(set(keeps.values())) == 1  # equalized
    for s, n in (("a", 100), ("b", 200), ("c", 700)):
        assert keeps[s] <= n
        assert 0.0 < out[s]["sampling_rate"] <= 1.0
    # the scarcest source is fully consumed up to ppm-truncation loss
    # (keep = B·ppm div 10⁶ loses ≤1 token per source)
    assert out["a"]["sampling_rate"] >= 0.98


def test_mix_rebalance_explicit_targets(spark):
    """Explicit ppm targets: a zero-target source keeps nothing and
    must not constrain the budget."""
    rows = [
        (1, " ".join(f"x{i}" for i in range(50)), "keep"),
        (2, " ".join(f"y{i}" for i in range(50)), "drop"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r
        for r in pipeline.mix_rebalance_plan(
            df, target_ppm={"keep": 1_000_000, "drop": 0}
        ).collect()
    }
    assert out["drop"]["keep_tokens"] == 0
    assert out["keep"]["keep_tokens"] == 50
    assert out["keep"]["sampling_rate"] == 1.0


# ------------------------------------------------------------------
# plan budgets
# ------------------------------------------------------------------


def test_round8_shuffle_budgets(spark, sf_dir):
    """Exchange-count ceilings + no cartesian products (the repo-wide
    plan-budget discipline). Ceilings are the measured counts at
    authoring time — a regression that adds a shuffle fails here."""
    from real_time_database_monitoring_system_spark.operators import monitoring
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    budgets = [
        ("value_percentiles_interp", monitoring.value_percentiles_interp(events), 4),
        ("windowed_psi", anomaly.windowed_psi(events), 8),
        # spread + the countDistinct two-phase agg (dim-keyed then
        # label-keyed) + the output sort = 4
        ("embedding_norm_audit", similarity.embedding_norm_audit(emb), 4),
        ("mix_rebalance_plan", pipeline.mix_rebalance_plan(docs), 4),
        ("quality_calibration_curve", curation.quality_calibration_curve(docs), 10),
        ("winnow_longest_run", dedup.winnow_longest_run(docs), 10),
        ("doc_perplexity_outliers", pipeline.doc_perplexity_outliers(docs), 10),
    ]
    for name, df, ceiling in budgets:
        plan = checks.explain_str(df, "simple")
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        n = checks.count_exchanges(df)
        assert n <= ceiling, f"{name}: {n} exchanges > budget {ceiling}"


# ------------------------------------------------------------------
# round-8 second wave: streaming percentiles, KLL split cutoff,
# encoding audit, intra-doc line dedup
# ------------------------------------------------------------------


def test_stream_value_percentiles_equals_batch(spark, sf_dir):
    """Complete-mode count state + weighted rank coda == the batch
    counts-based interpolated percentiles, row for row."""
    from real_time_database_monitoring_system_spark.operators import monitoring
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )
    from real_time_database_monitoring_system_spark.streaming import rollup

    batch = monitoring.value_percentiles_interp(
        load_table(spark, sf_dir, "events")
    ).collect()
    stream = rollup.stream_value_percentiles(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_temporal_split_kll_verdict_and_exact_cutoff(spark, sf_dir):
    """The exact cutoff must equal temporal_split's percentile_disc
    cutoff; the sketch verdict must hold at the default accuracy; the
    achieved train fraction must sit at ≥ train_frac (percentile_disc
    picks the smallest value reaching the target rank)."""
    from real_time_database_monitoring_system_spark.operators import curation
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    row = curation.temporal_split_kll(events).collect()[0]
    ref = curation.temporal_split(events).select("cutoff_us").first()[0]
    assert row["cutoff_us_exact"] == ref
    assert row["kll_cutoff_in_rank_bound"] is True
    assert 0.8 <= row["train_frac_achieved"] < 0.81
    assert row["n_train"] <= row["n_events"]


def test_encoding_audit_closed_form(spark):
    """2 clean docs + 1 with two U+FFFD + 1 with one control char:
    counts and rates are hand-computable."""
    from real_time_database_monitoring_system_spark.operators import (
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean text here", "s0"),
            (2, "also clean", "s0"),
            (3, "bad �� decode", "s0"),
            (4, "ctl \x01 byte", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in text_ops.encoding_audit(docs).collect()}
    assert out["s0"]["n_docs"] == 3 and out["s0"]["n_bad_docs"] == 1
    assert out["s0"]["n_bad_chars"] == 2
    assert out["s1"]["n_bad_docs"] == 1 and out["s1"]["n_bad_chars"] == 1
    assert out["s1"]["bad_char_rate"] == pytest.approx(
        1 / len("ctl \x01 byte")
    )
    # tab/newline/CR are NOT flagged (legitimate whitespace controls)
    ws = spark.createDataFrame(
        [(1, "a\tb\nc\rd", "w")], "doc_id long, text string, source string"
    )
    assert text_ops.encoding_audit(ws).collect()[0]["n_bad_chars"] == 0


def test_intra_doc_line_dedup_keeps_first_in_order(spark):
    from real_time_database_monitoring_system_spark.operators import (
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [(1, "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter")],
        "doc_id long, text string",
    )
    row = text_ops.intra_doc_line_dedup(docs).collect()[0]
    assert row["n_lines"] == 7 and row["n_kept"] == 4
    assert row["text_clean"] == "nav\nbody one\nbody two\nfooter"
    # idempotence: a deduped doc passes through unchanged
    again = text_ops.intra_doc_line_dedup(
        spark.createDataFrame([(1, row["text_clean"])], "doc_id long, text string")
    ).collect()[0]
    assert again["text_clean"] == row["text_clean"]
    assert again["n_lines"] == again["n_kept"] == 4


def test_intra_doc_line_dedup_is_shuffle_free(spark, sf_dir):
    """The array-side form must stay map-side: zero shuffle exchanges
    besides the presentation sort (the whole point vs the explode +
    window alternative)."""
    from real_time_database_monitoring_system_spark.operators import (
        text as text_ops,
    )
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    df = text_ops.intra_doc_line_dedup(load_table(spark, sf_dir, "documents"))
    # spread repartition + output sort only
    assert checks.count_exchanges(df) <= 2


# ------------------------------------------------------------------
# round-8 third wave: apdex, gap histogram, dup-degree stats
# ------------------------------------------------------------------


def test_apdex_closed_form(spark):
    """T=100.00: values 50 (sat), 250 (tol), 450 (fru), 80 (sat) →
    apdex = (2·2 + 1)/(2·4) = 0.625 exactly → 'poor'; a clean group
    of four satisfieds scores 1.0 → 'excellent'. NULL values drop."""
    from real_time_database_monitoring_system_spark.operators import analytics

    rows = [
        (1, "api", 50.0), (2, "api", 250.0), (3, "api", 450.0),
        (4, "api", 80.0), (5, "api", None),
        (6, "web", 10.0), (7, "web", 20.0), (8, "web", 30.0), (9, "web", 99.99),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_type"]: r for r in analytics.apdex_score(df).collect()}
    api = out["api"]
    assert (api["n_samples"], api["n_satisfied"], api["n_tolerating"],
            api["n_frustrated"]) == (4, 2, 1, 1)
    assert api["apdex"] == 0.625 and api["apdex_band"] == "poor"
    web = out["web"]
    assert web["apdex"] == 1.0 and web["apdex_band"] == "excellent"


def test_gap_histogram_closed_form(spark):
    """One user with gaps 0.5 s (bucket 0), 3 s (bucket 2: bin(3) =
    '11'), 70 s (bucket 7: bin(70) has 7 digits); shares sum to 1."""
    import datetime as dt

    from real_time_database_monitoring_system_spark.operators import (
        event_analytics,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7),
        (2, t0 + dt.timedelta(seconds=0.5), 7),
        (3, t0 + dt.timedelta(seconds=3.5), 7),
        (4, t0 + dt.timedelta(seconds=73.5), 7),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    )
    out = {r["gap_bucket"]: r for r in event_analytics.gap_histogram(df).collect()}
    assert sorted(out) == [0, 2, 7]
    assert out[0]["n_gaps"] == 1 and out[0]["min_gap_us"] == 500_000
    assert out[2]["min_gap_us"] == 3_000_000
    assert out[7]["min_gap_us"] == 70_000_000
    assert sum(r["share"] for r in out.values()) == pytest.approx(1.0)


def test_dup_degree_stats_planted_mirrors(spark):
    """Three verbatim copies of one doc + two singletons: the copies
    form a 3-clique (degree 2 each); singletons don't appear."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, text, "s0"), (2, text, "s1"), (3, text, "s2"),
        (4, "totally different words entirely here now one two", "s0"),
        (5, "another unrelated document with its own tokens set", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dedup.dup_degree_stats(df).collect()
    assert len(out) == 1
    assert out[0]["degree"] == 2 and out[0]["n_docs"] == 3
    assert out[0]["share"] == 1.0


def test_stream_gap_histogram_equals_batch_multifile(spark, sf_dir, tmp_path):
    """The stateful gap twin must equal the batch panel — including
    over a 4-file time-split feed with maxFilesPerTrigger=1, where
    every cross-file boundary gap must come from the per-user state
    (files written in ascending time order with ascending mtimes, the
    file-stream contract)."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_database_monitoring_system_spark.operators import (
        event_analytics,
    )
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )
    from real_time_database_monitoring_system_spark.streaming import stateful

    events = load_table(spark, sf_dir, "events")
    batch = sorted(
        map(tuple, event_analytics.gap_histogram(events).collect())
    )
    stream = sorted(
        map(tuple, stateful.stream_gap_histogram(spark, sf_dir).collect())
    )
    assert stream == batch

    # 4-file time-ordered replay of the same rows
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    import pandas as pd

    pdf = tbl.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    d = tmp_path / "events.parquet"
    d.mkdir()
    n = len(pdf)
    for i in range(4):
        part = pdf.iloc[i * n // 4 : (i + 1) * n // 4]
        path = str(d / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), path)
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    multi = sorted(
        map(tuple, stateful.stream_gap_histogram(spark, str(tmp_path)).collect())
    )
    assert multi == batch


def test_cont_quantiles_property_random_multisets(spark):
    """Property check: on 30 seeded random multisets (ties, negatives,
    singletons), every counts-replica quantile equals Spark's own
    `percentile` aggregate to 1e-12 relative — the strongest evidence
    the integer rank split reproduces the type-7 definition at every
    group size, not just the authored fixtures. (Plain random module,
    not hypothesis: each example costs a Spark job, so 30 seeded
    draws beat shrinking.)"""
    import random

    rng = random.Random(80_808)
    qs = [("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)]
    rows = []
    for g in range(30):
        n = rng.randint(1, 25)
        vals = [
            float(rng.choice([rng.randint(-50, 50), rng.randint(-3, 3)]))
            for _ in range(n)
        ]
        rows += [(f"g{g}", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: [r[a] for a, _, _ in qs]
        for r in cont_quantiles_from_counts(df, ["g"], "x", qs).collect()
    }
    ref = {
        r["g"]: [r[a] for a, _, _ in qs]
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(x, {num}/{den})").alias(a)
                for a, num, den in qs
            ]
        )
        .collect()
    }
    assert set(got) == set(ref)
    for g in ref:
        for a, b in zip(got[g], ref[g]):
            assert a == pytest.approx(b, rel=1e-12, abs=1e-12), (g, got[g], ref[g])


def test_round8_late_wave_shuffle_budgets(spark, sf_dir):
    """Exchange ceilings + no cartesians for the second/third-wave
    batch operators (the wave-1 budgets live in
    test_round8_shuffle_budgets)."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        event_analytics,
        text as text_ops,
    )
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # classify → (type, cls) agg → type agg → sort
        ("apdex_score", analytics.apdex_score(events), 3),
        # user window + bucket agg + sort (+ broadcast total)
        ("gap_histogram", event_analytics.gap_histogram(events), 3),
        # spread + source agg + sort
        ("encoding_audit", text_ops.encoding_audit(docs), 3),
        # exact cutoff agg + rank-count aggs are global single-row
        ("temporal_split_kll", curation.temporal_split_kll(events), 4),
        # banded pair pipeline + degree + histogram aggs
        ("dup_degree_stats", dedup.dup_degree_stats(docs), 12),
    ]
    for name, df, ceiling in budgets:
        plan = checks.explain_str(df, "simple")
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        n = checks.count_exchanges(df)
        assert n <= ceiling, f"{name}: {n} exchanges > budget {ceiling}"
