"""Behavior tests for the round-6 wave-2 statistics operators:
Cramér's V, mutual information, Welch's t, and Mann–Whitney U —
planted contingency tables and two-sample fixtures whose statistics
are hand-computable in closed form, covering perfect association,
exact independence, tie degeneracy, and the NULL guards."""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics

_DAY = 86_400


def _events(spark, rows):
    """rows = (epoch_secs, event_type, value); ts derived via
    timestamp_seconds so the fixture is timezone-unambiguous."""
    return (
        spark.createDataFrame(rows, "secs long, event_type string, value double")
        .withColumn("ts", F.timestamp_seconds("secs"))
        .drop("secs")
    )


def test_cramers_v_perfect_association(spark):
    """Type X only on dow 0, type Y only on dow 1 → χ² = N, V = 1."""
    rows = [(0, "X", 1.0)] * 10 + [(_DAY, "Y", 1.0)] * 10
    out = analytics.cramers_v_stat(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.n_types, r.n_dows, r.dof) == (20, 2, 2, 1)
    assert abs(r.chi2 - 20.0) < 1e-9
    assert r.cramers_v == 1.0


def test_cramers_v_exact_independence(spark):
    """Uniform 2×2 table → χ² = 0, V = 0."""
    rows = [
        (d * _DAY, t, 1.0) for d in (0, 1) for t in ("X", "Y") for _ in range(5)
    ]
    r = analytics.cramers_v_stat(_events(spark, rows)).collect()[0]
    assert abs(r.chi2) < 1e-9
    assert r.cramers_v == 0.0


def test_mutual_information_perfect_and_independent(spark):
    """Perfect 2×2 coupling: MI = H_type = H_dow = ln 2 (as the sum of
    two round(9) halves), NMI = 1; the uniform table gives MI 0."""
    perfect = [(0, "X", 1.0)] * 10 + [(_DAY, "Y", 1.0)] * 10
    r = analytics.mutual_information_stat(_events(spark, perfect)).collect()[0]
    ln2_from_halves = 0.693147180  # 2 × round(ln2 / 2, 9)
    assert (r.n, r.n_cells) == (20, 2)
    assert abs(r.mi_nats - ln2_from_halves) < 1e-12
    assert abs(r.h_type - ln2_from_halves) < 1e-12
    assert r.nmi == 1.0
    indep = [
        (d * _DAY, t, 1.0) for d in (0, 1) for t in ("X", "Y") for _ in range(5)
    ]
    r0 = analytics.mutual_information_stat(_events(spark, indep)).collect()[0]
    assert abs(r0.mi_nats) < 1e-12
    assert r0.nmi == 0.0


def test_welch_ttest_closed_form(spark):
    """ref = {1,3} (mean 2, s² 2), cur = {5,9} (mean 7, s² 8):
    t = −5/√5, df = 25/17 — both to the op's round(9)."""
    rows = [
        (0, "a", 1.0),
        (3600, "a", 3.0),
        (10 * 3600, "a", 5.0),
        (11 * 3600, "a", 9.0),
    ]
    r = analytics.welch_ttest(_events(spark, rows)).collect()[0]
    assert (r.n_ref, r.n_cur) == (2, 2)
    assert (r.mean_ref, r.mean_cur) == (2.0, 7.0)
    assert (r.var_ref, r.var_cur) == (2.0, 8.0)
    assert r.t_stat == -2.236067977
    assert r.welch_df == 1.470588235


def test_welch_ttest_null_values_and_small_sides_drop(spark):
    """NULL values vanish before the midpoint split is applied to
    values (but not before the ts range is fixed), and a side with
    n < 2 removes the type from the panel entirely."""
    rows = [
        (0, "a", 1.0),
        (3600, "a", None),
        (10 * 3600, "a", 5.0),
        (11 * 3600, "a", 9.0),
    ]
    out = analytics.welch_ttest(_events(spark, rows)).collect()
    assert out == []


def test_mannwhitney_closed_form_and_tie_guard(spark):
    """Separated samples {1,2} vs {3,4}: U = 0, and the exact verdict
    components reproduce z = z_num·√(3·nt·(nt−1)/(n_ref·n_cur·tie_term))
    = −4·√(36/240) = −1.549193…; four identical values: U = n₁n₂/2 and
    tie_term collapses to the exact zero that marks z undefined."""
    sep = [
        (0, "a", 1.0),
        (3600, "a", 2.0),
        (10 * 3600, "a", 3.0),
        (11 * 3600, "a", 4.0),
    ]
    r = analytics.mannwhitney_u(_events(spark, sep)).collect()[0]
    assert (r.n_ref, r.n_cur) == (2, 2)
    assert r.u_stat == Decimal("0.0")
    assert r.tie_cube == Decimal("0")
    assert r.z_num == Decimal("-4")
    assert r.tie_term == Decimal("60")
    z = float(r.z_num) * math.sqrt(
        3.0 * 4 * 3 / (float(r.n_ref) * float(r.n_cur) * float(r.tie_term))
    )
    assert abs(z - (-1.5491933384829668)) < 1e-12
    tied = [
        (0, "a", 7.0),
        (3600, "a", 7.0),
        (10 * 3600, "a", 7.0),
        (11 * 3600, "a", 7.0),
    ]
    rt = analytics.mannwhitney_u(_events(spark, tied)).collect()[0]
    assert rt.u_stat == Decimal("2.0")
    assert rt.tie_cube == Decimal("60")
    assert rt.z_num == Decimal("0")
    assert rt.tie_term == Decimal("0")


def test_association_panel_shares_one_contingency_shape(spark, sf_dir):
    """Both association stats agree on the table dimensions and N over
    the same sf events — the shared `_type_dow_margins` core."""
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    v = analytics.cramers_v_stat(ev).collect()[0]
    m = analytics.mutual_information_stat(ev).collect()[0]
    assert v.n == m.n
    assert v.n_types * v.n_dows >= m.n_cells
    assert 0.0 <= v.cramers_v <= 1.0
    assert m.mi_nats >= -1e-9
    assert m.nmi is None or -1e-9 <= m.nmi <= 1.0 + 1e-9


def test_xcorr_detects_planted_lead(spark):
    """B's daily count series is A's shifted by +2 days (cyclically,
    so the global dense grid has no boundary zeros): the (A, B) panel
    row at lag 2 must be exactly 1.0, and no other (A, B) lag may
    reach it. Types never correlate with themselves in this panel."""
    from real_time_database_monitoring_system_spark.operators import anomaly

    pattern = [1, 2, 3, 1, 2, 3, 1, 2, 3, 1]
    rows = []
    for d in range(10):
        rows += [(d * _DAY + i, "A", 1.0) for i in range(pattern[d])]
        rows += [(d * _DAY + 1000 + i, "B", 1.0) for i in range(pattern[(d - 2) % 10])]
    out = anomaly.xcorr_panel(_events(spark, rows)).collect()
    assert {(r.type_a, r.type_b) for r in out} == {("A", "B"), ("B", "A")}
    ab = {r.lag: r.xcorr for r in out if r.type_a == "A" and r.type_b == "B"}
    assert ab[2] == 1.0
    assert all(v < 1.0 for k, v in ab.items() if k != 2 and v is not None)
    # every row's n shrinks with the lag on the common grid
    for r in out:
        assert r.n_days == 10 - r.lag


def test_xcorr_constant_side_is_null(spark):
    """A constant series has zero variance — the correlation must be
    NULL (the CORR_FINAL_SQL guard), never NaN or a fake value."""
    from real_time_database_monitoring_system_spark.operators import anomaly

    rows = []
    for d in range(5):
        rows += [(d * _DAY, "C", 1.0)]          # constant 1/day
        rows += [(d * _DAY + 10 + i, "V", 1.0) for i in range(d + 1)]
    out = anomaly.xcorr_panel(_events(spark, rows), max_lag=2).collect()
    assert out and all(r.xcorr is None for r in out)


def _typed_events(spark, pairs):
    """pairs = (user_id, event_type); ts/value irrelevant to the graph."""
    return spark.createDataFrame(
        [(u, t, 1_000_000 * u, 1.0) for u, t in pairs],
        "user_id long, event_type string, secs long, value double",
    ).withColumn("ts", F.timestamp_seconds("secs")).drop("secs")


def test_cooccurrence_edges_exact_counts(spark):
    """u1={A,B,C}, u2={A,B}, u3={A,C}, u4={D}: edge weights and
    Jaccard overlaps are hand-countable; duplicate events per
    (user, type) must not inflate anything."""
    from real_time_database_monitoring_system_spark.operators import event_analytics

    pairs = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"), (2, "B"),   # duplicate (2, B) event
        (3, "A"), (3, "C"),
        (4, "D"),
    ]
    out = event_analytics.cooccurrence_edges(_typed_events(spark, pairs)).collect()
    got = {(r.type_a, r.type_b): (r.shared_users, r.users_a, r.users_b, r.jaccard)
           for r in out}
    assert got == {
        ("A", "B"): (2, 3, 2, round(2 / 3, 9)),
        ("A", "C"): (2, 3, 2, round(2 / 3, 9)),
        ("B", "C"): (1, 2, 2, round(1 / 3, 9)),
    }


def test_type_triangles_support_threshold(spark):
    """The A-B-C triangle exists at min_shared=1 with support 1 (the
    B-C bottleneck) and vanishes at min_shared=2; D never joins."""
    from real_time_database_monitoring_system_spark.operators import event_analytics

    pairs = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "D"),
    ]
    ev = _typed_events(spark, pairs)
    tri = event_analytics.type_triangles(ev, min_shared=1).collect()
    assert [(r.type_a, r.type_b, r.type_c, r.support) for r in tri] == [
        ("A", "B", "C", 1)
    ]
    assert event_analytics.type_triangles(ev, min_shared=2).collect() == []


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_gopher_rules_fire_individually(spark):
    """One planted doc per rule: each violation flips exactly its own
    rule while the others hold."""
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    base = "the a " + " ".join(["word"] * 48)          # 50 words, all rules pass
    rows = [
        (1, base),
        (2, "the a " + " ".join(["word"] * 8)),        # 10 words: count fails
        (3, base + " ### ### ### ### ### ###"),        # 18 '#': symbol fails
        (4, base + " " + " ".join(["123"] * 20)),      # 20/70 numeric: alpha fails
        (5, base + " " + "z" * 600),                   # mean len 15.6: mean fails
        (6, " ".join(["word"] * 50)),                  # no stopwords
    ]
    out = {r.doc_id: r for r in text_ops.gopher_rule_filter(_docs(spark, rows)).collect()}
    assert out[1].keep
    assert not out[2].word_count_ok and out[2].mean_word_len_ok
    assert not out[3].symbol_ratio_ok and out[3].word_count_ok
    assert not out[4].alpha_ratio_ok and out[4].symbol_ratio_ok
    assert not out[5].mean_word_len_ok and out[5].alpha_ratio_ok
    assert not out[6].has_stopwords and out[6].alpha_ratio_ok
    for d in (2, 3, 4, 5, 6):
        assert not out[d].keep


def test_gopher_mean_rule_is_exact_at_boundary(spark):
    """mean == 10 exactly must PASS (≤ bound, integer cross-multiply,
    no double drift): 50 words of 10 chars each."""
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    # 50 words ('the', 'a', 48 fillers) padded to exactly 500 chars:
    # mean = 10.0 must pass the ≤ 10 bound exactly
    exact = " ".join(["the", "a", "b" * 26] + ["abcdefghij"] * 47)
    out = text_ops.gopher_rule_filter(_docs(spark, [(1, exact)])).collect()[0]
    assert out.n_words == 50
    assert out.mean_word_len == 10.0
    assert out.mean_word_len_ok and out.keep


def test_oov_rate_vocab_and_tiebreak(spark):
    """Top-1 vocab of a 14-x corpus is 'x'; per-source OOV mass is
    exact. Equal counts break ties by term ASC."""
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    rows = [
        (1, " ".join(["x"] * 9 + ["y"]), "s1"),
        (2, " ".join(["x"] * 5 + ["z"] * 5), "s2"),
    ]
    docs = _docs(spark, rows, "doc_id long, text string, source string")
    out = {r.source: r for r in text_ops.oov_rate(docs, vocab_size=1).collect()}
    assert (out["s1"].n_tokens, out["s1"].n_oov, out["s1"].oov_rate) == (10, 1, 0.1)
    assert (out["s2"].n_tokens, out["s2"].n_oov, out["s2"].oov_rate) == (10, 5, 0.5)
    tie = _docs(
        spark,
        [(1, "b b b a a a", "s")],
        "doc_id long, text string, source string",
    )
    t = text_ops.oov_rate(tie, vocab_size=1).collect()[0]
    assert t.n_oov == 3  # vocab = {'a'} (count tie → term ASC), 'b' is OOV


def test_line_dedup_drops_hot_lines_everywhere(spark):
    """A line in 5 > max_docs=3 docs vanishes from ALL of them (not
    first-kept like paragraph_dedup); rare lines keep every occurrence
    in order; an all-boilerplate doc survives with empty text."""
    from real_time_database_monitoring_system_spark.operators import dedup

    rows = [(i, f"u{i}a\ncommon\nu{i}b") for i in range(1, 6)] + [(6, "common")]
    out = {r.doc_id: r for r in dedup.line_dedup(_docs(spark, rows), max_docs=3).collect()}
    assert len(out) == 6
    for i in range(1, 6):
        assert out[i].clean_text == f"u{i}a\nu{i}b"
        assert (out[i].n_lines, out[i].n_kept, out[i].n_dropped) == (3, 2, 1)
    assert (out[6].n_kept, out[6].clean_text) == (0, "")


def test_line_dedup_threshold_counts_distinct_docs(spark):
    """df counts DISTINCT documents: one doc repeating a line 10 times
    contributes 1 to df, and a line in exactly max_docs docs stays."""
    from real_time_database_monitoring_system_spark.operators import dedup

    rows = [(1, "\n".join(["rep"] * 10)), (2, "rep\nother"), (3, "solo")]
    out = {r.doc_id: r for r in dedup.line_dedup(_docs(spark, rows), max_docs=2).collect()}
    assert out[1].n_kept == 10          # df('rep') = 2 ≤ 2 → kept everywhere
    assert out[2].clean_text == "rep\nother"
    assert out[3].clean_text == "solo"


def test_js_divergence_identical_and_disjoint(spark):
    """Two sources with identical unigram mixes → JS = 0; disjoint
    vocabularies → JS = ln 2 (as the sum of two round(9) halves); a
    single-source corpus has no complement and yields no rows."""
    from real_time_database_monitoring_system_spark.operators import pipeline

    same = _docs(
        spark,
        [(1, "x x y", "s1"), (2, "x x y", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in pipeline.js_divergence(same).collect()}
    assert out["s1"].js_nats == 0.0 and out["s2"].js_nats == 0.0
    disjoint = _docs(
        spark,
        [(1, "x x", "s1"), (2, "y y", "s2")],
        "doc_id long, text string, source string",
    )
    d = {r.source: r for r in pipeline.js_divergence(disjoint).collect()}
    ln2_halves = 0.693147180  # 2 × round(0.5·ln 2, 9)
    for s in ("s1", "s2"):
        assert abs(d[s].js_nats - ln2_halves) < 1e-12
        assert d[s].n_terms_src == 1
    solo = _docs(
        spark, [(1, "x y", "only")], "doc_id long, text string, source string"
    )
    assert pipeline.js_divergence(solo).collect() == []


def test_countmin_one_sided_and_full_collision(spark):
    """width=1 forces every type into one bucket: the estimate must be
    the TOTAL event count for every type (exact worst case); a single
    type sketches exactly; the guarantee estimate ≥ exact always
    holds."""
    from real_time_database_monitoring_system_spark.operators import sketches

    pairs = [(u, t) for u, t in [(1, "A"), (2, "A"), (3, "B"), (4, "C")]]
    ev = _typed_events(spark, pairs)
    worst = {r.event_type: r for r in sketches.countmin_types(ev, width=1).collect()}
    assert all(r.cm_estimate == 4 for r in worst.values())
    assert worst["A"].overshoot == 2 and worst["C"].overshoot == 3
    assert all(r.never_under for r in worst.values())
    single = sketches.countmin_types(
        _typed_events(spark, [(1, "A"), (2, "A")])
    ).collect()[0]
    assert (single.exact_n, single.cm_estimate, single.overshoot) == (2, 2, 0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sketches.countmin_types(ev, depth=0)
