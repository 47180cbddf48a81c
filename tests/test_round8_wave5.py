"""Behavior tests for the round-8 fourth-wave operators: arrival
burstiness (Fano factor, batch + count-state streaming twin), the
streaming encoding audit, per-source interpolated length percentiles
(the keyed counts-family point), the vocabulary overlap matrix, and
the normalized-key dedup panel — planted fixtures with
hand-computable truth, plus plan budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import (
    dedup,
    event_analytics,
    pipeline,
    text as text_ops,
)
from real_time_database_monitoring_system_spark.plans import checks


def _events_min(spark, rows):
    """rows: (event_id, minute, event_type) → events-shaped frame."""
    return spark.createDataFrame(
        [(eid, m * 60_000_000, t) for eid, m, t in rows],
        "event_id long, us long, event_type string",
    ).select(
        "event_id",
        F.expr("cast(timestamp_micros(us) as timestamp_ntz)").alias("ts"),
        "event_type",
    )


def test_burstiness_closed_form(spark):
    """Type 'a': minutes [0,0,0,2] → c={0:3, 2:1}, N=4, S2=10, M=3,
    active=2, fano = 10/4 − 4/3. Type 'b': one event per minute over
    [0..3] → perfectly paced, fano exactly 0."""
    rows = [(1, 0, "a"), (2, 0, "a"), (3, 0, "a"), (4, 2, "a")] + [
        (10 + i, i, "b") for i in range(4)
    ]
    out = {
        r["event_type"]: r
        for r in event_analytics.burstiness_panel(
            _events_min(spark, rows)
        ).collect()
    }
    a = out["a"]
    assert (a["n_events"], a["n_minutes"], a["active_minutes"], a["sum_sq"]) == (
        4,
        3,
        2,
        10,
    )
    assert a["events_per_min"] == 4.0 / 3.0
    assert a["fano"] == 10.0 / 4.0 - 4.0 / 3.0
    b = out["b"]
    assert (b["n_events"], b["n_minutes"], b["active_minutes"], b["sum_sq"]) == (
        4,
        4,
        4,
        4,
    )
    assert b["fano"] == 0.0


def test_burstiness_single_minute_type(spark):
    """All events in one minute: M=1, fano = S2/N − N = N − N = 0 for
    a lone burst minute (variance over a single bucket is zero)."""
    out = event_analytics.burstiness_panel(
        _events_min(spark, [(1, 5, "x"), (2, 5, "x"), (3, 5, "x")])
    ).collect()[0]
    assert (out["n_minutes"], out["active_minutes"]) == (1, 1)
    assert out["fano"] == 0.0


def test_stream_burstiness_equals_batch(spark, sf_dir):
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )
    from real_time_database_monitoring_system_spark.streaming import rollup

    batch = event_analytics.burstiness_panel(
        load_table(spark, sf_dir, "events")
    ).collect()
    stream = rollup.stream_burstiness(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_stream_encoding_audit_equals_batch(spark, sf_dir):
    """Same contamination injection on both sides → identical panels
    (shared classify + coda; only the aggregation mode differs)."""
    from __spark_entry__ import _inject_bad_encoding
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )
    from real_time_database_monitoring_system_spark.streaming import rollup

    batch = text_ops.encoding_audit(
        _inject_bad_encoding(load_table(spark, sf_dir, "documents"))
    ).collect()
    stream = rollup.stream_encoding_audit(
        spark, sf_dir, mutate=_inject_bad_encoding
    ).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_doc_length_percentiles_matches_builtin(spark, sf_dir):
    """The keyed counts replica must reproduce Spark's own
    `percentile` aggregate per source on the real table — to 1e-12
    relative (the builtin interpolates through a double rank h where
    the replica keeps the exact rational rem/den, a last-ULP
    difference; the ORACLE mirrors the replica's expression verbatim,
    so the cross-engine hash is exact — see the harness runs)."""
    import pytest

    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["source"]: (r["p25"], r["p50"], r["p75"], r["p95"])
        for r in pipeline.doc_length_percentiles(docs).collect()
    }
    ref = {
        r["source"]: (r["p25"], r["p50"], r["p75"], r["p95"])
        for r in docs.groupBy("source")
        .agg(
            F.expr("percentile(n_chars, 0.25)").alias("p25"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.75)").alias("p75"),
            F.expr("percentile(n_chars, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for s in ref:
        for a, b in zip(got[s], ref[s]):
            assert a == pytest.approx(b, rel=1e-12), (s, got[s], ref[s])


def _docs(spark, rows):
    """rows: (doc_id, source, text)."""
    return spark.createDataFrame(
        [(d, s, t) for d, s, t in rows], "doc_id long, source string, text string"
    )


def test_vocab_overlap_closed_form(spark):
    """s1={a,b,c}, s2={b,c,d}, s3={x}: the only overlapping pair is
    (s1,s2) with |∩|=2, jaccard 2/4, overlap 2/3; zero-overlap pairs
    are absent by construction."""
    docs = _docs(
        spark,
        [(1, "s1", "a b c"), (2, "s2", "b c d"), (3, "s3", "x")],
    )
    rows = text_ops.vocab_overlap_matrix(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert (r["vocab_a"], r["vocab_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5
    assert r["overlap_coef"] == 2.0 / 3.0


def test_vocab_overlap_dedups_within_source(spark):
    """Token multiplicity must not inflate the sets: 'a a a b' is the
    same vocabulary as 'a b'."""
    docs = _docs(spark, [(1, "s1", "a a a b"), (2, "s2", "a b b")])
    r = text_ops.vocab_overlap_matrix(docs).collect()[0]
    assert (r["vocab_a"], r["vocab_b"], r["n_common"]) == (2, 2, 2)
    assert r["jaccard"] == 1.0


def test_normalized_dedup_closed_form(spark):
    """'Hello, World!' and 'hello   world' share a normalization key
    (casefold + punct strip + whitespace collapse); the lower doc_id
    is the keeper. Per-source: s1 keeps both its docs (keeper + a
    unique), s2 loses its only doc."""
    docs = _docs(
        spark,
        [
            (1, "s1", "Hello, World!"),
            (2, "s2", "hello   world"),
            (3, "s1", "some unique text"),
        ],
    )
    out = {r["source"]: r for r in dedup.normalized_dedup(docs).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_docs"], s1["n_in_dup_clusters"], s1["n_removed"]) == (2, 1, 0)
    assert (s2["n_docs"], s2["n_in_dup_clusters"], s2["n_removed"]) == (1, 1, 1)
    assert s2["removal_rate"] == 1.0


def test_normalized_dedup_tab_newline_collapse(spark):
    """The explicit whitespace class must treat tabs/newlines/CRs as
    collapsible — 'a\\tb' ≡ 'a\\nb' ≡ 'a  b' under the key."""
    docs = _docs(
        spark, [(1, "s", "a\tb"), (2, "s", "a\nb"), (3, "s", "a  \r\n b")]
    )
    r = dedup.normalized_dedup(docs).collect()[0]
    assert (r["n_docs"], r["n_in_dup_clusters"], r["n_removed"]) == (3, 3, 2)


def test_normalized_key_extract_equals_negated_replace(spark, sf_dir):
    """The fast positive-class extract-runs-and-join strip must be
    byte-identical to the naive negated-class replace on the real
    corpus (the 25× rewrite's semantic contract)."""
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    naive = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower("text"), F.lit(r"[^a-z0-9 \t\r\n]"), F.lit("")
                ),
                F.lit(dedup.NORMALIZE_WS_CLASS),
                F.lit(" "),
            )
        )
    )
    n_diff = (
        docs.select(
            (dedup.normalized_text_key(F.col("text")) != naive).alias("d")
        )
        .filter("d")
        .count()
    )
    assert n_diff == 0


def test_punct_complement_equals_negated_class(spark, sf_dir):
    """quality_score's n_punct rewrite (length − positive-class char
    count) must equal the naive negated-class extract count on the
    real corpus AND on adversarial unicode/edge strings — every match
    of [^a-z0-9\\s] is exactly one char, so complement arithmetic is
    exact."""
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    new = F.length("text") - F.length(
        F.array_join(
            F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9\s]+"), 0), ""
        )
    )
    old = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^a-z0-9\s]"), 0))
    corpus = load_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [("",), ("ABC!?",), ("a b\tc\nd",), ("héllo wörld…",), ("123",)],
        "text string",
    )
    for df in (corpus, edge):
        assert df.select((new != old).alias("d")).filter("d").count() == 0


def test_wave5_shuffle_budgets(spark, sf_dir):
    """Exchange-count ceilings + no cartesian products, measured at
    authoring time — a regression that adds a shuffle fails here."""
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # (type,minute) count agg + type agg + sort
        ("burstiness_panel", event_analytics.burstiness_panel(events), 3),
        # spread + source agg + sort
        ("encoding_audit", text_ops.encoding_audit(docs), 3),
        # spread + per-(source,len) count + cum window + pick agg +
        # left join to the group spine + sort
        ("doc_length_percentiles", pipeline.doc_length_percentiles(docs), 7),
        # spread + distinct + size agg + term self-join + pair agg + sort
        ("vocab_overlap_matrix", text_ops.vocab_overlap_matrix(docs), 8),
        # spread + key agg + key join + source agg + sort
        ("normalized_dedup", dedup.normalized_dedup(docs), 6),
    ]
    for name, df, ceiling in budgets:
        plan = checks.explain_str(df, "simple")
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        n = checks.count_exchanges(df)
        assert n <= ceiling, f"{name}: {n} exchanges > budget {ceiling}"
