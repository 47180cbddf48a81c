"""Unit tests for operators.curation beyond the oracle-parity sweep:
edge cases (empty/no-overlap inputs), invariants (weights sum to 1,
rates realize the target fraction, bucket boundary placement), and
exact expected outputs on tiny hand-checked fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_time_database_monitoring_system_spark.operators import curation

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    )


# ---------------------------------------------------------------- decontaminate

def test_decontaminate_finds_exact_ngram_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps", "a"),  # shares 'quick brown fox'
            (2, "totally different words here now", "a"),  # clean
            (3, "quick brown fox quick brown fox", "a"),  # shares, repeated
        ],
    )
    bench = _docs(spark, [(100, "a quick brown fox appears", "b")])
    out = curation.decontaminate(train, bench).collect()
    assert [(r.doc_id, r.n_bench_docs) for r in out] == [(1, 1), (3, 1)]
    # doc 3's repeated shingle counts once (distinct semantics)
    hits = {r.doc_id: r.n_hit_shingles for r in out}
    assert hits[3] == 1 and hits[1] == 1


def test_decontaminate_no_overlap_and_short_docs(spark):
    train = _docs(spark, [(1, "alpha beta gamma", "a"), (2, "xy", "a")])
    bench = _docs(spark, [(100, "delta epsilon zeta eta", "b")])
    assert curation.decontaminate(train, bench).count() == 0


def test_decontaminate_empty_bench(spark):
    train = _docs(spark, [(1, "alpha beta gamma", "a")])
    bench = _docs(spark, [])
    assert curation.decontaminate(train, bench).count() == 0


# ---------------------------------------------------------- temperature mixing

def test_temperature_weights_sum_to_one_and_favor_small_sources(spark):
    rows = [(i, f"doc {i}", "big" if i < 90 else "small") for i in range(100)]
    w = {
        r.source: r
        for r in curation.temperature_mix_weights(_docs(spark, rows)).collect()
    }
    assert math.isclose(w["big"].weight + w["small"].weight, 1.0, abs_tol=1e-8)
    # alpha=0.5 compresses the 9:1 count ratio to 3:1 in weight
    assert math.isclose(w["big"].weight / w["small"].weight, 3.0, rel_tol=1e-6)
    # natural share of 'small' is 0.1; temperature mixing must exceed it
    assert w["small"].weight > 0.1
    # smaller source gets the higher per-doc sampling rate
    assert w["small"].sample_rate > w["big"].sample_rate


def test_temperature_rates_realize_target_fraction(spark):
    rows = [(i, f"doc {i}", f"s{i % 4}") for i in range(400)]
    got = curation.temperature_mix_weights(
        _docs(spark, rows), alpha=0.5, target_frac=0.25
    ).collect()
    expected_kept = sum(r.sample_rate * r.n_docs for r in got)
    assert math.isclose(expected_kept, 0.25 * 400, rel_tol=1e-6)


def test_temperature_sample_is_deterministic_subset(spark):
    rows = [(i, f"document number {i} with text", f"s{i % 3}") for i in range(120)]
    docs = _docs(spark, rows)
    a = sorted(r.doc_id for r in curation.temperature_sample(docs).collect())
    b = sorted(r.doc_id for r in curation.temperature_sample(docs).collect())
    assert a == b  # content-addressed, not RNG
    assert set(a) <= set(range(120))
    assert 0 < len(a) < 120


def test_temperature_alpha_one_is_uniform_rate(spark):
    rows = [(i, f"doc {i}", "big" if i < 90 else "small") for i in range(100)]
    got = curation.temperature_mix_weights(
        _docs(spark, rows), alpha=1.0, target_frac=0.5
    ).collect()
    # alpha=1 keeps the natural mix: every source samples at target_frac
    for r in got:
        assert math.isclose(r.sample_rate, 0.5, abs_tol=1e-9)


# ------------------------------------------------------------- length buckets

def test_length_bucket_boundaries_exact(spark):
    # 7 tokens → [0,8); 8 → [8,16); 4096 → open-ended last bucket
    def words(n):
        return " ".join(["w"] * n)

    docs = _docs(
        spark,
        [(1, words(7), "a"), (2, words(8), "a"), (3, words(4096), "a")],
    )
    got = {r.bucket_id: r for r in curation.length_buckets(docs).collect()}
    assert got[0].bucket_label == "[0,8)" and got[0].n_docs == 1
    assert got[1].bucket_label == "[8,16)" and got[1].n_docs == 1
    last = len(curation.LENGTH_BUCKETS) - 1
    assert got[last].bucket_label == "[4096,inf)" and got[last].total_tokens == 4096
    assert math.isclose(
        sum(r.token_share for r in got.values()), 1.0, abs_tol=1e-8
    )


def test_length_bucket_case_is_cross_engine_sql(spark):
    import duckdb

    expr = curation.length_bucket_case("n")
    label = curation.length_bucket_label_case("n")
    for n in [0, 1, 7, 8, 9, 63, 64, 2047, 2048, 4095, 4096, 100000]:
        d_id, d_lbl = duckdb.sql(
            f"SELECT {expr}, {label} FROM (SELECT {n} AS n)"
        ).fetchone()
        s_id, s_lbl = (
            spark.createDataFrame([(n,)], "n: bigint")
            .select(F.expr(expr), F.expr(label))
            .first()
        )
        assert (d_id, d_lbl) == (s_id, s_lbl), n


# -------------------------------------------------------------- snapshot diff

def test_snapshot_diff_all_statuses(spark):
    old = _docs(
        spark,
        [(1, "same text", "a"), (2, "old text", "a"), (3, "gone", "a")],
    )
    new = _docs(
        spark,
        [(1, "same text", "a"), (2, "new text", "a"), (4, "fresh", "a")],
    )
    got = {r.doc_id: r.status for r in curation.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "deleted", 4: "added"}


def test_snapshot_diff_empty_new_is_all_deleted(spark):
    old = _docs(spark, [(1, "a b", "a"), (2, "c d", "a")])
    new = _docs(spark, [])
    got = curation.snapshot_diff(old, new).collect()
    assert {r.status for r in got} == {"deleted"} and len(got) == 2


# --------------------------------------------------------- incremental dedup

def test_incremental_dedup_three_rules(spark):
    old = _docs(
        spark,
        [
            (1, "stable content", "a"),
            (2, "will be revised", "a"),
            (3, "moved content", "a"),
        ],
    )
    new = _docs(
        spark,
        [
            (1, "stable content", "a"),       # unchanged -> dropped
            (2, "revised content", "a"),      # changed, genuinely new -> kept
            (10, "moved content", "a"),       # added by key, old content -> dropped
            (11, "brand new words", "a"),     # genuinely new -> kept
            (12, "brand new words", "a"),     # batch-dupe of 11 -> dropped (min key wins)
        ],
    )
    got = {r.doc_id: r.status for r in curation.incremental_dedup(old, new).collect()}
    assert got == {2: "changed", 11: "added"}


def test_incremental_dedup_empty_old_dedups_batch(spark):
    old = _docs(spark, [])
    new = _docs(spark, [(5, "x y z", "a"), (6, "x y z", "a"), (7, "p q", "a")])
    got = {r.doc_id: r.status for r in curation.incremental_dedup(old, new).collect()}
    assert got == {5: "added", 7: "added"}


def test_incremental_dedup_identical_snapshots_empty(spark):
    rows = [(i, f"text number {i}", "a") for i in range(20)]
    old = _docs(spark, rows)
    assert curation.incremental_dedup(old, _docs(spark, rows)).count() == 0


# ------------------------------------------------- cap / split / shuffle order

def test_cap_per_source_keeps_longest_k(spark):
    rows = [(i, "x" * (10 + i), "a") for i in range(5)] + [
        (10 + i, "y" * 5, "b") for i in range(2)
    ]
    out = curation.cap_per_source(_docs(spark, rows), k=3).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    assert len(by_source["a"]) == 3
    # longest docs win: ids 4, 3, 2 (n_chars 14, 13, 12)
    assert [r.doc_id for r in by_source["a"]] == [4, 3, 2]
    assert [r.rank_in_source for r in by_source["a"]] == [1, 2, 3]
    # under-cap source kept whole, tie on n_chars broken by doc_id
    assert [r.doc_id for r in by_source["b"]] == [10, 11]


def test_assign_split_partitions_and_is_stable_under_text_change(spark):
    docs = _docs(spark, [(i, f"text {i}", "a") for i in range(200)])
    out1 = {r.doc_id: r.split for r in curation.assign_split(docs).collect()}
    assert set(out1.values()) == {"train", "val", "test"}
    # every doc gets exactly one split; ~90/5/5 with hash tolerance
    n = len(out1)
    n_train = sum(1 for s in out1.values() if s == "train")
    assert 0.8 * n <= n_train <= 0.97 * n
    # rewriting text must NOT move any document between splits
    edited = _docs(spark, [(i, f"EDITED {i} !!", "a") for i in range(200)])
    out2 = {r.doc_id: r.split for r in curation.assign_split(edited).collect()}
    assert out1 == out2


def test_shuffle_order_deterministic_and_salt_sensitive(spark):
    docs = _docs(spark, [(i, f"text {i}", "a") for i in range(100)])
    o1 = [r.doc_id for r in curation.shuffle_order(docs).collect()]
    o2 = [r.doc_id for r in curation.shuffle_order(docs).collect()]
    assert o1 == o2, "same salt must reproduce the exact order"
    assert sorted(o1) == list(range(100))
    o3 = [r.doc_id for r in curation.shuffle_order(docs, salt="other:").collect()]
    assert o1 != o3, "a different salt must reshuffle"
    assert sorted(o3) == list(range(100))
