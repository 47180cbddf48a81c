"""Behavior tests for the round-6 operators: near-dup incremental
dedup, 13-gram decontamination, the Jaccard threshold curve, and
embedding drift — planted fixtures with hand-computable truth
covering the decision paths the sf tables exercise only in bulk."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import (
    curation,
    dedup,
    similarity,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_near_decision_paths(spark):
    """One planted doc per rule: exact-dup drop, near-dup drop,
    below-threshold keep, genuinely-new keep, short-doc (no signature)
    keep, changed-near-self drop."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = _docs(
        spark,
        [
            (1, base),
            (2, "one two three four five six seven eight nine ten"),
            (3, "tiny doc"),
        ],
    )
    new = _docs(
        spark,
        [
            # unchanged key/content → not in CDC survivors at all
            (1, base),
            # changed: one word appended → near-dup of old self → DROP
            (2, "one two three four five six seven eight nine ten extra"),
            # changed short doc (<3 tokens → no signature) → KEEP
            (3, "tiny docs"),
            # added, content byte-equal to old #1 → exact rule DROP
            (10, base),
            # added, near-dup of old #1 (one word appended → J=8/9) →
            # near rule DROP (a word SWAP mid-doc changes 3 of 8
            # shingles → J=5/11 < 0.5 and correctly stays)
            (11, base + " postscript"),
            # added, genuinely new → KEEP
            (12, "completely different words with no overlap at all here"),
        ],
    )
    out = curation.incremental_dedup_near(old, new)
    got = {(r.doc_id, r.status) for r in out.collect()}
    assert got == {(3, "changed"), (12, "added")}


def test_incremental_dedup_near_threshold_is_inclusive(spark):
    """jaccard == threshold must drop (>= contract). Swapping the last
    of 20 tokens changes exactly 1 of 18 shingles → J = 17/19;
    threshold = 17/19 drops, threshold just above keeps (the keep side
    is banding-independent; the drop side pins that a J≈0.89 pair is
    a band candidate under the fixed portable family)."""
    words = [f"w{i}" for i in range(20)]
    old = _docs(spark, [(1, " ".join(words))])
    new = _docs(spark, [(2, " ".join(words[:19] + ["swapped"]))])
    j = 17 / 19
    dropped = curation.incremental_dedup_near(old, new, threshold=j)
    assert dropped.count() == 0
    kept = curation.incremental_dedup_near(old, new, threshold=j + 1e-9)
    assert [(r.doc_id, r.status) for r in kept.collect()] == [(2, "added")]


def test_decontaminate_13gram_exact_window(spark):
    """A 13-token excerpt of a train doc is exactly one 13-gram hit;
    a 12-token excerpt is none (the window is exact, not fuzzy)."""
    words = [f"w{i}" for i in range(20)]
    train = _docs(spark, [(1, " ".join(words)), (2, "unrelated text entirely")])
    bench13 = _docs(spark, [(100, " ".join(words[3:16]))])
    out = curation.decontaminate(train, bench13, shingle_k=13).collect()
    assert [(r.doc_id, r.n_hit_shingles, r.n_bench_docs) for r in out] == [(1, 1, 1)]
    bench12 = _docs(spark, [(100, " ".join(words[3:15]))])
    assert curation.decontaminate(train, bench12, shingle_k=13).count() == 0


def test_jaccard_curve_buckets_exact_and_near_pairs(spark):
    """Exact duplicates land in bucket 10; a planted near pair lands
    in the bucket of its integer-exact (10·|∩|) div |∪|; unrelated
    docs produce no candidate pair at all."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base),  # exact dup of 1 → J=1 → bucket 10
            (3, base + " extra"),  # 8 shared / 9 union with #1 & #2
            (4, "totally different content with zero shared shingles"),
        ],
    )
    out = {r.bucket: r.n_pairs for r in dedup.jaccard_threshold_curve(docs).collect()}
    # (1,2) exact; (1,3) and (2,3): J = 8/9 → bucket (80 div 9) = 8
    assert out == {8: 2, 10: 1}
    rows = dedup.jaccard_threshold_curve(docs).collect()
    assert all(abs(r.jaccard_lo - r.bucket / 10.0) < 1e-12 for r in rows)


def test_embedding_drift_identical_and_shifted(spark):
    """Identical halves → cos 1 / l2 0. A label whose mass moves along
    an axis reports the hand-computed cosine and distance; labels
    missing from one half drop out; NULL embeddings are excluded from
    the counts."""
    rows = [
        # label 0: identical in both halves
        (0, 0, [1.0, 0.0]),
        (1, 0, [1.0, 0.0]),
        # label 1: old along x, new along y
        (2, 1, [2.0, 0.0]),
        (3, 1, [0.0, 2.0]),
        # label 2: only in the old half → drops out
        (4, 2, [1.0, 1.0]),
        # label 0 NULL embedding in new half: ignored
        (5, 0, None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    out = {r.label: r for r in similarity.embedding_drift(old, new, dim=2).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_old == 1 and out[0].n_new == 1
    assert out[0].cos_sim == 1.0 and out[0].l2_shift == 0.0
    # label 1: centroids (2,0) vs (0,2): cos 0, l2 = sqrt(8)
    assert out[1].cos_sim == 0.0
    assert abs(out[1].l2_shift - 8**0.5) < 1e-9


def test_embedding_drift_clamps_last_ulp_negative(spark):
    """Centroids equal up to rounding must never produce NaN from a
    −1e-17-style ‖a−b‖² — the greatest(…, 0) clamp."""
    rows = [(0, 0, [0.1, 0.2, 0.3]), (1, 0, [0.1, 0.2, 0.3])]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = similarity.embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        dim=3,
    ).collect()
    assert len(out) == 1 and out[0].l2_shift == 0.0
