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


def test_winnow_guarantee_and_hot_cutoff(spark):
    """The winnowing contract: a shared token run of ≥ w+k−1 (=6)
    tokens guarantees ≥1 shared fingerprint; disjoint docs share none;
    a fingerprint present in > max_df docs is dropped before the
    self-join (boilerplate guard)."""
    shared_run = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [
            (1, f"{shared_run} one two three four five six"),
            (2, f"seven eight nine ten eleven {shared_run}"),
            (3, "totally unrelated words that overlap with nothing else"),
        ],
    )
    pairs = dedup.winnow_overlap_pairs(docs, min_shared=1)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    # hot cutoff: 5 docs all containing the same block; max_df=4 kills
    # every fingerprint of the block → no pairs survive
    hot = _docs(spark, [(i, shared_run) for i in range(5)])
    assert dedup.winnow_overlap_pairs(hot, min_shared=1, max_df=4).count() == 0
    assert dedup.winnow_overlap_pairs(hot, min_shared=1, max_df=10).count() == 10


def test_winnow_density_below_full_shingling(spark):
    """Winnowing must select strictly fewer fingerprints than full
    shingling on a long doc (~2/(w+1) density) — the point of the
    algorithm at scale."""
    words = " ".join(f"tok{i}" for i in range(200))
    docs = _docs(spark, [(1, words)])
    from real_time_database_monitoring_system_spark.operators.dedup import (
        portable_shingle_hashes,
    )

    n_full = portable_shingle_hashes(docs).count()
    # reuse the operator's fingerprint stage via a min_shared=1 probe
    # of doc vs itself-copy: count distinct fps by running the public
    # op on two copies and reading n_shared (= shared fingerprints)
    two = _docs(spark, [(1, words), (2, words)])
    n_fp = dedup.winnow_overlap_pairs(two, min_shared=1).first().n_shared
    assert n_fp < n_full * 0.6, (n_fp, n_full)


def test_c4_rules_fire_individually(spark):
    docs = _docs(
        spark,
        [
            (1, "This sentence is long enough and ends properly."),
            (2, "Too short."),                            # min_words fails
            (3, "this one has no terminal punctuation at all"),
            (4, "some code block here { return x; } done."),
            (5, "classic filler lorem ipsum dolor sit amet friend."),
            (6, "please enable javascript to view this site today."),
            (7, "short words then " + "x" * 1500 + " end."),
        ],
    )
    from real_time_database_monitoring_system_spark.operators.text import (
        c4_rule_filter,
    )

    out = {r.doc_id: r for r in c4_rule_filter(docs).collect()}
    assert out[1].keep
    assert not out[2].has_min_words and not out[2].keep
    assert not out[3].has_terminal_punct and out[3].has_min_words
    assert not out[4].no_braces and out[4].has_terminal_punct
    assert not out[5].no_lorem
    assert not out[6].no_policy_boilerplate
    assert not out[7].no_long_word


def test_ann_recall_audit_perfect_when_all_lists_probed(spark, sf_dir):
    """With nprobe ≥ #labels the IVF candidate set equals the full
    table, so recall@k must be exactly 1.0 for every query; with the
    default narrow probe it stays within [0, 1] and n_hits ≤ n_exact."""
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    full = similarity.ann_recall_audit(emb, n_queries=5, k=3, nprobe=n_labels)
    rows = full.collect()
    assert rows and all(r.recall == 1.0 and r.n_hits == r.n_exact for r in rows)
    narrow = similarity.ann_recall_audit(emb, n_queries=5, k=3, nprobe=1).collect()
    assert all(0.0 <= r.recall <= 1.0 and r.n_hits <= r.n_exact for r in narrow)
