"""Property-based tests (hypothesis) for the pure-Python dialect
pieces — no SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_database_monitoring_system_spark.functions.pg_dialect import pg_to_java_pattern

PG_ATOMS = ["YYYY", "YY", "MM", "DD", "HH24", "HH12", "HH", "MI", "SS", "MS", "AM", "MON", "DAY"]
SEPARATORS = ["-", "/", ":", ".", " ", ""]


@st.composite
def pg_patterns(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(PG_ATOMS)))
        parts.append(draw(st.sampled_from(SEPARATORS)))
    return "".join(parts)


@given(pg_patterns())
@settings(max_examples=200)
def test_translation_is_total_and_atomic(pattern):
    out = pg_to_java_pattern(pattern)
    # no PG-only atoms survive
    assert "HH24" not in out
    assert "MI" not in out
    # length is bounded (no runaway expansion)
    assert len(out) <= 2 * len(pattern)


@given(st.text(alphabet="-/:. ", max_size=20))
def test_separators_pass_through(seps):
    assert pg_to_java_pattern(seps) == seps


def test_idempotent_on_translated_output_separators():
    # translating a pattern twice must not mangle separators
    once = pg_to_java_pattern("YYYY-MM-DD HH24:MI:SS")
    assert once == "yyyy-MM-dd HH:mm:ss"


# ---- Spark-backed properties (session fixture) ----


def test_bloom_prune_superset_property_random_keys(spark):
    """For ANY key set and any fact, bloom survivors ⊇ true matches —
    across several (m, k) sizes including aggressively undersized."""
    import random

    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import (
        runtime_filter as rf,
    )

    rng = random.Random(42)
    for trial in range(3):
        fact_keys = [rng.randrange(0, 5000) for _ in range(400)]
        key_keys = [rng.randrange(0, 5000) for _ in range(60)]
        fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
        keys = spark.createDataFrame([(k,) for k in key_keys], "k long")
        true_match = set(fact_keys) & set(key_keys)
        for m_bits, k in ((1 << 16, 4), (1 << 7, 1)):
            bloom = rf.bloom_build(keys, "k", m_bits=m_bits, k=k)
            survivors = {
                r.k for r in rf.bloom_prune(fact, bloom, "k").distinct().collect()
            }
            assert true_match <= survivors
        exact = {r.k for r in rf.bloom_semi_join(fact, keys, "k").distinct().collect()}
        assert exact == true_match


def test_gapfill_row_count_identity(spark):
    """Per key, output rows == (max_bucket - min_bucket)/step + 1 and
    non-gap rows == distinct observed buckets — for a random feed."""
    import datetime as dt
    import random

    from real_time_database_monitoring_system_spark.operators import gapfill

    rng = random.Random(7)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(0, 2000)),
                1,
                rng.choice(["cpu", "mem"]),
                float(rng.randrange(0, 100)),
                "{}",
            )
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = gapfill.gapfill_locf(ev).collect()
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    observed: dict[str, set] = {}
    for (i, ts, u, et, v, p) in rows:
        observed.setdefault(et, set()).add((ts.timestamp() // 300) * 300)
    for et, rs in by_key.items():
        buckets = sorted(r.bucket_s for r in rs)
        assert buckets == list(range(buckets[0], buckets[-1] + 300, 300))
        assert sum(not r.is_gap for r in rs) == len(observed[et])
        # LOCF: every row at/after the first observation carries a value
        assert all(r.value_locf is not None for r in rs)


def test_operators_tolerate_empty_inputs(spark):
    """Every operator family must degrade to an empty (or all-zero
    summary) result on an empty feed — not crash on a NULL aggregate,
    an empty sequence(), or a missing percentile. An empty partition
    is a routine occurrence at scale (fresh date partition, filtered
    tenant), not an edge case."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        anomaly,
        dedup,
        event_analytics,
        gapfill,
        monitoring,
        pipeline,
        similarity,
    )
    from real_time_database_monitoring_system_spark.sources.registry import SCHEMAS

    events = spark.createDataFrame([], SCHEMAS["events"])
    docs = spark.createDataFrame([], SCHEMAS["documents"])
    emb = spark.createDataFrame([], SCHEMAS["embeddings"])

    empty_ok = [
        ("downsample_5min", monitoring.downsample_5min(events)),
        ("sliding_rollup", monitoring.sliding_rollup(events)),
        ("multi_grain_rollup", monitoring.multi_grain_rollup(events)),
        ("gapfill_locf", gapfill.gapfill_locf(events)),
        ("gapfill_interpolate", gapfill.gapfill_interpolate(events)),
        ("mad_outliers", anomaly.mad_outliers(events)),
        ("drift_cusum", anomaly.drift_cusum(events)),
        ("equidepth_histogram", analytics.equidepth_histogram(events)),
        ("active_users_rolling", analytics.active_users_rolling(events)),
        ("type_correlation", analytics.type_correlation(events)),
        ("moment_stats", analytics.moment_stats(events)),
        ("user_entropy", event_analytics.user_entropy(events)),
        ("top_session_paths", event_analytics.top_session_paths(events)),
        ("transition_matrix", event_analytics.transition_matrix(events)),
        ("cohort_retention", event_analytics.cohort_retention(events)),
        ("exact_dedup", dedup.exact_dedup(docs)),
        ("dup_cluster_sizes", dedup.dup_cluster_sizes(docs)),
        ("weighted_sample", pipeline.weighted_sample(docs)),
        ("pmi_pairs", pipeline.pmi_pairs(docs)),
        ("knn_bruteforce", similarity.knn_bruteforce(emb)),
        ("label_centroid_similarity", similarity.label_centroid_similarity(emb)),
    ]
    for name, df in empty_ok:
        assert df.count() == 0, f"{name} should be empty on empty input"

    # summary-shaped operators legitimately emit rows on empty input —
    # but the counts inside them must be zero
    funnel = event_analytics.funnel_counts(events).collect()
    assert [r.n_users for r in funnel] == [0, 0, 0]


def test_continuation_operators_tolerate_empty_inputs(spark):
    """Same empty-partition contract for the round-3 continuation
    operators."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        dedup,
        event_analytics,
        monitoring,
        pipeline,
        similarity,
        skew,
    )
    from real_time_database_monitoring_system_spark.sources.registry import SCHEMAS

    events = spark.createDataFrame([], SCHEMAS["events"])
    docs = spark.createDataFrame([], SCHEMAS["documents"])
    emb = spark.createDataFrame([], SCHEMAS["embeddings"])

    empty_ok = [
        ("bm25_search", pipeline.bm25_search(docs)),
        ("tokenize_to_ids", pipeline.tokenize_to_ids(docs)),
        ("source_quantile_normalize", pipeline.source_quantile_normalize(docs)),
        ("touch_attribution", event_analytics.attribution(events)),
        ("latency_percentile_panel", monitoring.latency_percentile_panel(events)),
        ("trending_types", monitoring.trending_types(events)),
        ("pareto_contribution", analytics.pareto_contribution(events)),
        ("dataset_checksum", analytics.dataset_checksum(docs)),
        ("embedding_quantize_int8", similarity.embedding_quantize_int8(emb)),
        ("random_projection", similarity.random_projection(emb)),
        ("knn_projected", similarity.knn_projected(emb)),
        ("minhash_portable", dedup.minhash_lsh_pairs_portable(docs)),
        ("simhash_portable", dedup.simhash_pairs_portable(docs)),
    ]
    for name, df in empty_ok:
        assert df.count() == 0, f"{name} should be empty on empty input"

    # one-row summary: NULL estimate over zero matched keys, not a crash
    est = skew.join_cardinality_estimate(events, events, "user_id").first()
    assert est.n_matched_keys == 0 and est.est_rows is None


# ---- round-6 cross-operator invariants (Spark-backed, deterministic
# corpora derived from the sf tables — no per-example Spark jobs, so
# these are plain tests asserting algebraic properties, not @given) ----


def test_near_dedup_result_is_subset_of_exact_dedup(spark, sf_dir):
    """incremental_dedup_near can only DROP more than incremental_dedup
    (the near rule is a further filter), never keep something the
    exact pass dropped, and statuses must agree on the intersection."""
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import curation
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.concat("text", F.lit(" tail"))).otherwise(
            F.col("text")
        ),
    )
    exact = {(r.doc_id, r.status) for r in curation.incremental_dedup(docs, new).collect()}
    near = {(r.doc_id, r.status) for r in curation.incremental_dedup_near(docs, new).collect()}
    assert near <= exact


def test_jaccard_curve_mass_equals_candidate_pairs_above_threshold(spark, sf_dir):
    """The curve's cumulative mass from bucket b up must equal the
    pair count minhash_lsh_pairs_portable returns at threshold b/10 —
    same pipeline, so the histogram must tie out exactly (modulo pairs
    sitting exactly on a bucket edge, handled by integer-exact bucket
    ids: bucket ≥ b ⟺ jaccard ≥ b/10 cannot disagree when both sides
    share the integer (10·∩) div ∪ definition and >= on doubles)."""
    from real_time_database_monitoring_system_spark.operators import dedup
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    curve = {r.bucket: r.n_pairs for r in dedup.jaccard_threshold_curve(docs).collect()}
    # threshold 0.8: buckets 8, 9, 10 (integer bucket b ⟹ J ≥ b/10
    # exactly when (10·∩) div ∪ ≥ 8 ⟹ ∩/∪ ≥ 0.8)
    from_curve = sum(n for b, n in curve.items() if b >= 8)
    pairs = dedup.minhash_lsh_pairs_portable(docs, threshold=0.8).count()
    assert from_curve == pairs


def test_winnow_fingerprints_subset_of_full_shingle_hashes(spark, sf_dir):
    """Every winnowed fingerprint is the 60-bit hash of a real k-gram
    of its doc: the fingerprint relation must be a subset of the full
    portable shingle-hash relation (algorithm selects, never invents)."""
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators import dedup
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    )
    full = dedup.portable_shingle_hashes(docs).select("doc_id", "h").distinct()
    # reconstruct the operator's fingerprint stage output via the
    # public pair op at min_shared=1 against a disjoint renamed copy
    # is indirect; instead re-derive fingerprints with the same code
    # path by calling the internal stage through winnow_overlap_pairs'
    # building blocks: a doc paired with itself-copy shares exactly
    # its fingerprint set
    two = docs.unionByName(
        docs.select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text")
    )
    pairs = dedup.winnow_overlap_pairs(two, min_shared=1, max_df=1 << 30)
    self_pairs = pairs.filter(F.col("doc_b") == F.col("doc_a") + 10_000_000)
    # each self-pair's n_shared = #fingerprints of that doc ≤ #distinct shingles
    full_counts = {r.doc_id: r.n for r in full.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for r in self_pairs.collect():
        assert r.n_shared <= full_counts[r.doc_a], r


def test_cdc_chunks_tile_every_document(spark):
    """CDC invariant for ANY text (unicode, len < window, len ==
    window, hot repeats): chunks exactly tile each document — total
    chunk chars equals total document chars, for every source."""
    import random

    from real_time_database_monitoring_system_spark.operators import dedup

    rng = random.Random(7)
    alphabet = "ab XY\n\tzzz.é⊕"
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 7, 8, 9, 63, 64, 65, rng.randrange(0, 400)])
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n)), f"s{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in dedup.cdc_chunk_dedup(docs).collect()}
    want = {}
    for _, t, s in rows:
        if t:
            want[s] = want.get(s, 0) + len(t)
    assert {s: r.chunk_chars for s, r in out.items()} == want
    for r in out.values():
        assert 0 <= r.dup_chars <= r.chunk_chars
        assert r.n_dup_occurrences <= r.n_chunks


def test_distinct_ngram_ratio_invariants_random(spark):
    """For ANY token stream: distinct ≤ total, ratio ∈ (0, 1], and the
    1-gram total equals the exact token count."""
    import random

    from real_time_database_monitoring_system_spark.operators import text as text_ops

    rng = random.Random(11)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows, tok_count = [], {}
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
        src = f"s{i % 4}"
        tok_count[src] = tok_count.get(src, 0) + len(toks)
        rows.append((i, " ".join(toks), src))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text_ops.distinct_ngram_ratio(docs).collect()
    for r in out:
        assert 1 <= r.distinct_ngrams <= r.total_ngrams
        assert 0.0 < r.distinct_ratio <= 1.0
        if r.n == 1:
            assert r.total_ngrams == tok_count[r.source]


def test_round7_operators_tolerate_empty_inputs(spark):
    """Same empty-partition contract for the round-7 operators."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        curation,
        dedup,
        multimodal,
        pipeline,
        similarity,
        sketches,
        text as text_ops,
    )
    from real_time_database_monitoring_system_spark.sources.registry import SCHEMAS

    events = spark.createDataFrame([], SCHEMAS["events"])
    docs = spark.createDataFrame([], SCHEMAS["documents"])
    emb = spark.createDataFrame([], SCHEMAS["embeddings"])

    empty_ok = [
        ("char_entropy", text_ops.char_entropy(docs)),
        ("distinct_ngram_ratio", text_ops.distinct_ngram_ratio(docs)),
        ("pii_density_by_source", text_ops.pii_density_by_source(docs)),
        ("template_prefix_groups", text_ops.template_prefix_groups(docs)),
        ("lang_mismatch_audit", text_ops.lang_mismatch_audit(docs)),
        ("gopher_repetition", text_ops.gopher_repetition(docs)),
        ("cdc_chunk_dedup", dedup.cdc_chunk_dedup(docs)),
        ("simhash_distance_hist", dedup.simhash_distance_hist(docs)),
        ("cross_source_dup_matrix", dedup.cross_source_dup_matrix(docs)),
        ("sample_skew_audit", pipeline.sample_skew_audit(docs)),
        ("payload_dedup", multimodal.payload_dedup(docs)),
        ("split_embedding_leakage", similarity.split_embedding_leakage(emb)),
        ("negative_samples", similarity.negative_samples(emb)),
        ("contamination_by_source", curation.contamination_by_source(docs, docs)),
        ("mannwhitney_u", analytics.mannwhitney_u(events)),
        ("welch_ttest", analytics.welch_ttest(events)),
        ("moments", analytics.moment_stats(events)),
        ("cramers_v", analytics.cramers_v_stat(events)),
    ]
    for name, df in empty_ok:
        assert df.count() == 0, f"{name} should be empty on empty input"
    # summary-shaped operators (global aggregates, like their SQL
    # oracles) legitimately emit one row — with zero counts, no crash
    mi = analytics.mutual_information_stat(events).collect()[0]
    assert mi.n_cells == 0 and mi.mi_nats is None
    r = sketches.bloom_fpr_audit(events).collect()[0]
    assert (r.n_ref_users, r.n_probe_users, r.n_false_positives) == (0, 0, 0)


def test_disc_quantiles_from_counts_equals_percentile_disc(spark):
    """The counts-based replica must equal Spark's percentile_disc
    aggregate VALUE-FOR-VALUE on adversarial data: heavy ties, group
    sizes that put q·n exactly on integers, NULL values, an all-NULL
    group, and non-dyadic q (1/10, 9/10) next to dyadic (1/4, 1/2)."""
    import random

    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.operators.util import (
        disc_quantiles_from_counts,
    )

    rng = random.Random(23)
    rows = []
    # group sizes hit multiples of 2, 4, 10, 20 so every q·n integer
    # boundary case occurs
    for g, size in [("a", 20), ("b", 40), ("c", 37), ("d", 100), ("e", 3)]:
        for _ in range(size):
            v = rng.choice([1.0, 1.0, 2.5, 2.5, 2.5, 7.25, 9.0, None])
            rows.append((g, v))
    rows += [("allnull", None)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [("q10", 1, 10), ("q25", 1, 4), ("q50", 1, 2), ("q90", 9, 10)]
    got = {
        r.g: (r.q10, r.q25, r.q50, r.q90)
        for r in disc_quantiles_from_counts(df, ["g"], "v", qs).collect()
    }
    want = {
        r.g: (r.q10, r.q25, r.q50, r.q90)
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({num / den!r}) WITHIN GROUP (ORDER BY v)"
                ).alias(alias)
                for alias, num, den in qs
            ]
        )
        .collect()
    }
    assert got == want
    assert got["allnull"] == (None, None, None, None)
