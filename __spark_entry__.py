"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship slow-session query (the reference's
slow-query panel, `/root/reference/myapp/views.py:396-407`) on sf0.001.
`queries()` exposes every implemented operator from SURVEY.md §2 plus
the training-data-pipeline layer (see COVERAGE.md for the full map);
`oracle_sql()` gives the DuckDB twin for each, omitted only where the
result is xxhash64-dependent or sketch-saturated
(MinHash/SimHash/HLL/KLL/keepers/approx-percentile) — those are
verified against exact algorithms in tests/ instead. (K-means, IVF-ANN
and LSH-ANN ARE oracle-backed: integer-quantized arithmetic, decimal
centroids and literal-embedded planes make them exactly reproducible,
iteration and approximation notwithstanding.)

Determinism contract (SURVEY §7): `now()` is replaced by the max event
timestamp; interval math is integer microseconds; aggregate sums are
exact decimal; top-K always carries a unique tiebreaker; fractional
outputs are either single final double divisions (engine-exact) or
rounded to 9 dp (cosines).
"""

from __future__ import annotations

import functools
import math
import os
import sys
from collections.abc import Callable

# the engine package lives next to this file; make the import robust
# to whatever CWD the driver runs from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.functions import pg_dialect
from real_time_database_monitoring_system_spark.operators import (
    analytics,
    anomaly,
    clustering,
    curation,
    dedup,
    event_analytics,
    gapfill,
    ivm,
    monitoring,
    multimodal,
    mutation,
    pipeline,
    relational,
    runtime_filter,
    similarity,
    sketches,
    text as text_ops,
)
from real_time_database_monitoring_system_spark.sources.registry import TABLES, load_table
from real_time_database_monitoring_system_spark.streaming import rollup as streaming_rollup

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, SF0001, "events")
    return monitoring.slow_sessions(events)


# --------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per implemented operator
# --------------------------------------------------------------------------


def _q_slow_sessions(spark, sf):
    return monitoring.slow_sessions(load_table(spark, sf, "events"))


def _q_idle_sessions(spark, sf):
    return monitoring.idle_sessions(load_table(spark, sf, "events"))


def _q_session_summary(spark, sf):
    return monitoring.session_summary(load_table(spark, sf, "events"))


def _q_connection_load(spark, sf):
    return monitoring.connection_load(load_table(spark, sf, "events"))


def _q_threshold_flags(spark, sf):
    return monitoring.threshold_flags(load_table(spark, sf, "events"))


def _q_downsample_5min(spark, sf):
    return monitoring.downsample_5min(load_table(spark, sf, "events"))


def _q_rollup_cascade(spark, sf):
    return monitoring.rollup_cascade(load_table(spark, sf, "events"))


def _q_minute_corr_join(spark, sf):
    return monitoring.minute_corr_join(
        load_table(spark, sf, "events"), load_table(spark, sf, "customer")
    )


def _q_lag_delta(spark, sf):
    return monitoring.lag_delta(load_table(spark, sf, "events"))


def _q_latest_per_user(spark, sf):
    return monitoring.latest_per_user(load_table(spark, sf, "events"))


def _q_tps_per_user(spark, sf):
    return monitoring.tps_per_user(load_table(spark, sf, "events"))


def _q_asof_join(spark, sf):
    return monitoring.asof_join(load_table(spark, sf, "events"))


def _q_value_band_join(spark, sf):
    return monitoring.value_band_join(load_table(spark, sf, "events"))


def _q_value_percentiles(spark, sf):
    return monitoring.value_percentiles(load_table(spark, sf, "events"))


def _q_value_percentiles_approx(spark, sf):
    # verdict-column form (exact percentiles/cardinalities + in-bound
    # booleans) so the sketch aggregation has a deterministic DuckDB
    # twin — the raw-estimate form stays as library surface
    return monitoring.value_percentiles_approx_checked(load_table(spark, sf, "events"))


def _q_sessionize(spark, sf):
    return monitoring.sessionize(load_table(spark, sf, "events"))


def _q_retention_filter(spark, sf):
    return monitoring.retention_filter(load_table(spark, sf, "events"))


def _q_drilldown_grid(spark, sf):
    return monitoring.drilldown_grid(
        load_table(spark, sf, "events"),
        {
            "ts": (">=", F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")),
            "event_type": ("=", "click"),
            "value": ("between", (10.0, 20.0)),
        },
    )


def _q_paginate_page2(spark, sf):
    base = load_table(spark, sf, "events").select("event_id", "ts", "user_id", "value")
    return monitoring.paginate(base, ["event_id"], page=2, page_size=10)


def _q_sql_bucket_panel(spark, sf):
    """The raw-SQL surface end-to-end: registered views + SQL scalar
    UDFs (functions/sql_udfs.py), the way the reference's users write
    their dashboards (raw SQL, no ORM)."""
    from real_time_database_monitoring_system_spark.functions.sql_udfs import (
        register_sql_functions,
    )
    from real_time_database_monitoring_system_spark.sources.registry import register_views

    register_views(spark, sf)
    register_sql_functions(spark)
    return spark.sql(
        """
        SELECT time_bucket_s(CAST(900 AS BIGINT), cast(ts AS timestamp)) AS bucket_s,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1 ORDER BY 1
        """
    )


def _q_engine_info(spark, sf):
    return monitoring.engine_info(load_table(spark, sf, "events"))


def _q_paginate_keyset(spark, sf):
    base = load_table(spark, sf, "events").select("event_id", "ts", "user_id", "value")
    return monitoring.paginate_keyset(base, ["event_id"], after=(9,), page_size=10)


def _q_substring_search(spark, sf):
    docs = load_table(spark, sf, "documents")
    return monitoring.substring_search(docs, ["text"], "spark merge").select(
        "doc_id", "source", "n_chars"
    ).orderBy("doc_id")


def _q_props_histogram(spark, sf):
    return monitoring.props_key_histogram(load_table(spark, sf, "events"))


def _q_topk_events(spark, sf):
    return relational.topk_global(load_table(spark, sf, "events"))


def _q_distinct_types(spark, sf):
    return relational.distinct_types(load_table(spark, sf, "events"))


def _q_table_catalog(spark, sf):
    return relational.table_catalog({t: load_table(spark, sf, t) for t in TABLES})


def _q_three_way_topk(spark, sf):
    return relational.three_way_topk(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
    )


def _q_left_join_rollup(spark, sf):
    return relational.left_join_rollup(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "nation"),
    )


def _q_anti_join(spark, sf):
    return relational.customers_without_recent_orders(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    )


def _q_semi_join(spark, sf):
    return relational.urgent_customers(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    )


def _q_cross_join_lookup(spark, sf):
    return relational.cross_join_lookup(
        load_table(spark, sf, "region"), load_table(spark, sf, "nation")
    )


def _q_nations_per_region(spark, sf):
    return relational.nations_per_region(
        load_table(spark, sf, "region"), load_table(spark, sf, "nation")
    )


def _q_shipping_priority(spark, sf):
    return relational.shipping_priority(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
    )


def _q_local_supplier_volume(spark, sf):
    return relational.local_supplier_volume(
        load_table(spark, sf, "region"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
    )


def _q_pricing_summary(spark, sf):
    return relational.pricing_summary(load_table(spark, sf, "lineitem"))


def _q_customer_rollup(spark, sf):
    return relational.customer_rollup(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "region"),
    )


def _q_parts_by_brand(spark, sf):
    return relational.parts_by_brand(load_table(spark, sf, "part"))


def _q_top_supplier_per_nation(spark, sf):
    return relational.top_supplier_per_nation(
        load_table(spark, sf, "supplier"), load_table(spark, sf, "nation")
    )


def _q_cache_hit_ratio(spark, sf):
    return relational.cache_hit_ratio(load_table(spark, sf, "lineitem"))


def _q_priority_bands(spark, sf):
    return relational.priority_bands(load_table(spark, sf, "orders"))


def _q_net_price_ratio(spark, sf):
    return relational.net_price_ratio(load_table(spark, sf, "lineitem"))


def _q_to_char_formats(spark, sf):
    orders = load_table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        pg_dialect.to_char(F.col("o_orderdate"), "YYYY-MM-DD HH24:MI:SS").alias("ts_iso"),
        pg_dialect.to_char(F.col("o_orderdate"), "DD/MM/YYYY HH24:MI").alias("ts_eu"),
        F.date_format(
            pg_dialect.at_time_zone(F.col("o_orderdate"), "Asia/Kolkata"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_ist"),
        pg_dialect.to_char(F.col("o_orderdate"), "FMDD/FMMM/YYYY").alias("ts_fm"),
        pg_dialect.to_char(F.col("o_orderdate"), "Q").alias("quarter"),
        pg_dialect.week_of_year_pg("o_orderdate").alias("week_pg"),
    ).orderBy("o_orderkey")


def _q_size_pretty(spark, sf):
    docs = load_table(spark, sf, "documents")
    nbytes = (F.col("n_chars") * F.col("n_chars") * F.lit(37)).alias("nbytes")
    return docs.select(
        "doc_id",
        nbytes,
        pg_dialect.size_pretty_int(F.col("n_chars") * F.col("n_chars") * F.lit(37)).alias("pretty"),
    ).orderBy("doc_id")


def _q_hash_sample(spark, sf):
    return pipeline.hash_sample(load_table(spark, sf, "documents"))


def _q_stratified_sample(spark, sf):
    return pipeline.stratified_sample(load_table(spark, sf, "documents"))


def _q_shard_pack(spark, sf):
    return pipeline.shard_pack(load_table(spark, sf, "documents"))


def _q_tfidf_top_terms(spark, sf):
    return pipeline.tfidf_top_terms(load_table(spark, sf, "documents"))


def _q_vocab_topk(spark, sf):
    return pipeline.vocab_topk(load_table(spark, sf, "documents"))


def _q_ngram_counts(spark, sf):
    return pipeline.ngram_counts(load_table(spark, sf, "documents"), n=2, k=50)


def _q_quality_quantile_filter(spark, sf):
    return pipeline.quality_quantile_filter(load_table(spark, sf, "documents"))


def _q_decontaminate(spark, sf):
    # benchmark = the ~2% of docs whose content-hash bucket < 2 (a
    # deterministic stand-in for a held-out eval suite); train = rest
    docs = load_table(spark, sf, "documents")
    hb = curation.content_hash_bucket("text", 100)
    return curation.decontaminate(docs.filter(hb >= 2), docs.filter(hb < 2))


def _q_temperature_mix(spark, sf):
    return curation.temperature_mix_weights(load_table(spark, sf, "documents"))


def _q_temperature_sample(spark, sf):
    return curation.temperature_sample(load_table(spark, sf, "documents"))


def _q_length_buckets(spark, sf):
    return curation.length_buckets(load_table(spark, sf, "documents"))


def _q_snapshot_diff(spark, sf):
    # new snapshot = deterministic re-crawl mutation of the corpus:
    # docs with id%17==0 vanish, id%13==0 get revised text, id%29==0
    # reappear under a fresh id (the 'added' class)
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    revised = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    return curation.snapshot_diff(docs, revised.unionByName(added))


def _q_incremental_dedup(spark, sf):
    # same deterministic re-crawl as _q_snapshot_diff, except half the
    # re-appeared docs carry genuinely new content — exercising all
    # three rules: key-level diff, cross-key content dedup (the other
    # half are content-dupes of live docs and must drop), and the
    # batch-internal min-key representative
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    revised = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" brand-new"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return curation.incremental_dedup(docs, revised.unionByName(added))


def _q_pii_redact(spark, sf):
    # the synthetic corpus is digit-free, so inject deterministic PII
    # (an e-mail, a phone, an IP on fixed doc_id residues) before the
    # scrub — the oracle mirrors the same injection
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-867-5309")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.lit(" from host 10.0.0."), (F.col("doc_id") % 250).cast("string")),
            ).otherwise(F.lit("")),
        ),
    )
    return text_ops.pii_redact(injected)


def _q_corpus_stats(spark, sf):
    return pipeline.corpus_stats(load_table(spark, sf, "documents"))


def _q_chunk_documents(spark, sf):
    return pipeline.chunk_documents(
        load_table(spark, sf, "documents"), window=32, stride=24
    )


def _q_clean_text(spark, sf):
    return text_ops.clean_text(load_table(spark, sf, "documents"))


def _q_repetition_score(spark, sf):
    return text_ops.repetition_score(load_table(spark, sf, "documents"))


def _q_token_stats(spark, sf):
    return text_ops.token_stats(load_table(spark, sf, "documents"))


def _q_quality_score(spark, sf):
    return text_ops.quality_score(load_table(spark, sf, "documents"))


def _q_lang_id(spark, sf):
    return text_ops.lang_id(load_table(spark, sf, "documents"))


def _q_fingerprint(spark, sf):
    return text_ops.fingerprint(load_table(spark, sf, "documents"))


def _q_exact_dedup(spark, sf):
    return dedup.exact_dedup(load_table(spark, sf, "documents"))


def _q_ngram_jaccard(spark, sf):
    return dedup.ngram_jaccard_pairs(load_table(spark, sf, "documents"))


def _q_minhash_lsh(spark, sf):
    # registry entry runs the PORTABLE hash family (md5-derived affine
    # permutations) at a distinct operating point from
    # minhash_portable_pairs (4-gram shingles, 0.5 threshold vs the
    # twin's 3-gram/0.3), so the pipeline is end-to-end oracle-checkable
    # at two configurations; the xxhash64 fast path
    # (dedup.minhash_lsh_pairs) stays as library surface, pinned by
    # pytest equivalence on the same fixtures
    return dedup.minhash_lsh_pairs_portable(
        load_table(spark, sf, "documents"), threshold=0.5, shingle_k=4
    )


def _q_simhash_pairs(spark, sf):
    # PORTABLE 60-bit md5 simhash at a distinct operating point from
    # simhash_portable_pairs (hamming ≤ 2 / 3 pigeonhole bands vs the
    # twin's ≤ 3 / 4 bands); the xxhash64 fast path
    # (dedup.simhash_pairs) stays as library surface, pytest-pinned
    return dedup.simhash_pairs_portable(load_table(spark, sf, "documents"), max_hamming=2)


def _q_knn_bruteforce(spark, sf):
    return similarity.knn_bruteforce(load_table(spark, sf, "embeddings"))


def _q_knn_lsh(spark, sf):
    return similarity.knn_lsh(load_table(spark, sf, "embeddings"))


def _q_multimodal_meta(spark, sf):
    return multimodal.decode_metadata(load_table(spark, sf, "documents"))


def _updates_batch(events: DataFrame) -> DataFrame:
    return (
        events.filter(F.col("event_id") % 100 == 0)
        .withColumn("event_type", F.lit("updated"))
        .withColumn("value", F.col("value") + F.lit(1000.0))
    )


def _q_upsert(spark, sf):
    events = load_table(spark, sf, "events")
    merged = mutation.upsert(events, _updates_batch(events), ["event_id"])
    return (
        merged.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


def _q_delete(spark, sf):
    events = load_table(spark, sf, "events")
    remaining = mutation.delete_where(events, F.col("event_type") == "error")
    return remaining.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


def _q_update(spark, sf):
    events = load_table(spark, sf, "events")
    updated = mutation.update_where(events, F.col("value") < 5.0, {"value": F.lit(0.0)})
    return (
        updated.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


def _q_dedup_keepers(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.keeper_list(docs, pairs)


def _q_dedup_keepers_best(spark, sf):
    # quality-aware keeper selection: same pair evidence as
    # dedup_keepers, but the per-cluster survivor is the
    # highest-quality doc (text.quality_score), ties -> min doc_id
    docs = load_table(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    scores = text_ops.quality_score(docs).select("doc_id", "quality")
    return dedup.keeper_list_best(docs, pairs, scores)


def _q_ivf_knn(spark, sf):
    return similarity.ivf_knn(load_table(spark, sf, "embeddings"))


def _q_embedding_near_dups(spark, sf):
    # The synthetic embeddings have no true near-dups (max pair cosine
    # ~0.50 at every SF), so a production threshold like the operator's
    # 0.95 default matches the oracle only on empty results. 0.3 keeps
    # the whole pipeline (bands, candidate join, exact cosine, filter)
    # exercised over real rows.
    return similarity.embedding_near_dup_pairs(load_table(spark, sf, "embeddings"), threshold=0.3)


def _q_streaming_rollup(spark, sf):
    return streaming_rollup.stream_rollup(spark, sf)


def _q_streaming_alerts(spark, sf):
    return streaming_rollup.stream_alerts(spark, sf)


def _q_streaming_dedup(spark, sf):
    return streaming_rollup.stream_dedup(spark, sf)


def _q_streaming_sessions(spark, sf):
    return streaming_rollup.stream_sessions(spark, sf)


def _q_streaming_join(spark, sf):
    return streaming_rollup.stream_join_alert_context(spark, sf)


def _q_streaming_join_outer(spark, sf):
    return streaming_rollup.stream_join_alert_context_outer(spark, sf)


def _q_streaming_join_full(spark, sf):
    return streaming_rollup.stream_join_alert_context_full(spark, sf)


def _q_bm25_search(spark, sf):
    return pipeline.bm25_search(load_table(spark, sf, "documents"))


def _q_minhash_portable(spark, sf):
    return dedup.minhash_lsh_pairs_portable(load_table(spark, sf, "documents"))


def _q_simhash_portable(spark, sf):
    return dedup.simhash_pairs_portable(load_table(spark, sf, "documents"))


def _q_attribution(spark, sf):
    return event_analytics.attribution(load_table(spark, sf, "events"))


def _q_source_quantile_normalize(spark, sf):
    return pipeline.source_quantile_normalize(load_table(spark, sf, "documents"))


def _q_tokenize_to_ids(spark, sf):
    # Driver-shape contract: the harness canonicalizer hashes pandas
    # values and crashes on list cells (r04's only red row), so the
    # registry entry flattens `token_ids` to a comma-joined string.
    # The array-typed API remains `pipeline.tokenize_to_ids`.
    return pipeline.tokenize_to_ids(load_table(spark, sf, "documents")).select(
        "doc_id",
        "n_tokens",
        F.array_join(F.col("token_ids").cast("array<string>"), ",").alias(
            "token_ids_csv"
        ),
    )


def _q_streaming_value_histogram(spark, sf):
    return streaming_rollup.stream_value_histogram(spark, sf)


def _q_streaming_trending_types(spark, sf):
    return streaming_rollup.stream_trending_types(spark, sf)


def _q_pareto_contribution(spark, sf):
    return analytics.pareto_contribution(load_table(spark, sf, "events"))


def _q_dataset_checksum(spark, sf):
    return analytics.dataset_checksum(load_table(spark, sf, "documents"))


def _q_knn_projected(spark, sf):
    return similarity.knn_projected(load_table(spark, sf, "embeddings"))


def _q_trend_slope(spark, sf):
    return analytics.trend_slope_panel(load_table(spark, sf, "events"))


def _q_source_kl(spark, sf):
    return pipeline.source_kl_divergence(load_table(spark, sf, "documents"))


def _q_k_anonymity(spark, sf):
    return curation.k_anonymity_audit(load_table(spark, sf, "customer"))


def _q_forget_users(spark, sf):
    return ivm.forget_users(load_table(spark, sf, "events"))


def _q_dup_rate_by_source(spark, sf):
    return dedup.dup_rate_by_source(load_table(spark, sf, "documents"))


def _q_data_contract(spark, sf):
    return curation.data_contract_audit(load_table(spark, sf, "events"))


def _q_psi_drift(spark, sf):
    return anomaly.psi_drift(load_table(spark, sf, "events"))


def _q_lateral_topk(spark, sf):
    return relational.lateral_topk(spark, sf)


def _q_streaming_contract(spark, sf):
    return streaming_rollup.stream_contract_audit(spark, sf)


def _q_blocking_stats(spark, sf):
    return dedup.blocking_stats(load_table(spark, sf, "documents"))


def _q_bigram_logprob(spark, sf):
    return pipeline.bigram_logprob_score(load_table(spark, sf, "documents"))


def _q_robust_trend(spark, sf):
    return analytics.robust_trend_panel(load_table(spark, sf, "events"))


def _q_streaming_pop(spark, sf):
    return streaming_rollup.stream_period_over_period(spark, sf)


def _q_streaming_rfm(spark, sf):
    return streaming_rollup.stream_rfm_segments(spark, sf)


def _q_ab_test(spark, sf):
    return event_analytics.ab_test_panel(load_table(spark, sf, "events"))


def _q_survival_curve(spark, sf):
    return event_analytics.survival_curve(load_table(spark, sf, "events"))


def _q_funnel_windowed(spark, sf):
    return event_analytics.funnel_windowed(load_table(spark, sf, "events"))


def _q_user_features(spark, sf):
    return event_analytics.user_feature_table(load_table(spark, sf, "events"))


def _q_streaming_user_features(spark, sf):
    return streaming_rollup.stream_user_feature_table(spark, sf)


def _q_slo_burn(spark, sf):
    return monitoring.slo_burn(load_table(spark, sf, "events"))


def _q_bounce_rate(spark, sf):
    return monitoring.bounce_rate_daily(load_table(spark, sf, "events"))


def _q_trend_forecast(spark, sf):
    return analytics.trend_forecast(load_table(spark, sf, "events"))


def _q_streaming_slo(spark, sf):
    return streaming_rollup.stream_slo_burn(spark, sf)


def _q_dispersion(spark, sf):
    return anomaly.dispersion_panel(load_table(spark, sf, "events"))


def _q_streaming_bounce(spark, sf):
    return streaming_rollup.stream_bounce_rate(spark, sf)


def _q_streaming_trend(spark, sf):
    return streaming_rollup.stream_trend_slope(spark, sf)


def _q_topk_with_ties(spark, sf):
    return relational.topk_with_ties(load_table(spark, sf, "events"))


def _q_nearest_join(spark, sf):
    return monitoring.nearest_event_join(load_table(spark, sf, "events"))


def _q_health_score(spark, sf):
    return monitoring.health_score(load_table(spark, sf, "events"))


def _q_streaming_funnel(spark, sf):
    # watermarked variant: correct under out-of-order arrival across
    # micro-batches (buffer + versioned corrections), not just on the
    # in-order replay — the plain state machine stays as library
    # surface (stateful.stream_funnel), equivalence-tested
    from real_time_database_monitoring_system_spark.streaming import stateful

    return stateful.stream_funnel_watermarked(spark, sf)


def _q_independence_chi2(spark, sf):
    return analytics.independence_chi2(load_table(spark, sf, "events"))


def _q_rfm_segments(spark, sf):
    return event_analytics.rfm_segments(load_table(spark, sf, "events"))


def _q_period_over_period(spark, sf):
    return monitoring.period_over_period(load_table(spark, sf, "events"))


def _q_trigram_langid(spark, sf):
    return text_ops.char_trigram_langid(load_table(spark, sf, "documents"))


def _q_market_share(spark, sf):
    return relational.market_share_panel(
        load_table(spark, sf, "region"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
    )


def _q_quality_logit(spark, sf):
    return text_ops.quality_logit(load_table(spark, sf, "documents"))


def _q_incremental_rollup(spark, sf):
    # deterministic CDC fixture: the stored view was built when the
    # feed held event_id % 10 != 0; the current snapshot holds
    # event_id % 7 != 0 — so ids divisible by 7 (not 10) were deleted
    # and ids divisible by 10 (not 7) inserted. The operator maintains
    # the view from the diff; the oracle recomputes from scratch.
    events = load_table(spark, sf, "events")
    old = events.filter(F.col("event_id") % 10 != 0)
    new = events.filter(F.col("event_id") % 7 != 0)
    return ivm.delta_rollup_apply(old, new)


def _q_embedding_quantize(spark, sf):
    return similarity.embedding_quantize_int8(load_table(spark, sf, "embeddings"))


def _q_random_projection(spark, sf):
    return similarity.random_projection(load_table(spark, sf, "embeddings"))


def _q_join_cardinality(spark, sf):
    # predict the attribution join's size: purchases × touches per user
    from real_time_database_monitoring_system_spark.operators import skew

    ev = load_table(spark, sf, "events")
    return skew.join_cardinality_estimate(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type").isin("view", "click")),
        "user_id",
    )


def _q_latency_percentile_panel(spark, sf):
    return monitoring.latency_percentile_panel(load_table(spark, sf, "events"))


def _q_trending_types(spark, sf):
    return monitoring.trending_types(load_table(spark, sf, "events"))


def _q_weighted_sample(spark, sf):
    return pipeline.weighted_sample(load_table(spark, sf, "documents"))


def _q_sliding_rollup(spark, sf):
    return monitoring.sliding_rollup(load_table(spark, sf, "events"))


def _q_streaming_sliding_rollup(spark, sf):
    return streaming_rollup.stream_sliding_rollup(spark, sf)


def _q_pmi_pairs(spark, sf):
    return pipeline.pmi_pairs(load_table(spark, sf, "documents"))


def _q_dup_cluster_sizes(spark, sf):
    return dedup.dup_cluster_sizes(load_table(spark, sf, "documents"))


def _q_equidepth_histogram(spark, sf):
    return analytics.equidepth_histogram(load_table(spark, sf, "events"))


def _q_active_users_rolling(spark, sf):
    return analytics.active_users_rolling(load_table(spark, sf, "events"))


def _q_drift_cusum(spark, sf):
    return anomaly.drift_cusum(load_table(spark, sf, "events"))


def _q_label_centroid_similarity(spark, sf):
    return similarity.label_centroid_similarity(load_table(spark, sf, "embeddings"))


def _q_moment_stats(spark, sf):
    return analytics.moment_stats(load_table(spark, sf, "events"))


def _q_top_session_paths(spark, sf):
    return event_analytics.top_session_paths(load_table(spark, sf, "events"))


def _q_fk_integrity_audit(spark, sf):
    return relational.fk_integrity_audit(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "region"),
    )


def _q_streaming_throttled_alerts(spark, sf):
    return streaming_rollup.stream_throttled_alerts(spark, sf)


def _q_multi_grain_rollup(spark, sf):
    return monitoring.multi_grain_rollup(load_table(spark, sf, "events"))


def _q_user_entropy(spark, sf):
    return event_analytics.user_entropy(load_table(spark, sf, "events"))


def _q_split_leakage(spark, sf):
    return curation.split_leakage(load_table(spark, sf, "documents"))


def _q_curation_waterfall(spark, sf):
    return pipeline.curation_waterfall(load_table(spark, sf, "documents"))


def _q_scd2_enrich(spark, sf):
    return relational.scd2_enrich(
        load_table(spark, sf, "events"), load_table(spark, sf, "customer")
    )


def _q_type_correlation(spark, sf):
    return analytics.type_correlation(load_table(spark, sf, "events"))


def _q_streaming_session_paths(spark, sf):
    return streaming_rollup.stream_session_paths(spark, sf)


def _q_streaming_stateful(spark, sf):
    from real_time_database_monitoring_system_spark.streaming import stateful

    return stateful.stream_user_tracker(spark, sf)


# ---- round 3: OLAP surface (grouped subtotals, windows, set ops, reshape) ----


def _q_rollup_totals(spark, sf):
    return analytics.rollup_totals(load_table(spark, sf, "orders"))


def _q_cube_totals(spark, sf):
    return analytics.cube_totals(load_table(spark, sf, "documents"))


def _q_grouping_sets_panel(spark, sf):
    return analytics.grouping_sets_panel(load_table(spark, sf, "documents"))


def _q_window_suite(spark, sf):
    return analytics.window_suite(load_table(spark, sf, "events"))


def _q_user_set_ops(spark, sf):
    return analytics.user_set_ops(load_table(spark, sf, "events"))


def _q_pivot_event_counts(spark, sf):
    return analytics.pivot_event_counts(load_table(spark, sf, "events"))


def _q_unpivot_summary(spark, sf):
    return analytics.unpivot_summary(load_table(spark, sf, "events"))


def _q_value_histogram(spark, sf):
    return analytics.value_histogram(load_table(spark, sf, "events"))


# ---- round 3: corpus-pipeline additions ----


def _q_paragraph_dedup(spark, sf):
    """Drives paragraph_dedup over a corpus with REAL repeated
    paragraphs, synthesized deterministically (doc i = text_i + "\\n" +
    text_{i+1}, so every interior paragraph occurs in two documents).
    The single-task lead() window is test-corpus synthesis, not part
    of the operator under test."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    w = Window.orderBy("doc_id")
    synth = (
        docs.select(
            "doc_id",
            F.col("text"),
            F.lead("text", 1).over(w).alias("nxt"),
        )
        # drop NULL on BOTH sides (the oracle's || would propagate a
        # NULL text into a NULL synth doc; concat_ws would silently
        # skip it — filtering first makes the two identical)
        .filter(F.col("text").isNotNull() & F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws("\n", "text", "nxt").alias("text"))
    )
    return dedup.paragraph_dedup(synth)


def _q_hll_user_rollup(spark, sf):
    # verdict-column form (exact counts + in-bound boolean) so the
    # sketch rollup has a deterministic DuckDB twin — the raw-estimate
    # form stays as library surface (analytics.hll_user_rollup)
    return analytics.hll_user_rollup_checked(load_table(spark, sf, "events"))


def _q_unigram_logprob(spark, sf):
    return pipeline.unigram_logprob_score(load_table(spark, sf, "documents"))


def _q_streaming_enrich(spark, sf):
    return streaming_rollup.stream_enrich_static(spark, sf)


def _q_gapfill_locf(spark, sf):
    return gapfill.gapfill_locf(load_table(spark, sf, "events"))


def _q_gapfill_interpolate(spark, sf):
    return gapfill.gapfill_interpolate(load_table(spark, sf, "events"))


def _q_conversion_latency(spark, sf):
    return event_analytics.conversion_latency(load_table(spark, sf, "events"))


def _q_transition_matrix(spark, sf):
    return event_analytics.transition_matrix(load_table(spark, sf, "events"))


def _q_curate_corpus(spark, sf):
    return pipeline.curate_corpus(load_table(spark, sf, "documents"))


def _q_funnel_counts(spark, sf):
    return event_analytics.funnel_counts(load_table(spark, sf, "events"))


def _q_cohort_retention(spark, sf):
    return event_analytics.cohort_retention(load_table(spark, sf, "events"))


def _q_streaming_mad_alerts(spark, sf):
    return streaming_rollup.stream_mad_alerts(spark, sf)


def _q_mad_outliers(spark, sf):
    return anomaly.mad_outliers(load_table(spark, sf, "events"))


def _q_seasonal_baseline(spark, sf):
    return anomaly.seasonal_baseline(load_table(spark, sf, "events"))


def _q_variant_props_stats(spark, sf):
    return monitoring.variant_props_stats(load_table(spark, sf, "events"))


def _q_range_frame_stats(spark, sf):
    return analytics.range_frame_stats(load_table(spark, sf, "events"))


def _q_kll_value_rollup(spark, sf):
    # verdict-column form (exact discrete percentiles + rank-bound
    # booleans) so the KLL merge cascade has a deterministic DuckDB
    # twin — the raw-estimate form stays as library surface
    return sketches.kll_value_rollup_checked(load_table(spark, sf, "events"))


def _q_theta_user_overlap(spark, sf):
    return sketches.theta_user_overlap(load_table(spark, sf, "events"))


def _q_approx_topk_types(spark, sf):
    return sketches.approx_topk_types(load_table(spark, sf, "events"))


def _q_bloom_semi_revenue(spark, sf):
    """Revenue per return flag over lineitems of high-value orders,
    with the fact side Bloom-pruned map-side before the exact semi
    join. Exact for any (m, k) — the oracle is the plain IN-subquery."""
    li = load_table(spark, sf, "lineitem")
    keys = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        runtime_filter.bloom_semi_join(li, keys, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def _q_substring_dup_spans(spark, sf):
    return dedup.substring_dup_spans(load_table(spark, sf, "documents"))


def _q_user_day_streaks(spark, sf):
    return analytics.user_day_streaks(load_table(spark, sf, "events"))


def _q_cap_per_source(spark, sf):
    return curation.cap_per_source(load_table(spark, sf, "documents"))


def _q_assign_split(spark, sf):
    return curation.assign_split(load_table(spark, sf, "documents"))


def _q_shuffle_order(spark, sf):
    return curation.shuffle_order(load_table(spark, sf, "documents"))


def _q_kmeans_clusters(spark, sf):
    """Integer-quantized Lloyd k-means (k=8, 2 iterations) over
    embeddings; exact-deterministic, so oracle-backed despite being
    iterative (the SQL twin unrolls the same two iterations)."""
    return clustering.kmeans_clusters(load_table(spark, sf, "embeddings"))


def _q_semantic_dedup(spark, sf):
    """SemDeDup: near-dup pairs searched only within a k-means
    cluster (cluster id = blocking key)."""
    return clustering.semantic_dedup(load_table(spark, sf, "embeddings"))


def _q_embedding_prototypicality(spark, sf):
    """Distance-to-centroid pruning signal with per-cluster discrete
    0.9-quantile tail flag."""
    return clustering.prototypicality(load_table(spark, sf, "embeddings"))


def _q_feature_hash_embed(spark, sf):
    """Hashing-trick doc featurization in long form (portable
    md5-prefix buckets, exact-integer L2 norm)."""
    return pipeline.feature_hash_embed(load_table(spark, sf, "documents"))


def _q_doc_novelty(spark, sf):
    """Fraction of each doc's distinct shingles with corpus DF = 1."""
    return dedup.doc_novelty(load_table(spark, sf, "documents"))


def _q_bpe_pair_stats(spark, sf):
    """Top adjacent char-pair counts — BPE's first-merge statistic."""
    return text_ops.bpe_pair_stats(load_table(spark, sf, "documents"))


def _q_containment_pairs(spark, sf):
    """Asymmetric shingle containment |A∩B|/min(|A|,|B|) — catches
    excerpt dups Jaccard misses; same inverted-index candidate plan."""
    return dedup.containment_pairs(load_table(spark, sf, "documents"))


def _q_fuzzy_prefix_match(spark, sf):
    """Blocked fuzzy linkage: exact-prefix blocking key, levenshtein
    on candidates only."""
    return dedup.fuzzy_prefix_match(load_table(spark, sf, "documents"))


def _q_interval_overlap_join(spark, sf):
    """Range join via bucket-split equi-join: sessions × busy-hour
    windows on measure-positive time overlap."""
    return monitoring.interval_overlap_join(load_table(spark, sf, "events"))


def _q_ewma_smooth(spark, sf):
    """Exact finite-window EWMA (α=1/2, 8 lags) per (user, type)
    series; decimal weighted sum, one final double division."""
    return monitoring.ewma_smooth(load_table(spark, sf, "events"))


def _q_minmax_normalize(spark, sf):
    """Per-type min-max feature scaling via broadcast stats join (no
    per-type window)."""
    return pipeline.minmax_normalize(load_table(spark, sf, "events"))


def _q_winsorized_stats(spark, sf):
    """Winsorized per-type summary: exact percentile_disc cut points,
    comparison-only clipping, decimal mean."""
    return anomaly.winsorized_stats(load_table(spark, sf, "events"))


def _q_column_profile(spark, sf):
    """Per-column rows/NULLs/exact-distinct profile via one stack
    unpivot + keyed aggregate."""
    return analytics.column_profile(load_table(spark, sf, "events"))


def _q_skew_profile(spark, sf):
    """Heavy-hitter join-key diagnosis: one plan (counts + one-row
    broadcast totals + TakeOrdered), no driver-side count action."""
    from real_time_database_monitoring_system_spark.operators import skew

    return skew.skew_profile(load_table(spark, sf, "events"), "user_id")


def _q_temporal_split(spark, sf):
    """Embargoed time-ordered train/eval split; percentile_disc
    cutoff broadcast, map-side labeling."""
    return curation.temporal_split(load_table(spark, sf, "events"))


def _q_pagerank_transitions(spark, sf):
    """Integer-millionth PageRank (3 iterations) on the event-type
    transition graph; unrolled-CTE oracle generated from the same
    iteration count."""
    return event_analytics.pagerank_transitions(load_table(spark, sf, "events"))


def _q_freshness_audit(spark, sf):
    """Per-source latest arrival, lag vs the snapshot instant, stale
    flag — the ingestion-health panel."""
    return monitoring.freshness_audit(load_table(spark, sf, "events"))


def _q_class_balance(spark, sf):
    """Label-mix audit: per-class share + exact single-division χ²
    against uniform."""
    return analytics.class_balance(load_table(spark, sf, "events"))


def _q_streaming_freshness(spark, sf):
    """Streaming ingestion-health panel (availableNow replay);
    state = #types rows, shares the batch freshness_audit oracle."""
    return streaming_rollup.stream_freshness_audit(spark, sf)


def _driver_green_names(repo_dir: str | None = None) -> frozenset[str]:
    """Entries whose LATEST driver verdict is a full green row
    (rows + schema + hash) across the committed CORRECTNESS_r*.json
    artifacts next to this file. Thin set view over
    `_driver_green_rounds` for callers that only need membership."""
    return frozenset(_driver_green_rounds(repo_dir))


def _driver_green_rounds(repo_dir: str | None = None) -> dict[str, int]:
    """Map each entry whose LATEST driver verdict is a full green row
    (rows + schema + hash) to the ROUND NUMBER of that verdict, folding
    the committed CORRECTNESS_r*.json artifacts next to this file.

    Latest-wins, not green-latch: artifacts are folded in numeric
    round order, so an entry that was green in an early round but
    REGRESSED in a later one drops out of the map (never-green again)
    and the rotation puts it back in the driver window for
    re-verification — a permanent latch would leave red evidence
    unactionable forever while reporting full coverage.

    The round number is the staleness signal for the green partition:
    once every entry is green, `queries()` cycles driver evidence by
    re-checking the entries whose proof is OLDEST first, so a silent
    regression in the registry tail surfaces within ~registry/50
    rounds instead of hiding forever behind a fixed canonical order
    (VERDICT r5 finding #2).

    Unreadable or non-dict files are skipped, so a corrupt artifact
    degrades to 'not mentioned' rather than crashing the driver
    contract. Results are memoized per directory (artifacts only
    change between rounds, and queries() is called in per-query
    loops by the harness)."""
    import os

    repo = repo_dir or os.path.dirname(os.path.abspath(__file__))
    return _driver_green_rounds_cached(repo)


def _green_cache_impl(repo: str) -> dict[str, int]:
    import glob
    import json
    import os
    import re

    def _round_key(path: str) -> tuple[int, str]:
        # Latest-wins fold must follow NUMERIC round order: lexicographic
        # sorting puts r4 after r10–r39 and r100 before r99, letting a
        # stale artifact silently override a newer verdict (ADVICE r4).
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return (int(m.group(1)) if m else -1, path)

    verdict: dict[str, tuple[int, bool]] = {}
    for path in sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")), key=_round_key
    ):
        rnd = _round_key(path)[0]
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            # valid JSON but not the row map (truncated/repaired
            # artifact) — same degrade rule as unreadable files
            continue
        for name, row in data.items():
            if isinstance(row, dict):
                verdict[name] = (
                    rnd,
                    bool(
                        row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match")
                    ),
                )
    return {n: rnd for n, (rnd, ok) in verdict.items() if ok}


_driver_green_rounds_cached = functools.lru_cache(maxsize=8)(_green_cache_impl)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is the evidence plan: the driver evaluates only
    a 50-entry prefix per round, so entries without a green driver row
    must occupy the prefix or they can never be checked.

    Since round 4 the rotation is AUTOMATIC: the canonical dict below
    encodes a curated priority order (sketch-conversion proofs and
    VERDICT-anchor entries first), and this function stably partitions
    it so every entry with no green row across the committed
    CORRECTNESS_r*.json artifacts precedes every entry that already
    has one. Each round the driver's new artifact lands in the repo,
    and the next import re-derives the window — no manual reorder, no
    stale-prose risk (the failure mode that cost rounds 2 and 3 their
    rotation bookkeeping). The no-wasted-slot invariant is still
    machine-checked independently by tests/test_registry_window.py.

    Since round 6 the GREEN partition additionally rotates by
    STALENESS: green entries are ordered by the round of their latest
    green verdict (oldest proof first), with canonical order as the
    tiebreak. With the full registry green (round 5 closed coverage),
    a fixed canonical order would make the driver re-check the same
    50 entries forever while a regression in the tail hid
    indefinitely; oldest-first cycles the whole registry through
    driver evidence every ~registry/50 rounds, and a regressed entry
    re-enters the never-green prefix immediately (latest-wins fold).

    Every entry is oracle-backed (the five former rows-only sketch
    entries were converted in place to verdict-column forms, so no
    driver slot can ever burn on a `no_oracle` row again). Round 5
    closed full-registry driver evidence (223/223 green across
    r01–r05); growth resumed in round 6 under the same discipline —
    new entries are never-green, so they take the window prefix and
    get same-round driver evidence. Overflow entries remain covered
    by the identical local check (tests/test_oracle_parity.py runs
    the full registry every time)."""
    base = _queries_canonical()
    rounds = _driver_green_rounds()
    idx = {n: i for i, n in enumerate(base)}
    never = [n for n in base if n not in rounds]
    done = sorted((n for n in base if n in rounds), key=lambda n: (rounds[n], idx[n]))
    return {n: base[n] for n in (*never, *done)}


def _queries_canonical() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Curated priority order (the tiebreak within each rotation
    partition); `queries()` derives the driver-facing order from this
    plus the committed CORRECTNESS artifacts."""
    return {
        # -- r04 window (50 slots): never-green oracle-backed entries only.
        #    First the five in-place sketch conversions (driver evidence
        #    that the verdict-column forms hash-match), then the four
        #    entries VERDICT r3 flagged as anchors (portable dedup twins,
        #    IVM forget-users, BM25), then the round-3 late-addition block
        #    in registry order. --
        "value_percentiles_approx": _q_value_percentiles_approx,
        "minhash_lsh_pairs": _q_minhash_lsh,
        "simhash_pairs": _q_simhash_pairs,
        "hll_user_rollup": _q_hll_user_rollup,
        "kll_value_rollup": _q_kll_value_rollup,
        "minhash_portable_pairs": _q_minhash_portable,
        "simhash_portable_pairs": _q_simhash_portable,
        "bm25_search": _q_bm25_search,
        "forget_users_rollup": _q_forget_users,
        "containment_pairs": _q_containment_pairs,
        "fuzzy_prefix_match": _q_fuzzy_prefix_match,
        "interval_overlap_join": _q_interval_overlap_join,
        "ewma_smooth": _q_ewma_smooth,
        "minmax_normalize": _q_minmax_normalize,
        "winsorized_stats": _q_winsorized_stats,
        "column_profile": _q_column_profile,
        "skew_profile": _q_skew_profile,
        "temporal_split": _q_temporal_split,
        "pagerank_transitions": _q_pagerank_transitions,
        "freshness_audit": _q_freshness_audit,
        "class_balance": _q_class_balance,
        "touch_attribution": _q_attribution,
        "tokenize_to_ids": _q_tokenize_to_ids,
        "embedding_quantize_int8": _q_embedding_quantize,
        "random_projection": _q_random_projection,
        "knn_projected": _q_knn_projected,
        "trend_slope": _q_trend_slope,
        "source_kl_divergence": _q_source_kl,
        "k_anonymity_audit": _q_k_anonymity,
        "incremental_rollup": _q_incremental_rollup,
        "quality_logit": _q_quality_logit,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "data_contract_audit": _q_data_contract,
        "psi_drift": _q_psi_drift,
        "blocking_stats": _q_blocking_stats,
        "bigram_logprob": _q_bigram_logprob,
        "robust_trend": _q_robust_trend,
        "trigram_langid_eval": _q_trigram_langid,
        "rfm_segments": _q_rfm_segments,
        "ab_test_panel": _q_ab_test,
        "survival_curve": _q_survival_curve,
        "funnel_windowed": _q_funnel_windowed,
        "user_feature_table": _q_user_features,
        "slo_burn": _q_slo_burn,
        "bounce_rate_daily": _q_bounce_rate,
        "trend_forecast": _q_trend_forecast,
        "dispersion_panel": _q_dispersion,
        "topk_with_ties": _q_topk_with_ties,
        "nearest_event_join": _q_nearest_join,
        "health_score": _q_health_score,
        # -- r05 window candidates (22): the remaining never-green entries,
        #    ordered here so next round's 50-slot window picks them all up
        #    (plus 28 green representatives). Streaming twins sit here
        #    because their batch counterparts are in the r04 window and
        #    batch-equivalence tests pin the twin relationship; the batch
        #    entries here all have driver-green family representatives. --
        "period_over_period": _q_period_over_period,
        "independence_chi2": _q_independence_chi2,
        "join_cardinality": _q_join_cardinality,
        "latency_percentile_panel": _q_latency_percentile_panel,
        "trending_types": _q_trending_types,
        "pareto_contribution": _q_pareto_contribution,
        "dataset_checksum": _q_dataset_checksum,
        "source_quantile_normalize": _q_source_quantile_normalize,
        "lateral_topk": _q_lateral_topk,
        "market_share": _q_market_share,
        "streaming_freshness": _q_streaming_freshness,
        "streaming_join_full": _q_streaming_join_full,
        "streaming_value_histogram": _q_streaming_value_histogram,
        "streaming_trending_types": _q_streaming_trending_types,
        "streaming_contract_audit": _q_streaming_contract,
        "streaming_period_over_period": _q_streaming_pop,
        "streaming_rfm_segments": _q_streaming_rfm,
        "streaming_user_features": _q_streaming_user_features,
        "streaming_slo_burn": _q_streaming_slo,
        "streaming_bounce_rate": _q_streaming_bounce,
        "streaming_trend_slope": _q_streaming_trend,
        "streaming_funnel": _q_streaming_funnel,
        # -- overflow: all driver-green in r01/r02/r03; identical local
        #    harness check still runs on every entry
        #    (tests/test_oracle_parity.py) --
        "gapfill_interpolate": _q_gapfill_interpolate,
        "bloom_semi_revenue": _q_bloom_semi_revenue,
        "theta_user_overlap": _q_theta_user_overlap,
        "approx_topk_types": _q_approx_topk_types,
        "range_frame_stats": _q_range_frame_stats,
        "variant_props_stats": _q_variant_props_stats,
        "mad_outliers": _q_mad_outliers,
        "seasonal_baseline": _q_seasonal_baseline,
        "streaming_mad_alerts": _q_streaming_mad_alerts,
        "funnel_counts": _q_funnel_counts,
        "cohort_retention": _q_cohort_retention,
        "curate_corpus": _q_curate_corpus,
        "transition_matrix": _q_transition_matrix,
        "conversion_latency": _q_conversion_latency,
        "dedup_keepers": _q_dedup_keepers,
        "dedup_keepers_best": _q_dedup_keepers_best,
        "knn_lsh": _q_knn_lsh,
        "ivf_knn": _q_ivf_knn,
        "streaming_join_outer": _q_streaming_join_outer,
        "weighted_sample": _q_weighted_sample,
        "sliding_rollup": _q_sliding_rollup,
        "streaming_sliding_rollup": _q_streaming_sliding_rollup,
        "pmi_pairs": _q_pmi_pairs,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "equidepth_histogram": _q_equidepth_histogram,
        "active_users_rolling": _q_active_users_rolling,
        "drift_cusum": _q_drift_cusum,
        "label_centroid_similarity": _q_label_centroid_similarity,
        "moment_stats": _q_moment_stats,
        "top_session_paths": _q_top_session_paths,
        "fk_integrity_audit": _q_fk_integrity_audit,
        "streaming_throttled_alerts": _q_streaming_throttled_alerts,
        "multi_grain_rollup": _q_multi_grain_rollup,
        "user_entropy": _q_user_entropy,
        "split_leakage": _q_split_leakage,
        "curation_waterfall": _q_curation_waterfall,
        "scd2_enrich": _q_scd2_enrich,
        "type_correlation": _q_type_correlation,
        "streaming_session_paths": _q_streaming_session_paths,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "embedding_prototypicality": _q_embedding_prototypicality,
        "feature_hash_embed": _q_feature_hash_embed,
        "doc_novelty": _q_doc_novelty,
        "bpe_pair_stats": _q_bpe_pair_stats,
        "pricing_summary": _q_pricing_summary,
        "slow_sessions": _q_slow_sessions,
        "knn_bruteforce": _q_knn_bruteforce,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "embedding_near_dups": _q_embedding_near_dups,
        "multimodal_meta": _q_multimodal_meta,
        "anti_join_no_recent": _q_anti_join,
        "semi_join_urgent": _q_semi_join,
        "to_char_formats": _q_to_char_formats,
        "size_pretty": _q_size_pretty,
        "lag_delta": _q_lag_delta,
        "left_join_rollup": _q_left_join_rollup,
        "downsample_5min": _q_downsample_5min,
        "minute_corr_join": _q_minute_corr_join,
        "topk_events": _q_topk_events,
        "three_way_topk": _q_three_way_topk,
        "exact_dedup": _q_exact_dedup,
        "streaming_rollup_5min": _q_streaming_rollup,
        "paragraph_dedup": _q_paragraph_dedup,
        "substring_dup_spans": _q_substring_dup_spans,
        "streaming_sessions": _q_streaming_sessions,
        "upsert_merge": _q_upsert,
        "delete_where": _q_delete,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "chunk_documents": _q_chunk_documents,
        "corpus_stats": _q_corpus_stats,
        "gapfill_locf": _q_gapfill_locf,
        "rollup_totals": _q_rollup_totals,
        "cube_totals": _q_cube_totals,
        "grouping_sets_panel": _q_grouping_sets_panel,
        "window_suite": _q_window_suite,
        "user_set_ops": _q_user_set_ops,
        "pivot_event_counts": _q_pivot_event_counts,
        "unpivot_summary": _q_unpivot_summary,
        "value_histogram": _q_value_histogram,
        "cap_per_source": _q_cap_per_source,
        "assign_split": _q_assign_split,
        "shuffle_order": _q_shuffle_order,
        "streaming_enrich_static": _q_streaming_enrich,
        "unigram_logprob": _q_unigram_logprob,
        "update_where": _q_update,
        "streaming_alerts": _q_streaming_alerts,
        "streaming_stateful_tracker": _q_streaming_stateful,
        "streaming_join_alert_context": _q_streaming_join,
        "paginate_keyset": _q_paginate_keyset,
        "shard_pack": _q_shard_pack,
        "decontaminate": _q_decontaminate,
        "temperature_mix": _q_temperature_mix,
        "temperature_sample": _q_temperature_sample,
        "length_buckets": _q_length_buckets,
        "snapshot_diff": _q_snapshot_diff,
        "incremental_dedup": _q_incremental_dedup,
        "pii_redact": _q_pii_redact,
        "hash_sample": _q_hash_sample,
        "stratified_sample": _q_stratified_sample,
        "streaming_dedup": _q_streaming_dedup,
        "clean_text": _q_clean_text,
        "repetition_score": _q_repetition_score,
        "sql_bucket_panel": _q_sql_bucket_panel,
        "vocab_topk": _q_vocab_topk,
        "ngram_counts": _q_ngram_counts,
        "quality_quantile_filter": _q_quality_quantile_filter,
        "engine_info": _q_engine_info,
        "user_day_streaks": _q_user_day_streaks,
        "asof_join": _q_asof_join,
        "fingerprint": _q_fingerprint,
        "idle_sessions": _q_idle_sessions,
        "session_summary": _q_session_summary,
        "value_percentiles": _q_value_percentiles,
        "table_catalog": _q_table_catalog,
        "local_supplier_volume": _q_local_supplier_volume,
        "tps_per_user": _q_tps_per_user,
        "retention_filter": _q_retention_filter,
        "drilldown_grid": _q_drilldown_grid,
        "substring_search": _q_substring_search,
        "props_histogram": _q_props_histogram,
        "parts_by_brand": _q_parts_by_brand,
        "latest_per_user": _q_latest_per_user,
        "paginate_page2": _q_paginate_page2,
        "distinct_types": _q_distinct_types,
        "cross_join_lookup": _q_cross_join_lookup,
        "nations_per_region": _q_nations_per_region,
        "cache_hit_ratio": _q_cache_hit_ratio,
        "priority_bands": _q_priority_bands,
        "value_band_join": _q_value_band_join,
        "connection_load": _q_connection_load,
        "threshold_flags": _q_threshold_flags,
        "rollup_cascade": _q_rollup_cascade,
        "sessionize": _q_sessionize,
        "shipping_priority": _q_shipping_priority,
        "customer_rollup": _q_customer_rollup,
        "top_supplier_per_nation": _q_top_supplier_per_nation,
        "net_price_ratio": _q_net_price_ratio,
        "token_stats": _q_token_stats,
        "quality_score": _q_quality_score,
        "lang_id": _q_lang_id,
        # -- round-5 additions (placed LAST in canonical order so the
        #    23 pre-round-5 never-green entries keep window priority;
        #    23 + 6 = 29 never-green ≤ 50, so full-registry driver
        #    coverage still closes this round). --
        "benford_audit": _q_benford_audit,
        "value_concentration": _q_value_concentration,
        "ks_drift": _q_ks_drift,
        "acf_panel": _q_acf_panel,
        "vocab_growth": _q_vocab_growth,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "changepoint_detect": _q_changepoint_detect,
        "theil_sen_trend": _q_theil_sen_trend,
        "zipf_fit": _q_zipf_fit,
        "pca_power_iter": _q_pca_power_iter,
        # -- round-6 additions (growth resumed after round 5 closed
        #    full-registry coverage; never-green entries take the
        #    window prefix automatically, the staleness rotation fills
        #    the remaining slots with the oldest-proven entries). --
        "incremental_dedup_near": _q_incremental_dedup_near,
        "decontaminate_13gram": _q_decontaminate_13gram,
        "jaccard_threshold_curve": _q_jaccard_threshold_curve,
        "embedding_drift": _q_embedding_drift,
        "streaming_ks_drift": _q_streaming_ks_drift,
        "streaming_changepoint": _q_streaming_changepoint,
        "winnow_overlap_pairs": _q_winnow_overlap_pairs,
        "c4_rule_filter": _q_c4_rule_filter,
        "ann_recall_audit": _q_ann_recall_audit,
        "frame_samples": _q_frame_samples,
        "resize_payloads": _q_resize_payloads,
        "sequence_pack": _q_sequence_pack,
        "cramers_v": _q_cramers_v,
        "mutual_information": _q_mutual_information,
        "welch_ttest": _q_welch_ttest,
        "mannwhitney_u": _q_mannwhitney_u,
        "xcorr_panel": _q_xcorr_panel,
        "cooccurrence_edges": _q_cooccurrence_edges,
        "type_triangles": _q_type_triangles,
        "gopher_rule_filter": _q_gopher_rule_filter,
        "oov_rate": _q_oov_rate,
        "line_dedup": _q_line_dedup,
        "js_divergence": _q_js_divergence,
        "countmin_types": _q_countmin_types,
        # -- round-7 additions --
        "incremental_dedup_near_transitive": _q_incremental_dedup_near_transitive,
        "gopher_repetition": _q_gopher_repetition,
        "gopher_line_repetition": _q_gopher_line_repetition,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "stratified_sample_exact": _q_stratified_sample_exact,
        "pack_efficiency": _q_pack_efficiency,
        "seqlen_histogram": _q_seqlen_histogram,
        "vocab_coverage_curve": _q_vocab_coverage_curve,
        "boilerplate_lines": _q_boilerplate_lines,
        "streaming_line_boilerplate": _q_streaming_line_boilerplate,
        "streaming_psi_drift": _q_streaming_psi_drift,
        "streaming_mannwhitney": _q_streaming_mannwhitney,
        "streaming_welch": _q_streaming_welch,
        "char_entropy": _q_char_entropy,
        "lang_mismatch_audit": _q_lang_mismatch_audit,
        "cross_source_dup_matrix": _q_cross_source_dup_matrix,
        "payload_dedup": _q_payload_dedup,
        "split_embedding_leakage": _q_split_embedding_leakage,
        "distinct_ngram_ratio": _q_distinct_ngram_ratio,
        "pii_density_by_source": _q_pii_density_by_source,
        "simhash_distance_hist": _q_simhash_distance_hist,
        "sample_skew_audit": _q_sample_skew_audit,
        "streaming_moment_stats": _q_streaming_moment_stats,
        "cdc_chunk_dedup": _q_cdc_chunk_dedup,
        "bloom_fpr_audit": _q_bloom_fpr_audit,
        "template_prefix_groups": _q_template_prefix_groups,
        "contamination_by_source": _q_contamination_by_source,
        "negative_samples": _q_negative_samples,
        "streaming_cramers_v": _q_streaming_cramers_v,
        "streaming_mutual_information": _q_streaming_mutual_information,
        "audio_frame_energy": _q_audio_frame_energy,
        # -- round-8 additions (never-green → auto window prefix):
        #    the VERDICT r7 priority list — windowed/watermarked
        #    streaming PSI, interpolated counts-based percentiles,
        #    perplexity outliers, quality×dup calibration, winnowing
        #    longest-run — plus the norm-audit and mix-rebalance
        #    pipeline ops. --
        "value_percentiles_interp": _q_value_percentiles_interp,
        "windowed_psi": _q_windowed_psi,
        "streaming_windowed_psi": _q_streaming_windowed_psi,
        "doc_perplexity_outliers": _q_doc_perplexity_outliers,
        "quality_calibration_curve": _q_quality_calibration_curve,
        "winnow_longest_run": _q_winnow_longest_run,
        "embedding_norm_audit": _q_embedding_norm_audit,
        "mix_rebalance_plan": _q_mix_rebalance_plan,
        "streaming_value_percentiles": _q_streaming_value_percentiles,
        "temporal_split_kll": _q_temporal_split_kll,
        "encoding_audit": _q_encoding_audit,
        "intra_doc_line_dedup": _q_intra_doc_line_dedup,
        "apdex_score": _q_apdex_score,
        "gap_histogram": _q_gap_histogram,
        "streaming_gap_histogram": _q_streaming_gap_histogram,
        "streaming_apdex": _q_streaming_apdex,
        "dup_degree_stats": _q_dup_degree_stats,
        # -- round-8 fourth wave: arrival burstiness (batch + count-
        #    state twin), streaming encoding audit, per-source length
        #    quantiles (keyed counts-family point), vocabulary overlap
        #    matrix, normalized-key dedup panel --
        "burstiness_panel": _q_burstiness_panel,
        "streaming_burstiness": _q_streaming_burstiness,
        "streaming_encoding_audit": _q_streaming_encoding_audit,
        "doc_length_percentiles": _q_doc_length_percentiles,
        "vocab_overlap_matrix": _q_vocab_overlap_matrix,
        "normalized_dedup": _q_normalized_dedup,
        # -- round-8 sixth wave: the drift-panel completion (W1
        #    distance + streaming twin, ordinal effect size), the
        #    delete-one-bucket jackknife (distributed error bars),
        #    rank correlation, lexical richness, journey
        #    predictability --
        "wasserstein_drift": _q_wasserstein_drift,
        "streaming_wasserstein": _q_streaming_wasserstein,
        "cliffs_delta": _q_cliffs_delta,
        "jackknife_variance": _q_jackknife_variance,
        "spearman_corr": _q_spearman_corr,
        "vocab_richness": _q_vocab_richness,
        "transition_entropy": _q_transition_entropy,
        # -- round-8 seventh wave: the remaining two-sample-panel
        #    streaming twins (cliffs shares the wasserstein state;
        #    jackknife's state is exactly B·#types rows forever) --
        "streaming_cliffs": _q_streaming_cliffs,
        "streaming_jackknife": _q_streaming_jackknife,
        # -- round-9 first wave: ordinal association over the bounded
        #    dense grid (batch + joint-count-state twin) --
        "kendall_tau": _q_kendall_tau,
        "streaming_kendall": _q_streaming_kendall,
        # -- round-9: day-over-day W1 against a sliding reference
        #    (batch + the genuinely WATERMARKED eviction twin) --
        "windowed_wasserstein": _q_windowed_wasserstein,
        "streaming_windowed_wasserstein": _q_streaming_windowed_wasserstein,
        # -- round-9: per-source length × quality joint histogram --
        "len_quality_histogram": _q_len_quality_histogram,
        # -- round-9: signature-vs-exact dedup agreement (Cohen's κ) --
        "dedup_agreement_kappa": _q_dedup_agreement_kappa,
        # -- round-9: dup-chain length histogram from winnowing runs --
        "winnow_chain_lengths": _q_winnow_chain_lengths,
        # -- round-9: the embedding-LSH PRODUCTION operating point
        #    (16-bit bands, the measured 200k sizing) oracle-pinned,
        #    the minhash two-operating-point pattern; threshold −1
        #    emits every banded candidate with its cosine so the
        #    check exercises real rows at check scale --
        "embedding_near_dups_prod": _q_embedding_near_dups_prod,
        # -- round-9: day-over-day KS completes the windowed drift
        #    triple from the same day-shifted count relation --
        "windowed_ks": _q_windowed_ks,
        "streaming_windowed_ks": _q_streaming_windowed_ks,
        # -- round-9 second wave: the k-sample rank test (batch +
        #    count-state twin) --
        "kruskal_wallis": _q_kruskal_wallis,
        "streaming_kruskal": _q_streaming_kruskal,
        # -- round-9: nonparametric trend tests over the dense daily
        #    count relation (batch + daily-count-state twins) --
        "mann_kendall_trend": _q_mann_kendall_trend,
        "streaming_mann_kendall": _q_streaming_mann_kendall,
        "runs_test": _q_runs_test,
        "streaming_runs_test": _q_streaming_runs_test,
        # -- round-9: the dedup before/after quality-distribution PSI --
        "dedup_quality_shift": _q_dedup_quality_shift,
        # -- round-9: MinHash estimate-vs-exact Jaccard calibration --
        "minhash_jaccard_calibration": _q_minhash_jaccard_calibration,
        # -- round-9: per-day tail-quantile drift panel (batch + the
        #    watermarked finalized-day twin) --
        "quantile_drift": _q_quantile_drift,
        "streaming_quantile_drift": _q_streaming_quantile_drift,
        # -- round-9: spread-homogeneity components (batch + twin) --
        "brown_forsythe": _q_brown_forsythe,
        "streaming_brown_forsythe": _q_streaming_brown_forsythe,
        # -- round-9: parametric k-sample mean test (batch + the
        #    family's best-bounded twin: 3 integers per type) --
        "anova_oneway": _q_anova_oneway,
        "streaming_anova": _q_streaming_anova,
        # -- round-9: sign-based k-sample location test (batch + twin)
        #    and the most-duplicated-passages report --
        "mood_median_test": _q_mood_median_test,
        "streaming_mood_median": _q_streaming_mood_median,
        "top_dup_ngrams": _q_top_dup_ngrams,
        # -- round-9: weekly-shape goodness-of-fit + the per-source
        #    boilerplate report --
        "dow_activity_gof": _q_dow_activity_gof,
        "top_dup_ngrams_by_source": _q_top_dup_ngrams_by_source,
        # -- round-10: the two-sample panel's remaining members
        #    (tail-weighted L2, plain L2, rotation-invariant sup) +
        #    robust shift effect size, each with its twin --
        "anderson_darling": _q_anderson_darling,
        "streaming_anderson_darling": _q_streaming_anderson_darling,
        "cramer_von_mises": _q_cramer_von_mises,
        "streaming_cramer_von_mises": _q_streaming_cramer_von_mises,
        "kuiper_drift": _q_kuiper_drift,
        "streaming_kuiper": _q_streaming_kuiper,
        "hodges_lehmann": _q_hodges_lehmann,
        "streaming_hodges_lehmann": _q_streaming_hodges_lehmann,
        # -- round-10 wave 2: weekly-shape twin, per-source signature
        #    audit, and the windowed family's tail + effect-size
        #    members (batch + watermarked twins) --
        "streaming_dow_gof": _q_streaming_dow_gof,
        "dedup_agreement_by_source": _q_dedup_agreement_by_source,
        "windowed_anderson_darling": _q_windowed_anderson_darling,
        "streaming_windowed_anderson_darling": _q_streaming_windowed_ad,
        "windowed_cliffs_delta": _q_windowed_cliffs_delta,
        "streaming_windowed_cliffs": _q_streaming_windowed_cliffs,
        # -- round-10 wave 3: cycle-aware and ordered-alternative
        #    trend tests (batch + twins) --
        "seasonal_mann_kendall": _q_seasonal_mann_kendall,
        "streaming_seasonal_mann_kendall": _q_streaming_seasonal_mk,
        "jonckheere_terpstra": _q_jonckheere_terpstra,
        "streaming_jonckheere": _q_streaming_jonckheere,
        # -- round-10 wave 4: two-sample scale test + boilerplate
        #    mass budget --
        "ansari_bradley": _q_ansari_bradley,
        "streaming_ansari_bradley": _q_streaming_ansari_bradley,
        "boilerplate_mass_by_source": _q_boilerplate_mass_by_source,
        # -- round-10 wave 5: the windowed drift panel's last two
        #    members (L2 + rotation-invariant sup), batch + twins --
        "windowed_cramer_von_mises": _q_windowed_cvm,
        "streaming_windowed_cvm": _q_streaming_windowed_cvm,
        "windowed_kuiper": _q_windowed_kuiper,
        "streaming_windowed_kuiper": _q_streaming_windowed_kuiper,
        # -- round-10 wave 6: the dispersion pair's tail-weighted
        #    member --
        "mood_scale_test": _q_mood_scale_test,
        "streaming_mood_scale": _q_streaming_mood_scale,
        # -- round-11 wave 1: the two-sample rank panel's omnibus
        #    member — Lepage's combined location+scale statistic --
        "lepage_test": _q_lepage_test,
        "streaming_lepage": _q_streaming_lepage,
        # -- round-11 wave 2: drift ATTRIBUTION — the windowed panel
        #    keyed by the bounded experiment cohort (which cohort
        #    drifted, not just which day) --
        "windowed_ks_by_cohort": _q_windowed_ks_by_cohort,
        "streaming_windowed_ks_by_cohort": _q_streaming_wks_by_cohort,
        "windowed_wasserstein_by_cohort": _q_windowed_w1_by_cohort,
        "streaming_windowed_w1_by_cohort": _q_streaming_ww1_by_cohort,
        # -- round-11 wave 3: changepoint pair over the calendar-sized
        #    daily relation — retrospective (Pettitt) + sequential
        #    (Page–Hinkley) --
        "pettitt_test": _q_pettitt_test,
        "streaming_pettitt": _q_streaming_pettitt,
        "page_hinkley": _q_page_hinkley,
        "streaming_page_hinkley": _q_streaming_page_hinkley,
        # -- round-11 wave 4: the windowed panel's omnibus member --
        "windowed_lepage": _q_windowed_lepage,
        "streaming_windowed_lepage": _q_streaming_windowed_lepage,
        # -- round-11 wave 5: day-blocked k-sample rank test --
        "friedman_test": _q_friedman_test,
        "streaming_friedman": _q_streaming_friedman,
        # -- round-11 wave 6: changepoint attribution + the rollout
        #    review report over the cohort drift panel --
        "pettitt_by_cohort": _q_pettitt_by_cohort,
        "streaming_pettitt_by_cohort": _q_streaming_pettitt_by_cohort,
        "cohort_drift_summary": _q_cohort_drift_summary,
        "page_hinkley_by_cohort": _q_page_hinkley_by_cohort,
        "streaming_ph_by_cohort": _q_streaming_ph_by_cohort,
        # -- round-11 wave 8: the weighted blocked k-sample test --
        "quade_test": _q_quade_test,
        "streaming_quade": _q_streaming_quade,
        # -- round-11 wave 9: one-vs-rest per-source length panel --
        "source_length_drift": _q_source_length_drift,
        # -- round-12 (consolidation; growth capped ~5/round, VERDICT
        #    r11): the cohort ingest-column path built as code --
        "windowed_ks_by_cohort_enriched": _q_windowed_ks_by_cohort_enriched,
    }


def _q_windowed_ks_by_cohort_enriched(spark, sf):
    """The cohort-as-ingest-column path (VERDICT r11 task 3): the same
    drift panel as `windowed_ks_by_cohort` but over a `with_cohort`
    enriched feed, driving the materialized-column branch of
    `util.windowed_day_cents_counts` (the reduction keys on the
    pre-computed ``cohort`` column; `props` is never parsed inside
    the reduction). Here the projection is lazy (same scan), so
    results are bit-identical to the parse path and the shared oracle
    pins both; production materializes the projection at ingest —
    measured at 100M rows: 15.4 s parse path → 5.9 s over the
    materialized column ≈ the 5.8 s global-panel relation factor, with
    a 22 s one-time enrich+write (SCALE.md round-12 row)."""
    from real_time_database_monitoring_system_spark.operators.util import (
        with_cohort,
    )

    return anomaly.windowed_ks_by_cohort(
        with_cohort(load_table(spark, sf, "events"))
    )


def _q_source_length_drift(spark, sf):
    return pipeline.source_length_drift(load_table(spark, sf, "documents"))


def _q_quade_test(spark, sf):
    return analytics.quade_test(load_table(spark, sf, "events"))


def _q_streaming_quade(spark, sf):
    return streaming_rollup.stream_quade(spark, sf)


def _q_page_hinkley_by_cohort(spark, sf):
    return anomaly.page_hinkley_by_cohort(load_table(spark, sf, "events"))


def _q_streaming_ph_by_cohort(spark, sf):
    return streaming_rollup.stream_page_hinkley_by_cohort(spark, sf)


def _q_pettitt_by_cohort(spark, sf):
    return anomaly.pettitt_by_cohort(load_table(spark, sf, "events"))


def _q_streaming_pettitt_by_cohort(spark, sf):
    return streaming_rollup.stream_pettitt_by_cohort(spark, sf)


def _q_cohort_drift_summary(spark, sf):
    return analytics.cohort_drift_summary(load_table(spark, sf, "events"))


def _q_friedman_test(spark, sf):
    return analytics.friedman_test(load_table(spark, sf, "events"))


def _q_streaming_friedman(spark, sf):
    return streaming_rollup.stream_friedman(spark, sf)


def _q_windowed_lepage(spark, sf):
    return anomaly.windowed_lepage(load_table(spark, sf, "events"))


def _q_streaming_windowed_lepage(spark, sf):
    return streaming_rollup.stream_windowed_lepage(spark, sf)


def _q_pettitt_test(spark, sf):
    return anomaly.pettitt_test(load_table(spark, sf, "events"))


def _q_streaming_pettitt(spark, sf):
    return streaming_rollup.stream_pettitt(spark, sf)


def _q_page_hinkley(spark, sf):
    return anomaly.page_hinkley(load_table(spark, sf, "events"))


def _q_streaming_page_hinkley(spark, sf):
    return streaming_rollup.stream_page_hinkley(spark, sf)


def _q_windowed_ks_by_cohort(spark, sf):
    return anomaly.windowed_ks_by_cohort(load_table(spark, sf, "events"))


def _q_streaming_wks_by_cohort(spark, sf):
    return streaming_rollup.stream_windowed_ks_by_cohort(spark, sf)


def _q_windowed_w1_by_cohort(spark, sf):
    return analytics.windowed_wasserstein_by_cohort(load_table(spark, sf, "events"))


def _q_streaming_ww1_by_cohort(spark, sf):
    return streaming_rollup.stream_windowed_w1_by_cohort(spark, sf)


def _q_lepage_test(spark, sf):
    return anomaly.lepage_test(load_table(spark, sf, "events"))


def _q_streaming_lepage(spark, sf):
    return streaming_rollup.stream_lepage(spark, sf)


def _q_mood_scale_test(spark, sf):
    return anomaly.mood_scale_test(load_table(spark, sf, "events"))


def _q_streaming_mood_scale(spark, sf):
    return streaming_rollup.stream_mood_scale(spark, sf)


def _q_windowed_cvm(spark, sf):
    return anomaly.windowed_cramer_von_mises(load_table(spark, sf, "events"))


def _q_streaming_windowed_cvm(spark, sf):
    return streaming_rollup.stream_windowed_cvm(spark, sf)


def _q_windowed_kuiper(spark, sf):
    return anomaly.windowed_kuiper(load_table(spark, sf, "events"))


def _q_streaming_windowed_kuiper(spark, sf):
    return streaming_rollup.stream_windowed_kuiper(spark, sf)


def _q_ansari_bradley(spark, sf):
    return anomaly.ansari_bradley(load_table(spark, sf, "events"))


def _q_streaming_ansari_bradley(spark, sf):
    return streaming_rollup.stream_ansari_bradley(spark, sf)


def _q_boilerplate_mass_by_source(spark, sf):
    return dedup.boilerplate_mass_by_source(load_table(spark, sf, "documents"))


def _q_seasonal_mann_kendall(spark, sf):
    return anomaly.seasonal_mann_kendall(load_table(spark, sf, "events"))


def _q_streaming_seasonal_mk(spark, sf):
    return streaming_rollup.stream_seasonal_mann_kendall(spark, sf)


def _q_jonckheere_terpstra(spark, sf):
    return analytics.jonckheere_terpstra(load_table(spark, sf, "events"))


def _q_streaming_jonckheere(spark, sf):
    return streaming_rollup.stream_jonckheere(spark, sf)


def _q_streaming_dow_gof(spark, sf):
    return streaming_rollup.stream_dow_gof(spark, sf)


def _q_dedup_agreement_by_source(spark, sf):
    return dedup.dedup_agreement_by_source(load_table(spark, sf, "documents"))


def _q_windowed_anderson_darling(spark, sf):
    return anomaly.windowed_anderson_darling(load_table(spark, sf, "events"))


def _q_streaming_windowed_ad(spark, sf):
    return streaming_rollup.stream_windowed_anderson_darling(spark, sf)


def _q_windowed_cliffs_delta(spark, sf):
    return analytics.windowed_cliffs_delta(load_table(spark, sf, "events"))


def _q_streaming_windowed_cliffs(spark, sf):
    return streaming_rollup.stream_windowed_cliffs(spark, sf)


def _q_anderson_darling(spark, sf):
    return anomaly.anderson_darling(load_table(spark, sf, "events"))


def _q_streaming_anderson_darling(spark, sf):
    return streaming_rollup.stream_anderson_darling(spark, sf)


def _q_cramer_von_mises(spark, sf):
    return anomaly.cramer_von_mises(load_table(spark, sf, "events"))


def _q_streaming_cramer_von_mises(spark, sf):
    return streaming_rollup.stream_cramer_von_mises(spark, sf)


def _q_kuiper_drift(spark, sf):
    return anomaly.kuiper_drift(load_table(spark, sf, "events"))


def _q_streaming_kuiper(spark, sf):
    return streaming_rollup.stream_kuiper(spark, sf)


def _q_hodges_lehmann(spark, sf):
    return analytics.hodges_lehmann(load_table(spark, sf, "events"))


def _q_streaming_hodges_lehmann(spark, sf):
    return streaming_rollup.stream_hodges_lehmann(spark, sf)


def _q_dow_activity_gof(spark, sf):
    return analytics.dow_activity_gof(load_table(spark, sf, "events"))


def _q_top_dup_ngrams_by_source(spark, sf):
    return dedup.top_dup_ngrams_by_source(load_table(spark, sf, "documents"))


def _q_mood_median_test(spark, sf):
    return analytics.mood_median_test(load_table(spark, sf, "events"))


def _q_streaming_mood_median(spark, sf):
    return streaming_rollup.stream_mood_median(spark, sf)


def _q_top_dup_ngrams(spark, sf):
    return dedup.top_dup_ngrams(load_table(spark, sf, "documents"))


def _q_anova_oneway(spark, sf):
    return analytics.anova_oneway(load_table(spark, sf, "events"))


def _q_streaming_anova(spark, sf):
    return streaming_rollup.stream_anova(spark, sf)


def _q_brown_forsythe(spark, sf):
    return analytics.brown_forsythe(load_table(spark, sf, "events"))


def _q_streaming_brown_forsythe(spark, sf):
    return streaming_rollup.stream_brown_forsythe(spark, sf)


def _q_quantile_drift(spark, sf):
    return analytics.quantile_drift(load_table(spark, sf, "events"))


def _q_streaming_quantile_drift(spark, sf):
    return streaming_rollup.stream_quantile_drift(spark, sf)


def _q_minhash_jaccard_calibration(spark, sf):
    return dedup.minhash_jaccard_calibration(load_table(spark, sf, "documents"))


def _q_dedup_quality_shift(spark, sf):
    return curation.dedup_quality_shift(load_table(spark, sf, "documents"))


def _q_mann_kendall_trend(spark, sf):
    return anomaly.mann_kendall_trend(load_table(spark, sf, "events"))


def _q_streaming_mann_kendall(spark, sf):
    return streaming_rollup.stream_mann_kendall(spark, sf)


def _q_runs_test(spark, sf):
    return anomaly.runs_test(load_table(spark, sf, "events"))


def _q_streaming_runs_test(spark, sf):
    return streaming_rollup.stream_runs_test(spark, sf)


def _q_kruskal_wallis(spark, sf):
    return analytics.kruskal_wallis(load_table(spark, sf, "events"))


def _q_streaming_kruskal(spark, sf):
    return streaming_rollup.stream_kruskal(spark, sf)


def _q_windowed_ks(spark, sf):
    return anomaly.windowed_ks(load_table(spark, sf, "events"))


def _q_streaming_windowed_ks(spark, sf):
    return streaming_rollup.stream_windowed_ks(spark, sf)


def _q_embedding_near_dups_prod(spark, sf):
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf, "embeddings"),
        threshold=-1.0,
        bands=8,
        bits_per_band=16,
    )


def _q_winnow_chain_lengths(spark, sf):
    return dedup.winnow_chain_lengths(load_table(spark, sf, "documents"))


def _q_dedup_agreement_kappa(spark, sf):
    return dedup.dedup_agreement_kappa(load_table(spark, sf, "documents"))


def _q_len_quality_histogram(spark, sf):
    return curation.len_quality_histogram(load_table(spark, sf, "documents"))


def _q_windowed_wasserstein(spark, sf):
    return analytics.windowed_wasserstein(load_table(spark, sf, "events"))


def _q_streaming_windowed_wasserstein(spark, sf):
    return streaming_rollup.stream_windowed_wasserstein(spark, sf)


def _q_kendall_tau(spark, sf):
    return analytics.kendall_tau(load_table(spark, sf, "documents"))


def _q_streaming_kendall(spark, sf):
    return streaming_rollup.stream_kendall(spark, sf)


def _q_streaming_cliffs(spark, sf):
    return streaming_rollup.stream_cliffs_delta(spark, sf)


def _q_streaming_jackknife(spark, sf):
    return streaming_rollup.stream_jackknife(spark, sf)


def _q_wasserstein_drift(spark, sf):
    return analytics.wasserstein_drift(load_table(spark, sf, "events"))


def _q_streaming_wasserstein(spark, sf):
    return streaming_rollup.stream_wasserstein(spark, sf)


def _q_cliffs_delta(spark, sf):
    return analytics.cliffs_delta(load_table(spark, sf, "events"))


def _q_jackknife_variance(spark, sf):
    return analytics.jackknife_variance(load_table(spark, sf, "events"))


def _q_spearman_corr(spark, sf):
    return analytics.spearman_corr(load_table(spark, sf, "documents"))


def _q_vocab_richness(spark, sf):
    return text_ops.vocab_richness(load_table(spark, sf, "documents"))


def _q_transition_entropy(spark, sf):
    return event_analytics.transition_entropy(load_table(spark, sf, "events"))


def _q_burstiness_panel(spark, sf):
    return event_analytics.burstiness_panel(load_table(spark, sf, "events"))


def _q_streaming_burstiness(spark, sf):
    return streaming_rollup.stream_burstiness(spark, sf)


def _q_streaming_encoding_audit(spark, sf):
    return streaming_rollup.stream_encoding_audit(
        spark, sf, mutate=_inject_bad_encoding
    )


def _q_doc_length_percentiles(spark, sf):
    return pipeline.doc_length_percentiles(load_table(spark, sf, "documents"))


def _q_vocab_overlap_matrix(spark, sf):
    return text_ops.vocab_overlap_matrix(load_table(spark, sf, "documents"))


def _inject_norm_variants(docs):
    # deterministic casefold/punctuation/whitespace mirrors (the
    # synthetic corpus is byte-unique, which would make the panel a
    # trivially all-zero relation): every 7th doc re-appears from a
    # 'mirror' source, upper-cased with injected punctuation and
    # doubled spacing — byte-distinct, identical under the
    # normalization key; mirrored verbatim in the oracle
    return docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + F.lit(70_000_000)).alias("doc_id"),
            F.concat(
                F.regexp_replace(F.upper("text"), F.lit(" "), F.lit("  ")),
                F.lit(" !!!"),
            ).alias("text"),
            "lang",
            F.lit("mirror").alias("source"),
            "n_chars",
        )
    )


def _q_normalized_dedup(spark, sf):
    return dedup.normalized_dedup(
        _inject_norm_variants(load_table(spark, sf, "documents"))
    )


def _q_apdex_score(spark, sf):
    return analytics.apdex_score(load_table(spark, sf, "events"))


def _q_streaming_apdex(spark, sf):
    return streaming_rollup.stream_apdex(spark, sf)


def _q_gap_histogram(spark, sf):
    return event_analytics.gap_histogram(load_table(spark, sf, "events"))


def _q_streaming_gap_histogram(spark, sf):
    from real_time_database_monitoring_system_spark.streaming import stateful

    return stateful.stream_gap_histogram(spark, sf)


def _q_dup_degree_stats(spark, sf):
    # the near-dup mirror injection from cross_source_dup_matrix
    # (plain synthetic docs have near-zero dup structure — the
    # injected mirrors give the degree histogram real mass)
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")
    mirrored = docs.filter(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
        "text",
        F.concat(F.lit("mirror-of-"), F.col("source")).alias("source"),
    )
    return dedup.dup_degree_stats(docs.unionByName(mirrored))


def _q_streaming_value_percentiles(spark, sf):
    return streaming_rollup.stream_value_percentiles(spark, sf)


def _q_temporal_split_kll(spark, sf):
    return curation.temporal_split_kll(load_table(spark, sf, "events"))


def _inject_bad_encoding(docs):
    # deterministic mojibake/control-char contamination (the synthetic
    # corpus is clean ASCII, which would make the audit a trivially
    # all-zero panel): U+FFFD on every 9th doc, a C0 control byte on
    # every 13th — mirrored verbatim in the oracle via chr()
    return docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 9 == 0, F.lit(" bad��decode")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" ctl\x01byte")
            ).otherwise(F.lit("")),
        ),
    )


def _q_encoding_audit(spark, sf):
    return text_ops.encoding_audit(
        _inject_bad_encoding(load_table(spark, sf, "documents"))
    )


def _inject_repeated_lines(docs):
    # deterministic intra-doc repetition (the corpus is single-line):
    # a nav block repeated 3× on every 4th doc, a footer repeated 2×
    # on every 6th — mirrored verbatim in the oracle
    return docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nnav home about contact\nnav home about contact"
                      "\nnav home about contact"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.lit("\nfooter fine print\nfooter fine print"),
            ).otherwise(F.lit("")),
        ),
    )


def _q_intra_doc_line_dedup(spark, sf):
    return text_ops.intra_doc_line_dedup(
        _inject_repeated_lines(load_table(spark, sf, "documents"))
    )


def _q_value_percentiles_interp(spark, sf):
    return monitoring.value_percentiles_interp(load_table(spark, sf, "events"))


def _q_windowed_psi(spark, sf):
    return anomaly.windowed_psi(load_table(spark, sf, "events"))


def _q_streaming_windowed_psi(spark, sf):
    return streaming_rollup.stream_windowed_psi(spark, sf)


def _q_doc_perplexity_outliers(spark, sf):
    return pipeline.doc_perplexity_outliers(load_table(spark, sf, "documents"))


def _q_quality_calibration_curve(spark, sf):
    return curation.quality_calibration_curve(load_table(spark, sf, "documents"))


def _q_winnow_longest_run(spark, sf):
    return dedup.winnow_longest_run(load_table(spark, sf, "documents"))


def _q_embedding_norm_audit(spark, sf):
    return similarity.embedding_norm_audit(load_table(spark, sf, "embeddings"))


def _q_mix_rebalance_plan(spark, sf):
    return pipeline.mix_rebalance_plan(load_table(spark, sf, "documents"))


def _q_streaming_psi_drift(spark, sf):
    return streaming_rollup.stream_psi_drift(spark, sf)


def _q_streaming_mannwhitney(spark, sf):
    return streaming_rollup.stream_mannwhitney(spark, sf)


def _q_streaming_welch(spark, sf):
    return streaming_rollup.stream_welch(spark, sf)


def _q_char_entropy(spark, sf):
    return text_ops.char_entropy(load_table(spark, sf, "documents"))


def _q_lang_mismatch_audit(spark, sf):
    return text_ops.lang_mismatch_audit(load_table(spark, sf, "documents"))


def _q_cross_source_dup_matrix(spark, sf):
    # cross-source mirrors planted deterministically: every 23rd doc
    # is re-hosted VERBATIM under the next source ('mirror-of-<src>')
    # with a new id — the global (unblocked) banding must pair each
    # original with its foreign-source mirror
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")
    mirrored = docs.filter(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
        "text",
        F.concat(F.lit("mirror-of-"), F.col("source")).alias("source"),
    )
    return dedup.cross_source_dup_matrix(docs.unionByName(mirrored))


def _q_payload_dedup(spark, sf):
    # exact payload duplicates planted: every 11th doc's payload is
    # re-ingested under a new id; the content address must collapse
    # each copy onto the original (min doc_id keeper, 2 copies)
    docs = load_table(spark, sf, "documents")
    copies = docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(40_000_000)
    )
    return multimodal.payload_dedup(docs.unionByName(copies))


def _q_split_embedding_leakage(spark, sf):
    return similarity.split_embedding_leakage(load_table(spark, sf, "embeddings"))


def _q_distinct_ngram_ratio(spark, sf):
    return text_ops.distinct_ngram_ratio(load_table(spark, sf, "documents"))


def _q_pii_density_by_source(spark, sf):
    # same deterministic PII injection as pii_redact (the corpus is
    # digit-free); the oracle mirrors it
    docs = load_table(spark, sf, "documents")
    injected = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-867-5309")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" from host 10.0.0."),
                    (F.col("doc_id") % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return text_ops.pii_density_by_source(injected)


def _q_simhash_distance_hist(spark, sf):
    return dedup.simhash_distance_hist(load_table(spark, sf, "documents"))


def _q_sample_skew_audit(spark, sf):
    return pipeline.sample_skew_audit(load_table(spark, sf, "documents"))


def _q_streaming_moment_stats(spark, sf):
    return streaming_rollup.stream_moment_stats(spark, sf)


# the CDC demo payload: every 9th doc carries this SAME segment at a
# DIFFERENT offset (its own text precedes it); interior chunk
# boundaries re-align inside the segment, so its interior chunks dedup
# across docs even though no fixed-offset scheme would line them up
_CDC_SEG = (
    " the quick brown fox jumps over the lazy dog again and again while"
    " the pipeline measures content defined chunk realignment across"
    " shifted duplicate payloads planted in every ninth document of the"
    " corpus so that interior boundaries settle identically once the"
    " rolling window has fully entered the shared segment and the chunk"
    " stream re-synchronizes independent of each carrier document"
)


def _q_cdc_chunk_dedup(spark, sf):
    docs = load_table(spark, sf, "documents")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat("text", F.lit(_CDC_SEG))
        ).otherwise(F.col("text")),
    )
    return dedup.cdc_chunk_dedup(injected)


def _q_bloom_fpr_audit(spark, sf):
    return sketches.bloom_fpr_audit(load_table(spark, sf, "events"))


def _q_template_prefix_groups(spark, sf):
    # templates planted: every 5th doc opens with the same CMS header
    docs = load_table(spark, sf, "documents")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("TEMPLATE HEADER v1 all rights reserved "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return text_ops.template_prefix_groups(injected)


def _q_contamination_by_source(spark, sf):
    # the decontaminate_13gram benchmark suite, rolled up per source
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    bench = docs.filter((F.col("doc_id") % 7 == 0) & (F.size(toks) >= 16)).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.array_join(F.slice(toks, 4, 20), " ").alias("text"),
    )
    return curation.contamination_by_source(docs, bench, shingle_k=13)


def _q_negative_samples(spark, sf):
    return similarity.negative_samples(load_table(spark, sf, "embeddings"))


def _q_streaming_cramers_v(spark, sf):
    return streaming_rollup.stream_cramers_v(spark, sf)


def _q_streaming_mutual_information(spark, sf):
    return streaming_rollup.stream_mutual_information(spark, sf)


def _q_audio_frame_energy(spark, sf):
    return multimodal.audio_frame_energy(load_table(spark, sf, "documents"))


def _q_stratified_sample_exact(spark, sf):
    return pipeline.stratified_sample_exact(load_table(spark, sf, "documents"))


def _q_pack_efficiency(spark, sf):
    return pipeline.pack_efficiency(load_table(spark, sf, "documents"))


def _q_seqlen_histogram(spark, sf):
    return pipeline.seqlen_histogram(load_table(spark, sf, "documents"))


def _q_vocab_coverage_curve(spark, sf):
    return text_ops.vocab_coverage_curve(load_table(spark, sf, "documents"))


def _q_gopher_repetition(spark, sf):
    return text_ops.gopher_repetition(load_table(spark, sf, "documents"))


def _q_gopher_line_repetition(spark, sf):
    # the synthetic corpus is single-line; plant line/paragraph
    # structure deterministically (the gopher_rule_filter injection
    # pattern): %4 docs gain a repeated line, %6 a unique extra line,
    # %8 a repeated paragraph — so both dup families provably fire
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 4 == 0, F.lit("\nrepeat me\nrepeat me")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 6 == 0, F.lit("\nonce only")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 8 == 0, F.lit("\n\nsame para\n\nsame para")
            ).otherwise(F.lit("")),
        ),
    )
    return text_ops.gopher_line_repetition(injected)


def _inject_boilerplate(docs):
    # deterministic boilerplate lines for the hot-line panel entries:
    # a "subscribe" line on every 5th doc (df = n/5) and a copyright
    # footer on every 7th (df = n/7) — both far over the threshold at
    # every sf, while genuine body lines stay df = 1
    return docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\nsubscribe to our newsletter today"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\n(c) example corp all rights reserved"),
            ).otherwise(F.lit("")),
        ),
    )


def _q_boilerplate_lines(spark, sf):
    return dedup.boilerplate_lines(
        _inject_boilerplate(load_table(spark, sf, "documents"))
    )


def _q_streaming_line_boilerplate(spark, sf):
    return streaming_rollup.stream_line_boilerplate(
        spark, sf, mutate=_inject_boilerplate
    )


def _q_tokenizer_fertility(spark, sf):
    return text_ops.tokenizer_fertility(load_table(spark, sf, "documents"))


def _q_js_divergence(spark, sf):
    return pipeline.js_divergence(load_table(spark, sf, "documents"))


def _q_countmin_types(spark, sf):
    return sketches.countmin_types(load_table(spark, sf, "events"))


def _q_gopher_rule_filter(spark, sf):
    # the synthetic corpus is uniform lowercase prose (word-count is
    # the ONLY rule with natural variety), so inject deterministic
    # violations on fixed residues, the c4_rule_filter pattern: %6 →
    # symbol soup ('#'/'...'), %10 → 30 numeric tokens (alpha ratio),
    # %9 → five 120-char tokens (mean word length). The stopword rule
    # varies naturally ('the'/'a' appear ~1.7×/doc, short docs miss
    # them). The oracle mirrors the injection verbatim.
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 6 == 0, F.lit(" ### ### ... ...")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.lit(" " + " ".join(["12345"] * 30)),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.expr(
                    "concat(' ', repeat('z', 120), ' ', repeat('z', 120),"
                    " ' ', repeat('z', 120), ' ', repeat('z', 120),"
                    " ' ', repeat('z', 120))"
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return text_ops.gopher_rule_filter(injected)


def _q_oov_rate(spark, sf):
    # vocab_size 16 against the synthetic corpus' 31-term vocabulary:
    # roughly half the token mass lands out-of-vocab, so every source
    # reports a meaningful, distinct rate at every SF
    return text_ops.oov_rate(load_table(spark, sf, "documents"))


def _q_line_dedup(spark, sf):
    # the corpus has no newlines; cut deterministic 8-token lines
    # (regexp, mirrored in the oracle) and append two boilerplate
    # lines on fixed residues (%4, %6) — both exceed max_docs=20 at
    # every SF and must vanish from every document that carries them
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.regexp_replace("text", r"((?:\S+\s+){7}\S+)\s+", "$1\n"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nsubscribe to our newsletter today"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.lit("\nall rights reserved worldwide"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup.line_dedup(injected)


def _q_cooccurrence_edges(spark, sf):
    return event_analytics.cooccurrence_edges(load_table(spark, sf, "events"))


def _q_type_triangles(spark, sf):
    return event_analytics.type_triangles(load_table(spark, sf, "events"))


def _q_xcorr_panel(spark, sf):
    return anomaly.xcorr_panel(load_table(spark, sf, "events"))


def _q_cramers_v(spark, sf):
    return analytics.cramers_v_stat(load_table(spark, sf, "events"))


def _q_mutual_information(spark, sf):
    return analytics.mutual_information_stat(load_table(spark, sf, "events"))


def _q_welch_ttest(spark, sf):
    return analytics.welch_ttest(load_table(spark, sf, "events"))


def _q_mannwhitney_u(spark, sf):
    return analytics.mannwhitney_u(load_table(spark, sf, "events"))


def _q_sequence_pack(spark, sf):
    return pipeline.sequence_pack(load_table(spark, sf, "documents"))


def _q_resize_payloads(spark, sf):
    # resize/thumbnail stand-in: stride-sampled payload metadata —
    # integer-exact stride math + the shared polynomial checksum over
    # the sampled bytes (ASCII corpus: byte offset == char offset)
    return multimodal.resize_payloads(load_table(spark, sf, "documents"))


def _q_ann_recall_audit(spark, sf):
    return similarity.ann_recall_audit(load_table(spark, sf, "embeddings"))


def _q_frame_samples(spark, sf):
    # the 1→N multimodal batch shape (video payload → sampled frames);
    # the deterministic slice+checksum stand-in is oracle-expressible
    # because the corpus is ASCII (byte offset == char offset — the
    # same equivalence multimodal_meta already pins)
    return multimodal.sample_frames(load_table(spark, sf, "documents"))


def _q_winnow_overlap_pairs(spark, sf):
    return dedup.winnow_overlap_pairs(
        load_table(spark, sf, "documents").select("doc_id", "text")
    )


def _q_c4_rule_filter(spark, sf):
    # the synthetic corpus is punctuation-free lowercase prose, so
    # every rule would report one constant value; inject deterministic
    # violations on fixed residues (the pii_redact pattern) so each
    # rule fires on a known subset — the oracle mirrors the injection
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 7 == 0, F.lit(" lorem ipsum dolor")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" read our privacy policy")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" {code}")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 17 == 0,
                F.concat(F.lit(" "), F.expr("repeat('x', 1200)")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    return text_ops.c4_rule_filter(injected)


def _q_incremental_dedup_near(spark, sf):
    # the incremental_dedup re-crawl, with the added block split three
    # ways to exercise every decision path of the near rule:
    # id%3==0 → token-REVERSED text (genuinely different shingles →
    # kept as 'added'); id%3==1 → ' brand-new' appended (near-dup of
    # the still-live source doc → dropped by the NEAR rule, kept by
    # the exact rule — the delta this entry proves); id%3==2 → verbatim
    # text (exact content dupe → dropped by the exact rule)
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    revised = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    reversed_toks = F.array_join(
        F.reverse(F.filter(F.split("text", r"\s+"), lambda x: x != "")), " "
    )
    added = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, reversed_toks)
        .when(
            F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" brand-new"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return curation.incremental_dedup_near(docs, revised.unionByName(added))


def _q_incremental_dedup_near_transitive(spark, sf):
    # the incremental_dedup_near re-crawl plus planted WITHIN-BATCH
    # near-dup clusters: every %31 doc contributes TWO token-reversed
    # mirrors (' alpha' / ' beta' suffixes) — reversal breaks every
    # shingle vs the old corpus (both survive the new↔old near rule as
    # 'added') while the two mirrors share all but their trailing
    # shingles (near each other for any non-tiny doc), so transitive
    # clustering must keep exactly the min-key mirror per cluster
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    revised = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    reversed_toks = F.array_join(
        F.reverse(F.filter(F.split("text", r"\s+"), lambda x: x != "")), " "
    )
    added = docs.filter(F.col("doc_id") % 29 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, reversed_toks)
        .when(
            F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" brand-new"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    mirrors = docs.filter(F.col("doc_id") % 31 == 0)
    mirror_a = mirrors.select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.concat(reversed_toks, F.lit(" alpha")).alias("text"),
    )
    mirror_b = mirrors.select(
        (F.col("doc_id") + F.lit(30_000_000)).alias("doc_id"),
        F.concat(reversed_toks, F.lit(" beta")).alias("text"),
    )
    new = revised.unionByName(added).unionByName(mirror_a).unionByName(mirror_b)
    return curation.incremental_dedup_near_transitive(docs, new)


def _q_decontaminate_13gram(spark, sf):
    # the production 13-gram operating point (the default-3 entry
    # `decontaminate` matches the tiny synthetic vocabulary); the
    # benchmark is a deterministic excerpt suite — tokens 4..23 of
    # every 7th doc — so exact 13-gram leakage provably exists
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    bench = docs.filter((F.col("doc_id") % 7 == 0) & (F.size(toks) >= 16)).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.array_join(F.slice(toks, 4, 20), " ").alias("text"),
    )
    return curation.decontaminate(docs, bench, shingle_k=13)


def _q_jaccard_threshold_curve(spark, sf):
    return dedup.jaccard_threshold_curve(
        load_table(spark, sf, "documents").select("doc_id", "text")
    )


def _q_embedding_drift(spark, sf):
    # snapshots = vec_id parity halves of the embedding table (the
    # deterministic stand-in for two ingest generations)
    emb = load_table(spark, sf, "embeddings")
    return similarity.embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0), emb.filter(F.col("vec_id") % 2 == 1)
    )


def _q_streaming_ks_drift(spark, sf):
    return streaming_rollup.stream_ks_drift(spark, sf)


def _q_streaming_changepoint(spark, sf):
    return streaming_rollup.stream_changepoint(spark, sf)


def _q_benford_audit(spark, sf):
    return analytics.benford_audit(load_table(spark, sf, "events"))


def _q_value_concentration(spark, sf):
    return analytics.value_concentration(load_table(spark, sf, "events"))


def _q_ks_drift(spark, sf):
    return anomaly.ks_drift(load_table(spark, sf, "events"))


def _q_acf_panel(spark, sf):
    return anomaly.acf_panel(load_table(spark, sf, "events"))


def _q_vocab_growth(spark, sf):
    return text_ops.vocab_growth(load_table(spark, sf, "documents"))


def _q_edit_distance_pairs(spark, sf):
    return dedup.edit_distance_pairs(load_table(spark, sf, "documents"))


def _q_changepoint_detect(spark, sf):
    return anomaly.changepoint_detect(load_table(spark, sf, "events"))


def _q_theil_sen_trend(spark, sf):
    return anomaly.theil_sen_trend(load_table(spark, sf, "events"))


def _q_zipf_fit(spark, sf):
    return text_ops.zipf_fit(load_table(spark, sf, "documents"))


def _q_pca_power_iter(spark, sf):
    return clustering.pca_power_iter(load_table(spark, sf, "embeddings"))


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB ANSI-SQL twins
# --------------------------------------------------------------------------

# shared SQL fragments
_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"


def _stoplist(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in text_ops.LANG_STOPWORDS[lang])


def _minhash_portable_oracle(threshold: float, shingle_k: int) -> str:
    """DuckDB twin of dedup.minhash_lsh_pairs_portable at an arbitrary
    (threshold, shingle_k) operating point — affine constants, band
    keys, candidate join and exact set verification all mirror the
    Spark operator bit-for-bit (shared constants via
    dedup.portable_perm_params)."""
    pp = dedup.portable_perm_params()
    rpb = dedup.N_HASHES // dedup.BANDS
    min_aggs = ",\n                   ".join(
        f"min(({a} * hi + {b} * lo + {c}) % {dedup.MINHASH_P}) AS mh_{i}"
        for i, (a, b, c) in enumerate(pp)
    )
    band_union = "\n            UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_id, {key} AS band_key FROM sig".format(
            bi=bi,
            key=" || '|' || ".join(
                f"CAST(mh_{bi * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for bi in range(dedup.BANDS)
    )
    # k-gram comprehension: 1-based list indexing, i = 1 .. len-k+1
    shingle_expr = " || ' ' || ".join(
        f"toks[i+{j}]" if j else "toks[i]" for j in range(shingle_k)
    )
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        shn AS (
            SELECT doc_id,
                   list_distinct([{shingle_expr}
                                  for i in range(1, len(toks) - {shingle_k - 2})]) AS shingles
            FROM t WHERE len(toks) >= {shingle_k}),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM shn),
        hs AS (SELECT doc_id,
                      CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
               FROM ex),
        hx AS (SELECT doc_id, h >> 30 AS hi, h & 1073741823 AS lo FROM hs),
        sig AS (SELECT doc_id,
                   {min_aggs}
                FROM hx GROUP BY doc_id),
        banded AS (
            {band_union}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id),
        sets AS (SELECT DISTINCT doc_id, h FROM hs),
        sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sets x ON x.doc_id = c.doc_a
            JOIN sets y ON y.doc_id = c.doc_b AND y.h = x.h
            GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(n_inter AS DOUBLE)
               / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE)
              / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= {threshold}
        ORDER BY doc_a, doc_b
    """


def _emb_near_dup_oracle(nb: int, nbits: int, threshold: float) -> str:
    """DuckDB twin of similarity.embedding_near_dup_pairs at an
    arbitrary (bands, bits_per_band, threshold) operating point — the
    same deterministic ±1 hyperplanes (shared
    `similarity.rademacher_planes` source of truth), band packing,
    label-blocked candidate join and round-9 cosine verification as
    the check-scale literal twin, parameterized so the PRODUCTION
    operating point (16-bit bands, the measured 200k sizing) is
    oracle-pinned too, not just pytest-pinned."""
    planes = similarity.rademacher_planes(nb * nbits)

    def plane_lit(p: list[float]) -> str:
        return "[" + ", ".join("1.0" if v > 0 else "-1.0" for v in p) + "]"

    band_defs = []
    for j in range(nb):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(vec, {plane_lit(planes[j * nbits + i])}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(nbits)
        )
        band_defs.append(f"({terms}) AS b{j}")
    banded_union = " UNION ALL ".join(
        f"SELECT vec_id, label, {j} AS band_id, b{j} AS band_val FROM sig"
        for j in range(nb)
    )
    return f"""
        WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        sig AS (SELECT vec_id, label, vec, {", ".join(band_defs)} FROM emb),
        banded AS ({banded_union}),
        cand AS (
            SELECT DISTINCT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM banded a
            JOIN banded b ON a.label = b.label AND a.band_id = b.band_id
                         AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
        SELECT c.label, c.vec_a, c.vec_b,
               round(list_dot_product(x.vec, y.vec)
                     / (sqrt(list_dot_product(x.vec, x.vec))
                        * sqrt(list_dot_product(y.vec, y.vec))), 9) AS cos_sim
        FROM cand c
        JOIN emb x ON c.vec_a = x.vec_id
        JOIN emb y ON c.vec_b = y.vec_id
        WHERE round(list_dot_product(x.vec, y.vec)
                    / (sqrt(list_dot_product(x.vec, x.vec))
                       * sqrt(list_dot_product(y.vec, y.vec))), 9) >= {threshold}
        ORDER BY vec_a, vec_b
    """


def _portable_sig_ctes(p: str, src: str, shingle_k: int) -> str:
    """CTE block computing the portable-MinHash pipeline for a
    ``(doc_id, text)`` source CTE ``src``, with every CTE name
    prefixed by ``p`` so two sides (e.g. old/new snapshots) can run
    the identical pipeline in one statement. Emits ``{p}hs`` (60-bit
    shingle keys — the exact-verification input) and ``{p}banded``
    (band keys). Shares `dedup.portable_perm_params` with the Spark
    operators — one source of truth for the affine constants."""
    pp = dedup.portable_perm_params()
    rpb = dedup.N_HASHES // dedup.BANDS
    min_aggs = ",\n                   ".join(
        f"min(({a} * hi + {b} * lo + {c}) % {dedup.MINHASH_P}) AS mh_{i}"
        for i, (a, b, c) in enumerate(pp)
    )
    band_union = "\n            UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_id, {key} AS band_key FROM {p}sig".format(
            bi=bi,
            p=p,
            key=" || '|' || ".join(
                f"CAST(mh_{bi * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for bi in range(dedup.BANDS)
    )
    shingle_expr = " || ' ' || ".join(
        f"toks[i+{j}]" if j else "toks[i]" for j in range(shingle_k)
    )
    return f"""{p}tok AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
        {p}shn AS (
            SELECT doc_id,
                   list_distinct([{shingle_expr}
                                  for i in range(1, len(toks) - {shingle_k - 2})]) AS shingles
            FROM {p}tok WHERE len(toks) >= {shingle_k}),
        {p}ex AS (SELECT doc_id, unnest(shingles) AS s FROM {p}shn),
        {p}hs AS (SELECT doc_id,
                         CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
                  FROM {p}ex),
        {p}hx AS (SELECT doc_id, h >> 30 AS hi, h & 1073741823 AS lo FROM {p}hs),
        {p}sig AS (SELECT doc_id,
                   {min_aggs}
                   FROM {p}hx GROUP BY doc_id),
        {p}banded AS (
            {band_union})"""


def _simhash_portable_oracle(max_hamming: int) -> str:
    """DuckDB twin of dedup.simhash_pairs_portable at an arbitrary
    hamming radius — same 60-bit md5 token hashes, ±1 bit sums, sign
    assembly, (max_hamming+1)-way pigeonhole banding and
    bit_count(xor) verification."""
    bands = max_hamming + 1
    base, rem = divmod(60, bands)
    widths = [base + (1 if i < rem else 0) for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]
    sh_sums = ",\n                   ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(60)
    )
    sh_asm = " | ".join(
        f"(CASE WHEN s_{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE CAST(0 AS BIGINT) END)"
        for b in range(60)
    )
    sh_bands = "\n            UNION ALL ".join(
        f"SELECT source, doc_id, simhash, {i} AS band_id,"
        f" (simhash >> {offsets[i]}) & {(1 << widths[i]) - 1} AS band_val FROM sig"
        for i in range(bands)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
            FROM documents),
        hx AS (SELECT doc_id,
                      CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
               FROM tok),
        agg AS (SELECT doc_id,
                   {sh_sums}
                FROM hx GROUP BY doc_id),
        sig AS (SELECT d.source, agg.doc_id, {sh_asm} AS simhash
                FROM agg JOIN documents d USING (doc_id)),
        banded AS (
            {sh_bands}),
        pairs AS (
            SELECT DISTINCT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM banded a JOIN banded b
              ON a.source = b.source AND a.band_id = b.band_id
             AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
        SELECT source, doc_a, doc_b, hamming
        FROM pairs WHERE hamming <= {max_hamming}
        ORDER BY doc_a, doc_b
    """


# The DuckDB mirror of operators.util.COHORT_SQL (json k bucket,
# NULL/missing/malformed → -1; json_valid guard = Spark's
# try_parse_json fold, ADVICE r11). Module-level so
# tests/test_round12_ops.py pins its DuckDB-vs-Spark agreement against
# THIS string — the single definition the cohort oracles interpolate —
# instead of a test-local copy that could silently drift.
COHORT_DUCK_SQL = (
    "coalesce(CAST(json_extract_string("
    "CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)"
    " // 25, -1)"
)


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["rollup_totals"] = """
        SELECT CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_priority, status, priority
    """

    sql["cube_totals"] = """
        SELECT CAST(GROUPING(source) AS INTEGER) AS g_source,
               CAST(GROUPING(lang) AS INTEGER) AS g_lang,
               COALESCE(source, '(all)') AS source,
               COALESCE(lang, '(all)') AS lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY CUBE(source, lang)
        ORDER BY g_source, g_lang, source, lang
    """

    sql["grouping_sets_panel"] = """
        SELECT CAST(GROUPING(source) AS INTEGER) AS g_source,
               CAST(GROUPING(lang) AS INTEGER) AS g_lang,
               COALESCE(source, '(all)') AS source,
               COALESCE(lang, '(all)') AS lang,
               count(*) AS n_docs
        FROM documents
        GROUP BY GROUPING SETS ((source), (lang), ())
        ORDER BY g_source, g_lang, source, lang
    """

    sql["window_suite"] = """
        SELECT user_id, event_id, ts, value,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
                   / CAST(count(*) OVER w3 AS DOUBLE) AS moving_avg3,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume_dist,
               first_value(value) OVER wall AS first_value,
               last_value(value) OVER wall AS last_value,
               CAST(row_number() OVER w AS INTEGER) AS seq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               wall AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, seq
    """

    sql["user_set_ops"] = """
        SELECT user_id, 'both' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'click_only' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase')
        ORDER BY tag, user_id
    """

    sql["pivot_event_counts"] = """
        SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY cohort ORDER BY cohort
    """

    sql["unpivot_summary"] = """
        WITH wide AS (
            SELECT event_type, count(*) AS n_sessions,
                   count(DISTINCT user_id) AS n_users,
                   count(CASE WHEN value > 50 THEN 1 END) AS n_hot
            FROM events GROUP BY event_type)
        SELECT event_type, 'n_sessions' AS metric, n_sessions AS metric_value FROM wide
        UNION ALL
        SELECT event_type, 'n_users' AS metric, n_users AS metric_value FROM wide
        UNION ALL
        SELECT event_type, 'n_hot' AS metric, n_hot AS metric_value FROM wide
        ORDER BY event_type, metric
    """

    sql["paragraph_dedup"] = """
        WITH synth AS (
            SELECT doc_id, text || chr(10) || lead(text) OVER (ORDER BY doc_id) AS text
            FROM documents
            QUALIFY text IS NOT NULL
                AND lead(text) OVER (ORDER BY doc_id) IS NOT NULL),
        paras AS (
            SELECT doc_id,
                   len(string_split(text, chr(10))) AS n_paras,
                   unnest(string_split(text, chr(10))) AS para,
                   unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
            FROM synth),
        kept AS (
            SELECT doc_id, para, pos, n_paras,
                   row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
            FROM paras)
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pos) AS dedup_text,
               count(*) AS n_kept,
               CAST(max(n_paras) - count(*) AS BIGINT) AS n_dropped
        FROM kept WHERE rn = 1
        GROUP BY doc_id ORDER BY doc_id
    """

    sql["unigram_logprob"] = f"""
        WITH toks AS (
            SELECT doc_id, source, unnest({_TOKS}) AS tok FROM documents),
        freq AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
        tot AS (SELECT sum(n_tok) AS n_total FROM freq),
        scored AS (
            SELECT doc_id, source,
                   CAST(round(ln(CAST(n_tok AS DOUBLE))
                              - ln(CAST(n_total AS DOUBLE)), 9)
                        AS DECIMAL(28,9)) AS logp
            FROM toks JOIN freq USING (tok), tot)
        SELECT doc_id, source, count(*) AS n_tokens,
               CAST(sum(logp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_logprob
        FROM scored GROUP BY doc_id, source ORDER BY doc_id
    """

    sql["streaming_enrich_static"] = """
        SELECT e.event_id, e.user_id, e.event_type, e.value, c.segment, c.tier
        FROM events e
        LEFT JOIN (
            SELECT c_custkey AS user_id, c_mktsegment AS segment,
                   CASE WHEN c_acctbal >= 5000.0 THEN 'gold'
                        WHEN c_acctbal >= 0.0 THEN 'standard'
                        ELSE 'delinquent' END AS tier
            FROM customer) c USING (user_id)
        ORDER BY e.event_id
    """

    sql["cap_per_source"] = """
        SELECT doc_id, source, n_chars, CAST(rank_in_source AS INTEGER) AS rank_in_source
        FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ) AS rank_in_source
            FROM documents)
        WHERE rank_in_source <= 10
        ORDER BY source, rank_in_source
    """

    sql["assign_split"] = """
        SELECT doc_id, source, bucket,
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, source,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       % 100 AS bucket
            FROM documents)
        ORDER BY doc_id
    """

    sql["shuffle_order"] = """
        SELECT doc_id, source,
               md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
        ORDER BY shuffle_key, doc_id
    """

    sql["value_histogram"] = """
        WITH b AS (
            SELECT CASE WHEN value < 0 THEN 0
                        WHEN value >= 500 THEN 11
                        ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS bucket,
                   value
            FROM events)
        SELECT bucket, count(*) AS n, min(value) AS min_value,
               max(value) AS max_value,
               0.0 + CAST(bucket - 1 AS DOUBLE) * 50.0 AS lo_edge
        FROM b GROUP BY bucket ORDER BY bucket
    """

    sql["slow_sessions"] = """
        WITH m AS (SELECT max(epoch_us(ts)) AS as_of_us FROM events)
        SELECT event_id, user_id, event_type, ts, m.as_of_us - epoch_us(ts) AS age_us
        FROM events, m
        WHERE m.as_of_us - epoch_us(ts) > 15 * 60 * 1000000
    """

    sql["idle_sessions"] = """
        WITH m AS (SELECT max(epoch_us(ts)) AS as_of_us FROM events)
        SELECT event_id, user_id, ts, m.as_of_us - epoch_us(ts) AS idle_us
        FROM events, m
        WHERE event_type = 'view' AND m.as_of_us - epoch_us(ts) > 3600000000
    """

    sql["session_summary"] = """
        SELECT event_type, count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users,
               count(CASE WHEN value > 50 THEN 1 END) AS n_hot
        FROM events GROUP BY event_type ORDER BY event_type
    """

    sql["connection_load"] = """
        WITH c AS (
            SELECT count(CASE WHEN event_type = 'click' THEN 1 END) AS used_connections,
                   count(DISTINCT user_id) * 250 AS max_connections
            FROM events)
        SELECT used_connections, max_connections,
               100.0 - (CAST(used_connections AS DOUBLE) / NULLIF(max_connections, 0)) * 100.0
                   AS connection_load_pct
        FROM c
    """

    sql["threshold_flags"] = """
        SELECT event_id, user_id, value,
               value < 95 AS cpu_status, value < 90 AS ram_status,
               value > 85 AS cache_status, value < 90 AS disk_status,
               value < 10 AS load1_status, value < 15 AS load5_status
        FROM events
    """

    sql["downsample_5min"] = """
        SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_s,
               count(*) AS n_points,
               arg_max(value, event_id) AS last_value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1
    """

    # the cascaded (5min -> 1h -> 1d) rollup must equal direct daily
    # aggregation of raw events — re-aggregation decomposability
    sql["rollup_cascade"] = """
        SELECT ((epoch_us(ts) // 300000000) * 300 // 86400) * 86400 AS bucket_d,
               count(*) AS n_points,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               arg_max(value, event_id) AS last_value
        FROM events GROUP BY 1 ORDER BY 1
    """

    sql["minute_corr_join"] = """
        SELECT DISTINCT epoch_us(a.ts) // 60000000 AS minute_b,
               a.event_id AS a_event_id, b.event_id AS b_event_id, c.c_name
        FROM events a
        JOIN events b ON (epoch_us(a.ts) // 60000000) = (epoch_us(b.ts) // 60000000)
        JOIN customer c ON a.user_id = c.c_custkey
        WHERE a.event_type = 'purchase' AND b.event_type = 'error'
    """

    # Spark composes the as-of join from union + carried last();
    # DuckDB states it natively — semantics must agree exactly
    sql["asof_join"] = """
        WITH clicks AS (
            SELECT user_id, ts, max(event_id) AS r_event_id,
                   arg_max(value, event_id) AS r_value
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        purchases AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.ts,
               c.r_event_id AS matched_click_id,
               c.r_value AS matched_click_value,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM purchases p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """

    sql["value_band_join"] = """
        WITH bands(band_id, lo, hi) AS (
            VALUES (0, 0.0, 25.0), (1, 25.0, 50.0), (2, 50.0, 100.0),
                   (3, 100.0, 200.0), (4, 200.0, 1000000000.0))
        SELECT band_id, lo, hi, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id, lo, hi ORDER BY band_id
    """

    sql["lag_delta"] = """
        SELECT event_id, user_id, ts, value,
               LAG(value) OVER w AS prev_value,
               value - LAG(value) OVER w AS delta
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """

    sql["latest_per_user"] = """
        SELECT user_id, event_id, ts, value, event_type
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """

    sql["tps_per_user"] = """
        WITH g AS (
            SELECT user_id, count(*) AS n_events,
                   max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
            FROM events GROUP BY user_id)
        SELECT user_id, n_events, span_us,
               CASE WHEN span_us > 0
                    THEN CAST(n_events AS DOUBLE) / (CAST(span_us AS DOUBLE) / 1000000.0)
                    ELSE 0.0 END AS tps
        FROM g ORDER BY user_id
    """

    # approx variant is sketch-based -> rows-only check (tested
    # against exact percentiles within rank tolerance in pytest)
    sql["value_percentiles"] = """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.95) AS p95,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
    """

    # verdict-column sketch twins (round 4): the hashed output is the
    # EXACT statistic plus booleans asserting the Spark-side sketch
    # estimate obeys its published error bound; the estimates
    # themselves (not reproducible outside the estimator) stay out of
    # the hash, so the deterministic twin emits literal TRUE — any
    # estimator-contract violation on the Spark side hash-mismatches.
    sql["value_percentiles_approx"] = """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS exact_users,
               quantile_cont(value, 0.5) AS p50_exact,
               quantile_cont(value, 0.95) AS p95_exact,
               TRUE AS p50_in_rank_bound,
               TRUE AS p95_in_rank_bound,
               TRUE AS users_in_bound
        FROM events GROUP BY event_type ORDER BY event_type
    """

    sql["hll_user_rollup"] = """
        SELECT epoch_us(ts) // 86400000000 AS day_bucket,
               count(*) AS n_events,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS est_in_bound
        FROM events GROUP BY 1 ORDER BY day_bucket
    """

    sql["kll_value_rollup"] = """
        SELECT epoch_us(ts) // 86400000000 AS day_bucket,
               count(*) AS n_points,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS exact_p50,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS exact_p95,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS exact_p99,
               TRUE AS p50_in_rank_bound,
               TRUE AS p95_in_rank_bound,
               TRUE AS p99_in_rank_bound
        FROM events GROUP BY 1 ORDER BY day_bucket
    """

    sql["sessionize"] = """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_no
            FROM flagged)
        SELECT user_id, session_no, count(*) AS n_events,
               min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        FROM numbered GROUP BY user_id, session_no ORDER BY user_id, session_no
    """

    sql["retention_filter"] = """
        WITH m AS (SELECT max(epoch_us(ts)) AS as_of_us FROM events)
        SELECT event_id, event_type, ts FROM events, m
        WHERE epoch_us(ts) < m.as_of_us - 604800000000
        ORDER BY event_id
    """

    sql["drilldown_grid"] = """
        SELECT DISTINCT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          AND event_type = 'click' AND value BETWEEN 10.0 AND 20.0
        ORDER BY event_id
    """

    sql["paginate_page2"] = """
        SELECT event_id, ts, user_id, value FROM events
        QUALIFY row_number() OVER (ORDER BY event_id) BETWEEN 11 AND 20
    """

    sql["engine_info"] = f"""
        SELECT '{monitoring.ENGINE_NAME}' AS engine,
               '{monitoring.ENGINE_VERSION}' AS version,
               max(epoch_us(ts)) AS as_of_us,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS uptime_us
        FROM events
    """

    sql["paginate_keyset"] = """
        SELECT event_id, ts, user_id, value FROM events
        WHERE event_id > 9 ORDER BY event_id LIMIT 10
    """

    sql["substring_search"] = """
        SELECT doc_id, source, n_chars FROM documents
        WHERE contains(lower(text), 'spark merge') ORDER BY doc_id
    """

    sql["props_histogram"] = """
        SELECT CAST(json_extract_string(
                   CASE WHEN json_valid(props) THEN props END, '$.k')
               AS INTEGER) AS k, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """

    sql["topk_events"] = """
        SELECT event_id, user_id, event_type, value FROM events
        ORDER BY value DESC, event_id ASC LIMIT 20
    """

    sql["distinct_types"] = "SELECT DISTINCT event_type FROM events ORDER BY event_type"

    sql["table_catalog"] = " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in sorted(TABLES)
    )

    sql["three_way_topk"] = """
        SELECT l_orderkey, l_linenumber, c_name, o_orderdate, l_extendedprice
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100
    """

    sql["left_join_rollup"] = """
        WITH recent AS (
            SELECT o_custkey, count(*) AS n_recent FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey)
        SELECT c.c_custkey, c.c_name,
               COALESCE(n.n_name, 'No Nation') AS nation_name,
               COALESCE(r.n_recent, 0) AS recent_orders,
               CASE WHEN r.n_recent IS NULL THEN 'No Recent Orders' ELSE 'Active' END AS activity
        FROM customer c
        LEFT JOIN recent r ON c.c_custkey = r.o_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY c.c_custkey
    """

    sql["anti_join_no_recent"] = """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        ORDER BY c_custkey
    """

    sql["semi_join_urgent"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """

    sql["cross_join_lookup"] = """
        SELECT r_name, n_name FROM region, nation
        WHERE r_regionkey = n_regionkey AND r_name LIKE 'A%'
        ORDER BY r_name, n_name
    """

    sql["nations_per_region"] = """
        SELECT r_name, count(n_name) AS n_nations,
               COALESCE(string_agg(n_name, ', ' ORDER BY n_name), '') AS nation_list
        FROM region LEFT JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
    """

    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2)))
                    AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2))
                               * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(8,2))
                               AS DECIMAL(8,4)))
                    AS DOUBLE) AS sum_charge,
               count(*) AS count_order,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    sql["shipping_priority"] = """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '2000-06-01'
          AND o_orderdate < TIMESTAMP '2000-06-01'
          AND c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """

    sql["local_supplier_volume"] = """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
          AND r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """

    sql["customer_rollup"] = """
        SELECT r_name, n_name, count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """

    sql["parts_by_brand"] = """
        SELECT p_brand, count(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail,
               max(p_size) AS max_size
        FROM part WHERE p_type LIKE '%AR%'
        GROUP BY p_brand ORDER BY p_brand
    """

    sql["top_supplier_per_nation"] = """
        SELECT n_name, s_suppkey, s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        QUALIFY row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC, s_suppkey ASC) = 1
        ORDER BY n_name
    """

    sql["cache_hit_ratio"] = """
        WITH g AS (
            SELECT l_linestatus,
                   count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS hits,
                   count(*) - count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS misses
            FROM lineitem GROUP BY l_linestatus)
        SELECT l_linestatus, hits, misses,
               CAST(hits AS DOUBLE) * 100.0 / NULLIF(hits + misses, 0) AS hit_pct
        FROM g ORDER BY l_linestatus
    """

    sql["priority_bands"] = """
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                    WHEN o_orderpriority = '2-HIGH' THEN 2
                    WHEN o_orderpriority = '3-MEDIUM' THEN 3
                    ELSE 9 END AS severity,
               CASE WHEN o_totalprice >= 300000 THEN 'XL'
                    WHEN o_totalprice >= 150000 THEN 'L'
                    WHEN o_totalprice >= 50000 THEN 'M'
                    ELSE 'S' END AS price_band,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2 ORDER BY severity, price_band
    """

    sql["net_price_ratio"] = """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
               l_extendedprice / NULLIF(l_tax, 0) AS price_per_tax
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """

    sql["to_char_formats"] = """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_iso,
               strftime(o_orderdate, '%d/%m/%Y %H:%M') AS ts_eu,
               strftime(o_orderdate + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS ts_ist,
               strftime(o_orderdate, '%-d/%-m/%Y') AS ts_fm,
               CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
               CAST((dayofyear(o_orderdate) - 1) // 7 + 1 AS INTEGER) AS week_pg
        FROM orders ORDER BY o_orderkey
    """

    sql["size_pretty"] = """
        WITH b AS (SELECT doc_id, n_chars * n_chars * 37 AS nbytes FROM documents)
        SELECT doc_id, nbytes,
               CASE WHEN nbytes >= 11258990684262400 THEN CAST(nbytes // 1125899906842624 AS VARCHAR) || ' PB'
                    WHEN nbytes >= 10995116277760 THEN CAST(nbytes // 1099511627776 AS VARCHAR) || ' TB'
                    WHEN nbytes >= 10737418240 THEN CAST(nbytes // 1073741824 AS VARCHAR) || ' GB'
                    WHEN nbytes >= 10485760 THEN CAST(nbytes // 1048576 AS VARCHAR) || ' MB'
                    WHEN nbytes >= 10240 THEN CAST(nbytes // 1024 AS VARCHAR) || ' KB'
                    ELSE CAST(nbytes AS VARCHAR) || ' B' END AS pretty
        FROM b ORDER BY doc_id
    """

    sql["token_stats"] = f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
                   CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_unique_tokens,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS INTEGER) AS n_nonspace_chars
            FROM documents)
        SELECT doc_id, n_tokens, n_bpe_tokens, n_unique_tokens, n_nonspace_chars,
               CASE WHEN n_tokens > 0
                    THEN CAST(n_nonspace_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    ELSE 0.0 END AS mean_token_len
        FROM base ORDER BY doc_id
    """

    _all_stop = ", ".join(
        f"'{w}'" for ws in text_ops.LANG_STOPWORDS.values() for w in ws
    )
    sql["quality_score"] = f"""
        WITH base AS (
            SELECT doc_id, lang, length(text) AS n_chars_m,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_unique,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_all_stop}))) AS INTEGER) AS n_stopwords,
                   CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS INTEGER) AS n_punct
            FROM documents),
        r AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
                   CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
                   CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE) AS punct_ratio
            FROM base WHERE n_tokens > 0),
        s AS (
            SELECT doc_id, lang, n_tokens, uniq_ratio, stop_ratio,
                   uniq_ratio * 50.0 + stop_ratio * 30.0 + (1.0 - punct_ratio) * 10.0
                   + CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 10.0 ELSE 0.0 END AS quality
            FROM r)
        SELECT doc_id, lang, n_tokens, uniq_ratio, stop_ratio, quality,
               CASE WHEN quality >= 60 THEN 'high'
                    WHEN quality >= 40 THEN 'medium'
                    ELSE 'low' END AS quality_band
        FROM s ORDER BY doc_id
    """

    # content-hash bucket shared by the sampling twins: first 8 hex
    # chars of md5(text) parsed as an integer — portable because both
    # engines produce identical md5 hex and identical BIGINT parses
    _HB = "CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)"

    sql["hash_sample"] = f"""
        SELECT doc_id, source, lang, n_chars, {_HB} % 100 AS hash_bucket
        FROM documents
        WHERE {_HB} % 100 < 10
        ORDER BY doc_id
    """

    sql["stratified_sample"] = f"""
        WITH h AS (
            SELECT doc_id, source, lang, {_HB} % 256 AS h256 FROM documents)
        SELECT doc_id, source, lang,
               CAST(row_number() OVER (PARTITION BY source ORDER BY h256, doc_id)
                    AS INTEGER) AS sample_rank
        FROM h
        QUALIFY sample_rank <= 5
        ORDER BY source, sample_rank
    """

    sql["shard_pack"] = f"""
        WITH t AS (
            SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents),
        r AS (
            SELECT doc_id, source, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS tokens_before
            FROM t)
        SELECT doc_id, source, n_tokens,
               CAST(tokens_before // 2000 AS BIGINT) AS shard_id
        FROM r ORDER BY doc_id
    """

    sql["tfidf_top_terms"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS n_term
            FROM toks GROUP BY doc_id, term),
        dl AS (
            SELECT doc_id, CAST(SUM(n_term) AS BIGINT) AS n_tokens
            FROM tf GROUP BY doc_id),
        dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round((CAST(tf.n_term AS DOUBLE) / CAST(dl.n_tokens AS DOUBLE))
                         * ln((SELECT n_docs FROM nd) / CAST(dfq.doc_freq AS DOUBLE)),
                         9) AS tfidf
            FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term))
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term ASC)
                    AS INTEGER) AS rn,
               term, tfidf
        FROM scored
        QUALIFY rn <= 3
        ORDER BY doc_id, rn
    """

    # BM25 retrieval twin: identical arithmetic shape to
    # pipeline.bm25_search — per-term contribution rounded to 9 dp,
    # accumulated as DECIMAL(20,9) (exact, order-independent), double
    # only at the edge. Constants: k1=1.2, b=0.75 → k1+1=2.2, 1−b=0.25.
    sql["bm25_search"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS n_term
            FROM toks GROUP BY doc_id, term),
        dl AS (
            SELECT doc_id, CAST(SUM(n_term) AS BIGINT) AS n_tokens
            FROM tf GROUP BY doc_id),
        dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(SUM(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
               FROM dl),
        q AS (
            SELECT doc_id AS query_id,
                   unnest(list_distinct({_TOKS}[1:6])) AS term
            FROM documents WHERE doc_id < 10),
        contrib AS (
            SELECT q.query_id, tf.doc_id,
                   CAST(round(
                       ln((st.n_docs - CAST(dfq.doc_freq AS DOUBLE) + 0.5)
                          / (CAST(dfq.doc_freq AS DOUBLE) + 0.5) + 1.0)
                       * ((CAST(tf.n_term AS DOUBLE) * 2.2)
                          / (CAST(tf.n_term AS DOUBLE)
                             + 1.2 * (0.25 + 0.75 * (CAST(dl.n_tokens AS DOUBLE)
                                                     / st.avgdl)))),
                       9) AS DECIMAL(20,9)) AS contrib
            FROM tf
            JOIN q USING (term)
            JOIN dl USING (doc_id)
            JOIN dfq USING (term)
            CROSS JOIN st
            WHERE tf.doc_id <> q.query_id),
        scored AS (
            SELECT query_id, doc_id,
                   CAST(SUM(contrib) AS DOUBLE) AS score
            FROM contrib GROUP BY query_id, doc_id)
        SELECT query_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, doc_id ASC)
                    AS INTEGER) AS rn,
               doc_id, score
        FROM scored
        QUALIFY rn <= 5
        ORDER BY query_id, rn
    """

    # portable MinHash+LSH twins: the SAME md5-derived affine constants
    # as dedup.minhash_lsh_pairs_portable (one source of truth —
    # dedup.portable_perm_params), so signatures, band keys, candidate
    # set and exact verification are bit-identical across engines.
    # Two operating points: the `_portable_pairs` twin at the library
    # defaults, and `minhash_lsh_pairs` at 4-gram/0.5 (registry entry
    # re-pointed to the portable family in round 4 so every registry
    # entry is oracle-backed; the xxhash64 form stays library+pytest).
    sql["minhash_portable_pairs"] = _minhash_portable_oracle(threshold=0.30, shingle_k=3)
    sql["minhash_lsh_pairs"] = _minhash_portable_oracle(threshold=0.5, shingle_k=4)

    # portable SimHash twins: 60-bit md5-prefix token hashes, the same
    # ±1 bit sums / sign assembly / pigeonhole bands / bit_count(xor)
    # verify as dedup.simhash_pairs_portable — at hamming ≤ 3 (4 bands)
    # for the `_portable_pairs` twin and ≤ 2 (3 bands) for the
    # round-4-re-pointed `simhash_pairs` registry entry.
    sql["simhash_portable_pairs"] = _simhash_portable_oracle(max_hamming=3)
    sql["simhash_pairs"] = _simhash_portable_oracle(max_hamming=2)

    # touch attribution twin: inner range-join candidates, last/first
    # touch via row_number over (touch_us, touch_id) — the exact twin
    # of Spark's max_by/min_by(struct) since touch_id is unique —
    # then a left join back so unattributed conversions survive.
    sql["touch_attribution"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type
                   FROM events),
        c AS (SELECT event_id AS conv_id, user_id, us AS conv_us
              FROM e WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                     us AS touch_us
              FROM e WHERE event_type IN ('view', 'click')),
        m AS (SELECT c.conv_id, t.touch_id, t.touch_type, t.touch_us
              FROM c JOIN t ON c.user_id = t.user_id
                   AND t.touch_us <= c.conv_us
                   AND t.touch_us > c.conv_us - 1800000000
                   AND t.touch_id <> c.conv_id),
        r AS (SELECT *,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY touch_us DESC, touch_id DESC) AS rl,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY touch_us ASC, touch_id ASC) AS rf,
                     count(*) OVER (PARTITION BY conv_id) AS n_t
              FROM m),
        lt AS (SELECT conv_id, touch_id AS last_touch_id,
                      touch_type AS last_touch_type, touch_us AS last_touch_us,
                      n_t
               FROM r WHERE rl = 1),
        ft AS (SELECT conv_id, touch_id AS first_touch_id,
                      touch_type AS first_touch_type, touch_us AS first_touch_us
               FROM r WHERE rf = 1)
        SELECT c.conv_id, c.user_id, c.conv_us,
               lt.last_touch_id, lt.last_touch_type, lt.last_touch_us,
               ft.first_touch_id, ft.first_touch_type, ft.first_touch_us,
               COALESCE(lt.n_t, 0) AS n_touches
        FROM c
        LEFT JOIN lt USING (conv_id)
        LEFT JOIN ft USING (conv_id)
        ORDER BY conv_id
    """

    # per-source quantile normalization twin: the same percentile_disc
    # cut points (exact order statistics over integer n_chars) and the
    # same strict-> bucket chain as pipeline.source_quantile_normalize.
    _sqn_cuts = ", ".join(
        f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY n_chars) AS c_{i - 1}"
        for i in range(1, 10)
    )
    _sqn_bucket = " + ".join(
        f"(CASE WHEN d.n_chars > c_{i} THEN 1 ELSE 0 END)" for i in range(9)
    )
    sql["source_quantile_normalize"] = f"""
        WITH cuts AS (
            SELECT source, {_sqn_cuts}
            FROM documents GROUP BY source)
        SELECT d.doc_id, d.source, d.n_chars,
               CAST({_sqn_bucket} AS INTEGER) AS norm_bucket
        FROM documents d JOIN cuts USING (source)
        ORDER BY d.doc_id
    """

    # tokenizer-application twin: same top-1000 (count DESC, term ASC)
    # vocabulary, ids = rank, OOV → 0; per-doc ordered id lists.
    sql["tokenize_to_ids"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        tokp AS (
            SELECT doc_id, CAST(pos AS INTEGER) AS pos, t[pos + 1] AS term
            FROM (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM d)),
        counts AS (SELECT term, count(*) AS n FROM tokp GROUP BY term),
        vocab AS (
            SELECT term,
                   CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER) AS id
            FROM counts
            QUALIFY id <= 1000)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               array_to_string(list(COALESCE(v.id, 0) ORDER BY pos), ',')
                   AS token_ids_csv
        FROM tokp LEFT JOIN vocab v USING (term)
        GROUP BY doc_id
        ORDER BY doc_id
    """

    # int8-quantization audit twin: identical per-element arithmetic
    # (cast→double, scale = max|x|/127, round-half-away q, error fold
    # via list_dot_product == Spark's left-to-right aggregate)
    sql["embedding_quantize_int8"] = """
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
                   FROM embeddings WHERE embedding IS NOT NULL),
        s AS (SELECT vec_id, label, x,
                     list_max(list_transform(x, v -> abs(v)))
                     / CAST(127.0 AS DOUBLE) AS scale
              FROM e),
        q AS (SELECT vec_id, label, x, scale,
                     CASE WHEN scale = CAST(0.0 AS DOUBLE)
                          THEN list_transform(x, v -> CAST(0.0 AS DOUBLE))
                          ELSE list_transform(x, v -> round(v / scale, 0)) END AS qv
              FROM s),
        er AS (SELECT vec_id, label, scale,
                      [abs(x[i] - qv[i] * scale) for i in range(1, len(x) + 1)] AS err
               FROM q)
        SELECT vec_id, label,
               round(scale, 9) AS scale,
               round(list_max(err), 9) AS max_abs_err,
               round(list_dot_product(err, err) / CAST(len(err) AS DOUBLE), 9) AS mse
        FROM er
        ORDER BY vec_id
    """

    # JL random-projection twin: the SAME rademacher planes (one
    # source of truth) as similarity.random_projection
    _rp_planes = similarity.rademacher_planes(16)
    _rp_scale = repr(1.0 / math.sqrt(16))

    def _rp_plane_lit(p: list[float]) -> str:
        return "[" + ", ".join("1.0" if v > 0 else "-1.0" for v in p) + "]"

    _rp_list = ", ".join(
        f"round(list_dot_product(vec, {_rp_plane_lit(p)})"
        f" * CAST({_rp_scale} AS DOUBLE), 9)"
        for p in _rp_planes
    )
    sql["random_projection"] = f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
                   FROM embeddings WHERE embedding IS NOT NULL),
        p AS (SELECT vec_id, label, [{_rp_list}] AS proj FROM e)
        SELECT vec_id, label, CAST(pos AS INTEGER) AS dim_id,
               proj[pos + 1] AS value
        FROM (SELECT vec_id, label, unnest(range(0, len(proj))) AS pos, proj
              FROM p)
        ORDER BY vec_id, dim_id
    """

    # two-stage compressed-first k-NN twin: identical JL projection
    # literals, identical shortlist metric/tiebreaks, exact cosine
    # re-rank — approximate search, deterministic answer
    sql["knn_projected"] = f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
                   FROM embeddings WHERE embedding IS NOT NULL),
        p AS (SELECT vec_id, label, vec, [{_rp_list}] AS proj FROM e),
        q AS (SELECT vec_id AS q_id, vec AS q_vec, proj AS q_proj
              FROM p WHERE vec_id < 20),
        d AS (SELECT q.q_id, p.vec_id,
                     round(list_dot_product(
                         [q.q_proj[i] - p.proj[i] for i in range(1, len(p.proj) + 1)],
                         [q.q_proj[i] - p.proj[i] for i in range(1, len(p.proj) + 1)]),
                         9) AS pdist2
              FROM p CROSS JOIN q WHERE p.vec_id <> q.q_id),
        cand AS (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY pdist2 ASC, vec_id ASC) AS srn
            FROM d QUALIFY srn <= 32),
        r AS (SELECT c.q_id, c.vec_id, p.label,
                     round(list_dot_product(q.q_vec, p.vec)
                           / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                              * sqrt(list_dot_product(p.vec, p.vec))), 9) AS cos_sim
              FROM cand c
              JOIN p ON p.vec_id = c.vec_id
              JOIN q ON q.q_id = c.q_id)
        SELECT q_id,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, vec_id ASC)
                    AS INTEGER) AS rn,
               vec_id, label, cos_sim
        FROM r
        QUALIFY rn <= 5
        ORDER BY q_id, rn
    """

    # Pareto contribution twin: cumulative window over the count
    # relation, single final double divisions
    sql["pareto_contribution"] = """
        WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        w AS (SELECT event_type, n,
                     CAST(sum(n) OVER (ORDER BY n DESC, event_type ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum_n,
                     (SELECT total FROM t) AS total
              FROM c)
        SELECT event_type, n,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
               CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
               CAST(cum_n - n AS DOUBLE) < 0.8 * CAST(total AS DOUBLE) AS in_head
        FROM w ORDER BY n DESC, event_type ASC
    """

    # order-independent dataset checksum twin: identical 60-bit md5
    # content hash, XOR-aggregated
    sql["dataset_checksum"] = """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
                   AS xor_checksum
        FROM documents GROUP BY source ORDER BY source
    """

    # least-squares trend panel twin: shared sufficient-sum / combine
    # fragments (analytics.TREND_*_SQL) with the DuckDB epoch-hour form
    _tsums = ", ".join(
        f"{expr.format(x=analytics.TREND_X_DUCK, y='value')} AS {name}"
        for name, expr in analytics.TREND_SUMS_SQL.items()
    )
    _tfin = ", ".join(
        f"{expr} AS {name}" for name, expr in analytics.TREND_FINAL_SQL.items()
    )
    sql["trend_slope"] = f"""
        WITH sums AS (
            SELECT event_type, {_tsums}
            FROM events GROUP BY event_type)
        SELECT event_type, n, {_tfin}
        FROM sums ORDER BY event_type
    """

    # KL(source ‖ corpus) twin: identical tokenization, per-term
    # pinned-order double contribution rounded to 9 dp, DECIMAL(20,9)
    # accumulation (the bm25 order-independence pattern)
    sql["source_kl_divergence"] = f"""
        WITH toks AS (
            SELECT source, unnest({_TOKS}) AS term FROM documents),
        tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
               FROM toks GROUP BY source, term),
        st AS (SELECT source, SUM(c_st) AS n_s FROM tf GROUP BY source),
        tt AS (SELECT term, SUM(c_st) AS c_t FROM tf GROUP BY term),
        tot AS (SELECT SUM(n_s) AS n_total FROM st),
        contrib AS (
            SELECT tf.source,
                   CAST(round((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                     * ln((CAST(c_st AS DOUBLE) * CAST(n_total AS DOUBLE))
                     / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))), 9)
                     AS DECIMAL(20,9)) AS contrib
            FROM tf JOIN st USING (source) JOIN tt USING (term)
            CROSS JOIN tot)
        SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(SUM(contrib) AS DOUBLE) AS kl_nats
        FROM contrib GROUP BY source ORDER BY source
    """

    # k-anonymity lattice twin: GROUPING SETS + per-set decision panel
    sql["k_anonymity_audit"] = """
        WITH g AS (
            SELECT CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nat,
                   CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer
            GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment),
                                    (c_nationkey), (c_mktsegment)))
        SELECT CASE WHEN g_nat = 0 AND g_seg = 0 THEN 'nationkey+mktsegment'
                    WHEN g_nat = 0 THEN 'nationkey'
                    ELSE 'mktsegment' END AS qi_set,
               CAST(count(*) AS BIGINT) AS n_groups,
               MIN(n) AS min_group_n,
               CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               MIN(n) >= 5 AS k_anonymous
        FROM g GROUP BY 1 ORDER BY qi_set
    """

    # logistic quality gate twin: identical feature counts, the shared
    # pinned-order scoring expression (text.QUALITY_LOGIT_SQL), and
    # DuckDB's 'g' regexp flag for the non-space length
    sql["quality_logit"] = f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_unique,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_all_stop}))) AS BIGINT) AS n_stopwords,
                   length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace
            FROM documents),
        s AS (
            SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
                   {text_ops.QUALITY_LOGIT_SQL} AS keep_p
            FROM base WHERE n_tokens > 0)
        SELECT doc_id, n_tokens, keep_p, keep_p >= 0.5 AS keep
        FROM s ORDER BY doc_id
    """

    # data-contract twin: one aggregation CTE + constant-width reshape
    sql["data_contract_audit"] = """
        WITH a AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_key,
                   CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key,
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
                   CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_value,
                   CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS high_value,
                   CAST(SUM(CASE WHEN event_type NOT IN
                       ('click','error','purchase','signup','view')
                       THEN 1 ELSE 0 END) AS BIGINT) AS bad_type,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '2020-01-01'
                       OR ts >= TIMESTAMP '2035-01-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS bad_ts
            FROM events)
        SELECT c.* FROM a, LATERAL (VALUES
            ('event_id_not_null', CAST(null_key AS DOUBLE), null_key = 0),
            ('event_id_unique', CAST(n - n_key AS DOUBLE), n = n_key),
            ('event_type_in_domain', CAST(bad_type AS DOUBLE), bad_type = 0),
            ('row_count_min_1', CAST(n AS DOUBLE), n >= 1),
            ('ts_in_2020_2035', CAST(bad_ts AS DOUBLE), bad_ts = 0),
            ('user_id_not_null', CAST(null_user AS DOUBLE), null_user = 0),
            ('value_below_400', CAST(high_value AS DOUBLE), high_value = 0),
            ('value_non_negative', CAST(neg_value AS DOUBLE), neg_value = 0)
            ) AS c(expectation, observed, pass)
        ORDER BY expectation
    """

    # PSI drift twin: same generated bin CASE + smoothed-term SQL
    _psi_cuts = ", ".join(
        f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY value) AS c{i}"
        for i in range(1, 10)
    )
    sql["psi_drift"] = f"""
        WITH s AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                   FROM events),
        tagged AS (
            SELECT epoch_us(ts) <= (mn + mx) // 2 AS is_ref, value
            FROM events, s),
        cuts AS (SELECT {_psi_cuts} FROM tagged WHERE is_ref),
        counts AS (
            SELECT {anomaly.psi_bin_case_sql(10)} AS bin,
                   CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
                   CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
            FROM tagged, cuts GROUP BY 1),
        t AS (SELECT SUM(c_ref) AS t_ref, SUM(c_cur) AS t_cur FROM counts)
        SELECT CAST(bin AS INTEGER) AS bin, c_ref AS n_ref, c_cur AS n_cur,
               {anomaly.PSI_TERM_SQL.format(nbins=10)} AS psi_term
        FROM counts, t ORDER BY bin
    """

    # LATERAL twin: the SAME SQL text (relational.LATERAL_TOPK_SQL)
    sql["lateral_topk"] = relational.LATERAL_TOPK_SQL

    # streaming contract gate: availableNow state == batch audit, so
    # it shares the batch oracle verbatim
    sql["streaming_contract_audit"] = sql["data_contract_audit"]

    # interpolated-bigram LM twin: array-side pair construction
    # (prepend-null + zip), the shared term expression, DECIMAL
    # accumulation
    sql["bigram_logprob"] = f"""
        WITH base AS (
            SELECT doc_id, source, {_TOKS} AS l FROM documents),
        pairs AS (
            SELECT doc_id, source, p[1] AS prev, p[2] AS cur
            FROM (SELECT doc_id, source,
                         unnest(list_zip(list_prepend(NULL, l)[1:len(l)], l)) AS p
                  FROM base WHERE len(l) > 0) t),
        uni AS (SELECT cur AS tok, CAST(count(*) AS BIGINT) AS n_uni
                FROM pairs GROUP BY 1),
        bi AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c12
               FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT SUM(n_uni) AS n_total FROM uni),
        scored AS (
            SELECT doc_id, source,
                   CAST({pipeline.BIGRAM_TERM_SQL} AS DECIMAL(28,9)) AS term
            FROM pairs
            LEFT JOIN (SELECT tok AS cur, n_uni AS cu FROM uni) u1 USING (cur)
            LEFT JOIN (SELECT tok AS prev, n_uni AS c1 FROM uni) u2 USING (prev)
            LEFT JOIN bi USING (prev, cur)
            CROSS JOIN tot)
        SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(SUM(term) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS avg_logprob
        FROM scored GROUP BY doc_id, source ORDER BY doc_id
    """

    # blocking-quality twin: identical integer pair arithmetic + the
    # shared reduction-ratio expression
    sql["blocking_stats"] = f"""
        WITH c AS (
            SELECT substr(text, 1, 16) AS blk, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(MAX(c) AS BIGINT) AS max_block,
                   CAST(SUM(CAST(c AS HUGEINT) * (c - 1) // 2) AS BIGINT)
                       AS candidate_pairs,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS singleton_blocks
            FROM c)
        SELECT n_blocks, n_docs, max_block, candidate_pairs,
               singleton_blocks, {dedup.BLOCKING_RR_SQL} AS reduction_ratio
        FROM s
    """

    # right-to-be-forgotten twin: recompute with the cohort excluded.
    # NULL-user rows are NOT in the erasure cohort, so they must be
    # retained — a bare `user_id % 97 <> 0` would drop them (NULL
    # predicate is not true), diverging from the operator on any feed
    # with NULL user_id.
    sql["forget_users_rollup"] = """
        SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_s,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events WHERE user_id IS NULL OR user_id % 97 <> 0
        GROUP BY 1, 2 ORDER BY bucket_s, event_type
    """

    # per-source duplication scorecard twin: identical digest and
    # count-relation join
    sql["dup_rate_by_source"] = """
        WITH ps AS (
            SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS content_fp,
                   source, CAST(count(*) AS BIGINT) AS n_here
            FROM documents GROUP BY 1, 2),
        t AS (SELECT content_fp, SUM(n_here) AS n_total FROM ps GROUP BY 1),
        j AS (SELECT source, n_here, n_total, n_total > n_here AS cross_source
              FROM ps JOIN t USING (content_fp))
        SELECT source,
               CAST(SUM(n_here) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_total > 1 THEN n_here ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
               CAST(SUM(CASE WHEN cross_source THEN n_here ELSE 0 END) AS BIGINT)
                   AS n_cross_source_docs,
               CAST(count(*) AS BIGINT) AS n_contents,
               CAST(SUM(CASE WHEN n_total > 1 THEN n_here ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(n_here) AS DOUBLE) AS dup_rate
        FROM j GROUP BY source ORDER BY source
    """

    # IVM twin: the oracle does the from-scratch recompute the
    # incremental path must equal bit-for-bit (operators/ivm.py)
    sql["incremental_rollup"] = """
        SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_s,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events WHERE event_id % 7 <> 0
        GROUP BY 1, 2 ORDER BY bucket_s, event_type
    """

    # robust (bucket-median) trend twin: same shared fragments over
    # the per-hour median relation
    _rsums = ", ".join(
        f"{expr.format(x='hr', y='med')} AS {name}"
        for name, expr in analytics.TREND_SUMS_SQL.items()
    )
    sql["robust_trend"] = f"""
        WITH h AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events GROUP BY event_type, hr),
        sums AS (SELECT event_type, {_rsums} FROM h GROUP BY event_type)
        SELECT event_type, n AS n_hours, {_tfin}
        FROM sums ORDER BY event_type
    """

    # chi-square independence twin: exact integer diff + shared cell
    # expression
    sql["independence_chi2"] = f"""
        WITH sparse AS (
            SELECT event_type,
                   (epoch_us(ts) // 86400000000) % 7 AS dow,
                   CAST(count(*) AS BIGINT) AS obs
            FROM events GROUP BY 1, 2),
        rm AS (SELECT event_type, SUM(obs) AS r FROM sparse GROUP BY 1),
        cm AS (SELECT dow, SUM(obs) AS c FROM sparse GROUP BY 1),
        t AS (SELECT SUM(obs) AS n FROM sparse),
        cells AS (
            SELECT s.event_type, d.dow, COALESCE(sp.obs, 0) AS obs
            FROM (SELECT event_type FROM rm) s
            CROSS JOIN (SELECT dow FROM cm) d
            LEFT JOIN sparse sp USING (event_type, dow)),
        j AS (
            SELECT cells.event_type, cells.dow, obs, r, c, n,
                   {analytics.CHI2_DIFF_SQL} AS diff
            FROM cells JOIN rm USING (event_type) JOIN cm USING (dow)
            CROSS JOIN t)
        SELECT event_type, CAST(dow AS INTEGER) AS dow, obs,
               round(CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                     / CAST(n AS DOUBLE), 9) AS expected,
               {analytics.CHI2_CELL_SQL} AS chi2_term
        FROM j ORDER BY event_type, dow
    """

    # RFM twin: identical integer metrics, order-statistic cuts, and
    # monotone score chains
    sql["rfm_segments"] = """
        WITH pu AS (
            SELECT user_id,
                   max(epoch_us(ts)) AS last_us,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS mon_cents
            FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        snap AS (SELECT max(last_us) AS as_of_us FROM pu),
        base AS (SELECT pu.*, as_of_us - last_us AS rec_us FROM pu, snap),
        cuts AS (
            SELECT
              CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY rec_us) AS BIGINT) AS rc1,
              CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY rec_us) AS BIGINT) AS rc2,
              CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY rec_us) AS BIGINT) AS rc3,
              CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY rec_us) AS BIGINT) AS rc4,
              CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS fc1,
              CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS fc2,
              CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS fc3,
              CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS fc4,
              CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY mon_cents) AS BIGINT) AS mc1,
              CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY mon_cents) AS BIGINT) AS mc2,
              CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY mon_cents) AS BIGINT) AS mc3,
              CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY mon_cents) AS BIGINT) AS mc4
            FROM base),
        scored AS (
            SELECT user_id, rec_us, freq, mon_cents,
                   CAST(5 - (CAST(rec_us > rc1 AS INT) + CAST(rec_us > rc2 AS INT)
                       + CAST(rec_us > rc3 AS INT) + CAST(rec_us > rc4 AS INT)) AS INT)
                       AS r_score,
                   CAST(1 + CAST(freq > fc1 AS INT) + CAST(freq > fc2 AS INT)
                       + CAST(freq > fc3 AS INT) + CAST(freq > fc4 AS INT) AS INT)
                       AS f_score,
                   CAST(1 + CAST(mon_cents > mc1 AS INT) + CAST(mon_cents > mc2 AS INT)
                       + CAST(mon_cents > mc3 AS INT) + CAST(mon_cents > mc4 AS INT) AS INT)
                       AS m_score
            FROM base, cuts)
        SELECT *,
               CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                    WHEN f_score >= 4 THEN 'loyal'
                    WHEN r_score >= 4 THEN 'recent'
                    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                    ELSE 'hibernating' END AS segment
        FROM scored ORDER BY user_id
    """

    # streaming RFM: availableNow per-user state == the batch user
    # relation, then the SHARED coda — oracle shared verbatim
    sql["streaming_rfm_segments"] = sql["rfm_segments"]

    # feature-store twin: identical conditional aggregates and rate
    # expressions
    sql["user_feature_table"] = """
        WITH pu AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   min(epoch_us(ts)) AS first_us,
                   max(epoch_us(ts)) AS last_us,
                   CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
                       AS active_days,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) * 100
                       AS BIGINT) AS spend_cents
            FROM events GROUP BY user_id),
        s AS (SELECT max(last_us) AS as_of_us FROM pu)
        SELECT user_id, n_events, n_types, n_view, n_click, n_purchase,
               n_signup, n_error,
               as_of_us - last_us AS recency_us,
               (last_us - first_us) // 86400000000 + 1 AS span_days,
               active_days, spend_cents,
               round(CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE), 9)
                   AS events_per_active_day,
               round(CAST(active_days AS DOUBLE)
                   / CAST((last_us - first_us) // 86400000000 + 1 AS DOUBLE), 9)
                   AS activity_density
        FROM pu, s ORDER BY user_id
    """

    # streaming feature store: availableNow (user, type, day) state
    # re-aggregates to the batch per-user relation — oracle shared
    sql["streaming_user_features"] = sql["user_feature_table"]

    # SLO burn twin: identical integer day counts and pinned ratios
    sql["slo_burn"] = """
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day_no,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_errors
            FROM events GROUP BY 1),
        c AS (
            SELECT *, SUM(n_errors) OVER (ORDER BY day_no ROWS BETWEEN
                      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_errors,
                   SUM(n_total) OVER (ORDER BY day_no ROWS BETWEEN
                      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_total
            FROM daily)
        SELECT CAST(day_no AS BIGINT) AS day_no, n_total, n_errors,
               round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 9)
                   AS error_rate,
               round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE)
                   / 0.01, 9) AS burn_rate,
               round(CAST(cum_errors AS DOUBLE)
                   / (0.01 * CAST(cum_total AS DOUBLE)), 9) AS cum_budget_used
        FROM c ORDER BY day_no
    """

    # streaming SLO: availableNow daily state == batch — shared oracle
    sql["streaming_slo_burn"] = sql["slo_burn"]

    # trend forecast twin: same TREND fragments + the projection
    _fsums = ", ".join(
        f"{expr.format(x=analytics.TREND_X_DUCK, y='value')} AS {name}"
        for name, expr in analytics.TREND_SUMS_SQL.items()
    )
    _fslope = analytics.TREND_FINAL_SQL["slope_per_hour"]
    _fint = analytics.TREND_FINAL_SQL["intercept"]
    sql["trend_forecast"] = f"""
        WITH sums AS (
            SELECT event_type, {_fsums}
            FROM events GROUP BY event_type),
        hm AS (SELECT max({analytics.TREND_X_DUCK}) AS h_max FROM events)
        SELECT event_type, n, {_fslope} AS slope_per_hour,
               round(CASE WHEN ({_fslope}) IS NOT NULL THEN
                   ({_fslope}) * CAST(h_max + 24 AS DOUBLE) + ({_fint})
                   END, 9) AS forecast_value,
               h_max + 24 AS forecast_hour
        FROM sums, hm ORDER BY event_type
    """

    # dispersion twin: moment sums over the (type, bucket) count
    # relation, pinned combines
    sql["dispersion_panel"] = """
        WITH c AS (
            SELECT event_type, epoch_us(ts) // 60000000 AS b,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(c) AS BIGINT) AS n_events,
                   SUM(CAST(c AS HUGEINT) * c) AS s2
            FROM c GROUP BY 1),
        f AS (
            SELECT event_type, n_buckets, n_events,
                   round(CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE), 9)
                       AS mean_per_bucket,
                   round(CASE WHEN n_buckets > 1 THEN
                       (CAST(s2 AS DOUBLE) / CAST(n_buckets AS DOUBLE)
                        - (CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                        * (CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE)))
                       / (CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                       END, 9) AS fano_factor
            FROM s)
        SELECT event_type, n_buckets, n_events, mean_per_bucket, fano_factor,
               -- classify from the ROUNDED fano value, exactly as the
               -- Spark operator does (a raw value within 5e-10 of a
               -- threshold must band identically in both engines)
               CASE WHEN fano_factor IS NULL THEN 'unknown'
                    WHEN fano_factor > 1.5 THEN 'bursty'
                    WHEN fano_factor < 0.7 THEN 'regular'
                    ELSE 'poisson_like' END AS arrival_class
        FROM f ORDER BY event_type
    """

    # bounce-rate twin: the sessionize window chain + per-day panel
    sql["bounce_rate_daily"] = """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
            SELECT user_id, event_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM flagged),
        sess AS (
            SELECT user_id, session_no, count(*) AS n_events,
                   min(epoch_us(ts)) // 86400000000 AS day_no
            FROM numbered GROUP BY 1, 2)
        SELECT day_no, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 9) AS bounce_rate
        FROM sess GROUP BY day_no ORDER BY day_no
    """

    # streaming bounce panel: availableNow session_window state ==
    # batch sessions (equivalence pinned) — shares the batch oracle
    sql["streaming_bounce_rate"] = sql["bounce_rate_daily"]

    # time-boxed funnel twin: same step conditioning plus the lag
    # bound; medians are order statistics over converting users
    sql["funnel_windowed"] = """
        WITH s1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t, min(s1.t) AS t_from
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
              AND epoch_us(e.ts) <= s1.t + CAST(43200000000 AS BIGINT)
            GROUP BY 1),
        s3 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t, min(s2.t) AS t_from
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
              AND epoch_us(e.ts) <= s2.t + CAST(43200000000 AS BIGINT)
            GROUP BY 1),
        c AS (
            SELECT 1 AS step_no, 'view' AS step,
                   (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users,
                   CAST(NULL AS BIGINT) AS median_lag_us
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
                   (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                           (ORDER BY t - t_from) AS BIGINT) FROM s2)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
                   (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                           (ORDER BY t - t_from) AS BIGINT) FROM s3))
        SELECT step_no, step, n_users, median_lag_us,
               round(CASE WHEN lag(n_users) OVER (ORDER BY step_no) != 0
                          THEN CAST(n_users AS DOUBLE) /
                               CAST(lag(n_users) OVER (ORDER BY step_no) AS DOUBLE)
                     END, 9) AS conversion
        FROM c ORDER BY step_no
    """

    # Kaplan–Meier twin: identical integer lifetimes/censoring, the
    # same decimal ln-sum window recursion, extinction flag
    sql["survival_curve"] = """
        WITH fm AS (SELECT max(epoch_us(ts)) AS feed_max_us FROM events),
        pu AS (
            SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000
                       AS day,
                   CAST((SELECT feed_max_us FROM fm) - max(epoch_us(ts))
                        < 7 * CAST(86400000000 AS BIGINT) AS INT) AS censored
            FROM events GROUP BY user_id),
        days AS (
            SELECT day, CAST(count(*) AS BIGINT) AS n_exits,
                   CAST(SUM(1 - censored) AS BIGINT) AS n_deaths,
                   CAST(SUM(censored) AS BIGINT) AS n_censored
            FROM pu GROUP BY day),
        t AS (SELECT SUM(n_exits) AS n_total FROM days),
        r AS (
            SELECT day, n_deaths, n_censored,
                   n_total - COALESCE(SUM(n_exits) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_risk
            FROM days, t),
        s AS (
            SELECT day, n_risk, n_deaths, n_censored,
                   CASE WHEN n_deaths = 0 THEN CAST(0.0 AS DECIMAL(20,9))
                        WHEN n_deaths < n_risk THEN CAST(round(ln(1.0
                            - CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9)
                            AS DECIMAL(20,9))
                        ELSE CAST(0.0 AS DECIMAL(20,9)) END AS ln_factor,
                   MAX(CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS extinct
            FROM r),
        c AS (
            SELECT *, SUM(ln_factor) OVER (ORDER BY day ROWS BETWEEN
                      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln
            FROM s)
        SELECT day AS lifetime_day,
               CAST(n_risk AS BIGINT) AS n_risk, n_deaths, n_censored,
               CASE WHEN extinct = 1 THEN 0.0
                    ELSE round(exp(CAST(cum_ln AS DOUBLE)), 9) END AS survival
        FROM c ORDER BY lifetime_day
    """

    # A/B panel twin: identical md5 arm assignment and the shared
    # pooled-z expression. Conditional aggregation (not filter +
    # cross join) so the panel is always exactly one row even when an
    # arm is empty — matching the operator's always-1-row contract.
    sql["ab_test_panel"] = f"""
        WITH pu AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id),
        assigned AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 2 AS arm,
                   converted
            FROM pu),
        arms AS (
            SELECT CAST(COUNT(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_a,
                   CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END),
                                 0) AS BIGINT) AS conv_a,
                   CAST(COUNT(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_b,
                   CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END),
                                 0) AS BIGINT) AS conv_b
            FROM assigned)
        SELECT n_a, conv_a,
               round(CASE WHEN n_a > 0 THEN
                   CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END, 9) AS rate_a,
               n_b, conv_b,
               round(CASE WHEN n_b > 0 THEN
                   CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END, 9) AS rate_b,
               round(CASE WHEN conv_a > 0 AND n_b > 0 THEN
                   (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - 1.0 END, 9)
                   AS relative_lift,
               {event_analytics.AB_Z_SQL} AS z_stat
        FROM arms
    """

    # period-over-period twin: gap-safe integer-day self-joins
    sql["period_over_period"] = """
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day_no,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
        SELECT d.event_type, CAST(d.day_no AS BIGINT) AS day_no, d.n,
               CAST(d.n - p1.n AS DOUBLE) / CAST(p1.n AS DOUBLE) AS dod_change,
               CAST(d.n - p7.n AS DOUBLE) / CAST(p7.n AS DOUBLE) AS wow_change
        FROM daily d
        LEFT JOIN daily p1 ON d.event_type = p1.event_type
                          AND d.day_no = p1.day_no + 1
        LEFT JOIN daily p7 ON d.event_type = p7.event_type
                          AND d.day_no = p7.day_no + 7
        ORDER BY d.event_type, d.day_no
    """

    # streaming growth panel: availableNow daily state == batch daily
    # counts, then the SHARED coda — oracle shared verbatim
    sql["streaming_period_over_period"] = sql["period_over_period"]

    # trigram-langid twin: train profiles, classify, and evaluate in
    # SQL — identical ranks, weights, and tiebreaks
    sql["trigram_langid_eval"] = """
        WITH tri AS (
            SELECT doc_id, lang AS lang_true, substr(text, CAST(i AS INTEGER), 3) AS tg
            FROM documents, LATERAL unnest(range(1, len(text) - 1)) AS t(i)
            WHERE len(text) >= 3),
        prof AS (
            SELECT plang, tg, 51 - rnk AS wt FROM (
                SELECT lang_true AS plang, tg, count(*) AS n,
                       row_number() OVER (PARTITION BY lang_true
                                          ORDER BY count(*) DESC, tg ASC) AS rnk
                FROM tri GROUP BY 1, 2) r
            WHERE rnk <= 50),
        dtg AS (SELECT DISTINCT doc_id, lang_true, tg FROM tri),
        sc AS (
            SELECT doc_id, lang_true, plang, CAST(SUM(wt) AS BIGINT) AS score
            FROM dtg JOIN prof USING (tg) GROUP BY 1, 2, 3),
        best AS (
            SELECT doc_id, lang_true, plang AS lang_pred FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, plang ASC) AS rn
                FROM sc) b WHERE rn = 1)
        SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
        FROM best GROUP BY 1, 2 ORDER BY lang_true, lang_pred
    """

    # market-share (Q8 shape) twin: the nation dim joins twice, the
    # share window runs over the cell relation
    sql["market_share"] = """
        WITH cells AS (
            SELECT r.r_name,
                   CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                   sn.n_name AS supp_nation,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST((1 - CAST(l.l_discount AS DECIMAL(18,2)))
                              AS DECIMAL(8,2))) AS revenue_raw
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            GROUP BY 1, 2, 3)
        SELECT r_name, o_year, supp_nation,
               CAST(revenue_raw AS DOUBLE) AS revenue,
               CAST(revenue_raw AS DOUBLE)
                   / CAST(SUM(revenue_raw) OVER (PARTITION BY r_name, o_year)
                          AS DOUBLE) AS market_share
        FROM cells ORDER BY r_name, o_year, supp_nation
    """

    # streaming trend: decimal sufficient sums are mergeable streaming
    # state; availableNow == batch sums — oracle shared verbatim
    sql["streaming_trend_slope"] = sql["trend_slope"]

    # health scorecard twin: identical panel aggregates + pinned fold
    sql["health_score"] = """
        WITH pt AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   max(epoch_us(ts)) AS last_us
            FROM events GROUP BY 1),
        p AS (
            SELECT SUM(n) AS n_total,
                   SUM(CASE WHEN event_type = 'error' THEN n ELSE 0 END)
                       AS n_errors,
                   CAST(count(*) AS BIGINT) AS n_sources,
                   max(last_us) AS as_of_us
            FROM pt),
        st AS (
            SELECT CAST(count(*) AS BIGINT) AS n_stale
            FROM pt, p WHERE as_of_us - last_us > 60 * CAST(60000000 AS BIGINT))
        SELECT CAST(n_total AS BIGINT) AS n_total,
               CAST(n_errors AS BIGINT) AS n_errors, n_sources, n_stale,
               round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 9)
                   AS error_rate,
               round(100.0
                   - 40.0 * least(1.0, CAST(n_errors AS DOUBLE)
                     / CAST(n_total AS DOUBLE) / 0.01)
                   - 30.0 * (CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                   - 30.0 * (CAST(n_stale AS DOUBLE) / CAST(n_sources AS DOUBLE)), 9)
                   AS score,
               CASE WHEN round(100.0
                   - 40.0 * least(1.0, CAST(n_errors AS DOUBLE)
                     / CAST(n_total AS DOUBLE) / 0.01)
                   - 30.0 * (CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                   - 30.0 * (CAST(n_stale AS DOUBLE) / CAST(n_sources AS DOUBLE)), 9)
                   >= 90 THEN 'healthy'
                    WHEN round(100.0
                   - 40.0 * least(1.0, CAST(n_errors AS DOUBLE)
                     / CAST(n_total AS DOUBLE) / 0.01)
                   - 30.0 * (CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                   - 30.0 * (CAST(n_stale AS DOUBLE) / CAST(n_sources AS DOUBLE)), 9)
                   >= 70 THEN 'degraded'
                    ELSE 'critical' END AS band
        FROM p, st
    """

    # nearest (bidirectional as-of) twin: identical union + two-pass
    # window carry with IGNORE NULLS
    sql["nearest_event_join"] = """
        WITH r AS (
            SELECT user_id, ts, max(event_id) AS r_event_id, 0 AS tag
            FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        l AS (
            SELECT user_id, ts, event_id AS l_event_id,
                   CAST(NULL AS BIGINT) AS r_event_id, 1 AS tag
            FROM events WHERE event_type = 'purchase'),
        u AS (
            SELECT user_id, ts, CAST(NULL AS BIGINT) AS l_event_id,
                   r_event_id, tag FROM r
            UNION ALL
            SELECT user_id, ts, l_event_id, r_event_id, tag FROM l),
        carried AS (
            SELECT user_id, ts, l_event_id, tag,
                   last_value(CASE WHEN tag = 0 THEN r_event_id END IGNORE NULLS)
                       OVER wb AS prev_id,
                   last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
                       OVER wb AS prev_us,
                   last_value(CASE WHEN tag = 0 THEN r_event_id END IGNORE NULLS)
                       OVER wf AS next_id,
                   last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
                       OVER wf AS next_us
            FROM u
            WINDOW wb AS (PARTITION BY user_id ORDER BY ts, tag
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY ts DESC, tag DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT l_event_id AS event_id, user_id,
               CASE WHEN next_us IS NULL
                         OR (prev_us IS NOT NULL
                             AND epoch_us(ts) - prev_us <= next_us - epoch_us(ts))
                    THEN prev_id ELSE next_id END AS nearest_id,
               CASE WHEN next_us IS NULL
                         OR (prev_us IS NOT NULL
                             AND epoch_us(ts) - prev_us <= next_us - epoch_us(ts))
                    THEN epoch_us(ts) - prev_us
                    ELSE -(next_us - epoch_us(ts)) END AS signed_gap_us
        FROM carried WHERE tag = 1 ORDER BY event_id
    """

    # WITH TIES twin: DuckDB supports the ANSI clause natively — the
    # oracle uses it directly, pinning the rank lowering to the real
    # SQL semantics
    sql["topk_with_ties"] = """
        WITH ranked AS (
            SELECT event_id, user_id, event_type, value,
                   CAST(rank() OVER (ORDER BY value DESC) AS INTEGER) AS rnk
            FROM events)
        SELECT * FROM ranked WHERE rnk <= 10
        ORDER BY value DESC, event_id ASC
    """

    # join-size estimator twin: Σ_k cnt_A(k)·cnt_B(k) over the two
    # count relations, identical arithmetic shape
    sql["join_cardinality"] = """
        WITH a AS (SELECT user_id, count(*) AS cnt_a FROM events
                   WHERE event_type = 'purchase' GROUP BY 1),
        b AS (SELECT user_id, count(*) AS cnt_b FROM events
              WHERE event_type IN ('view', 'click') GROUP BY 1),
        p AS (SELECT a.user_id, cnt_a * cnt_b AS pairs
              FROM a JOIN b USING (user_id))
        SELECT CAST(sum(pairs) AS BIGINT) AS est_rows,
               CAST(count(*) AS BIGINT) AS n_matched_keys,
               CAST(max(pairs) AS BIGINT) AS max_key_pairs,
               CAST(max(pairs) AS DOUBLE) / CAST(sum(pairs) AS DOUBLE)
                   AS top_key_share
        FROM p
    """

    # per-bucket latency percentiles: exact order statistics, one
    # keyed aggregate in both engines
    sql["latency_percentile_panel"] = """
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_s,
               CAST(count(*) AS BIGINT) AS n,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM events GROUP BY 1 ORDER BY 1
    """

    # per-day trending types: rank over the count relation
    sql["trending_types"] = """
        WITH c AS (
            SELECT epoch_us(ts) // 86400000000 AS day_no, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
        SELECT day_no, event_type, n,
               CAST(row_number() OVER (PARTITION BY day_no
                                       ORDER BY n DESC, event_type ASC)
                    AS INTEGER) AS rnk
        FROM c
        QUALIFY rnk <= 3
        ORDER BY day_no, rnk
    """

    # streaming twins share their batch operators' oracles verbatim
    # (availableNow complete-mode state == the batch aggregate)
    sql["streaming_value_histogram"] = sql["value_histogram"]
    sql["streaming_trending_types"] = sql["trending_types"]

    # mirrors curation.decontaminate over the same hash-bucket
    # benchmark/train split as _q_decontaminate; Spark counts distinct
    # 64-bit shingle hashes, the oracle distinct shingle strings —
    # equal cardinalities absent a ~2^-32 collision
    sql["decontaminate"] = f"""
        WITH d AS (SELECT doc_id, text, {_HB} % 100 AS hb FROM documents),
        tr AS (SELECT doc_id, {_TOKS} AS toks FROM d WHERE hb >= 2),
        be AS (SELECT doc_id, {_TOKS} AS toks FROM d WHERE hb < 2),
        tr_ex AS (
            SELECT doc_id,
                   unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                         for i in range(1, len(toks) - 1)])) AS s
            FROM tr WHERE len(toks) >= 3),
        be_ex AS (
            SELECT doc_id AS bench_id,
                   unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                         for i in range(1, len(toks) - 1)])) AS s
            FROM be WHERE len(toks) >= 3)
        SELECT tr_ex.doc_id,
               count(DISTINCT tr_ex.s) AS n_hit_shingles,
               count(DISTINCT be_ex.bench_id) AS n_bench_docs
        FROM tr_ex JOIN be_ex ON tr_ex.s = be_ex.s
        GROUP BY tr_ex.doc_id
        ORDER BY doc_id
    """

    # the weight/rate formulas are the SAME strings the Spark plan
    # parses (curation.WEIGHT_SQL / RATE_SQL) — bit-identical doubles
    _W = curation.WEIGHT_SQL.format(alpha=0.5)
    _R = curation.RATE_SQL.format(target_frac=0.5, alpha_m1=-0.5)
    sql["temperature_mix"] = f"""
        WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        t AS (SELECT sum(power(n_docs, {0.5!r})) AS pow_sum,
                     CAST(sum(n_docs) AS BIGINT) AS n_total FROM c)
        SELECT source, n_docs, {_W} AS weight, {_R} AS sample_rate
        FROM c CROSS JOIN t
        ORDER BY source
    """

    sql["temperature_sample"] = f"""
        WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        t AS (SELECT sum(power(n_docs, {0.5!r})) AS pow_sum,
                     CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
        r AS (SELECT source, {_R} AS sample_rate FROM c CROSS JOIN t)
        SELECT doc_id, d.source, lang, n_chars
        FROM documents d JOIN r ON d.source = r.source
        WHERE {_HB} % 1000000 < CAST(floor(sample_rate * 1000000.0) AS BIGINT)
        ORDER BY doc_id
    """

    # bucket CASEs generated from the same boundary list as the Spark
    # plan (curation.length_bucket_case / _label_case)
    sql["length_buckets"] = f"""
        WITH t AS (SELECT CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
        b AS (SELECT n_tokens,
                     {curation.length_bucket_case("n_tokens")} AS bucket_id,
                     {curation.length_bucket_label_case("n_tokens")} AS bucket_label
              FROM t),
        a AS (SELECT bucket_id, bucket_label, count(*) AS n_docs,
                     CAST(sum(n_tokens) AS BIGINT) AS total_tokens
              FROM b GROUP BY bucket_id, bucket_label),
        c AS (SELECT CAST(sum(total_tokens) AS BIGINT) AS corpus_tokens FROM a)
        SELECT bucket_id, bucket_label, n_docs, total_tokens,
               round(CAST(total_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE), 9)
                   AS token_share
        FROM a CROSS JOIN c
        ORDER BY bucket_id
    """

    sql["snapshot_diff"] = """
        WITH oldt AS (SELECT doc_id, text FROM documents),
        newt AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
            FROM documents WHERE doc_id % 17 <> 0
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id, text
            FROM documents WHERE doc_id % 29 = 0),
        o AS (SELECT doc_id, md5(text) AS old_fp FROM oldt),
        n AS (SELECT doc_id, md5(text) AS new_fp FROM newt),
        j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_fp, new_fp
              FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        SELECT doc_id,
               CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'deleted'
                    WHEN old_fp = new_fp THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM j ORDER BY doc_id
    """

    # same re-crawl as snapshot_diff, except half the re-appeared docs
    # carry genuinely new content; md5 values never leave either engine
    # (the join/anti/window all compare within-engine fingerprints)
    sql["incremental_dedup"] = """
        WITH oldt AS (SELECT doc_id, text FROM documents),
        newt AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
            FROM documents WHERE doc_id % 17 <> 0
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN text || ' brand-new' ELSE text END AS text
            FROM documents WHERE doc_id % 29 = 0),
        o AS (SELECT doc_id, md5(text) AS fp FROM oldt),
        n AS (SELECT doc_id, md5(text) AS fp FROM newt),
        ch AS (SELECT n.doc_id AS doc_id, n.fp AS fp,
                      CASE WHEN o.fp IS NULL THEN 'added' ELSE 'changed' END AS status
               FROM n LEFT JOIN o ON n.doc_id = o.doc_id
               WHERE o.fp IS NULL OR o.fp <> n.fp),
        r AS (SELECT doc_id, fp, status,
                     row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              FROM ch)
        SELECT doc_id, status FROM r
        WHERE rn = 1 AND fp NOT IN (SELECT fp FROM o)
        ORDER BY doc_id
    """

    # patterns injected from text.PII_PATTERNS — the same strings the
    # Spark plan compiles (Java regex and RE2 agree on this subset)
    _PII = {name: pat for name, pat, _ in text_ops.PII_PATTERNS}
    _PII_REPL = {name: rep for name, _, rep in text_ops.PII_PATTERNS}
    sql["pii_redact"] = f"""
        WITH inj AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0
                        THEN ' from host 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                        ELSE '' END AS text
            FROM documents),
        red AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{_PII["ip"]}')) AS INTEGER) AS n_ips,
                   CAST(len(regexp_extract_all(text, '{_PII["phone"]}')) AS INTEGER) AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII["email"]}', '{_PII_REPL["email"]}', 'g'),
                       '{_PII["ip"]}', '{_PII_REPL["ip"]}', 'g'),
                       '{_PII["phone"]}', '{_PII_REPL["phone"]}', 'g') AS redacted
            FROM inj)
        SELECT doc_id, n_emails, n_ips, n_phones,
               CAST(n_emails + n_ips + n_phones AS INTEGER) AS n_redactions,
               redacted,
               CAST(length(redacted) AS INTEGER) AS redacted_len
        FROM red
        ORDER BY doc_id
    """

    sql["corpus_stats"] = f"""
        WITH rows_t AS (
            SELECT source, lang,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_t,
                   md5(text) AS fp
            FROM documents),
        a AS (SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
                     count(DISTINCT fp) AS n_distinct_texts,
                     CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                     CAST(sum(n_chars_t) AS BIGINT) AS total_chars
              FROM rows_t GROUP BY source),
        c AS (SELECT CAST(sum(total_tokens) AS BIGINT) AS corpus_tokens FROM a)
        SELECT source, n_docs, n_langs, n_distinct_texts, total_tokens, total_chars,
               round(CAST(total_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE), 9)
                   AS token_share,
               round(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
                   AS mean_doc_chars
        FROM a CROSS JOIN c
        ORDER BY source
    """

    # window/stride literals mirror _q_chunk_documents; DuckDB range()
    # excludes the stop like the Spark sequence(0, n-1, stride) bound,
    # and list_slice clamps to the list end like Spark slice
    sql["chunk_documents"] = f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (
            SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) > 0),
        c AS (
            SELECT doc_id, unnest(range(0, n_tok, 24)) AS start, toks FROM s),
        sl AS (
            SELECT doc_id,
                   CAST(start // 24 AS INTEGER) AS chunk_id,
                   CAST(start AS BIGINT) AS start,
                   list_slice(toks, start + 1, start + 32) AS chunk_toks
            FROM c)
        SELECT doc_id, chunk_id, start,
               CAST(len(chunk_toks) AS BIGINT) AS chunk_tokens,
               array_to_string(chunk_toks, ' ') AS chunk_text
        FROM sl ORDER BY doc_id, chunk_id
    """

    sql["clean_text"] = r"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   text,
                   'https?://[^\s]+', ' ', 'g'),
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                   '\s+', ' ', 'g')) AS clean,
               CAST(length(text) AS INTEGER) AS raw_len
        FROM documents
        ORDER BY doc_id
    """
    sql["clean_text"] = (
        "WITH c AS (" + sql["clean_text"].replace("ORDER BY doc_id", "") + ") "
        "SELECT doc_id, clean, raw_len, CAST(length(clean) AS INTEGER) AS clean_len "
        "FROM c ORDER BY doc_id"
    )

    sql["repetition_score"] = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM toks WHERE len(t) >= 2),
        per_bg AS (
            SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg)
        SELECT doc_id,
               CAST(max(n) AS INTEGER) AS max_bigram,
               CAST(sum(n) AS INTEGER) AS n_bigrams,
               CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS rep_ratio
        FROM per_bg GROUP BY doc_id ORDER BY doc_id
    """

    sql["vocab_topk"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        SELECT term, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS doc_freq
        FROM toks GROUP BY term
        ORDER BY n_occurrences DESC, term ASC
        LIMIT 50
    """

    # bigram head (n=2 in _q_ngram_counts); toks[i] is 1-based and
    # range(1, len) stops at len-1, so i+1 never overruns
    sql["ngram_counts"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        p AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
              FROM t WHERE len(toks) >= 2),
        g AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram FROM p)
        SELECT gram, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS doc_freq
        FROM g GROUP BY gram
        ORDER BY n_occurrences DESC, gram ASC
        LIMIT 50
    """

    sql["quality_quantile_filter"] = f"""
        WITH base AS (
            SELECT doc_id, source, length(text) AS n_chars_m,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_unique,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_all_stop}))) AS INTEGER) AS n_stopwords,
                   CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS INTEGER) AS n_punct
            FROM documents),
        r AS (
            SELECT doc_id, source, n_tokens,
                   CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
                   CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
                   CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE) AS punct_ratio
            FROM base WHERE n_tokens > 0),
        s AS (
            SELECT doc_id, source,
                   uniq_ratio * 50.0 + stop_ratio * 30.0 + (1.0 - punct_ratio) * 10.0
                   + CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 10.0 ELSE 0.0 END AS quality
            FROM r),
        m AS (
            SELECT doc_id, source, quality,
                   quantile_cont(quality, 0.5) OVER (PARTITION BY source) AS src_median
            FROM s)
        SELECT doc_id, source, quality, src_median
        FROM m WHERE quality >= src_median
        ORDER BY doc_id
    """

    sql["lang_id"] = f"""
        WITH s AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('en')}))) AS INTEGER) AS score_en,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('de')}))) AS INTEGER) AS score_de,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('es')}))) AS INTEGER) AS score_es,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('fr')}))) AS INTEGER) AS score_fr
            FROM documents),
        g AS (SELECT *, greatest(score_de, score_en, score_es, score_fr) AS best FROM s)
        SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
               CASE WHEN best = 0 THEN 'unknown'
                    WHEN score_de = best THEN 'de'
                    WHEN score_en = best THEN 'en'
                    WHEN score_es = best THEN 'es'
                    WHEN score_fr = best THEN 'fr' END AS lang_guess
        FROM g ORDER BY doc_id
    """

    sql["fingerprint"] = r"""
        WITH n AS (
            SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
            FROM documents)
        SELECT doc_id, md5(norm) AS md5_fp,
               list_reduce(
                   list_transform(list_filter(string_split(norm, ''), c -> c <> ''),
                                  c -> CAST(ascii(c) AS BIGINT)),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp
        FROM n ORDER BY doc_id
    """

    sql["exact_dedup"] = r"""
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_fp,
               min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keeper_doc_id
    """

    sql["dup_cluster_sizes"] = r"""
        WITH c AS (
            SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
                   count(*) AS cluster_size
            FROM documents GROUP BY 1)
        SELECT cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(cluster_size) AS BIGINT) AS n_docs,
               CAST(sum(cluster_size - 1) AS BIGINT) AS n_wasted_copies
        FROM c GROUP BY 1 ORDER BY 1
    """

    # A-ES weighted sample: identical key expression (pipeline._AES_KEY_SQL)
    # over the DuckDB md5 twin form
    _h32 = "CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)"
    sql["weighted_sample"] = f"""
        SELECT doc_id, source, n_chars,
               {pipeline._AES_KEY_SQL.format(h=_h32)} AS sample_key
        FROM documents
        ORDER BY sample_key DESC, doc_id LIMIT 100
    """

    # token-pair PMI in a ±2 window: position self-join replays Spark's
    # zip_with pair generation; counts exact, casts-then-multiply and a
    # single ln round(9), identical evaluation order
    sql["pmi_pairs"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        tokp AS (
            SELECT doc_id, CAST(pos AS INTEGER) AS pos, t[pos + 1] AS term
            FROM (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM d)),
        tc AS (SELECT term, count(*) AS c FROM tokp GROUP BY 1),
        nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM tc),
        pr AS (
            SELECT CASE WHEN a.term <= b.term THEN a.term || ' ' || b.term
                        ELSE b.term || ' ' || a.term END AS pair
            FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id
                 AND b.pos > a.pos AND b.pos <= a.pos + 2),
        pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_pair FROM pr GROUP BY 1),
        np AS (SELECT CAST(sum(c_pair) AS BIGINT) AS n_pair FROM pc)
        SELECT pair, c_pair,
               ca.c AS c_a, cb.c AS c_b,
               round(ln((CAST(c_pair AS DOUBLE) * CAST(n_tok AS DOUBLE)
                         * CAST(n_tok AS DOUBLE)) / (CAST(n_pair AS DOUBLE)
                         * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 9) AS pmi
        FROM pc
        JOIN tc ca ON ca.term = split_part(pc.pair, ' ', 1)
        JOIN tc cb ON cb.term = split_part(pc.pair, ' ', 2)
        CROSS JOIN nt CROSS JOIN np
        WHERE c_pair >= 5
        ORDER BY pmi DESC, pair LIMIT 50
    """

    # mirrors dedup._kept_inverted: stop shingles (df > max(2,
    # floor(0.5 * block_size))) are dropped from intersections AND set
    # sizes before the co-occurrence join, exactly as in Spark.
    sql["ngram_jaccard_pairs"] = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT doc_id, source,
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM t WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        blk AS (SELECT source, count(*) AS n_docs FROM sh GROUP BY source),
        dfc AS (SELECT source, s, count(*) AS df FROM ex GROUP BY source, s),
        kept AS (
            SELECT ex.doc_id, ex.source, ex.s
            FROM ex
            JOIN dfc ON ex.source = dfc.source AND ex.s = dfc.s
            JOIN blk ON ex.source = blk.source
            WHERE dfc.df <= greatest(2, CAST(floor(0.5 * blk.n_docs) AS BIGINT))),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
        co AS (
            SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM kept a JOIN kept b
              ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3)
        SELECT co.source, doc_a, doc_b,
               CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM co
        JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.05
        ORDER BY doc_a, doc_b
    """

    # connected-components closure over the SAME pair evidence the
    # Spark query feeds keeper_list (ngram_jaccard_pairs at threshold
    # 0.5): min-label propagation is order-independent, so DuckDB's
    # recursive reachability closure (node → min reachable id) computes
    # the identical cluster labels Spark reaches by iterative
    # join+min-aggregate. Dup components are tiny (stars/short chains),
    # so the quadratic per-component reach relation is bounded.
    _KEEPER_PAIRS_CTE = f"""
        t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT doc_id, source,
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM t WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        blk AS (SELECT source, count(*) AS n_docs FROM sh GROUP BY source),
        dfc AS (SELECT source, s, count(*) AS df FROM ex GROUP BY source, s),
        kept AS (
            SELECT ex.doc_id, ex.source, ex.s
            FROM ex
            JOIN dfc ON ex.source = dfc.source AND ex.s = dfc.s
            JOIN blk ON ex.source = blk.source
            WHERE dfc.df <= greatest(2, CAST(floor(0.5 * blk.n_docs) AS BIGINT))),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
        co AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM kept a JOIN kept b
              ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        pr AS (
            SELECT doc_a, doc_b
            FROM co
            JOIN sizes sa ON co.doc_a = sa.doc_id
            JOIN sizes sb ON co.doc_b = sb.doc_id
            WHERE CAST(n_inter AS DOUBLE)
                  / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
        und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                UNION ALL
                SELECT doc_b, doc_a FROM pr),
        reach(node, r) AS (
            SELECT a, b FROM und
            UNION
            SELECT w.node, u.b FROM reach w JOIN und u ON w.r = u.a),
        labels AS (
            SELECT node, least(node, min(r)) AS cluster_id
            FROM reach GROUP BY node)"""

    sql["dedup_keepers"] = f"""
        WITH RECURSIVE {_KEEPER_PAIRS_CTE}
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS keeper_doc_id,
               d.doc_id = COALESCE(l.cluster_id, d.doc_id) AS is_keeper
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
        ORDER BY d.doc_id
    """

    # quality-aware keeper: highest quality_score wins the cluster,
    # ties (and docs the scorer skipped, which Spark coalesces to -inf)
    # fall back to min doc_id — row_number with NULLS LAST is the exact
    # SQL twin of Spark's max_by(doc_id, struct(score, -doc_id)).
    sql["dedup_keepers_best"] = f"""
        WITH RECURSIVE {_KEEPER_PAIRS_CTE},
        membered AS (
            SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.node),
        qbase AS (
            SELECT doc_id, length(text) AS n_chars_m,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_unique,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_all_stop}))) AS INTEGER) AS n_stopwords,
                   CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS INTEGER) AS n_punct
            FROM documents),
        q AS (
            SELECT doc_id,
                   (CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 50.0
                   + (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 30.0
                   + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)) * 10.0
                   + CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 10.0 ELSE 0.0 END AS quality
            FROM qbase WHERE n_tokens > 0),
        ranked AS (
            SELECT m.doc_id, m.cluster_id,
                   row_number() OVER (PARTITION BY m.cluster_id
                                      ORDER BY q.quality DESC NULLS LAST,
                                               m.doc_id ASC) AS rn
            FROM membered m LEFT JOIN q ON m.doc_id = q.doc_id),
        keepers AS (
            SELECT cluster_id, doc_id AS keeper_doc_id FROM ranked WHERE rn = 1)
        SELECT m.doc_id, k.keeper_doc_id,
               m.doc_id = k.keeper_doc_id AS is_keeper
        FROM membered m JOIN keepers k USING (cluster_id)
        ORDER BY m.doc_id
    """

    sql["knn_bruteforce"] = """
        WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        q AS (SELECT vec_id AS q_id, vec AS q_vec FROM emb WHERE vec_id < 20),
        s AS (
            SELECT q.q_id, e.vec_id, e.label,
                   round(list_dot_product(q.q_vec, e.vec)
                         / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                            * sqrt(list_dot_product(e.vec, e.vec))), 9) AS cos_sim
            FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        SELECT q_id,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rn,
               vec_id, label, cos_sim
        FROM s
        QUALIFY rn <= 5
        ORDER BY q_id, rn
    """

    # LSH-banded near-dup twin: the SAME deterministic ±1 hyperplanes as
    # similarity.embedding_near_dup_pairs (generated from one source of
    # truth), so Spark and DuckDB compute identical candidate sets and
    # the check is hash-exact despite the approximate candidate step.
    _nb, _nbits = similarity.NEAR_DUP_BANDS, similarity.NEAR_DUP_BITS
    _planes = similarity.rademacher_planes(_nb * _nbits)

    def _plane_lit(p: list[float]) -> str:
        return "[" + ", ".join("1.0" if v > 0 else "-1.0" for v in p) + "]"

    _band_defs = []
    for _j in range(_nb):
        _terms = " + ".join(
            f"(CASE WHEN list_dot_product(vec, {_plane_lit(_planes[_j * _nbits + _i]) }) >= 0"
            f" THEN {1 << _i} ELSE 0 END)"
            for _i in range(_nbits)
        )
        _band_defs.append(f"({_terms}) AS b{_j}")
    _banded_union = " UNION ALL ".join(
        f"SELECT vec_id, label, {_j} AS band_id, b{_j} AS band_val FROM sig"
        for _j in range(_nb)
    )
    sql["embedding_near_dups"] = f"""
        WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        sig AS (SELECT vec_id, label, vec, {", ".join(_band_defs)} FROM emb),
        banded AS ({_banded_union}),
        cand AS (
            SELECT DISTINCT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM banded a
            JOIN banded b ON a.label = b.label AND a.band_id = b.band_id
                         AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
        SELECT c.label, c.vec_a, c.vec_b,
               round(list_dot_product(x.vec, y.vec)
                     / (sqrt(list_dot_product(x.vec, x.vec))
                        * sqrt(list_dot_product(y.vec, y.vec))), 9) AS cos_sim
        FROM cand c
        JOIN emb x ON c.vec_a = x.vec_id
        JOIN emb y ON c.vec_b = y.vec_id
        WHERE round(list_dot_product(x.vec, y.vec)
                    / (sqrt(list_dot_product(x.vec, x.vec))
                       * sqrt(list_dot_product(y.vec, y.vec))), 9) >= 0.3
        ORDER BY vec_a, vec_b
    """

    # K-means twin: the operator is iterative but EXACT (integer-
    # quantized vectors, integer distances, grid-rounded centroids —
    # operators/clustering.py), so the oracle simply unrolls the same
    # two Lloyd iterations as CTEs. dist via the dot-product identity:
    # every term ≤ ~2^46, integral, exact in DuckDB's double
    # list_dot_product; `//` truncates toward zero exactly like
    # Spark's `div` and clustering._tdiv.
    # One Lloyd iteration in clustering.kmeans_fit = assign (a{i}) +
    # centroid update (c{i}f); the final query assigns once more under
    # the last centroids. The chain below unrolls exactly _KM_ITERS
    # update rounds then a final assignment `af` — same structure,
    # generated so the iteration count can't silently drift from the
    # Spark default.
    _KM_ITERS, _KM_K = 2, 8

    def _km_assign(i: int, cents: str) -> str:
        return f"""
        d{i} AS (SELECT q.vec_id, q.qvec, c.cid,
                 CAST(list_dot_product(q.qvec, q.qvec)
                      - 2 * list_dot_product(q.qvec, c.cvec)
                      + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS dist
               FROM q CROSS JOIN {cents} c),
        a{i} AS (SELECT vec_id, qvec, cid, dist FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY dist, cid) AS rn FROM d{i})
               WHERE rn = 1)"""

    _km_parts = [
        f"""
        q AS (SELECT vec_id, label,
                list_transform(embedding,
                               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qvec
              FROM embeddings
              WHERE embedding IS NOT NULL
                AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        c0f AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qvec AS cvec
               FROM (SELECT vec_id, qvec FROM q ORDER BY vec_id LIMIT {_KM_K}))"""
    ]
    for _i in range(1, _KM_ITERS + 1):
        _km_parts.append(_km_assign(_i, f"c{_i - 1}f"))
        _km_parts.append(
            f"""
        s{_i} AS (SELECT cid, pos, SUM(v) AS s, COUNT(*) AS n
               FROM (SELECT cid, unnest(qvec) AS v,
                            generate_subscripts(qvec, 1) AS pos FROM a{_i})
               GROUP BY cid, pos),
        c{_i} AS (SELECT cid, list(CAST((2*s + n) // (2*n) AS BIGINT) ORDER BY pos) AS cvec
               FROM s{_i} GROUP BY cid),
        c{_i}f AS (SELECT cid, cvec FROM c{_i}
                UNION ALL
                SELECT cid, cvec FROM c{_i - 1}f
                WHERE cid NOT IN (SELECT cid FROM c{_i}))"""
        )
    _km_parts.append(_km_assign(_KM_ITERS + 1, f"c{_KM_ITERS}f"))
    _km_chain = (
        ",".join(_km_parts)
        + f",\n        af AS (SELECT vec_id, qvec, cid, dist FROM a{_KM_ITERS + 1})"
    )

    sql["kmeans_clusters"] = f"""
        WITH {_km_chain}
        SELECT af.vec_id, q.label, CAST(af.cid AS INTEGER) AS cluster_id,
               af.dist AS dist_sq
        FROM af JOIN q USING (vec_id)
        ORDER BY vec_id
    """

    sql["semantic_dedup"] = f"""
        WITH {_km_chain}
        SELECT CAST(x.cid AS INTEGER) AS cluster_id,
               x.vec_id AS a_id, y.vec_id AS b_id,
               round(list_dot_product(x.qvec, y.qvec)
                     / (sqrt(list_dot_product(x.qvec, x.qvec))
                        * sqrt(list_dot_product(y.qvec, y.qvec))), 9) AS cos_sim
        FROM af x JOIN af y ON x.cid = y.cid AND x.vec_id < y.vec_id
        WHERE round(list_dot_product(x.qvec, y.qvec)
                    / (sqrt(list_dot_product(x.qvec, x.qvec))
                       * sqrt(list_dot_product(y.qvec, y.qvec))), 9) >= 0.3
        ORDER BY a_id, b_id
    """

    sql["feature_hash_embed"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        tf AS (SELECT doc_id,
                      CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 32 AS INTEGER) AS bucket,
                      count(*) AS tf
               FROM tok GROUP BY doc_id, bucket),
        nrm AS (SELECT doc_id, SUM(tf * tf) AS norm_sq FROM tf GROUP BY doc_id)
        SELECT tf.doc_id, tf.bucket, tf.tf,
               CAST(tf.tf AS DOUBLE) / sqrt(CAST(nrm.norm_sq AS DOUBLE)) AS weight
        FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id
        ORDER BY tf.doc_id, tf.bucket
    """

    sql["doc_novelty"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                     for i in range(1, len(toks) - 1)]) AS shingles
               FROM t WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        dfc AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
        per AS (SELECT ex.doc_id, count(*) AS n_shingles,
                       CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
                FROM ex JOIN dfc ON ex.s = dfc.s
                GROUP BY ex.doc_id)
        SELECT doc_id, n_shingles, n_unique,
               CAST(n_unique AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS novelty
        FROM per
        ORDER BY doc_id
    """

    sql["bpe_pair_stats"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        w AS (SELECT unnest(toks) AS tok FROM t),
        idx AS (SELECT tok, unnest(range(1, length(tok))) AS i
                FROM w WHERE length(tok) >= 2),
        p AS (SELECT substr(tok, CAST(i AS INTEGER), 2) AS pair FROM idx)
        SELECT pair, count(*) AS n
        FROM p GROUP BY pair
        ORDER BY n DESC, pair ASC
        LIMIT 50
    """

    sql["embedding_prototypicality"] = f"""
        WITH {_km_chain},
        thr AS (SELECT cid, quantile_disc(dist, 0.9) AS dist_p_tail
                FROM af GROUP BY cid)
        SELECT af.vec_id, q.label, CAST(af.cid AS INTEGER) AS cluster_id,
               af.dist AS dist_sq, t.dist_p_tail,
               af.dist > t.dist_p_tail AS is_peripheral
        FROM af JOIN q USING (vec_id) JOIN thr t ON af.cid = t.cid
        ORDER BY vec_id
    """

    # IVF-ANN twin: decimal-exact per-label centroids (the
    # label_centroid_similarity rule), round-9 probe ranking with
    # label tiebreak, candidates only from the nprobe nearest lists,
    # round-9 scoring with vec_id tiebreak — deterministic end to end.
    sql["ivf_knn"] = """
        WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        comp AS (
            SELECT label, CAST(pos AS INTEGER) AS pos, vec[pos + 1] AS x
            FROM (SELECT label, unnest(range(0, len(vec))) AS pos, vec FROM emb)),
        centc AS (
            SELECT label, pos,
                   CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
            FROM comp GROUP BY 1, 2),
        cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM centc GROUP BY label),
        q AS (SELECT vec_id AS q_id, vec AS q_vec FROM emb WHERE vec_id < 20),
        qc AS (
            SELECT q.q_id, q.q_vec, c.label,
                   round(list_dot_product(q.q_vec, c.centroid)
                         / (sqrt(list_dot_product(q.q_vec, q.q_vec))
                            * sqrt(list_dot_product(c.centroid, c.centroid))), 9) AS c_sim
            FROM q CROSS JOIN cent c),
        probes AS (
            SELECT q_id, q_vec, label FROM
              (SELECT *, row_number() OVER (PARTITION BY q_id
                                            ORDER BY c_sim DESC, label ASC) AS pr FROM qc)
            WHERE pr <= 3),
        scored AS (
            SELECT p.q_id, e.vec_id, e.label,
                   round(list_dot_product(p.q_vec, e.vec)
                         / (sqrt(list_dot_product(p.q_vec, p.q_vec))
                            * sqrt(list_dot_product(e.vec, e.vec))), 9) AS cos_sim
            FROM emb e JOIN probes p ON e.label = p.label
            WHERE e.vec_id <> p.q_id)
        SELECT q_id,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rn,
               vec_id, label, cos_sim
        FROM scored
        QUALIFY rn <= 5
        ORDER BY q_id, rn
    """

    # LSH-ANN twin: the SAME seeded Gaussian planes as similarity.knn_lsh
    # (one source of truth, literal-embedded — repr round-trips the exact
    # double), so band signatures agree bit for bit and the candidate
    # sets are identical; scoring is the shared round-9 cosine.
    _lsh_planes = similarity._hyperplanes(12, 64)
    _lsh_bits = 12 // 3

    def _gauss_lit(p: list[float]) -> str:
        return "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"

    _lsh_band_defs = []
    for _j in range(3):
        _terms = " + ".join(
            f"(CASE WHEN list_dot_product(vec, {_gauss_lit(_lsh_planes[_j * _lsh_bits + _i])}) >= 0"
            f" THEN {1 << _i} ELSE 0 END)"
            for _i in range(_lsh_bits)
        )
        _lsh_band_defs.append(f"({_terms}) AS b{_j}")
    _lsh_banded_union = " UNION ALL ".join(
        f"SELECT vec_id, label, vec, {_j} AS band_id, b{_j} AS band_sig FROM sig"
        for _j in range(3)
    )
    sql["knn_lsh"] = f"""
        WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        sig AS (SELECT vec_id, label, vec, {", ".join(_lsh_band_defs)} FROM emb),
        banded AS ({_lsh_banded_union}),
        q AS (SELECT vec_id AS q_id, vec AS q_vec, band_id, band_sig
              FROM banded WHERE vec_id < 20),
        cand AS (
            SELECT DISTINCT q.q_id, b.vec_id
            FROM banded b
            JOIN q ON b.band_id = q.band_id AND b.band_sig = q.band_sig
                  AND b.vec_id <> q.q_id),
        scored AS (
            SELECT c.q_id, c.vec_id, e.label,
                   round(list_dot_product(x.vec, e.vec)
                         / (sqrt(list_dot_product(x.vec, x.vec))
                            * sqrt(list_dot_product(e.vec, e.vec))), 9) AS cos_sim
            FROM cand c
            JOIN emb x ON c.q_id = x.vec_id
            JOIN emb e ON c.vec_id = e.vec_id)
        SELECT q_id,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rn,
               vec_id, label, cos_sim
        FROM scored
        QUALIFY rn <= 5
        ORDER BY q_id, rn
    """

    sql["multimodal_meta"] = """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS payload_bytes,
               CAST(length(text) % 640 AS INTEGER) AS fake_width,
               CAST((length(text) * 7) % 480 AS INTEGER) AS fake_height,
               list_reduce(
                   list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                                  c -> CAST(ascii(c) AS BIGINT)),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
        FROM documents ORDER BY doc_id
    """

    sql["upsert_merge"] = """
        WITH upd AS (
            SELECT event_id, ts, user_id, 'updated' AS event_type,
                   value + 1000.0 AS value, props
            FROM events WHERE event_id % 100 = 0),
        merged AS (
            SELECT * FROM events WHERE event_id NOT IN (SELECT event_id FROM upd)
            UNION ALL SELECT * FROM upd)
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM merged GROUP BY event_type ORDER BY event_type
    """

    sql["delete_where"] = """
        SELECT event_type, count(*) AS n FROM events
        WHERE NOT COALESCE(event_type = 'error', FALSE)
        GROUP BY event_type ORDER BY event_type
    """

    sql["update_where"] = """
        WITH u AS (
            SELECT event_type, CASE WHEN value < 5.0 THEN 0.0 ELSE value END AS value
            FROM events)
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM u GROUP BY event_type ORDER BY event_type
    """

    sql["streaming_rollup_5min"] = sql["downsample_5min"]

    # hopping windows: bucket b covers starts (b-1)*300 and b*300
    # (width 600 = 2 slides, epoch-aligned like Spark's F.window)
    sql["sliding_rollup"] = """
        -- ts IS NOT NULL mirrors Spark's F.window, which injects an
        -- implicit not-null filter on the time column; without it the
        -- hop expansion would emit a NULL window_s group (twice)
        WITH x AS (SELECT (epoch_us(ts) // 300000000) AS b, event_id, value
                   FROM events WHERE ts IS NOT NULL)
        SELECT (b - j) * 300 AS window_s,
               count(*) AS n_points,
               arg_max(value, event_id) AS last_value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM x, (SELECT unnest(range(0, 2)) AS j)
        GROUP BY 1 ORDER BY 1
    """
    # the streaming twin runs the identical window expression; one
    # shared oracle pins stream == batch == SQL
    sql["streaming_sliding_rollup"] = sql["sliding_rollup"]

    # session paths: identical sessionizer (lag gap flags + running
    # sum), then an ordered string_agg per session — Spark's sorted
    # struct collect with the same (us, event_id) tiebreak
    sql["top_session_paths"] = """
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
                   FROM events),
        f AS (SELECT user_id, event_id, us, event_type,
                     CASE WHEN us - lag(us) OVER w IS NULL
                            OR us - lag(us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS is_start
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        s AS (SELECT user_id, event_id, us, event_type,
                     sum(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS session_no
              FROM f),
        p AS (SELECT user_id, session_no,
                     string_agg(event_type, '>' ORDER BY us, event_id) AS path,
                     count(*) AS path_len
              FROM s GROUP BY 1, 2)
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(max(path_len) AS BIGINT) AS path_len
        FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 25
    """
    # the streaming session-path twin runs the identical sessionizer
    # semantics (session_window == batch gap logic, pinned by
    # test_streaming); one shared oracle
    sql["streaming_session_paths"] = sql["top_session_paths"]

    # FK audit: NOT EXISTS per edge (matches left-anti NULL semantics —
    # a NULL child key never matches a parent and counts as an orphan)
    sql["fk_integrity_audit"] = """
        SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
               (SELECT count(*) FROM lineitem) AS n_rows,
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
               (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0 AS ok
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders r WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey)),
               (SELECT count(*) FROM orders r WHERE NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey)) = 0
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
               (SELECT count(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) = 0
        UNION ALL
        SELECT 'nation.n_regionkey->region',
               (SELECT count(*) FROM nation),
               (SELECT count(*) FROM nation n WHERE NOT EXISTS
                   (SELECT 1 FROM region g WHERE g.r_regionkey = n.n_regionkey)),
               (SELECT count(*) FROM nation n WHERE NOT EXISTS
                   (SELECT 1 FROM region g WHERE g.r_regionkey = n.n_regionkey)) = 0
        ORDER BY fk_edge
    """

    # throttled alerts: the streaming min(struct) winner equals the
    # batch row_number-=-1 pick because (us, event_id) is unique
    sql["streaming_throttled_alerts"] = """
        WITH a AS (SELECT user_id, epoch_us(ts) AS us, event_id, value,
                          (epoch_us(ts) // 600000000) * 600 AS bucket_s
                   FROM events WHERE value > 99.0),
        r AS (SELECT *,
                     row_number() OVER (PARTITION BY user_id, bucket_s
                                        ORDER BY us, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id, bucket_s) AS n_alerts
              FROM a)
        SELECT user_id, bucket_s, us AS alert_us, event_id AS alert_id,
               value AS alert_value, CAST(n_alerts - 1 AS BIGINT) AS n_suppressed
        FROM r WHERE rn = 1 ORDER BY user_id, bucket_s
    """

    # one-job multi-granularity rollup: 5-min partial agg, then
    # GROUPING SETS over the partials (b5 determines b1h/b1d)
    sql["multi_grain_rollup"] = """
        WITH base AS (
            SELECT (epoch_us(ts) // 300000000) * 300 AS b5,
                   (epoch_us(ts) // 3600000000) * 3600 AS b1h,
                   (epoch_us(ts) // 86400000000) * 86400 AS b1d,
                   CAST(value AS DECIMAL(18,2)) AS v
            FROM events),
        pre AS (SELECT b5, b1h, b1d, count(*) AS n, sum(v) AS s
                FROM base GROUP BY 1, 2, 3),
        g AS (SELECT b5, b1h, b1d,
                     CAST(sum(n) AS BIGINT) AS n_points,
                     CAST(sum(s) AS DOUBLE) AS sum_value
              FROM pre GROUP BY GROUPING SETS ((b5), (b1h), (b1d)))
        SELECT CASE WHEN b5 IS NOT NULL THEN '5min'
                    WHEN b1h IS NOT NULL THEN '1h' ELSE '1d' END AS grain,
               COALESCE(b5, b1h, b1d) AS bucket_s, n_points, sum_value
        FROM g ORDER BY grain, bucket_s
    """

    # engagement entropy: 9-dp-rounded ln accumulated in decimal
    # (the unigram_logprob determinism pattern), one double division
    sql["user_entropy"] = """
        WITH c AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2),
        u AS (SELECT user_id,
                     CAST(sum(c) AS BIGINT) AS n_events,
                     sum(CAST(c AS DECIMAL(12,0))
                         * CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(16,9))) AS s,
                     CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
              FROM c GROUP BY 1)
        SELECT user_id, n_events, n_types,
               round(round(ln(CAST(n_events AS DOUBLE)), 9)
                     - CAST(s AS DOUBLE) / CAST(n_events AS DOUBLE), 9) AS entropy
        FROM u ORDER BY user_id
    """

    # SCD2 temporal enrichment: version table derived identically
    # (midpoint split, tier upgrade), equi-join + validity-range filter
    sql["scd2_enrich"] = """
        WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
                   FROM events),
        base AS (SELECT c_custkey AS user_id, c_mktsegment AS segment,
                        CASE WHEN c_acctbal >= 5000.0 THEN 'gold'
                             WHEN c_acctbal >= 0.0 THEN 'standard'
                             ELSE 'delinquent' END AS tier_v1
                 FROM customer),
        dim AS (
            SELECT user_id, segment, tier_v1 AS tier, 1 AS version,
                   CAST(-4611686018427387904 AS BIGINT) AS valid_from_us,
                   mid_us AS valid_to_us
            FROM base, b
            UNION ALL
            SELECT user_id, segment,
                   CASE WHEN tier_v1 = 'delinquent' THEN 'standard'
                        ELSE 'gold' END,
                   2, mid_us, CAST(4611686018427387904 AS BIGINT)
            FROM base, b)
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS us, e.value,
               d.segment, d.tier, d.version
        FROM events e JOIN dim d ON e.user_id = d.user_id
             AND epoch_us(e.ts) >= d.valid_from_us
             AND epoch_us(e.ts) < d.valid_to_us
        ORDER BY e.event_id
    """

    # cross-type correlation from exact sufficient statistics; the
    # final expression is the shared module constant
    sql["type_correlation"] = f"""
        WITH m AS (
            SELECT epoch_us(ts) // 3600000000 AS b, event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
            FROM events GROUP BY 1, 2),
        p AS (SELECT a.b, a.event_type AS type_a, b2.event_type AS type_b,
                     a.m AS ma, b2.m AS mb
              FROM m a JOIN m b2 ON a.b = b2.b AND a.event_type < b2.event_type),
        s AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
                     sum(CAST(ma AS DECIMAL(28,10))) AS sa,
                     sum(CAST(mb AS DECIMAL(28,10))) AS sb,
                     sum(CAST(ma * mb AS DECIMAL(38,10))) AS sab,
                     sum(CAST(ma * ma AS DECIMAL(38,10))) AS saa,
                     sum(CAST(mb * mb AS DECIMAL(38,10))) AS sbb
              FROM p GROUP BY 1, 2)
        SELECT type_a, type_b, n, {analytics.CORR_FINAL_SQL} AS pearson_r
        FROM s ORDER BY 1, 2
    """

    # exact moment suite: the SQL fragments are shared module constants
    # evaluated verbatim by both engines (decimal power sums, pinned
    # double combine order)
    _msums = ", ".join(
        f"{expr} AS {name}" for name, expr in analytics.MOMENT_SUMS_SQL.items()
    )
    _mfin = ", ".join(
        f"{expr} AS {name}" for name, expr in analytics.MOMENT_FINAL_SQL.items()
    )
    sql["moment_stats"] = f"""
        WITH sums AS (
            SELECT event_type, {_msums}
            FROM events GROUP BY event_type)
        SELECT event_type, n, {_mfin}
        FROM sums ORDER BY event_type
    """

    # DAU / trailing-WAU: distinct user-days fan out to the 7 window
    # ends they are visible in, exact countDistinct per end day
    sql["active_users_rolling"] = """
        WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                    FROM events),
        e AS (SELECT user_id, day + j AS end_day
              FROM ud, (SELECT unnest(range(0, 7)) AS j)),
        wau AS (SELECT end_day, count(DISTINCT user_id) AS wau FROM e GROUP BY 1),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
        SELECT day, dau, wau,
               round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 9) AS stickiness
        FROM dau JOIN wau ON day = end_day ORDER BY day
    """

    # cumulative-deviation drift vs the per-type MEDIAN: the deviation
    # is exact decimal end to end (no division, no rounding — a
    # mean-based variant was hash-unstable at round() half-boundaries)
    sql["drift_cusum"] = """
        WITH stats AS (
            SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events GROUP BY 1),
        c AS (
            SELECT event_id, event_type, value,
                   SUM(CAST(value AS DECIMAL(18,2))) OVER w AS cum_sum,
                   COUNT(*) OVER w AS n_seen
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT c.event_id, c.event_type, c.value, s.med,
               CAST(cum_sum - n_seen * CAST(s.med AS DECIMAL(18,2)) AS DOUBLE)
                   AS cum_dev,
               abs(cum_sum - n_seen * CAST(s.med AS DECIMAL(18,2)))
                   > CAST(500.0 AS DECIMAL(18,2)) AS is_drift
        FROM c JOIN stats s USING (event_type) ORDER BY event_id
    """

    # per-label centroid cosine map: decimal-exact centroid components
    # (double summation order varies; decimal does not), double cosine
    # rounded at the edge
    sql["label_centroid_similarity"] = """
        WITH comp AS (
            SELECT label, CAST(pos AS INTEGER) AS pos,
                   embedding[pos + 1] AS x
            FROM (SELECT label, unnest(range(0, len(embedding))) AS pos, embedding
                  FROM embeddings)),
        cent AS (
            SELECT label, pos,
                   CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
            FROM comp GROUP BY 1, 2),
        cvec AS (
            -- ordered centroid LIST + list_dot_product: pins the
            -- double summation order to the same left-to-right fold
            -- as every other cosine twin (an unordered SUM over the
            -- join output would be engine-order-dependent)
            SELECT label, list(m ORDER BY pos) AS centroid
            FROM cent GROUP BY label)
        SELECT a.label AS label_a, b.label AS label_b,
               round(list_dot_product(a.centroid, b.centroid)
                     / (sqrt(list_dot_product(a.centroid, a.centroid))
                        * sqrt(list_dot_product(b.centroid, b.centroid))), 9)
                   AS cos_sim
        FROM cvec a JOIN cvec b ON a.label < b.label
        ORDER BY 1, 2
    """

    # equi-depth histogram: percentile_disc boundaries (same WITHIN
    # GROUP form as the Spark expression), upper-inclusive bucket id =
    # #boundaries <= value, evaluated as the same array scan
    sql["equidepth_histogram"] = """
        WITH bounds AS (SELECT list_value(
                 percentile_disc(0.125) WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.25)  WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.375) WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.5)   WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.625) WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.75)  WITHIN GROUP (ORDER BY value),
                 percentile_disc(0.875) WITHIN GROUP (ORDER BY value)) AS bnds
               FROM events)
        SELECT CAST(len(list_filter(bnds, b -> b <= value)) AS INT) AS bucket,
               count(*) AS n, min(value) AS min_value, max(value) AS max_value
        FROM events, bounds
        GROUP BY 1 ORDER BY 1
    """

    sql["sql_bucket_panel"] = """
        SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1 ORDER BY 1
    """

    sql["streaming_alerts"] = """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE value > 99.0 ORDER BY event_id
    """

    # the doubled replay deduped on event_id is exactly the original feed
    sql["streaming_dedup"] = """
        SELECT event_id, ts, user_id, event_type, value
        FROM events ORDER BY event_id
    """

    # session windows must equal the batch sessionizer, aggregated to
    # (user, session) grain — same CTE as `sessionize`, no session_no
    # (streaming windows carry no ordinal)
    sql["streaming_sessions"] = """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_no
            FROM flagged)
        SELECT user_id, min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
               count(*) AS n_events,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, start_us
    """

    # stream-stream interval join == the batch self-join (inner join in
    # append mode withholds nothing; µs literals match the Spark side)
    sql["streaming_join_alert_context"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value
                   FROM events)
        SELECT a.event_id AS alert_id, c.event_id AS ctx_id, a.user_id,
               a.us AS alert_us, c.us AS ctx_us,
               c.event_type AS ctx_type, a.value AS alert_value
        FROM e a JOIN e c ON a.user_id = c.user_id
             AND c.us >= a.us AND c.us <= a.us + 300000000
             AND a.event_id <> c.event_id
        WHERE a.value > 99.0
        ORDER BY alert_id, ctx_id
    """

    # left-outer stream-stream join: inner matches ∪ NULL rows for
    # unmatched alerts whose horizon expired against the FINAL global
    # watermark min(max alert ts, max ctx ts) − lateness (each
    # withWatermark node tracks its own max event time, so the sparse
    # alert side lags the feed). Unmatched alerts newer than that are
    # withheld by the streaming query and excluded here identically.
    sql["streaming_join_outer"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value
                   FROM events),
        a AS (SELECT event_id AS alert_id, user_id, us AS aus, value AS alert_value
              FROM e WHERE value > 99.0),
        m AS (SELECT a.alert_id, c.event_id AS ctx_id, a.user_id,
                     a.aus AS alert_us, c.us AS ctx_us,
                     c.event_type AS ctx_type, a.alert_value
              FROM a JOIN e c ON a.user_id = c.user_id
                   AND c.us >= a.aus AND c.us <= a.aus + 300000000
                   AND a.alert_id <> c.event_id),
        wm AS (SELECT LEAST((SELECT max(aus) FROM a),
                            (SELECT max(us) FROM e)) - 600000000 AS w)
        SELECT alert_id, ctx_id, user_id, alert_us, ctx_us, ctx_type, alert_value
        FROM m
        UNION ALL
        SELECT alert_id, NULL AS ctx_id, user_id, aus AS alert_us,
               NULL AS ctx_us, NULL AS ctx_type, alert_value
        FROM a
        WHERE alert_id NOT IN (SELECT alert_id FROM m)
          AND aus + 300000000 < (SELECT w FROM wm)
        ORDER BY alert_id, ctx_id
    """

    # FULL OUTER stream-stream join: the left-outer oracle plus expired
    # unmatched ctx rows. A ctx row can only be matched by alerts with
    # alert_ts ≤ ctx_ts, so it becomes decidable (and its NULL-alert row
    # emits) once the final watermark passes ctx_ts itself — no horizon
    # term on that side. Same watermark expression as streaming_join_outer.
    sql["streaming_join_full"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value
                   FROM events),
        a AS (SELECT event_id AS alert_id, user_id, us AS aus, value AS alert_value
              FROM e WHERE value > 99.0),
        m AS (SELECT a.alert_id, c.event_id AS ctx_id, a.user_id,
                     a.aus AS alert_us, c.us AS ctx_us,
                     c.event_type AS ctx_type, a.alert_value
              FROM a JOIN e c ON a.user_id = c.user_id
                   AND c.us >= a.aus AND c.us <= a.aus + 300000000
                   AND a.alert_id <> c.event_id),
        wm AS (SELECT LEAST((SELECT max(aus) FROM a),
                            (SELECT max(us) FROM e)) - 600000000 AS w)
        SELECT alert_id, ctx_id, user_id, alert_us, ctx_us, ctx_type, alert_value
        FROM m
        UNION ALL
        SELECT alert_id, NULL AS ctx_id, user_id, aus AS alert_us,
               NULL AS ctx_us, NULL AS ctx_type, alert_value
        FROM a
        WHERE alert_id NOT IN (SELECT alert_id FROM m)
          AND aus + 300000000 < (SELECT w FROM wm)
        UNION ALL
        SELECT NULL AS alert_id, c.event_id AS ctx_id, c.user_id,
               NULL AS alert_us, c.us AS ctx_us,
               c.event_type AS ctx_type, NULL AS alert_value
        FROM e c
        WHERE c.event_id NOT IN (SELECT ctx_id FROM m)
          AND c.us < (SELECT w FROM wm)
        ORDER BY alert_id, ctx_id
    """

    # the stateful tracker's final state must equal the batch aggregate
    sql["streaming_stateful_tracker"] = """
        SELECT user_id, count(*) AS n_events, max(value) AS max_value,
               max(event_id) AS last_event_id
        FROM events GROUP BY user_id ORDER BY user_id
    """

    # gap-filled rollup: generate_series spine per key + IGNORE NULLS
    # LOCF window — mirrors Spark's sequence()+last(ignorenulls)
    sql["gapfill_locf"] = """
        WITH b AS (
            SELECT event_type, (epoch_us(ts) // 300000000) * 300 AS bucket_s,
                   count(*) AS n_points, arg_max(value, event_id) AS last_value
            FROM events GROUP BY 1, 2),
        ext AS (
            SELECT event_type, min(bucket_s) AS mn, max(bucket_s) AS mx
            FROM b GROUP BY 1),
        spine AS (
            SELECT event_type, unnest(generate_series(mn, mx, 300)) AS bucket_s
            FROM ext)
        SELECT s.event_type, s.bucket_s,
               COALESCE(b.n_points, 0) AS n_points,
               b.n_points IS NULL AS is_gap,
               last_value(b.last_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bucket_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        FROM spine s
        LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_s = b.bucket_s
        ORDER BY s.event_type, s.bucket_s
    """

    # linear-interpolation gapfill: same spine, backward/forward
    # IGNORE NULLS windows, identical expression shape + round(9)
    sql["gapfill_interpolate"] = """
        WITH b AS (
            SELECT event_type, (epoch_us(ts) // 300000000) * 300 AS bucket_s,
                   count(*) AS n_points, arg_max(value, event_id) AS last_value
            FROM events GROUP BY 1, 2),
        ext AS (
            SELECT event_type, min(bucket_s) AS mn, max(bucket_s) AS mx
            FROM b GROUP BY 1),
        spine AS (
            SELECT event_type, unnest(generate_series(mn, mx, 300)) AS bucket_s
            FROM ext),
        j AS (
            SELECT s.event_type, s.bucket_s,
                   COALESCE(b.n_points, 0) AS n_points,
                   b.n_points IS NULL AS is_gap, b.last_value AS lv
            FROM spine s
            LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_s = b.bucket_s),
        w2 AS (
            SELECT event_type, bucket_s, n_points, is_gap,
                   last_value(lv IGNORE NULLS) OVER wb AS pv,
                   last_value(CASE WHEN lv IS NOT NULL THEN bucket_s END
                              IGNORE NULLS) OVER wb AS pb,
                   first_value(lv IGNORE NULLS) OVER wf AS nv,
                   first_value(CASE WHEN lv IS NOT NULL THEN bucket_s END
                               IGNORE NULLS) OVER wf AS nb
            FROM j
            WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY event_type ORDER BY bucket_s
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, bucket_s, n_points, is_gap,
               round(CASE WHEN NOT is_gap THEN pv
                          ELSE pv + (nv - pv) *
                               (CAST(bucket_s - pb AS DOUBLE) /
                                CAST(nb - pb AS DOUBLE)) END, 9) AS value_interp
        FROM w2 ORDER BY event_type, bucket_s
    """

    # bloom-pruned semi join is EXACT for any (m, k): plain IN-subquery
    sql["bloom_semi_revenue"] = """
        SELECT l_returnflag, count(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """

    # robust z-scores: percentile_disc medians (order statistics,
    # engine-exact); identical double expression shapes + round(9)
    sql["mad_outliers"] = """
        WITH med AS (
            SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events GROUP BY 1),
        mad AS (
            SELECT e.event_type,
                   percentile_disc(0.5)
                       WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
            FROM events e JOIN med m USING (event_type) GROUP BY 1)
        SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
               round(CASE WHEN d.mad != 0
                          THEN abs(e.value - m.med) / (1.4826 * d.mad)
                     END, 9) AS robust_z,
               abs(e.value - m.med) > (3.0 * 1.4826) * d.mad AS is_outlier
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        ORDER BY e.event_id
    """

    # full curation chain: clean → dedup keepers → quality floor →
    # split, as one CTE pipeline (fragments identical to the
    # stage-level oracles above)
    sql["curate_corpus"] = """
        WITH c AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       text,
                       'https?://[^\\s]+', ' ', 'g'),
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                       '\\s+', ' ', 'g')) AS text
            FROM documents),
        d AS (
            SELECT c.doc_id, c.text, doc.source
            FROM c JOIN documents doc USING (doc_id)),
        k AS (
            SELECT min(doc_id) AS doc_id
            FROM (SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                      AS fp, doc_id FROM d)
            GROUP BY fp),
        dk AS (SELECT d.* FROM d JOIN k USING (doc_id)),
        base AS (
            SELECT doc_id, source, length(text) AS n_chars_m,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS INTEGER) AS n_unique,
                   CAST(len(list_filter(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), x -> x IN ({stops}))) AS INTEGER) AS n_stopwords,
                   CAST(len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS INTEGER) AS n_punct
            FROM dk),
        r AS (
            SELECT doc_id, source, n_tokens,
                   CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
                   CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
                   CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE) AS punct_ratio
            FROM base WHERE n_tokens > 0),
        s AS (
            SELECT doc_id, source,
                   uniq_ratio * 50.0 + stop_ratio * 30.0 + (1.0 - punct_ratio) * 10.0
                   + CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 10.0 ELSE 0.0 END AS quality
            FROM r),
        m AS (
            SELECT doc_id, source, quality,
                   quantile_cont(quality, 0.5) OVER (PARTITION BY source) AS src_median
            FROM s),
        f AS (
            SELECT doc_id, source, quality, src_median
            FROM m WHERE quality >= src_median),
        sp AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       % 100 AS bucket
            FROM f)
        SELECT f.doc_id, f.source,
               CASE WHEN sp.bucket < 90 THEN 'train'
                    WHEN sp.bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
               f.quality, f.src_median
        FROM f JOIN sp USING (doc_id)
        ORDER BY f.doc_id
    """.replace(  # .format would misread the regex quantifier braces
        "{stops}",
        ", ".join(f"'{w}'" for ws in text_ops.LANG_STOPWORDS.values() for w in ws),
    )

    # leakage audit: 40-char normalized-prefix fingerprints spanning
    # >1 split (the templated-opening leak class; whole-doc hashing
    # finds nothing on this corpus — no byte-identical cross-split docs)
    sql["split_leakage"] = r"""
        WITH t AS (
            SELECT md5(substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, 40))
                       AS content_fp,
                   doc_id,
                   CASE WHEN b < 90 THEN 'train'
                        WHEN b < 95 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id, text,
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                             % 100 AS b
                  FROM documents)),
        g AS (SELECT content_fp,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     list_sort(list(DISTINCT split)) AS splits,
                     min(doc_id) AS example_doc_id
              FROM t GROUP BY 1)
        SELECT content_fp, n_docs, array_to_string(splits, ',') AS splits,
               example_doc_id
        FROM g WHERE len(splits) >= 2 ORDER BY example_doc_id
    """

    # waterfall: stage counts over the SAME CTE chain as the
    # curate_corpus oracle (sliced at its split stage so the two can
    # never drift), plus the retained fraction
    _prefix = sql["curate_corpus"].split("        sp AS (")[0].rstrip().rstrip(",")
    sql["curation_waterfall"] = _prefix + """
        , w AS (
            SELECT 1 AS stage_no, 'total' AS stage,
                   (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
            UNION ALL
            SELECT 2, 'clean_join', (SELECT CAST(count(*) AS BIGINT) FROM d)
            UNION ALL
            SELECT 3, 'dedup_keepers', (SELECT CAST(count(*) AS BIGINT) FROM dk)
            UNION ALL
            SELECT 4, 'quality_floor', (SELECT CAST(count(*) AS BIGINT) FROM f))
        SELECT stage_no, stage, n_docs,
               round(CAST(n_docs AS DOUBLE) /
                     (SELECT CAST(count(*) AS DOUBLE) FROM documents), 9)
                   AS retained_frac
        FROM w ORDER BY stage_no
    """

    # ordered funnel: each step's min-µs conditioned on the previous
    sql["funnel_counts"] = """
        WITH s1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t GROUP BY 1),
        s3 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t GROUP BY 1),
        c AS (
            SELECT 1 AS step_no, 'view' AS step,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        SELECT step_no, step, n_users,
               round(CASE WHEN lag(n_users) OVER (ORDER BY step_no) != 0
                          THEN CAST(n_users AS DOUBLE) /
                               CAST(lag(n_users) OVER (ORDER BY step_no) AS DOUBLE)
                     END, 9) AS conversion
        FROM c ORDER BY step_no
    """

    # streaming funnel: the per-user state machine's final panel must
    # equal the batch funnel — oracle shared verbatim
    sql["streaming_funnel"] = sql["funnel_counts"]

    # conversion latency: same step-conditioning as the funnel; the
    # percentiles are order statistics over converting users
    sql["conversion_latency"] = """
        WITH t1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(t1.t1) AS t1
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t1.t1
            GROUP BY 1),
        lat AS (SELECT t2 - t1 AS latency_us FROM t2)
        SELECT count(*) AS n_converted,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_us) AS p25_us,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_us) AS p50_us,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_us) AS p90_us
        FROM lat
    """

    # Markov transitions: lead over the same unique ordering; integer
    # window-sum denominator, single double division
    sql["transition_matrix"] = """
        WITH p AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        c AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM p WHERE to_type IS NOT NULL
            GROUP BY 1, 2)
        SELECT from_type, to_type, n_transitions,
               round(CAST(n_transitions AS DOUBLE) /
                     CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                          AS DOUBLE), 9) AS p
        FROM c ORDER BY from_type, to_type
    """

    # cohort weeks are integer days-since-epoch // 7 in both engines
    sql["cohort_retention"] = """
        WITH uw AS (
            SELECT DISTINCT user_id,
                   (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
            FROM events),
        f AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
        SELECT CAST(f.cohort_wk AS BIGINT) AS cohort_wk,
               CAST(uw.wk - f.cohort_wk AS BIGINT) AS week_offset,
               count(*) AS n_users
        FROM uw JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # streaming flags == batch flags: stream-static joins are stateless
    sql["streaming_mad_alerts"] = """
        WITH med AS (
            SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events GROUP BY 1),
        mad AS (
            SELECT e.event_type,
                   percentile_disc(0.5)
                       WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
            FROM events e JOIN med m USING (event_type) GROUP BY 1)
        SELECT e.event_id, e.event_type, e.value, m.med, d.mad
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        WHERE abs(e.value - m.med) > (3.0 * 1.4826) * d.mad
        ORDER BY e.event_id
    """

    sql["seasonal_baseline"] = """
        WITH wb AS (
            SELECT event_id, event_type, value,
                   (epoch_us(ts) // 60000000) % 1440 // 60 AS tod_bucket
            FROM events),
        b AS (
            SELECT event_type, tod_bucket,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS typical,
                   count(*) AS n_baseline
            FROM wb GROUP BY 1, 2)
        SELECT w.event_id, w.event_type, w.tod_bucket, w.value,
               b.typical, b.n_baseline,
               round(CASE WHEN b.typical != 0 THEN w.value / b.typical END, 9)
                   AS vs_typical
        FROM wb w JOIN b USING (event_type, tod_bucket)
        ORDER BY w.event_id
    """

    # VARIANT extraction: typed NULL for missing paths == JSON-path
    # semantics; DuckDB extracts the same field from the JSON string
    sql["variant_props_stats"] = """
        WITH e AS (
            SELECT event_type,
                   CAST(json_extract_string(
                       CASE WHEN json_valid(props) THEN props END, '$.k')
                   AS BIGINT) AS k
            FROM events)
        SELECT event_type, count(*) AS n, count(k) AS n_with_k,
               min(k) AS min_k, max(k) AS max_k,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM e GROUP BY event_type ORDER BY event_type
    """

    # RANGE frame: DuckDB RANGE BETWEEN over the same µs ordering;
    # decimal accumulation inside the frame, single double division
    sql["range_frame_stats"] = """
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
        SELECT user_id, event_id, us, value,
               count(*) OVER w AS n_10min,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS sum_10min,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / CAST(count(*) OVER w AS DOUBLE) AS avg_10min
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """

    # theta sketches are exact below saturation (user cardinality ≪
    # 2^12 at oracle scale): the oracle is plain exact set algebra
    sql["theta_user_overlap"] = """
        WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.n AS users_a, b.n AS users_b
            FROM c a JOIN c b ON a.event_type < b.event_type),
        ov AS (
            SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_both
            FROM ut x JOIN ut y
              ON x.user_id = y.user_id AND x.event_type < y.event_type
            GROUP BY 1, 2)
        SELECT p.type_a, p.type_b, p.users_a, p.users_b,
               p.users_a + p.users_b - COALESCE(b.n_both, 0) AS users_union,
               COALESCE(b.n_both, 0) AS users_both
        FROM pairs p LEFT JOIN ov b ON p.type_a = b.ta AND p.type_b = b.tb
        ORDER BY type_a, type_b
    """

    # approx_top_k is exact while distinct keys ≤ maxItemsTracked
    sql["approx_topk_types"] = """
        SELECT event_type, count(*) AS n_events
        FROM events GROUP BY event_type
        ORDER BY n_events DESC, event_type
    """

    # exact substring-dup spans: positional k-shingles (k=8), windows
    # occurring >1 time anywhere, merged per doc via gaps-and-islands.
    # DuckDB list slices are 1-based inclusive: t[pos+1 : pos+8] is the
    # 8-token window starting at 0-based offset pos.
    sql["substring_dup_spans"] = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents),
        sh0 AS (
            SELECT doc_id,
                   unnest(range(0, greatest(len(t) - 8 + 1, 0))) AS pos, t
            FROM toks),
        sh AS (
            SELECT doc_id, CAST(pos AS INTEGER) AS pos,
                   array_to_string(t[pos + 1 : pos + 8], ' ') AS s
            FROM sh0),
        dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1),
        marked AS (SELECT doc_id, pos FROM sh JOIN dup USING (s)),
        isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER w <= 8 THEN 0 ELSE 1 END AS brk
            FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        isl2 AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM isl)
        SELECT doc_id, min(pos) AS span_start,
               CAST(max(pos) + 8 AS INTEGER) AS span_end,
               count(*) AS n_dup_windows
        FROM isl2 GROUP BY doc_id, island
        ORDER BY doc_id, span_start
    """

    # recursive-CTE streaks: DuckDB recursion with date arithmetic
    # (day - INTERVAL / day + INTERVAL, since DuckDB lacks date_add)
    sql["user_day_streaks"] = """
        WITH RECURSIVE days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        streak (user_id, day, len) AS (
            SELECT d.user_id, d.day, 1 AS len
            FROM days d
            WHERE NOT EXISTS (
                SELECT 1 FROM days p
                WHERE p.user_id = d.user_id AND p.day = d.day - INTERVAL 1 DAY)
            UNION ALL
            SELECT s.user_id, d.day, s.len + 1
            FROM streak s
            JOIN days d
              ON d.user_id = s.user_id AND d.day = s.day + INTERVAL 1 DAY
        )
        SELECT user_id,
               count(*) AS n_active_days,
               CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_streaks,
               CAST(max(len) AS INTEGER) AS max_streak
        FROM streak
        GROUP BY user_id
        ORDER BY user_id
    """

    # asymmetric containment over the same stop-shingle-filtered
    # inverted index as ngram_jaccard_pairs
    sql["containment_pairs"] = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT doc_id, source,
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM t WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        blk AS (SELECT source, count(*) AS n_docs FROM sh GROUP BY source),
        dfc AS (SELECT source, s, count(*) AS df FROM ex GROUP BY source, s),
        kept AS (
            SELECT ex.doc_id, ex.source, ex.s
            FROM ex
            JOIN dfc ON ex.source = dfc.source AND ex.s = dfc.s
            JOIN blk ON ex.source = blk.source
            WHERE dfc.df <= greatest(2, CAST(floor(0.5 * blk.n_docs) AS BIGINT))),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
        co AS (
            SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM kept a JOIN kept b
              ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3)
        SELECT co.source, doc_a, doc_b, n_inter,
               CAST(n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)
                   AS containment
        FROM co
        JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5
        ORDER BY doc_a, doc_b
    """

    # blocked fuzzy linkage: exact-prefix block, levenshtein on
    # candidates (both engines: standard Wagner-Fischer distance)
    sql["fuzzy_prefix_match"] = """
        WITH k AS (SELECT doc_id, text[1:16] AS blk, text[1:60] AS probe
                   FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.probe, b.probe) AS INTEGER) AS edit_dist
        FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.probe, b.probe) <= 12
        ORDER BY doc_a, doc_b
    """

    # sessions × busy-hour windows on measure-positive overlap; the
    # busy predicate is the division-free cross-multiplication
    sql["interval_overlap_join"] = """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_no
            FROM flagged),
        sess AS (
            SELECT user_id, session_no,
                   min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
            FROM numbered GROUP BY user_id, session_no),
        by_hour AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS cnt
            FROM events GROUP BY 1, 2),
        tot AS (SELECT event_type, sum(cnt) AS total, count(*) AS n_hours
                FROM by_hour GROUP BY 1),
        win AS (
            SELECT b.event_type,
                   b.hr * 3600000000 AS win_start_us,
                   (b.hr + 1) * 3600000000 AS win_end_us
            FROM by_hour b JOIN tot t ON b.event_type = t.event_type
            WHERE b.cnt * t.n_hours * 2 > 3 * t.total)
        SELECT s.user_id, s.session_no, w.event_type, w.win_start_us,
               least(s.end_us, w.win_end_us) - greatest(s.start_us, w.win_start_us)
                   AS overlap_us
        FROM sess s
        JOIN win w ON s.start_us < w.win_end_us AND s.end_us > w.win_start_us
        ORDER BY s.user_id, s.session_no, w.event_type, w.win_start_us
    """

    # exact finite-window EWMA: decimal weighted sum over 8 lags,
    # generated so the weights/depth can't drift from the Spark code
    _ewma_depth = 8
    _lag_defs = ",\n                   ".join(
        "CAST(value AS DECIMAL(18,2)) AS l0"
        if i == 0
        else f"lag(CAST(value AS DECIMAL(18,2)), {i}) OVER w AS l{i}"
        for i in range(_ewma_depth)
    )
    _num = " + ".join(
        f"coalesce(l{i} * {1 << (_ewma_depth - 1 - i)}, 0)" for i in range(_ewma_depth)
    )
    _den = " + ".join(
        f"CASE WHEN l{i} IS NOT NULL THEN {1 << (_ewma_depth - 1 - i)} ELSE 0 END"
        for i in range(_ewma_depth)
    )
    sql["ewma_smooth"] = f"""
        WITH s AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value,
                   {_lag_defs}
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        SELECT event_id, user_id, event_type, us, value,
               CAST({_num} AS DOUBLE) / CAST({_den} AS DOUBLE) AS ewma
        FROM s ORDER BY event_id
    """

    sql["minmax_normalize"] = """
        WITH s AS (SELECT event_type, min(value) AS v_min, max(value) AS v_max
                   FROM events GROUP BY 1)
        SELECT e.event_id, e.event_type, e.value,
               CASE WHEN s.v_max > s.v_min
                    THEN (e.value - s.v_min) / (s.v_max - s.v_min) END AS norm01
        FROM events e JOIN s USING (event_type)
        ORDER BY e.event_id
    """

    sql["winsorized_stats"] = """
        WITH c AS (
            SELECT event_type,
                   percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p_lo,
                   percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p_hi
            FROM events GROUP BY 1)
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, c.p_lo, c.p_hi,
               CAST(sum(CASE WHEN e.value < c.p_lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below,
               CAST(sum(CASE WHEN e.value > c.p_hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above,
               CAST(sum(CAST(least(greatest(e.value, c.p_lo), c.p_hi)
                             AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS win_mean
        FROM events e JOIN c USING (event_type)
        GROUP BY e.event_type, c.p_lo, c.p_hi
        ORDER BY e.event_type
    """

    sql["skew_profile"] = """
        WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                     CAST(count(*) AS BIGINT) AS n_keys FROM c)
        SELECT c.user_id, c.cnt,
               CAST(c.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS share,
               CAST(c.cnt * t.n_keys AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
                   AS skew_ratio
        FROM c, t
        ORDER BY c.cnt DESC, c.user_id ASC
        LIMIT 10
    """

    sql["temporal_split"] = """
        WITH cut AS (
            SELECT percentile_disc(0.8) WITHIN GROUP (ORDER BY epoch_us(ts))
                       AS cutoff_us
            FROM events)
        SELECT event_id, epoch_us(ts) AS us, cut.cutoff_us,
               CASE WHEN epoch_us(ts) <= cut.cutoff_us THEN 'train'
                    WHEN epoch_us(ts) > cut.cutoff_us + 3600000000 THEN 'eval'
                    ELSE 'embargo' END AS split
        FROM events, cut
        ORDER BY event_id
    """

    # integer-millionth PageRank, unrolled to the same n_iter as the
    # Spark loop — the iteration chain is GENERATED, like _km_chain,
    # so the two cannot drift
    _pr_iters = 3
    _pr_chain = ""
    _prev = "r0"
    for _i in range(1, _pr_iters + 1):
        _pr_chain += f""",
        c{_i} AS (
            SELECT ew.to_type AS node,
                   sum((CAST(p.r AS HUGEINT) * 850 * ew.w)
                       // (CAST(ew.w_out AS HUGEINT) * 1000)) AS s
            FROM {_prev} p JOIN ew ON p.node = ew.from_type GROUP BY 1),
        r{_i} AS (
            SELECT n2.node, n2.n,
                   (150000 // n2.n) + coalesce(c{_i}.s, 0) AS r
            FROM nodes2 n2 LEFT JOIN c{_i} ON n2.node = c{_i}.node)"""
        _prev = f"r{_i}"
    sql["pagerank_transitions"] = f"""
        WITH pairs AS (
            SELECT user_id, event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id)
                       AS to_type
            FROM events),
        edges AS (SELECT from_type, to_type, count(*) AS w
                  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
        outw AS (SELECT from_type, sum(w) AS w_out FROM edges GROUP BY 1),
        ew AS (SELECT e.from_type, e.to_type, e.w, o.w_out
               FROM edges e JOIN outw o USING (from_type)),
        nodes AS (SELECT DISTINCT event_type AS node FROM events),
        nn AS (SELECT count(*) AS n FROM nodes),
        nodes2 AS (SELECT node, n FROM nodes, nn),
        r0 AS (SELECT node, n, 1000000 // n AS r FROM nodes2){_pr_chain}
        SELECT node, CAST(r AS BIGINT) AS rank_ppm,
               CAST(r AS DOUBLE) / 1000000.0 AS rank
        FROM {_prev} ORDER BY node
    """

    sql["freshness_audit"] = """
        WITH p AS (SELECT event_type, max(epoch_us(ts)) AS last_us,
                          CAST(count(*) AS BIGINT) AS n_events
                   FROM events GROUP BY 1),
        m AS (SELECT max(epoch_us(ts)) AS as_of_us FROM events)
        SELECT event_type, n_events, last_us,
               m.as_of_us - last_us AS lag_us,
               m.as_of_us - last_us > 3600000000 AS is_stale
        FROM p, m ORDER BY event_type
    """
    # the streaming twin replays to the identical state, so it shares
    # the batch oracle verbatim (same contract as streaming_session_paths)
    sql["streaming_freshness"] = sql["freshness_audit"]

    # χ² numerator is pure integer arithmetic; ONE final division
    sql["class_balance"] = """
        WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS obs
                   FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(obs) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS k FROM c),
        p AS (SELECT c.event_type, c.obs, t.total, t.k,
                     CAST(c.obs * t.k - t.total AS HUGEINT)
                         * (c.obs * t.k - t.total) AS dev2
              FROM c, t),
        s AS (SELECT CAST(sum(dev2) AS HUGEINT) AS sum_dev2,
                     CAST(min(total) AS BIGINT) AS total_,
                     CAST(min(k) AS BIGINT) AS k_ FROM p)
        SELECT p.event_type, p.obs,
               CAST(p.obs AS DOUBLE) / CAST(p.total AS DOUBLE) AS share,
               CAST(s.sum_dev2 AS DOUBLE) / CAST(s.k_ * s.total_ AS DOUBLE)
                   AS chi2_uniform
        FROM p, s ORDER BY p.event_type
    """

    # per-column profile; native-type distinct counts equal the
    # string-cast counts because per-type casts are injective
    _prof_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    sql["column_profile"] = "\n        UNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM events"""
        for c in _prof_cols
    ) + "\n        ORDER BY col_name"

    # Benford twin: identical cents→string first-digit bucketing, the
    # same dense #types×9 spine, shared expectation/deviation literals
    # (analytics.BENFORD_EXPECTED_SQL / BENFORD_DEV_SQL)
    _cents = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
    sql["benford_audit"] = f"""
        WITH base AS (
            SELECT event_type,
                   CASE WHEN value IS NOT NULL AND {_cents} > 0 THEN
                        CAST(substr(CAST({_cents} AS VARCHAR), 1, 1) AS INTEGER)
                   END AS digit
            FROM events),
        cells AS (
            SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2),
        totals AS (
            SELECT event_type,
                   SUM(CASE WHEN digit IS NOT NULL THEN n ELSE 0 END) AS t,
                   SUM(CASE WHEN digit IS NULL THEN n ELSE 0 END) AS n_excluded
            FROM cells GROUP BY 1),
        spine AS (
            SELECT t.event_type, CAST(d.range AS INTEGER) AS digit
            FROM (SELECT event_type FROM totals) t CROSS JOIN range(1, 10) d),
        grid AS (
            SELECT s.event_type, s.digit, COALESCE(c.n, 0) AS n_obs
            FROM spine s LEFT JOIN cells c USING (event_type, digit))
        SELECT g.event_type, g.digit, g.n_obs,
               round(CAST(n_obs AS DOUBLE) / CAST(t AS DOUBLE), 9) AS share,
               round({analytics.BENFORD_EXPECTED_SQL}, 9) AS expected,
               {analytics.BENFORD_DEV_SQL} AS dev,
               CAST(n_excluded AS BIGINT) AS n_excluded
        FROM grid g JOIN totals USING (event_type)
        ORDER BY event_type, digit
    """

    # Gini twin: exact cents, permutation-invariant rank weight, the
    # shared GINI_SQL final expression
    sql["value_concentration"] = f"""
        WITH pu AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2),
        ranked AS (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cents, user_id) AS rnk
            FROM pu),
        agg AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(rnk * cents) AS BIGINT) AS w,
                   CAST(MAX(cents) AS BIGINT) AS max_cents
            FROM ranked GROUP BY 1)
        SELECT event_type, n AS n_users, s AS total_cents,
               CASE WHEN s > 0 THEN {analytics.GINI_SQL} END AS gini,
               CASE WHEN s > 0 THEN
                   round(CAST(max_cents AS DOUBLE) / CAST(s AS DOUBLE), 9)
               END AS top_user_share
        FROM agg ORDER BY event_type
    """

    # KS twin: same integer midpoint split, HUGEINT ECDF cross-products
    # (exact, as Spark's DECIMAL(38,0)), shared KS_STAT_SQL division
    sql["ks_drift"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        tagged AS (
            SELECT event_type, value,
                   epoch_us(ts) <= (mn + mx) // 2 AS is_ref
            FROM events, st WHERE value IS NOT NULL),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS d_ref,
                   SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS d_cur
            FROM tagged GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(d_ref) AS n_ref, SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1),
        ecdf AS (
            SELECT event_type,
                   SUM(d_ref) OVER w AS c_ref,
                   SUM(d_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gaps AS (
            SELECT e.event_type, n_ref, n_cur,
                   abs(CAST(c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT)) AS gap
            FROM ecdf e JOIN tot USING (event_type)),
        mx AS (
            SELECT event_type, CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   MAX(gap) AS ks_num
            FROM gaps GROUP BY 1)
        SELECT event_type, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {anomaly.KS_STAT_SQL} END
                   AS ks_d
        FROM mx ORDER BY event_type
    """

    # ACF twin: same dense per-type day spine, HUGEINT scaled
    # deviations (n·y − S — exact, as Spark's DECIMAL(38,0)), shared
    # ACF_SQL final division; lags via lead() in one window pass
    _acf_max_lag = 7
    _acf_num_cols = ",\n                   ".join(
        f"SUM(CASE WHEN y_{k} IS NOT NULL THEN"
        f" (CAST(n AS HUGEINT) * y - CAST(s AS HUGEINT))"
        f" * (CAST(n AS HUGEINT) * y_{k} - CAST(s AS HUGEINT))"
        f" ELSE CAST(0 AS HUGEINT) END) AS num_{k}"
        for k in range(1, _acf_max_lag + 1)
    )
    _acf_leads = ",\n                   ".join(
        f"lead(y, {k}) OVER (PARTITION BY event_type ORDER BY day) AS y_{k}"
        for k in range(1, _acf_max_lag + 1)
    )
    _acf_unpivot = " UNION ALL ".join(
        f"SELECT event_type, {k} AS lag, n, den, num_{k} AS num FROM agg"
        for k in range(1, _acf_max_lag + 1)
    )
    sql["acf_panel"] = f"""
        WITH counts AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
        span AS (SELECT event_type, min(day) AS d0, max(day) AS d1
                 FROM counts GROUP BY 1),
        dense AS (
            SELECT sp.event_type, sp.day, COALESCE(c.y, 0) AS y
            FROM (SELECT event_type,
                         unnest(generate_series(d0, d1)) AS day
                  FROM span) sp
            LEFT JOIN counts c USING (event_type, day)),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS s
               FROM dense GROUP BY 1),
        leads AS (
            SELECT event_type, y,
                   {_acf_leads}
            FROM dense),
        agg AS (
            SELECT l.event_type, first(n) AS n,
                   SUM((CAST(n AS HUGEINT) * y - CAST(s AS HUGEINT))
                       * (CAST(n AS HUGEINT) * y - CAST(s AS HUGEINT))) AS den,
                   {_acf_num_cols}
            FROM leads l JOIN st USING (event_type)
            GROUP BY 1),
        stacked AS ({_acf_unpivot})
        SELECT event_type, CAST(lag AS INTEGER) AS lag,
               CAST(n AS BIGINT) AS n_days,
               CASE WHEN den > 0 THEN {anomaly.ACF_SQL} END AS acf
        FROM stacked WHERE lag < n
        ORDER BY event_type, lag
    """

    # Heaps-law twin: same arithmetic doc_id-range buckets, first-doc
    # vocabulary attribution, dense bucket spine, running totals
    sql["vocab_growth"] = f"""
        WITH bounds AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
                        FROM documents),
        toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (
            SELECT CAST(((doc_id - mn) * 20) // (mx - mn + 1) AS INTEGER)
                       AS bucket,
                   CAST(count(*) AS BIGINT) AS new_terms
            FROM (SELECT term, min(doc_id) AS doc_id FROM toks GROUP BY term),
                 bounds
            GROUP BY 1),
        dt AS (
            SELECT CAST(((doc_id - mn) * 20) // (mx - mn + 1) AS INTEGER)
                       AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS bucket_tokens
            FROM (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
                 bounds
            GROUP BY 1),
        spine AS (SELECT CAST(range AS INTEGER) AS bucket FROM range(0, 20)),
        pb AS (
            SELECT s.bucket,
                   COALESCE(dt.n_docs, 0) AS n_docs,
                   COALESCE(dt.bucket_tokens, 0) AS bucket_tokens,
                   COALESCE(tf.new_terms, 0) AS new_terms
            FROM spine s LEFT JOIN dt USING (bucket) LEFT JOIN tf USING (bucket)),
        cum AS (
            SELECT bucket, n_docs, bucket_tokens, new_terms,
                   SUM(bucket_tokens) OVER w AS cum_tokens,
                   SUM(new_terms) OVER w AS cum_vocab
            FROM pb
            WINDOW w AS (ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT bucket, n_docs, bucket_tokens, new_terms,
               CAST(cum_tokens AS BIGINT) AS cum_tokens,
               CAST(cum_vocab AS BIGINT) AS cum_vocab,
               CASE WHEN cum_tokens > 0 THEN
                   round(CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE), 9)
               END AS ttr
        FROM cum ORDER BY bucket
    """

    # Edit-distance twin: identical ASCII-cleaned prefixes (the domain
    # where DuckDB's byte-level and Spark's code-point Levenshtein
    # provably coincide), same hot-key cutoff and verify filter.
    # regexp_replace needs the 'g' flag (DuckDB replaces first match
    # only by default; Spark replaces all)
    sql["edit_distance_pairs"] = """
        WITH probes AS (
            SELECT doc_id,
                   substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                          1, 12) AS bkey,
                   substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                          1, 32) AS probe
            FROM documents),
        kept AS (
            SELECT * FROM probes
            WHERE bkey NOT IN (
                SELECT bkey FROM probes GROUP BY bkey HAVING count(*) > 1000)),
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(levenshtein(a.probe, b.probe) AS INTEGER) AS edit_dist,
                   greatest(length(a.probe), length(b.probe)) AS cmp_len
            FROM kept a JOIN kept b ON a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, edit_dist,
               CASE WHEN cmp_len > 0 THEN
                   round(1.0 - CAST(edit_dist AS DOUBLE) / CAST(cmp_len AS DOUBLE), 9)
               ELSE CAST(1.0 AS DOUBLE) END AS similarity
        FROM pairs WHERE edit_dist <= 6
        ORDER BY a_id, b_id
    """

    # shared dense daily-count spine for the two series twins below
    _dense_days = """
        counts AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
        span AS (SELECT event_type, min(day) AS d0, max(day) AS d1,
                        SUM(y) AS s
                 FROM counts GROUP BY 1),
        dense AS (
            SELECT sp.event_type, sp.day, COALESCE(c.y, 0) AS y
            FROM (SELECT event_type,
                         unnest(generate_series(d0, d1)) AS day
                  FROM span) sp
            LEFT JOIN counts c USING (event_type, day))"""

    # level-shift twin: same prefix sums, shared score expression,
    # same (score desc, day asc) argmax tiebreak on the rounded score
    sql["changepoint_detect"] = f"""
        WITH {_dense_days},
        pre AS (
            SELECT event_type, day,
                   SUM(y) OVER w AS s1,
                   CAST(row_number() OVER w2 AS BIGINT) AS n1
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w2 AS (PARTITION BY event_type ORDER BY day)),
        cands AS (
            SELECT p.event_type, p.day,
                   (d1 - d0 + 1) AS n, s1, n1,
                   s - s1 AS s2, (d1 - d0 + 1) - n1 AS n2
            FROM pre p JOIN span USING (event_type)
            WHERE n1 < (d1 - d0 + 1)),
        scored AS (
            SELECT *, {anomaly.CHANGEPOINT_SCORE_SQL} AS score FROM cands),
        best AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY score DESC, day ASC) AS rk
            FROM scored)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               CAST(day AS BIGINT) AS break_day, score,
               round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 9) AS mean_before,
               round(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 9) AS mean_after
        FROM best WHERE rk = 1 ORDER BY event_type
    """

    # Theil–Sen twin: identical double pairwise slopes (exact-integer
    # operands — IEEE-identical division), percentile_disc median
    sql["theil_sen_trend"] = f"""
        WITH {_dense_days},
        pairs AS (
            SELECT a.event_type,
                   CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
                       AS slope
            FROM dense a JOIN dense b
              ON a.event_type = b.event_type AND a.day < b.day)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY slope) AS sen_slope
        FROM pairs GROUP BY 1 ORDER BY 1
    """

    # Zipf twin: same (count desc, term asc) rank, one-transcendental
    # 9-dp ln values, DECIMAL sums, the SHARED trend combine
    _zdec = "CAST(round({e}, 9) AS DECIMAL(25,9))"
    sql["zipf_fit"] = f"""
        WITH tf AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS n_term
            FROM (SELECT source, unnest({_TOKS}) AS term FROM documents)
            GROUP BY 1, 2),
        ranked AS (
            SELECT source,
                   round(ln(CAST(rnk AS DOUBLE)), 9) AS x,
                   round(ln(CAST(n_term AS DOUBLE)), 9) AS y
            FROM (SELECT source, n_term,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY n_term DESC, term ASC)
                             AS rnk
                  FROM tf)
            WHERE rnk <= 100),
        sums AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM({_zdec.format(e='x')}) AS DOUBLE) AS sx,
                   CAST(SUM({_zdec.format(e='y')}) AS DOUBLE) AS sy,
                   CAST(SUM({_zdec.format(e='x * x')}) AS DOUBLE) AS sxx,
                   CAST(SUM({_zdec.format(e='x * y')}) AS DOUBLE) AS sxy,
                   CAST(SUM({_zdec.format(e='y * y')}) AS DOUBLE) AS syy
            FROM ranked GROUP BY 1)
        SELECT source, n AS n_terms,
               {analytics.TREND_FINAL_SQL["slope_per_hour"]} AS zipf_slope,
               {analytics.TREND_FINAL_SQL["r2"]} AS r2
        FROM sums ORDER BY source
    """

    # power-iteration twin: generated-identical left-associated chains
    # (same evaluation order → bit-identical doubles), HUGEINT sums as
    # the exact mirror of Spark's DECIMAL(38,0). DuckDB lists are
    # 1-indexed, hence qvec[d+1].
    _pca_sumq = " + ".join(f"qvec[{d + 1}]" for d in range(64))
    _pca_s1 = ",\n               ".join(
        f"SUM(CAST(qvec[{d + 1}] * ({_pca_sumq}) AS HUGEINT)) AS s1_{d}"
        for d in range(64)
    )
    _pca_n1 = " + ".join(
        f"CAST(s1_{d} AS DOUBLE) * CAST(s1_{d} AS DOUBLE)" for d in range(64)
    )
    # each chain is computed ONCE in its own CTE — repeating the
    # 64-term chains inside 64 column expressions made the twin's
    # expression tree quadratic in dims and OOM'd the planner
    _pca_v1 = ",\n               ".join(
        f"CASE WHEN nn1 > 0.0 THEN"
        f" round(CAST(s1_{d} AS DOUBLE) / sqrt(nn1), 6) END AS v1_{d}"
        for d in range(64)
    )
    _pca_dot1 = " + ".join(f"qvec[{d + 1}] * v1_{d}" for d in range(64))
    _pca_s2 = ",\n               ".join(
        f"SUM(qvec[{d + 1}] * idot) AS s2_{d}" for d in range(64)
    )
    _pca_n2 = " + ".join(
        f"CAST(s2_{d} AS DOUBLE) * CAST(s2_{d} AS DOUBLE)" for d in range(64)
    )
    _pca_out = " UNION ALL ".join(
        f"SELECT {d} AS dim, CASE WHEN nn2 > 0.0 THEN"
        f" round(CAST(s2_{d} AS DOUBLE) / sqrt(nn2), 9) END AS loading"
        f" FROM s2, n2"
        for d in range(64)
    )
    sql["pca_power_iter"] = f"""
        WITH q AS (
            SELECT list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                       AS qvec
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        s1 AS (
            SELECT {_pca_s1}
            FROM q),
        n1 AS (SELECT {_pca_n1} AS nn1 FROM s1),
        v1 AS (
            SELECT {_pca_v1}
            FROM s1, n1),
        rowdots AS (
            SELECT qvec,
                   CAST(round(round({_pca_dot1}, 6) * 1000000.0, 0) AS HUGEINT)
                       AS idot
            FROM q, v1),
        s2 AS (
            SELECT {_pca_s2}
            FROM rowdots),
        n2 AS (SELECT {_pca_n2} AS nn2 FROM s2),
        stacked AS ({_pca_out})
        SELECT CAST(dim AS INTEGER) AS dim, loading
        FROM stacked ORDER BY dim
    """

    # ---- round-6 entries ----

    # near-dup incremental dedup: the exact CDC pass (incremental_dedup
    # oracle verbatim) composed with the portable-MinHash cross
    # pipeline (shared _portable_sig_ctes) new-survivors ↔ old corpus
    sql["incremental_dedup_near"] = f"""
        WITH oldt AS (SELECT doc_id, text FROM documents),
        newt AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
            FROM documents WHERE doc_id % 17 <> 0
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN array_to_string(list_reverse({_TOKS}), ' ')
                        WHEN doc_id % 3 = 1 THEN text || ' brand-new'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 29 = 0),
        o AS (SELECT doc_id, md5(text) AS fp FROM oldt),
        n AS (SELECT doc_id, md5(text) AS fp FROM newt),
        ch AS (SELECT n.doc_id AS doc_id, n.fp AS fp,
                      CASE WHEN o.fp IS NULL THEN 'added' ELSE 'changed' END AS status
               FROM n LEFT JOIN o ON n.doc_id = o.doc_id
               WHERE o.fp IS NULL OR o.fp <> n.fp),
        r AS (SELECT doc_id, fp, status,
                     row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              FROM ch),
        surv AS (SELECT doc_id, status FROM r
                 WHERE rn = 1 AND fp NOT IN (SELECT fp FROM o)),
        sn AS (SELECT s.doc_id, t.text FROM surv s
               JOIN newt t ON s.doc_id = t.doc_id),
        {_portable_sig_ctes('nw_', 'sn', 3)},
        {_portable_sig_ctes('od_', 'oldt', 3)},
        cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
                 FROM nw_banded a JOIN od_banded b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key),
        nsets AS (SELECT DISTINCT doc_id, h FROM nw_hs),
        osets AS (SELECT DISTINCT doc_id, h FROM od_hs),
        nsz AS (SELECT doc_id, count(*) AS n FROM nsets GROUP BY doc_id),
        osz AS (SELECT doc_id, count(*) AS n FROM osets GROUP BY doc_id),
        inter AS (SELECT c.new_id, c.old_id, count(*) AS n_inter
                  FROM cand c
                  JOIN nsets x ON x.doc_id = c.new_id
                  JOIN osets y ON y.doc_id = c.old_id AND y.h = x.h
                  GROUP BY 1, 2),
        near AS (SELECT DISTINCT i.new_id
                 FROM inter i
                 JOIN nsz ON i.new_id = nsz.doc_id
                 JOIN osz ON i.old_id = osz.doc_id
                 WHERE CAST(n_inter AS DOUBLE)
                       / CAST(nsz.n + osz.n - n_inter AS DOUBLE) >= 0.5)
        SELECT doc_id, status FROM surv
        WHERE doc_id NOT IN (SELECT new_id FROM near)
        ORDER BY doc_id
    """

    # 13-gram decontamination against the deterministic excerpt suite
    _g13 = " || ' ' || ".join(
        f"toks[i+{j}]" if j else "toks[i]" for j in range(13)
    )
    sql["decontaminate_13gram"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        be AS (SELECT doc_id + 20000000 AS doc_id, toks[4:23] AS toks
               FROM d WHERE doc_id % 7 = 0 AND len(toks) >= 16),
        tr_ex AS (
            SELECT doc_id,
                   unnest(list_distinct([{_g13}
                                         for i in range(1, len(toks) - 11)])) AS s
            FROM d WHERE len(toks) >= 13),
        be_ex AS (
            SELECT doc_id AS bench_id,
                   unnest(list_distinct([{_g13}
                                         for i in range(1, len(toks) - 11)])) AS s
            FROM be WHERE len(toks) >= 13)
        SELECT tr_ex.doc_id,
               count(DISTINCT tr_ex.s) AS n_hit_shingles,
               count(DISTINCT be_ex.bench_id) AS n_bench_docs
        FROM tr_ex JOIN be_ex ON tr_ex.s = be_ex.s
        GROUP BY tr_ex.doc_id
        ORDER BY doc_id
    """

    # Jaccard histogram over all LSH candidates; the bucket id is pure
    # integer math ((10·|∩|) div |∪|) so bucket edges are engine-exact
    sql["jaccard_threshold_curve"] = f"""
        WITH src AS (SELECT doc_id, text FROM documents),
        {_portable_sig_ctes('c_', 'src', 3)},
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM c_banded a JOIN c_banded b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
        sets AS (SELECT DISTINCT doc_id, h FROM c_hs),
        sz AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                  FROM cand c
                  JOIN sets x ON x.doc_id = c.doc_a
                  JOIN sets y ON y.doc_id = c.doc_b AND y.h = x.h
                  GROUP BY 1, 2),
        j AS (SELECT (10 * n_inter) // (sa.n + sb.n - n_inter) AS bucket
              FROM inter i
              JOIN sz sa ON i.doc_a = sa.doc_id
              JOIN sz sb ON i.doc_b = sb.doc_id)
        SELECT CAST(bucket AS INTEGER) AS bucket,
               CAST(bucket AS DOUBLE) / 10.0 AS jaccard_lo,
               count(*) AS n_pairs
        FROM j GROUP BY bucket ORDER BY bucket
    """

    # embedding drift: per-(half, label) decimal-exact centroids (the
    # label_centroid_similarity cvec pattern), cosine + L2 from the
    # same three ordered-fold dot products as the Spark expression
    sql["embedding_drift"] = """
        WITH halves AS (
            SELECT label, embedding, vec_id % 2 AS half
            FROM embeddings WHERE embedding IS NOT NULL),
        cnt AS (SELECT half, label, count(*) AS n
                FROM halves GROUP BY 1, 2),
        comp AS (
            SELECT half, label, CAST(pos AS INTEGER) AS pos,
                   embedding[pos + 1] AS x
            FROM (SELECT half, label,
                         unnest(range(0, len(embedding))) AS pos, embedding
                  FROM halves)),
        cent AS (
            SELECT half, label, pos,
                   CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
            FROM comp GROUP BY 1, 2, 3),
        cvec AS (
            SELECT half, label, list(m ORDER BY pos) AS centroid
            FROM cent GROUP BY 1, 2)
        SELECT a.label,
               CAST(ca.n AS BIGINT) AS n_old,
               CAST(cb.n AS BIGINT) AS n_new,
               round(list_dot_product(a.centroid, b.centroid)
                     / (sqrt(list_dot_product(a.centroid, a.centroid))
                        * sqrt(list_dot_product(b.centroid, b.centroid))), 9)
                   AS cos_sim,
               round(sqrt(greatest(
                     list_dot_product(a.centroid, a.centroid)
                     - 2.0 * list_dot_product(a.centroid, b.centroid)
                     + list_dot_product(b.centroid, b.centroid), 0.0)), 9)
                   AS l2_shift
        FROM cvec a
        JOIN cvec b ON a.label = b.label AND a.half = 0 AND b.half = 1
        JOIN cnt ca ON ca.label = a.label AND ca.half = 0
        JOIN cnt cb ON cb.label = b.label AND cb.half = 1
        ORDER BY a.label
    """

    # streaming twins replay the same feed through the same cores —
    # batch oracles shared verbatim (the streaming_freshness pattern)
    sql["streaming_ks_drift"] = sql["ks_drift"]
    sql["streaming_changepoint"] = sql["changepoint_detect"]

    # winnowing: same 60-bit md5 k-gram keys as the portable family;
    # window minima are VALUE minima so tie handling cannot diverge;
    # hot fingerprints (df > 50) dropped before the self-join
    sql["winnow_overlap_pairs"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id,
                     [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      for i in range(1, len(toks) - 1)] AS grams
              FROM t WHERE len(toks) >= 3),
        h AS (SELECT doc_id,
                     list_transform(grams,
                         s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
              FROM g),
        wn AS (SELECT doc_id,
                      CASE WHEN len(hs) >= 4
                           THEN [list_min(hs[j:j+3])
                                 for j in range(1, len(hs) - 2)]
                           ELSE [list_min(hs)] END AS wins
               FROM h),
        fps AS (SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM wn),
        dfreq AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
        kept AS (SELECT f.doc_id, f.fp
                 FROM fps f JOIN dfreq USING (fp) WHERE df <= 50)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY 1, 2
    """

    # C4 rules over the injected fixture; list_max of an empty token
    # list is NULL in DuckDB where Spark's greatest-fold yields 0 —
    # coalesce pins the agreement
    sql["c4_rule_filter"] = f"""
        WITH inj AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum dolor' ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 THEN ' read our privacy policy' ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0 THEN ' {{code}}' ELSE '' END ||
                   CASE WHEN doc_id % 17 = 0 THEN ' ' || repeat('x', 1200) ELSE '' END ||
                   CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END AS text
            FROM documents),
        r AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   len({_TOKS}) >= 5 AS has_min_words,
                   regexp_matches(rtrim(text), '[.!?"]$') AS has_terminal_punct,
                   NOT contains(text, '{{') AND NOT contains(text, '}}')
                       AS no_braces,
                   NOT contains(lower(text), 'lorem ipsum') AS no_lorem,
                   NOT contains(lower(text), 'javascript')
                   AND NOT contains(lower(text), 'cookie policy')
                   AND NOT contains(lower(text), 'terms of use')
                   AND NOT contains(lower(text), 'privacy policy')
                       AS no_policy_boilerplate,
                   coalesce(list_max(list_transform({_TOKS}, t -> length(t))), 0)
                       <= 1000 AS no_long_word
            FROM inj)
        SELECT doc_id, n_tokens, has_min_words, has_terminal_punct,
               no_braces, no_lorem, no_policy_boilerplate, no_long_word,
               has_min_words AND has_terminal_punct AND no_braces
               AND no_lorem AND no_policy_boilerplate AND no_long_word AS keep
        FROM r ORDER BY doc_id
    """

    # ANN recall audit: both sub-pipelines are the entries' own oracle
    # texts embedded verbatim as CTEs — the audit proves the exact pair
    # the production operators serve, not a re-derivation
    sql["ann_recall_audit"] = f"""
        WITH exact_k AS ({sql["knn_bruteforce"]}),
        ivf_k AS ({sql["ivf_knn"]}),
        base AS (SELECT q_id, count(*) AS n_exact FROM exact_k GROUP BY q_id),
        hits AS (SELECT e.q_id, count(*) AS n_hits
                 FROM exact_k e JOIN ivf_k v
                   ON e.q_id = v.q_id AND e.vec_id = v.vec_id
                 GROUP BY e.q_id)
        SELECT b.q_id,
               CAST(b.n_exact AS BIGINT) AS n_exact,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
                     / CAST(b.n_exact AS DOUBLE), 9) AS recall
        FROM base b LEFT JOIN hits h ON b.q_id = h.q_id
        ORDER BY b.q_id
    """

    # frame sampling: same ascii-fold checksum formula as
    # multimodal_meta over each payload slice; list_prepend(0) seeds
    # the fold so empty slices reduce to 0 instead of erroring
    sql["frame_samples"] = """
        SELECT d.doc_id,
               CAST(i AS INTEGER) AS frame_no,
               CAST(i * step AS BIGINT) AS frame_offset,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(
                               string_split(substring(text,
                                   CAST(i * step + 1 AS INTEGER),
                                   CAST(step AS INTEGER)), ''),
                               c -> c <> ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007)
                   AS frame_checksum
        FROM (SELECT doc_id, text,
                     greatest(1, length(text) // 4) AS step
              FROM documents) d
        CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
        ORDER BY doc_id, frame_no
    """

    # resize stand-in: every stride-th character (stride = ⌈n/64⌉,
    # pure integer math), same seeded ascii-fold checksum
    sql["resize_payloads"] = """
        WITH b AS (SELECT doc_id, text, length(text) AS n,
                          greatest(1, (length(text) + 63) // 64) AS stride
                   FROM documents)
        SELECT doc_id,
               CAST(n AS BIGINT) AS orig_bytes,
               CAST(stride AS BIGINT) AS stride,
               CAST(CASE WHEN n = 0 THEN 0
                         ELSE (n + stride - 1) // stride END AS BIGINT)
                   AS resized_bytes,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           [i for i in range(1, n + 1) if (i - 1) % stride = 0],
                           i -> CAST(ascii(substring(text, CAST(i AS INTEGER), 1))
                                     AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007)
                   AS resized_checksum
        FROM b
        ORDER BY doc_id
    """

    # GPT-style sequence packing: (source, doc_id)-ordered stream with
    # one EOS per doc; global offset = per-source cumsum + source
    # prefix (mirrors the Spark two-level distributed cumsum)
    sql["sequence_pack"] = f"""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(len({_TOKS}) + 1 AS BIGINT) AS n_tokens
            FROM documents),
        local AS (
            SELECT doc_id, source, n_tokens,
                   CAST(coalesce(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS before_in_source
            FROM d),
        totals AS (SELECT source, SUM(n_tokens) AS src_total
                   FROM local GROUP BY source),
        prefix AS (
            SELECT source,
                   CAST(coalesce(SUM(src_total) OVER (
                       ORDER BY source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS src_prefix
            FROM totals),
        o AS (
            SELECT l.doc_id, l.source, l.n_tokens,
                   p.src_prefix + l.before_in_source AS stream_offset
            FROM local l JOIN prefix p ON l.source = p.source)
        SELECT doc_id, source, n_tokens, stream_offset,
               CAST(stream_offset // 512 AS BIGINT) AS seq_first,
               CAST((stream_offset + n_tokens - 1) // 512 AS BIGINT) AS seq_last,
               CAST((stream_offset + n_tokens - 1) // 512
                    - stream_offset // 512 + 1 AS BIGINT) AS n_seqs
        FROM o
        ORDER BY source, doc_id
    """

    # lagged cross-correlation: global dense day grid (zeros are real),
    # arithmetic day shift per lag, HUGEINT sufficient sums (exact, as
    # Spark's DECIMAL(38,0)), shared CORR_FINAL_SQL division
    sql["xcorr_panel"] = f"""
        WITH counts AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   count(*) AS y
            FROM events GROUP BY 1, 2),
        span AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
        types AS (SELECT DISTINCT event_type FROM counts),
        dense AS (
            SELECT t.event_type, g.day, coalesce(c.y, 0) AS y
            FROM types t
            CROSS JOIN span s
            CROSS JOIN unnest(generate_series(s.d0, s.d1)) AS g(day)
            LEFT JOIN counts c
              ON c.event_type = t.event_type AND c.day = g.day),
        b_shift AS (
            SELECT event_type AS type_b, y AS yb, u.l AS lag,
                   day - u.l AS day
            FROM dense CROSS JOIN unnest(generate_series(0, 7)) AS u(l)),
        paired AS (
            SELECT a.event_type AS type_a, b.type_b, b.lag,
                   a.y AS ya, b.yb
            FROM dense a JOIN b_shift b ON a.day = b.day
            WHERE a.event_type <> b.type_b),
        stats AS (
            SELECT type_a, type_b, lag, count(*) AS n,
                   SUM(CAST(ya AS HUGEINT)) AS sa,
                   SUM(CAST(yb AS HUGEINT)) AS sb,
                   SUM(CAST(ya AS HUGEINT) * CAST(yb AS HUGEINT)) AS sab,
                   SUM(CAST(ya AS HUGEINT) * CAST(ya AS HUGEINT)) AS saa,
                   SUM(CAST(yb AS HUGEINT) * CAST(yb AS HUGEINT)) AS sbb
            FROM paired GROUP BY 1, 2, 3)
        SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag,
               CAST(n AS BIGINT) AS n_days,
               {analytics.CORR_FINAL_SQL} AS xcorr
        FROM stats WHERE lag < n
        ORDER BY type_a, type_b, lag
    """

    # Jensen–Shannon vs rest-of-corpus: union-support spine, shared
    # JS_TERM_SQL halves, decimal accumulation
    sql["js_divergence"] = f"""
        WITH tfc AS (
            SELECT source, term, count(*) AS c_st
            FROM (SELECT source, unnest({_TOKS}) AS term FROM documents)
            GROUP BY 1, 2),
        st AS (SELECT source, sum(c_st) AS n_s FROM tfc GROUP BY 1),
        tt AS (SELECT term, sum(c_st) AS c_t FROM tfc GROUP BY 1),
        tot AS (SELECT sum(n_s) AS n_total FROM st),
        rows_ AS (
            SELECT sp.source,
                   coalesce(f.c_st, 0) AS c_st,
                   st.n_s,
                   tt.c_t - coalesce(f.c_st, 0) AS c_rest,
                   tot.n_total - st.n_s AS n_rest
            FROM tt CROSS JOIN (SELECT source FROM st) sp
            LEFT JOIN tfc f ON f.source = sp.source AND f.term = tt.term
            JOIN st ON st.source = sp.source
            CROSS JOIN tot
            WHERE tot.n_total - st.n_s > 0)
        SELECT source,
               CAST(sum(CASE WHEN c_st > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_terms_src,
               CAST(sum(CAST({pipeline.JS_TERM_SQL} AS DECIMAL(38,9)))
                    AS DOUBLE) AS js_nats,
               round(sqrt(greatest(
                   CAST(sum(CAST({pipeline.JS_TERM_SQL} AS DECIMAL(38,9)))
                        AS DOUBLE), 0.0)), 9) AS js_distance
        FROM rows_ GROUP BY source ORDER BY source
    """

    # Count-Min audit: identical md5 placement on both engines, bucket
    # totals over the #types reduction, min-fold, one-sided verdict
    sql["countmin_types"] = """
        WITH exact AS (SELECT event_type, count(*) AS exact_n
                       FROM events GROUP BY 1),
        hashed AS (
            SELECT event_type, exact_n, d.d,
                   CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                        || event_type), 1, 15) AS BIGINT) % 64 AS bucket
            FROM exact CROSS JOIN (SELECT unnest(range(0, 4)) AS d) d),
        cells AS (SELECT d, bucket, sum(exact_n) AS cell_total
                  FROM hashed GROUP BY 1, 2)
        SELECT h.event_type,
               CAST(first(h.exact_n) AS BIGINT) AS exact_n,
               CAST(min(c.cell_total) AS BIGINT) AS cm_estimate,
               CAST(min(c.cell_total) - first(h.exact_n) AS BIGINT)
                   AS overshoot,
               min(c.cell_total) >= first(h.exact_n) AS never_under
        FROM hashed h JOIN cells c ON c.d = h.d AND c.bucket = h.bucket
        GROUP BY h.event_type
        ORDER BY h.event_type
    """

    # Gopher rules over the injected fixture; every ratio rule is an
    # integer cross-multiplication on both engines
    sql["gopher_rule_filter"] = f"""
        WITH inj AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 6 = 0 THEN ' ### ### ... ...'
                        ELSE '' END ||
                   CASE WHEN doc_id % 10 = 0
                        THEN ' ' || repeat('12345 ', 29) || '12345'
                        ELSE '' END ||
                   CASE WHEN doc_id % 9 = 0
                        THEN ' ' || repeat('z', 120) || ' ' || repeat('z', 120)
                             || ' ' || repeat('z', 120) || ' ' || repeat('z', 120)
                             || ' ' || repeat('z', 120)
                        ELSE '' END AS text
            FROM documents),
        s AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_words,
                   coalesce(list_sum(list_transform({_TOKS},
                       t -> CAST(length(t) AS BIGINT))), 0) AS total_chars,
                   (length(text) - length(replace(text, '#', '')))
                   + (length(text) - length(replace(text, '...', ''))) // 3
                       AS n_symbols,
                   len(list_filter({_TOKS},
                       t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
                   (CASE WHEN list_contains({_TOKS}, 'the') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'a') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'of') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'and') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'to') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'in') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'that') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains({_TOKS}, 'with') THEN 1 ELSE 0 END)
                       AS n_stop
            FROM inj),
        r AS (
            SELECT doc_id, n_words, total_chars, n_symbols, n_alpha, n_stop,
                   n_words >= 50 AND n_words <= 100000 AS word_count_ok,
                   total_chars >= 3 * n_words
                   AND total_chars <= 10 * n_words
                   AND n_words > 0 AS mean_word_len_ok,
                   10 * n_symbols <= n_words AS symbol_ratio_ok,
                   5 * n_alpha >= 4 * n_words AS alpha_ratio_ok,
                   n_stop >= 2 AS has_stopwords
            FROM s)
        SELECT doc_id, n_words,
               round(CASE WHEN n_words > 0 THEN
                     CAST(total_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                     END, 9) AS mean_word_len,
               word_count_ok, mean_word_len_ok, symbol_ratio_ok,
               alpha_ratio_ok, has_stopwords,
               word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
               AND alpha_ratio_ok AND has_stopwords AS keep
        FROM r ORDER BY doc_id
    """

    # OOV audit: vocabulary = top-16 by (count DESC, term ASC); exact
    # integer mass sums, one pinned division
    sql["oov_rate"] = f"""
        WITH tfc AS (
            SELECT source, term, count(*) AS c_st
            FROM (SELECT source, unnest({_TOKS}) AS term FROM documents)
            GROUP BY 1, 2),
        tot AS (SELECT term, sum(c_st) AS c_t FROM tfc GROUP BY 1),
        vocab AS (SELECT term FROM tot ORDER BY c_t DESC, term LIMIT 16),
        src AS (SELECT source, sum(c_st) AS n_tokens, count(*) AS n_terms
                FROM tfc GROUP BY 1),
        oov AS (SELECT source, sum(c_st) AS n_oov,
                       count(*) AS n_oov_terms
                FROM tfc WHERE term NOT IN (SELECT term FROM vocab)
                GROUP BY 1)
        SELECT s.source,
               CAST(s.n_tokens AS BIGINT) AS n_tokens,
               CAST(s.n_terms AS BIGINT) AS n_terms,
               CAST(coalesce(o.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(o.n_oov_terms, 0) AS BIGINT) AS n_oov_terms,
               round(CAST(coalesce(o.n_oov, 0) AS DOUBLE)
                     / CAST(s.n_tokens AS DOUBLE), 9) AS oov_rate
        FROM src s LEFT JOIN oov o USING (source)
        ORDER BY s.source
    """

    # boilerplate-line removal over the injected line fixture: lines
    # in > 20 distinct docs vanish everywhere; reassembly preserves
    # line order; row count is input-stable
    sql["line_dedup"] = r"""
        WITH inj AS (
            SELECT doc_id,
                   regexp_replace(text, '((?:\S+\s+){7}\S+)\s+',
                                  '\1' || chr(10), 'g')
                   || CASE WHEN doc_id % 4 = 0
                           THEN chr(10) || 'subscribe to our newsletter today'
                           ELSE '' END
                   || CASE WHEN doc_id % 6 = 0
                           THEN chr(10) || 'all rights reserved worldwide'
                           ELSE '' END AS text
            FROM documents),
        base AS (SELECT doc_id,
                        len(string_split(text, chr(10))) AS n_lines
                 FROM inj),
        e2 AS (
            SELECT doc_id, u.line AS line, u.pos AS pos
            FROM (SELECT doc_id,
                         unnest(list_transform(string_split(text, chr(10)),
                             (x, i) -> struct_pack(line := x, pos := i))) AS u
                  FROM inj)),
        dfq AS (SELECT line, count(DISTINCT doc_id) AS df
                FROM e2 GROUP BY 1),
        kept AS (SELECT e2.doc_id, e2.line, e2.pos
                 FROM e2 JOIN dfq USING (line) WHERE df <= 20),
        k AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(line, chr(10) ORDER BY pos) AS txt
              FROM kept GROUP BY 1)
        SELECT b.doc_id,
               CAST(b.n_lines AS BIGINT) AS n_lines,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(b.n_lines - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
               coalesce(k.txt, '') AS clean_text
        FROM base b LEFT JOIN k USING (doc_id)
        ORDER BY b.doc_id
    """

    # co-occurrence graph: one distinct, user-keyed pair expansion
    # (bounded per-user fanout), exact integer overlaps
    sql["cooccurrence_edges"] = """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        counts AS (SELECT event_type, count(*) AS n_users
                   FROM ut GROUP BY 1),
        edges AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS shared_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT type_a, type_b,
               CAST(ca.n_users AS BIGINT) AS users_a,
               CAST(cb.n_users AS BIGINT) AS users_b,
               CAST(shared_users AS BIGINT) AS shared_users,
               round(CAST(shared_users AS DOUBLE)
                     / CAST(ca.n_users + cb.n_users - shared_users
                            AS DOUBLE), 9) AS jaccard
        FROM edges
        JOIN counts ca ON ca.event_type = type_a
        JOIN counts cb ON cb.event_type = type_b
        ORDER BY type_a, type_b
    """

    # ordered triangle enumeration (a < b < c exactly once); support =
    # bottleneck pairwise overlap
    sql["type_triangles"] = """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        edges AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS shared_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
            HAVING count(*) >= 2)
        SELECT ab.type_a, ab.type_b, bc.type_b AS type_c,
               CAST(ab.shared_users AS BIGINT) AS w_ab,
               CAST(bc.shared_users AS BIGINT) AS w_bc,
               CAST(ac.shared_users AS BIGINT) AS w_ac,
               CAST(least(ab.shared_users, bc.shared_users,
                          ac.shared_users) AS BIGINT) AS support
        FROM edges ab
        JOIN edges bc ON bc.type_a = ab.type_b
        JOIN edges ac ON ac.type_a = ab.type_a AND ac.type_b = bc.type_b
        ORDER BY 1, 2, 3
    """

    # -- association + two-sample testing panel: shared pinned-order
    #    term strings interpolated from the analytics module so the
    #    two engines can never drift --
    _cells_cte = """
        cells AS (
            SELECT event_type,
                   (epoch_us(ts) // 86400000000) % 7 AS dow,
                   count(*) AS obs
            FROM events GROUP BY 1, 2),
        rm AS (SELECT event_type, sum(obs) AS r FROM cells GROUP BY 1),
        cm AS (SELECT dow, sum(obs) AS c FROM cells GROUP BY 1),
        tot AS (SELECT sum(obs) AS n,
                       count(DISTINCT event_type) AS n_types,
                       count(DISTINCT dow) AS n_dows
                FROM cells)
    """

    sql["cramers_v"] = f"""
        WITH {_cells_cte},
        terms AS (
            SELECT CAST({analytics.CHI2V_TERM_SQL} AS DECIMAL(38,9)) AS t,
                   n, n_types, n_dows
            FROM cells JOIN rm USING (event_type) JOIN cm USING (dow)
            CROSS JOIN tot)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n_types AS INTEGER) AS n_types,
               CAST(n_dows AS INTEGER) AS n_dows,
               CAST(CAST(sum(t) AS DECIMAL(30,9))
                    - CAST(n AS DECIMAL(20,0)) AS DOUBLE) AS chi2,
               CAST((n_types - 1) * (n_dows - 1) AS INTEGER) AS dof,
               round(sqrt(greatest(CAST(CAST(sum(t) AS DECIMAL(30,9))
                              - CAST(n AS DECIMAL(20,0)) AS DOUBLE), 0.0)
                     / (CAST(n AS DOUBLE)
                        * CAST(least(n_types - 1, n_dows - 1) AS DOUBLE))), 9)
                   AS cramers_v
        FROM terms GROUP BY n, n_types, n_dows
    """

    sql["mutual_information"] = f"""
        WITH {_cells_cte},
        mi AS (
            SELECT sum(CAST({analytics.MI_TERM_SQL} AS DECIMAL(38,9))) AS mi,
                   count(*) AS n_cells
            FROM cells JOIN rm USING (event_type) JOIN cm USING (dow)
            CROSS JOIN tot),
        hr AS (SELECT sum(CAST({analytics.ENT_TERM_SQL} AS DECIMAL(38,9)))
                   AS h_type
               FROM (SELECT r AS m FROM rm) CROSS JOIN tot),
        hc AS (SELECT sum(CAST({analytics.ENT_TERM_SQL} AS DECIMAL(38,9)))
                   AS h_dow
               FROM (SELECT c AS m FROM cm) CROSS JOIN tot)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n_cells AS BIGINT) AS n_cells,
               CAST(mi AS DOUBLE) AS mi_nats,
               CAST(h_type AS DOUBLE) AS h_type,
               CAST(h_dow AS DOUBLE) AS h_dow,
               round(CASE WHEN h_type > 0 AND h_dow > 0 THEN
                     CAST(mi AS DOUBLE)
                     / sqrt(CAST(h_type AS DOUBLE) * CAST(h_dow AS DOUBLE))
                     END, 9) AS nmi
        FROM mi CROSS JOIN hr CROSS JOIN hc CROSS JOIN tot
    """

    _welch_var_ref = analytics.WELCH_VAR_SQL.format(n="n", sx="sx", sxx="sxx")
    sql["welch_ttest"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        sides AS (
            SELECT event_type,
                   epoch_us(ts) <= (mn + mx) // 2 AS is_ref,
                   count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,2))) AS sx,
                   sum(CAST(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))
                            AS DECIMAL(38,4))) AS sxx
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        ref AS (SELECT event_type, n AS n_ref,
                       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9)
                           AS mean_ref,
                       {_welch_var_ref} AS var_ref
                FROM sides WHERE is_ref),
        cur AS (SELECT event_type, n AS n_cur,
                       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9)
                           AS mean_cur,
                       {_welch_var_ref} AS var_cur
                FROM sides WHERE NOT is_ref)
        SELECT event_type,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               mean_ref, mean_cur, var_ref, var_cur,
               CASE WHEN var_ref + var_cur > 0
                    THEN {analytics.WELCH_T_SQL} END AS t_stat,
               CASE WHEN var_ref + var_cur > 0
                    THEN {analytics.WELCH_DF_SQL} END AS welch_df
        FROM ref JOIN cur USING (event_type)
        WHERE n_ref >= 2 AND n_cur >= 2
        ORDER BY event_type
    """

    sql["mannwhitney_u"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS c_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS c_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        ranked AS (
            SELECT event_type, c_ref, c_cur, c_ref + c_cur AS t,
                   SUM(c_ref + c_cur) OVER (
                       PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (c_ref + c_cur) AS cum_before
            FROM pv),
        agg AS (
            SELECT event_type,
                   SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(2 * cum_before + t + 1 AS HUGEINT)) AS r2_ref,
                   SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                       * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie_cube
            FROM ranked GROUP BY 1),
        fin AS (
            SELECT event_type,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   r2_ref - CAST(n_ref AS HUGEINT)
                       * CAST(n_ref + 1 AS HUGEINT) AS u2,
                   n_ref + n_cur AS nt,
                   tie_cube
            FROM agg WHERE n_ref >= 1 AND n_cur >= 1)
        SELECT event_type, n_ref, n_cur,
               CAST(u2 AS DOUBLE) / 2 AS u_stat,
               CAST(tie_cube AS BIGINT) AS tie_cube,
               CAST(u2 - CAST(n_ref AS HUGEINT)
                    * CAST(n_cur AS HUGEINT) AS BIGINT) AS z_num,
               CAST(CAST(nt AS HUGEINT) * CAST(nt AS HUGEINT)
                    * CAST(nt AS HUGEINT) - CAST(nt AS HUGEINT)
                    - tie_cube AS BIGINT) AS tie_term
        FROM fin ORDER BY event_type
    """

    # ---- round-7 additions ----

    # streaming twins: availableNow state == the batch reduction, so
    # the batch oracles apply verbatim (the streaming_ks_drift rule)
    sql["streaming_psi_drift"] = sql["psi_drift"]
    sql["streaming_mannwhitney"] = sql["mannwhitney_u"]
    sql["streaming_welch"] = sql["welch_ttest"]
    sql["streaming_moment_stats"] = sql["moment_stats"]
    sql["streaming_cramers_v"] = sql["cramers_v"]
    sql["streaming_mutual_information"] = sql["mutual_information"]

    # per-character entropy: ENT-style pinned round(9) per-count term,
    # exact DECIMAL(28,9) accumulation, one pinned final composition
    sql["char_entropy"] = """
        WITH ex AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch
            FROM documents),
        pc AS (SELECT doc_id, ch, count(*) AS c FROM ex GROUP BY 1, 2),
        agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)),
                                       9) AS DECIMAL(28,9))) AS DECIMAL(28,9))
                       AS s_clnc
            FROM pc GROUP BY doc_id)
        SELECT doc_id, n_chars, n_distinct,
               CAST(s_clnc AS DOUBLE) AS s_clnc,
               round(round(ln(CAST(n_chars AS DOUBLE)), 9)
                     - CAST(s_clnc AS DOUBLE) / CAST(n_chars AS DOUBLE), 9)
                   AS entropy_nats
        FROM agg ORDER BY doc_id
    """

    sql["lang_mismatch_audit"] = f"""
        WITH s AS (
            SELECT doc_id, source, lang,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('en')}))) AS INTEGER) AS score_en,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('de')}))) AS INTEGER) AS score_de,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('es')}))) AS INTEGER) AS score_es,
                   CAST(len(list_filter({_TOKS}, x -> x IN ({_stoplist('fr')}))) AS INTEGER) AS score_fr
            FROM documents),
        g AS (SELECT *, greatest(score_de, score_en, score_es, score_fr) AS best
              FROM s),
        ided AS (
            SELECT doc_id, source, lang,
                   CASE WHEN best = 0 THEN 'unknown'
                        WHEN score_de = best THEN 'de'
                        WHEN score_en = best THEN 'en'
                        WHEN score_es = best THEN 'es'
                        WHEN score_fr = best THEN 'fr' END AS lang_guess
            FROM g)
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_match,
               CAST(sum(CASE WHEN lang_guess = 'unknown' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unknown,
               CAST(count(*)
                    - sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END)
                    - sum(CASE WHEN lang_guess = 'unknown' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_conflict,
               CAST(sum(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS match_rate
        FROM ided GROUP BY 1, 2 ORDER BY source, lang
    """

    sql["cross_source_dup_matrix"] = f"""
        WITH mir AS (
            SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 50000000 AS doc_id, text,
                   'mirror-of-' || source AS source
            FROM documents WHERE doc_id % 23 = 0),
        {_portable_sig_ctes('mp_', 'mir', 4)},
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM mp_banded a JOIN mp_banded b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
        sets AS (SELECT DISTINCT doc_id, h FROM mp_hs),
        sz AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY 1),
        it AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
               FROM cand c
               JOIN sets x ON x.doc_id = c.doc_a
               JOIN sets y ON y.doc_id = c.doc_b AND y.h = x.h
               GROUP BY 1, 2),
        pr AS (SELECT i.doc_a, i.doc_b,
                      CAST(n_inter AS DOUBLE)
                      / CAST(a.n + b.n - n_inter AS DOUBLE) AS jaccard
               FROM it i
               JOIN sz a ON i.doc_a = a.doc_id
               JOIN sz b ON i.doc_b = b.doc_id
               WHERE CAST(n_inter AS DOUBLE)
                     / CAST(a.n + b.n - n_inter AS DOUBLE) >= 0.5),
        lab AS (SELECT least(sa.source, sb.source) AS source_a,
                       greatest(sa.source, sb.source) AS source_b,
                       CAST(round(jaccard, 9) AS DECIMAL(28,9)) AS j9
                FROM pr
                JOIN mir sa ON pr.doc_a = sa.doc_id
                JOIN mir sb ON pr.doc_b = sb.doc_id)
        SELECT source_a, source_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(j9) AS DOUBLE) AS sum_jaccard,
               CAST(sum(j9) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_jaccard
        FROM lab GROUP BY 1, 2 ORDER BY source_a, source_b
    """

    sql["payload_dedup"] = """
        WITH u AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 40000000 AS doc_id, text
            FROM documents WHERE doc_id % 11 = 0),
        m AS (SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS payload_bytes,
                     list_reduce(
                         list_transform(
                             list_filter(string_split(text, ''), c -> c <> ''),
                             c -> CAST(ascii(c) AS BIGINT)),
                         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
              FROM u)
        SELECT min(doc_id) AS keeper_doc_id, payload_bytes, checksum,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST((count(*) - 1) * payload_bytes AS BIGINT)
                   AS reclaimable_bytes
        FROM m GROUP BY payload_bytes, checksum ORDER BY keeper_doc_id
    """

    # paraphrase-level cross-split leakage: the embedding_near_dups
    # pair relation (nested verbatim) + the assign_split md5-bucket
    # rule on each side, rolled up per unordered split pair
    _SPB = "CAST('0x' || substr(md5(CAST({v} AS VARCHAR)), 1, 8) AS BIGINT) % 100"
    _SPLIT_CASE = (
        "CASE WHEN " + _SPB + " < 90 THEN 'train'"
        " WHEN " + _SPB + " < 95 THEN 'val' ELSE 'test' END"
    )
    sql["split_embedding_leakage"] = f"""
        WITH pr AS ({sql["embedding_near_dups"]}),
        lab AS (SELECT cos_sim,
                       {_SPLIT_CASE.format(v="vec_a")} AS sp_a,
                       {_SPLIT_CASE.format(v="vec_b")} AS sp_b
                FROM pr)
        SELECT least(sp_a, sp_b) AS split_a,
               greatest(sp_a, sp_b) AS split_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CAST(cos_sim AS DECIMAL(28,9))) AS DOUBLE)
                   AS sum_cos_sim,
               CAST(sum(CAST(cos_sim AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_cos_sim,
               CAST(max(CAST(cos_sim AS DECIMAL(28,9))) AS DOUBLE)
                   AS max_cos_sim
        FROM lab WHERE sp_a <> sp_b
        GROUP BY 1, 2 ORDER BY split_a, split_b
    """

    sql["distinct_ngram_ratio"] = f"""
        WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
        p AS (SELECT source, n, toks,
                     unnest(range(1, len(toks) - n + 2)) AS i
              FROM t, (VALUES (1),(2),(3)) tn(n)
              WHERE len(toks) >= n),
        g AS (SELECT source, CAST(n AS INT) AS n,
                     array_to_string(toks[i : i + n - 1], ' ') AS gram
              FROM p),
        pg AS (SELECT source, n, gram, count(*) AS cnt
               FROM g GROUP BY 1, 2, 3)
        SELECT source, n,
               CAST(sum(cnt) AS BIGINT) AS total_ngrams,
               CAST(count(*) AS BIGINT) AS distinct_ngrams,
               CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                   AS distinct_ratio
        FROM pg GROUP BY source, n ORDER BY source, n
    """

    sql["pii_density_by_source"] = f"""
        WITH inj AS (
            SELECT source,
                   text ||
                   CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0
                        THEN ' from host 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                        ELSE '' END AS text
            FROM documents),
        per AS (
            SELECT source,
                   CAST(length(text) AS BIGINT) AS chars,
                   CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{_PII["ip"]}')) AS INTEGER) AS n_ips,
                   CAST(len(regexp_extract_all(text, '{_PII["phone"]}')) AS INTEGER) AS n_phones
            FROM inj)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(chars) AS BIGINT) AS n_chars,
               CAST(sum(n_emails) AS BIGINT) AS n_emails,
               CAST(sum(n_ips) AS BIGINT) AS n_ips,
               CAST(sum(n_phones) AS BIGINT) AS n_phones,
               CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
               CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS doc_pii_rate,
               round(CAST(sum(n_emails) + sum(n_ips) + sum(n_phones) AS DOUBLE)
                     * 10000.0 / CAST(sum(chars) AS DOUBLE), 9)
                   AS hits_per_10k_chars
        FROM per GROUP BY source ORDER BY source
    """

    # the portable-simhash oracle generator at the histogram's wider
    # radius, nested verbatim, reduced to the per-distance panel
    sql["simhash_distance_hist"] = f"""
        WITH p AS ({_simhash_portable_oracle(8)})
        SELECT hamming,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(count(*)) OVER (ORDER BY hamming
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pairs
        FROM p GROUP BY hamming ORDER BY hamming
    """

    sql["sample_skew_audit"] = f"""
        WITH s AS (SELECT source, {_HB} % 100 AS hb FROM documents),
        a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pop,
                     CAST(sum(CASE WHEN hb < 10 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_sample
              FROM s GROUP BY source)
        SELECT source, n_pop, n_sample,
               round(CAST(n_sample AS DOUBLE) / CAST(n_pop AS DOUBLE), 9)
                   AS sample_rate,
               round(CAST(n_pop AS DOUBLE) * (CAST(10 AS DOUBLE) / 100.0), 9)
                   AS expected,
               round((CAST(n_sample AS DOUBLE)
                      - CAST(n_pop AS DOUBLE) * (CAST(10 AS DOUBLE) / 100.0))
                     / sqrt(CAST(n_pop AS DOUBLE) * (CAST(10 AS DOUBLE) / 100.0)
                            * (1.0 - (CAST(10 AS DOUBLE) / 100.0))), 9)
                   AS std_residual
        FROM a ORDER BY source
    """

    # content-defined chunking: grams substring(i, 8) → 60-bit md5
    # hash; cut at gram-end where h % 64 = 0 plus doc end; chunks
    # between consecutive cuts; dup = not the first (doc_id, start)
    # occurrence of the chunk md5
    sql["cdc_chunk_dedup"] = f"""
        WITH base AS (
            SELECT doc_id, source,
                   text || CASE WHEN doc_id % 9 = 0 THEN '{_CDC_SEG}'
                                ELSE '' END AS text
            FROM documents),
        d AS (SELECT doc_id, source, text, length(text) AS len
              FROM base WHERE length(text) > 0),
        g AS (SELECT doc_id, i + 7 AS cut,
                     CAST('0x' || substr(md5(substr(text, i, 8)), 1, 15)
                          AS BIGINT) AS h
              FROM (SELECT doc_id, text,
                           unnest(range(1, len - 6)) AS i
                    FROM d)),
        cuts AS (SELECT doc_id, cut FROM g WHERE h % 64 = 0
                 UNION SELECT doc_id, len AS cut FROM d),
        pr AS (SELECT doc_id, cut,
                      COALESCE(lag(cut) OVER (PARTITION BY doc_id
                                              ORDER BY cut), 0) AS prev
               FROM cuts),
        ch AS (SELECT pr.doc_id, d.source, prev + 1 AS start,
                      substr(d.text, prev + 1, cut - prev) AS chunk
               FROM pr JOIN d ON pr.doc_id = d.doc_id),
        att AS (SELECT source, CAST(length(chunk) AS BIGINT) AS clen,
                       row_number() OVER (PARTITION BY md5(chunk)
                                          ORDER BY doc_id, start) AS rn
                FROM ch)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(clen) AS BIGINT) AS chunk_chars,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_occurrences,
               CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT)
                   AS dup_chars,
               CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS DOUBLE)
                   / CAST(sum(clen) AS DOUBLE) AS dup_ratio
        FROM att GROUP BY source ORDER BY source
    """

    sql["bloom_fpr_audit"] = """
        WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u FROM events),
        ref AS (SELECT u FROM u WHERE u % 2 = 0),
        probe AS (SELECT u FROM u WHERE u % 2 = 1),
        bits AS (SELECT DISTINCT
                     CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                             || CAST(u AS VARCHAR)), 1, 8)
                          AS BIGINT) % 1024 AS bit
                 FROM ref, (VALUES (0),(1),(2),(3)) t(j)),
        pb AS (SELECT u,
                     CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                             || CAST(u AS VARCHAR)), 1, 8)
                          AS BIGINT) % 1024 AS bit
               FROM probe, (VALUES (0),(1),(2),(3)) t(j)),
        fp AS (SELECT u FROM pb JOIN bits USING (bit)
               GROUP BY u HAVING count(*) = 4),
        c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ref) AS n_ref_users,
                     (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probe_users,
                     (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
                     (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_false_positives)
        SELECT n_ref_users, n_probe_users, n_bits_set, n_false_positives,
               CASE WHEN n_probe_users > 0 THEN
                    round(CAST(n_false_positives AS DOUBLE)
                          / CAST(n_probe_users AS DOUBLE), 9) END AS fpr_observed,
               round(((CAST(n_bits_set AS DOUBLE) / 1024.0)
                      * (CAST(n_bits_set AS DOUBLE) / 1024.0))
                     * ((CAST(n_bits_set AS DOUBLE) / 1024.0)
                        * (CAST(n_bits_set AS DOUBLE) / 1024.0)), 9)
                   AS fpr_expected
        FROM c
    """

    sql["template_prefix_groups"] = r"""
        WITH inj AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 5 = 0
                        THEN 'TEMPLATE HEADER v1 all rights reserved ' || text
                        ELSE text END AS text
            FROM documents),
        n AS (SELECT doc_id, source,
                     substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                            1, 40) AS prefix,
                     CAST(length(text) AS BIGINT) AS chars
              FROM inj)
        SELECT source, prefix,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS example_doc_id,
               CAST(sum(chars) AS BIGINT) AS total_chars
        FROM n GROUP BY source, prefix
        HAVING count(*) >= 3
        ORDER BY source, prefix
    """

    sql["contamination_by_source"] = f"""
        WITH h AS ({sql["decontaminate_13gram"]}),
        per AS (SELECT d.source, h.n_hit_shingles
                FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_hit_shingles IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(sum(COALESCE(n_hit_shingles, 0)) AS BIGINT)
                   AS n_hit_shingles,
               CAST(sum(CASE WHEN n_hit_shingles IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS contamination_rate
        FROM per GROUP BY source ORDER BY source
    """

    # audio framing: samples = ascii(byte) - 100 (ASCII corpus pins
    # byte == char); frame f covers samples f*hop+1 .. f*hop+frame;
    # energy is an exact integer sum of squares
    sql["audio_frame_energy"] = """
        WITH codes AS (
            SELECT doc_id,
                   list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                                  c -> CAST(ascii(c) AS BIGINT) - 100) AS s
            FROM documents),
        f AS (SELECT doc_id, s,
                     unnest(range(0, (len(s) - 32) // 16 + 1)) AS frame_no
              FROM codes WHERE len(s) >= 32)
        SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
               CAST(32 AS INT) AS n_samples,
               CAST(list_sum(list_transform(s[frame_no*16 + 1 : frame_no*16 + 32],
                                            x -> x * x)) AS BIGINT) AS energy
        FROM f ORDER BY doc_id, frame_no
    """

    sql["negative_samples"] = """
        WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label
                   FROM embeddings WHERE vec_id % 97 = 0),
        c AS (SELECT vec_id AS neg_id, label AS neg_label FROM embeddings),
        j AS (SELECT anchor_id, anchor_label, neg_id, neg_label,
                     md5(CAST(anchor_id AS VARCHAR) || '|'
                         || CAST(neg_id AS VARCHAR)) AS sample_key
              FROM c JOIN a ON neg_label <> anchor_label),
        r AS (SELECT *,
                     CAST(row_number() OVER (PARTITION BY anchor_id
                              ORDER BY sample_key, neg_id) AS INTEGER)
                         AS neg_rank
              FROM j)
        SELECT anchor_id, anchor_label, neg_rank, neg_id, neg_label, sample_key
        FROM r WHERE neg_rank <= 5
        ORDER BY anchor_id, neg_rank
    """

    # incremental_dedup_near's full pipeline + within-batch transitive
    # near-dup collapse: kept docs sign again, band self-join a<b,
    # exact-Jaccard verify, recursive min-label closure (the
    # dedup_keepers reach CTE), keep only cluster minima
    sql["incremental_dedup_near_transitive"] = f"""
        WITH RECURSIVE oldt AS (SELECT doc_id, text FROM documents),
        newt AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
            FROM documents WHERE doc_id % 17 <> 0
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN array_to_string(list_reverse({_TOKS}), ' ')
                        WHEN doc_id % 3 = 1 THEN text || ' brand-new'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 29 = 0
            UNION ALL
            SELECT doc_id + 20000000 AS doc_id,
                   array_to_string(list_reverse({_TOKS}), ' ') || ' alpha' AS text
            FROM documents WHERE doc_id % 31 = 0
            UNION ALL
            SELECT doc_id + 30000000 AS doc_id,
                   array_to_string(list_reverse({_TOKS}), ' ') || ' beta' AS text
            FROM documents WHERE doc_id % 31 = 0),
        o AS (SELECT doc_id, md5(text) AS fp FROM oldt),
        n AS (SELECT doc_id, md5(text) AS fp FROM newt),
        ch AS (SELECT n.doc_id AS doc_id, n.fp AS fp,
                      CASE WHEN o.fp IS NULL THEN 'added' ELSE 'changed' END AS status
               FROM n LEFT JOIN o ON n.doc_id = o.doc_id
               WHERE o.fp IS NULL OR o.fp <> n.fp),
        rr AS (SELECT doc_id, fp, status,
                      row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
               FROM ch),
        surv AS (SELECT doc_id, status FROM rr
                 WHERE rn = 1 AND fp NOT IN (SELECT fp FROM o)),
        sn AS (SELECT s.doc_id, t.text FROM surv s
               JOIN newt t ON s.doc_id = t.doc_id),
        {_portable_sig_ctes('nw_', 'sn', 3)},
        {_portable_sig_ctes('od_', 'oldt', 3)},
        cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
                 FROM nw_banded a JOIN od_banded b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key),
        nsets AS (SELECT DISTINCT doc_id, h FROM nw_hs),
        osets AS (SELECT DISTINCT doc_id, h FROM od_hs),
        nsz AS (SELECT doc_id, count(*) AS n FROM nsets GROUP BY doc_id),
        osz AS (SELECT doc_id, count(*) AS n FROM osets GROUP BY doc_id),
        inter AS (SELECT c.new_id, c.old_id, count(*) AS n_inter
                  FROM cand c
                  JOIN nsets x ON x.doc_id = c.new_id
                  JOIN osets y ON y.doc_id = c.old_id AND y.h = x.h
                  GROUP BY 1, 2),
        near AS (SELECT DISTINCT i.new_id
                 FROM inter i
                 JOIN nsz ON i.new_id = nsz.doc_id
                 JOIN osz ON i.old_id = osz.doc_id
                 WHERE CAST(n_inter AS DOUBLE)
                       / CAST(nsz.n + osz.n - n_inter AS DOUBLE) >= 0.5),
        kept AS (SELECT doc_id, status FROM surv
                 WHERE doc_id NOT IN (SELECT new_id FROM near)),
        c2 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM nw_banded a JOIN nw_banded b
                 ON a.band_id = b.band_id AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
               WHERE a.doc_id IN (SELECT doc_id FROM kept)
                 AND b.doc_id IN (SELECT doc_id FROM kept)),
        i2 AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
               FROM c2 c
               JOIN nsets x ON x.doc_id = c.doc_a
               JOIN nsets y ON y.doc_id = c.doc_b AND y.h = x.h
               GROUP BY 1, 2),
        pr AS (SELECT i.doc_a, i.doc_b
               FROM i2 i
               JOIN nsz a ON i.doc_a = a.doc_id
               JOIN nsz b ON i.doc_b = b.doc_id
               WHERE CAST(n_inter AS DOUBLE)
                     / CAST(a.n + b.n - n_inter AS DOUBLE) >= 0.5),
        und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                UNION ALL
                SELECT doc_b, doc_a FROM pr),
        reach(node, rb) AS (
            SELECT a, b FROM und
            UNION
            SELECT w.node, u.b FROM reach w JOIN und u ON w.rb = u.a),
        labels AS (
            SELECT node, least(node, min(rb)) AS cluster_id
            FROM reach GROUP BY node)
        SELECT doc_id, status FROM kept
        WHERE doc_id NOT IN (SELECT node FROM labels WHERE cluster_id <> node)
        ORDER BY doc_id
    """

    # Gopher n-gram repetition: grams joined by single spaces, char
    # mass = cnt·length(gram); top = most frequent, count ties to the
    # larger mass; rows only where the doc has >= n tokens
    sql["gopher_repetition"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        base AS (SELECT doc_id, toks,
                        CAST(length(array_to_string(toks, ' ')) AS BIGINT)
                            AS total_chars
                 FROM t),
        p AS (SELECT doc_id, total_chars, n, toks,
                     unnest(range(1, len(toks) - n + 2)) AS i
              FROM base, (VALUES (2),(3),(4)) tn(n)
              WHERE len(toks) >= n),
        g AS (SELECT doc_id, total_chars, CAST(n AS INT) AS n,
                     array_to_string(toks[i : i + n - 1], ' ') AS gram
              FROM p),
        pg AS (SELECT doc_id, total_chars, n, gram, count(*) AS cnt,
                      count(*) * CAST(length(gram) AS BIGINT) AS mass
               FROM g GROUP BY 1, 2, 3, 4),
        win AS (SELECT *, max(cnt) OVER (PARTITION BY doc_id, n) AS top_cnt
                FROM pg)
        SELECT doc_id, n, total_chars,
               CAST(max(top_cnt) AS BIGINT) AS top_cnt,
               CAST(max(CASE WHEN cnt = top_cnt THEN mass END) AS BIGINT)
                   AS top_mass,
               CAST(COALESCE(sum(CASE WHEN cnt >= 2 THEN mass END), 0) AS BIGINT)
                   AS dup_mass,
               CAST(max(CASE WHEN cnt = top_cnt THEN mass END) AS DOUBLE)
                   / CAST(total_chars AS DOUBLE) AS top_frac,
               CAST(COALESCE(sum(CASE WHEN cnt >= 2 THEN mass END), 0) AS DOUBLE)
                   / CAST(total_chars AS DOUBLE) AS dup_frac
        FROM win GROUP BY doc_id, n, total_chars
        ORDER BY doc_id, n
    """

    # within-doc duplicate line/paragraph fractions: a unit occurring
    # c times contributes c-1 dup occurrences and (c-1)·len dup chars
    sql["gopher_line_repetition"] = r"""
        WITH inj AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 4 = 0
                           THEN chr(10) || 'repeat me' || chr(10) || 'repeat me'
                           ELSE '' END
                   || CASE WHEN doc_id % 6 = 0
                           THEN chr(10) || 'once only' ELSE '' END
                   || CASE WHEN doc_id % 8 = 0
                           THEN chr(10) || chr(10) || 'same para'
                                || chr(10) || chr(10) || 'same para'
                           ELSE '' END AS text
            FROM documents),
        lu AS (
            SELECT doc_id, u, count(*) AS c FROM (
                SELECT doc_id, unnest(string_split_regex(text, '\n')) AS u
                FROM inj) GROUP BY 1, 2),
        lagg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS line_units,
                   CAST(sum(c * length(u)) AS BIGINT) AS line_chars,
                   CAST(sum(c - 1) AS BIGINT) AS line_dup_units,
                   CAST(sum((c - 1) * length(u)) AS BIGINT) AS line_dup_chars
            FROM lu GROUP BY 1),
        pu AS (
            SELECT doc_id, u, count(*) AS c FROM (
                SELECT doc_id, unnest(string_split_regex(text, '\n\n')) AS u
                FROM inj) GROUP BY 1, 2),
        pagg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS para_units,
                   CAST(sum(c * length(u)) AS BIGINT) AS para_chars,
                   CAST(sum(c - 1) AS BIGINT) AS para_dup_units,
                   CAST(sum((c - 1) * length(u)) AS BIGINT) AS para_dup_chars
            FROM pu GROUP BY 1)
        SELECT l.doc_id, line_units, line_dup_units, line_dup_chars,
               para_units, para_dup_units, para_dup_chars,
               CAST(line_dup_units AS DOUBLE) / CAST(line_units AS DOUBLE)
                   AS line_dup_frac,
               CASE WHEN line_chars > 0 THEN
                    CAST(line_dup_chars AS DOUBLE) / CAST(line_chars AS DOUBLE)
                    END AS line_dup_char_frac,
               CAST(para_dup_units AS DOUBLE) / CAST(para_units AS DOUBLE)
                   AS para_dup_frac,
               CASE WHEN para_chars > 0 THEN
                    CAST(para_dup_chars AS DOUBLE) / CAST(para_chars AS DOUBLE)
                    END AS para_dup_char_frac
        FROM lagg l JOIN pagg p ON l.doc_id = p.doc_id
        ORDER BY l.doc_id
    """

    # exact proportional stratified sample: the oracle states the
    # CONTRACT (k_s smallest by (id-hash, doc_id) per source) that the
    # Spark two-phase bucket selection implements distributively
    sql["stratified_sample_exact"] = """
        WITH b AS (
            SELECT doc_id, source,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS h
            FROM documents),
        r AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY source) AS n_s
            FROM b)
        SELECT doc_id, source FROM r
        WHERE rn <= (n_s * 20 + 99) // 100
        ORDER BY doc_id
    """

    sql["pack_efficiency"] = f"""
        WITH t AS (
            SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents),
        r AS (
            SELECT doc_id, source, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS tokens_before
            FROM t),
        s AS (SELECT doc_id, source, n_tokens,
                     CAST(tokens_before // 2000 AS BIGINT) AS shard_id
              FROM r)
        SELECT source, shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(sum(n_tokens) AS DOUBLE) / 2000.0 AS fill_ratio
        FROM s GROUP BY 1, 2 ORDER BY source, shard_id
    """

    # power-of-two length buckets via base-2 digit count (bin()) — an
    # integer property, no log2 double anywhere
    sql["seqlen_histogram"] = f"""
        WITH t AS (
            SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents)
        SELECT source,
               CAST(length(bin(n_tokens)) AS INT) AS len_bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(n_tokens) AS min_tokens,
               max(n_tokens) AS max_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
        FROM t GROUP BY 1, 2 ORDER BY source, len_bucket
    """

    sql["vocab_coverage_curve"] = f"""
        WITH tf AS (
            SELECT term, count(*) AS c_t FROM (
                SELECT unnest({_TOKS}) AS term FROM documents)
            GROUP BY 1),
        tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS total_occ FROM tf),
        ranked AS (
            SELECT term, c_t,
                   CAST(row_number() OVER (ORDER BY c_t DESC, term ASC) AS INT)
                       AS k,
                   CAST(sum(c_t) OVER (ORDER BY c_t DESC, term ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS covered_occ
            FROM tf)
        SELECT k, term AS term_at_k, covered_occ, total_occ,
               CAST(covered_occ AS DOUBLE) / CAST(total_occ AS DOUBLE)
                   AS coverage
        FROM ranked, tot
        WHERE k IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
        ORDER BY k
    """

    # hot-line panel over the injected boilerplate; the streaming twin
    # replays the same injected corpus through the (line, doc) state
    # and shares this oracle verbatim
    _boiler_sql = r"""
        WITH inj AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 5 = 0
                           THEN chr(10) || 'subscribe to our newsletter today'
                           ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN chr(10) || '(c) example corp all rights reserved'
                           ELSE '' END AS text
            FROM documents),
        ex AS (SELECT doc_id, unnest(string_split_regex(text, '\n')) AS line
               FROM inj),
        agg AS (
            SELECT line,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
                   CAST(count(*) AS BIGINT) AS n_occurrences
            FROM ex GROUP BY 1)
        SELECT line, doc_freq, n_occurrences,
               n_occurrences * CAST(length(line) AS BIGINT) AS chars_mass
        FROM agg WHERE doc_freq > 20
        ORDER BY doc_freq DESC, line
    """
    sql["boilerplate_lines"] = _boiler_sql
    sql["streaming_line_boilerplate"] = _boiler_sql

    # byte-fallback fertility vs the corpus top-64 vocabulary (the
    # oov_rate vocabulary rule); strlen = UTF-8 bytes in DuckDB,
    # octet_length in Spark
    sql["tokenizer_fertility"] = f"""
        WITH ds AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1),
        tf AS (SELECT source, term, count(*) AS c_st FROM (
                   SELECT source, unnest({_TOKS}) AS term FROM documents)
               GROUP BY 1, 2),
        tt AS (SELECT term, sum(c_st) AS c_t FROM tf GROUP BY 1),
        vocab AS (SELECT term FROM tt ORDER BY c_t DESC, term ASC LIMIT 64),
        pieces AS (
            SELECT tf.source,
                   CAST(sum(c_st) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN v.term IS NOT NULL THEN c_st ELSE 0 END)
                        AS BIGINT) AS n_invocab,
                   CAST(sum(CASE WHEN v.term IS NOT NULL THEN c_st
                                 ELSE c_st * length(tf.term) END) AS BIGINT)
                       AS n_pieces
            FROM tf LEFT JOIN vocab v ON tf.term = v.term
            GROUP BY 1)
        SELECT ds.source, n_docs, n_tokens, n_invocab, n_pieces,
               total_bytes, total_chars,
               round(CAST(n_pieces AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9)
                   AS fertility,
               round(CAST(total_bytes AS DOUBLE) / CAST(n_pieces AS DOUBLE), 9)
                   AS bytes_per_piece,
               round(CAST(total_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9)
                   AS bytes_per_token
        FROM ds JOIN pieces ON ds.source = pieces.source
        ORDER BY ds.source
    """

    # ---- round-8 additions ----

    # interpolated continuous quantiles from counts: the oracle
    # mirrors util.cont_quantiles_from_counts' integer rank split and
    # fixed-shape interpolation expression VERBATIM (never
    # quantile_cont, whose internal h−floor(h) fraction can differ
    # from the exact rational rem/den in the last ULP); fragments are
    # generated from one quantile list so the two engines cannot drift
    def _contq_fragments(quantiles):
        sel, fin = [], []
        for alias, num, den in quantiles:
            sel.append(
                f"min(CASE WHEN _cum > ((_n - 1) * {num}) // {den}"
                f" THEN value END) AS _lo_{alias}"
            )
            sel.append(
                f"min(CASE WHEN _cum > ((_n - 1) * {num}) // {den} + 1"
                f" THEN value END) AS _hi_{alias}"
            )
            sel.append(f"min(((_n - 1) * {num}) % {den}) AS _rem_{alias}")
            fin.append(
                f"CAST(_lo_{alias} AS DOUBLE) + (CAST(_rem_{alias} AS DOUBLE)"
                f" * (CAST(coalesce(_hi_{alias}, _lo_{alias}) AS DOUBLE)"
                f" - CAST(_lo_{alias} AS DOUBLE))) / CAST({den} AS DOUBLE)"
                f" AS {alias}"
            )
        return ",\n                   ".join(sel), ",\n               ".join(fin)

    _vq_sel, _vq_fin = _contq_fragments(
        [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)]
    )
    sql["value_percentiles_interp"] = f"""
        WITH c AS (
            SELECT event_type, value, count(*) AS _c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        cum AS (
            SELECT event_type, value,
                   SUM(_c) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
                   SUM(_c) OVER (PARTITION BY event_type) AS _n
            FROM c),
        p AS (
            SELECT event_type,
                   {_vq_sel}
            FROM cum GROUP BY 1),
        g AS (SELECT DISTINCT event_type FROM events)
        SELECT g.event_type,
               {_vq_fin}
        FROM g LEFT JOIN p USING (event_type)
        ORDER BY event_type
    """

    # day-over-day sliding-reference PSI: fixed integer-cent bins
    # (psi_fixed_bin_sql shared verbatim), dense bin spine per scored
    # day, Laplace-smoothed terms (PSI_TERM_SQL shared verbatim)
    _wpsi_bin = anomaly.psi_fixed_bin_sql(10, 5000).replace(" div ", " // ")
    _WPSI_CORE = f"""
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     {_wpsi_bin} AS bin, count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        days AS (SELECT DISTINCT event_type, day FROM c),
        scored AS (SELECT cur.event_type, cur.day
                   FROM days cur JOIN days ref
                     ON cur.event_type = ref.event_type
                    AND cur.day = ref.day + 1{{day_filter}}),
        spine AS (SELECT event_type, day, unnest(range(0, 10)) AS bin
                  FROM scored),
        grid AS (SELECT s.event_type, s.day, s.bin,
                        coalesce(cu.c, 0) AS c_cur, coalesce(rf.c, 0) AS c_ref
                 FROM spine s
                 LEFT JOIN c cu ON s.event_type = cu.event_type
                               AND s.day = cu.day AND s.bin = cu.bin
                 LEFT JOIN c rf ON s.event_type = rf.event_type
                               AND s.day = rf.day + 1 AND s.bin = rf.bin),
        t AS (SELECT event_type, day, c_ref, c_cur,
                     SUM(c_ref) OVER (PARTITION BY event_type, day) AS t_ref,
                     SUM(c_cur) OVER (PARTITION BY event_type, day) AS t_cur
              FROM grid),
        terms AS (SELECT event_type, day, c_ref, c_cur,
                         {anomaly.PSI_TERM_SQL.format(nbins=10)} AS psi_term
                  FROM t),
        agg AS (SELECT event_type, day,
                       CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                       CAST(SUM(c_cur) AS BIGINT) AS n_cur,
                       CAST(SUM(CAST(psi_term AS DECIMAL(28,9)))
                            AS DECIMAL(28,9)) AS psi_d
                FROM terms GROUP BY 1, 2)
        SELECT event_type, CAST(day AS BIGINT) AS day, n_ref, n_cur,
               CAST(psi_d AS DOUBLE) AS psi,
               CASE WHEN psi_d > 0.25 THEN 'drifted'
                    WHEN psi_d > 0.10 THEN 'shifting'
                    ELSE 'stable' END AS drift_class
        FROM agg ORDER BY event_type, day
    """
    sql["windowed_psi"] = "WITH " + _WPSI_CORE.format(day_filter="")
    # streaming twin: APPEND mode emits exactly the windows whose end
    # ≤ final watermark = max event time − lateness (probed at exact
    # equality: the boundary window EMITS, so the rule is ≤, in the
    # engine's millisecond watermark arithmetic). The day-scoring rule
    # is monotone in day, so filtering the scored day is sufficient
    # (its reference day is always older, hence also finalized).
    sql["streaming_windowed_psi"] = "WITH " + _WPSI_CORE.format(
        day_filter=(
            "\n                    AND (cur.day + 1) * 86400000 <="
            " (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
            " FROM events WHERE value IS NOT NULL)"
        )
    )

    # perplexity-outlier panel: the unigram scorer CTE verbatim + the
    # mad_outliers percentile_disc baseline + the shared flag text
    sql["doc_perplexity_outliers"] = f"""
        WITH s0 AS ({sql["unigram_logprob"]}),
        s AS (SELECT source,
                     CAST(floor(avg_logprob * 1000000) AS BIGINT) AS q6
              FROM s0),
        med AS (SELECT source,
                       percentile_disc(0.5) WITHIN GROUP (ORDER BY q6)
                           AS med_q6
                FROM s GROUP BY 1),
        mad AS (SELECT s.source,
                       percentile_disc(0.5) WITHIN GROUP
                           (ORDER BY abs(s.q6 - m.med_q6)) AS mad_q6
                FROM s JOIN med m USING (source) GROUP BY 1)
        SELECT s.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(m.med_q6) AS DOUBLE) / 1000000.0 AS med_logprob,
               CAST(min(d.mad_q6) AS DOUBLE) / 1000000.0 AS mad_logprob,
               CAST(sum(CASE WHEN m.med_q6 - s.q6
                                  > (3.0 * 1.4826) * d.mad_q6
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(sum(CASE WHEN m.med_q6 - s.q6
                                  > (3.0 * 1.4826) * d.mad_q6
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS outlier_rate
        FROM s
        JOIN med m USING (source)
        JOIN mad d USING (source)
        GROUP BY s.source ORDER BY s.source
    """

    # quality × duplication calibration: quality CTE verbatim,
    # percentile_disc decile cuts, the generated decile_assign_sql
    # comparison text shared with the Spark operator, exact_dedup's
    # digest for the dup flag
    _qcal_cuts = ",\n                       ".join(
        f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY q3) AS c{i}"
        for i in range(1, 10)
    )
    sql["quality_calibration_curve"] = f"""
        WITH q0 AS ({sql["quality_score"]}),
        q AS (SELECT doc_id,
                     CAST(floor(quality * 1000) AS BIGINT) AS q3
              FROM q0),
        cuts AS (SELECT {_qcal_cuts}
                 FROM q),
        a AS (SELECT doc_id,
                     CAST({curation.decile_assign_sql(10)} AS INTEGER) AS decile
              FROM q, cuts),
        fps AS (SELECT doc_id,
                       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                           AS fp
                FROM documents),
        sz AS (SELECT fp, count(*) AS n FROM fps GROUP BY 1),
        fl AS (SELECT doc_id, n > 1 AS is_dup FROM fps JOIN sz USING (fp))
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS dup_rate
        FROM a JOIN fl USING (doc_id)
        GROUP BY decile ORDER BY decile
    """

    # longest shared fingerprint run: winnow_overlap_pairs' fingerprint
    # CTEs + collapse-consecutive-minima, ordinal renumber, and the
    # diagonal gaps-and-islands (pos_a − row_number per diagonal)
    sql["winnow_longest_run"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id,
                     [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      for i in range(1, len(toks) - 1)] AS grams
              FROM t WHERE len(toks) >= 3),
        h AS (SELECT doc_id,
                     list_transform(grams,
                         s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
              FROM g),
        wn AS (SELECT doc_id,
                      CASE WHEN len(hs) >= 4
                           THEN [list_min(hs[j:j+3])
                                 for j in range(1, len(hs) - 2)]
                           ELSE [list_min(hs)] END AS wins
               FROM h),
        pw AS (SELECT doc_id, unnest(wins) AS fp,
                      unnest(range(1, len(wins) + 1)) AS rawpos
               FROM wn),
        col AS (SELECT doc_id, rawpos, fp,
                       lag(fp) OVER (PARTITION BY doc_id ORDER BY rawpos)
                           AS prev_fp
                FROM pw),
        kept0 AS (SELECT doc_id, fp,
                         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos)
                             AS pos
                  FROM col WHERE prev_fp IS NULL OR prev_fp <> fp),
        dfreq AS (SELECT fp, count(DISTINCT doc_id) AS df
                  FROM kept0 GROUP BY fp),
        kept AS (SELECT k.doc_id, k.fp, k.pos
                 FROM kept0 k JOIN dfreq USING (fp) WHERE df <= 50),
        m AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM kept a JOIN kept b
                ON a.fp = b.fp AND a.doc_id < b.doc_id),
        r AS (SELECT doc_a, doc_b,
                     pos_a - pos_b AS diag,
                     pos_a - row_number() OVER (
                         PARTITION BY doc_a, doc_b, pos_a - pos_b
                         ORDER BY pos_a) AS island
              FROM m),
        runs AS (SELECT doc_a, doc_b, diag, island, count(*) AS run_len
                 FROM r GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b,
               CAST(sum(run_len) AS BIGINT) AS n_matches,
               CAST(max(run_len) AS BIGINT) AS longest_run,
               CAST(max(run_len) - 1 + 6 AS BIGINT) AS est_run_tokens
        FROM runs GROUP BY 1, 2 HAVING max(run_len) >= 2
        ORDER BY doc_a, doc_b
    """

    # norm audit: sqrt(list_dot_product(v, v)) == Spark's sequential
    # fold norm (the knn_bruteforce-proven identity)
    sql["embedding_norm_audit"] = """
        WITH p AS (
            SELECT label, len(embedding) AS dim,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS nrm
            FROM embeddings)
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
               CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero,
               min(nrm) AS min_norm,
               max(nrm) AS max_norm,
               CAST(sum(CAST(round(nrm, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_norm
        FROM p GROUP BY label ORDER BY label
    """

    # mix rebalance: all-integer budget arithmetic (min over
    # n_tok·10⁶ div ppm), two final double divisions
    sql["mix_rebalance_plan"] = f"""
        WITH t AS (SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tok
                   FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok FROM t),
        p AS (SELECT source, n_tok,
                     CAST((SELECT 1000000 // count(*) FROM t) AS BIGINT) AS ppm
              FROM t),
        b AS (SELECT CAST(min(n_tok * 1000000 // ppm) AS BIGINT) AS budget
              FROM p WHERE ppm > 0)
        SELECT source, n_tok, ppm,
               budget AS budget_tokens,
               CAST(budget * ppm // 1000000 AS BIGINT) AS keep_tokens,
               CAST(n_tok AS DOUBLE) / CAST(total_tok AS DOUBLE)
                   AS current_share,
               CAST(budget * ppm // 1000000 AS DOUBLE) / CAST(n_tok AS DOUBLE)
                   AS sampling_rate
        FROM p, b, tot ORDER BY source
    """

    # streaming twin: complete-mode (type, value) count state fed to
    # the same weighted rank arithmetic — batch oracle verbatim
    sql["streaming_value_percentiles"] = sql["value_percentiles_interp"]

    # KLL cutoff verdict twin: exact cutoff + achieved fraction are
    # deterministic; the rank-bound boolean is literal TRUE (the
    # value_percentiles_approx_checked convention — a sketch-contract
    # violation on the Spark side hash-mismatches)
    sql["temporal_split_kll"] = """
        WITH c AS (SELECT CAST(percentile_disc(0.8) WITHIN GROUP
                       (ORDER BY epoch_us(ts)) AS BIGINT) AS cut
                   FROM events)
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               c.cut AS cutoff_us_exact,
               CAST(sum(CASE WHEN epoch_us(ts) <= c.cut THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(sum(CASE WHEN epoch_us(ts) <= c.cut THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS train_frac_achieved,
               TRUE AS kll_cutoff_in_rank_bound
        FROM events, c GROUP BY c.cut
    """

    # encoding audit over the injected contamination; the bad-char
    # class text is shared verbatim (\\x{...} escapes parse the same
    # in Java regex and RE2)
    sql["encoding_audit"] = f"""
        WITH inj AS (
            SELECT doc_id, source,
                   text ||
                   CASE WHEN doc_id % 9 = 0
                        THEN ' bad' || chr(65533) || chr(65533) || 'decode'
                        ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0
                        THEN ' ctl' || chr(1) || 'byte'
                        ELSE '' END AS text
            FROM documents),
        per AS (
            SELECT source, length(text) AS n_chars_t,
                   len(regexp_extract_all(text,
                       '{text_ops.ENCODING_BAD_CLASS}')) AS n_bad
            FROM inj)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bad_docs,
               CAST(sum(n_chars_t) AS BIGINT) AS total_chars,
               CAST(sum(n_bad) AS BIGINT) AS n_bad_chars,
               CAST(sum(n_bad) AS DOUBLE) / CAST(sum(n_chars_t) AS DOUBLE)
                   AS bad_char_rate
        FROM per GROUP BY source ORDER BY source
    """

    # intra-doc line dedup over the injected repetition: DuckDB's
    # indexed list_filter mirrors Spark's (element, index) lambda —
    # element i survives iff no earlier element equals it
    sql["intra_doc_line_dedup"] = """
        WITH inj AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 4 = 0
                        THEN chr(10) || 'nav home about contact' ||
                             chr(10) || 'nav home about contact' ||
                             chr(10) || 'nav home about contact'
                        ELSE '' END ||
                   CASE WHEN doc_id % 6 = 0
                        THEN chr(10) || 'footer fine print' ||
                             chr(10) || 'footer fine print'
                        ELSE '' END AS text
            FROM documents),
        l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM inj),
        k AS (SELECT doc_id, lines,
                     list_filter(lines,
                         (x, i) -> NOT list_contains(lines[1:i-1], x)) AS kept
              FROM l)
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               array_to_string(kept, chr(10)) AS text_clean
        FROM k ORDER BY doc_id
    """

    # Apdex: integer-cent classification, one final double division,
    # band CASE via integer cross-multiplication
    sql["apdex_score"] = """
        WITH c AS (
            SELECT event_type,
                   CASE WHEN CAST(round(value * 100) AS BIGINT) <= 10000
                        THEN 'sat'
                        WHEN CAST(round(value * 100) AS BIGINT) <= 40000
                        THEN 'tol'
                        ELSE 'fru' END AS cls
            FROM events WHERE value IS NOT NULL),
        a AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(sum(CASE WHEN cls = 'sat' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_satisfied,
                   CAST(sum(CASE WHEN cls = 'tol' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tolerating,
                   CAST(sum(CASE WHEN cls = 'fru' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_frustrated
            FROM c GROUP BY 1)
        SELECT event_type, n_samples, n_satisfied, n_tolerating, n_frustrated,
               CAST(2 * n_satisfied + n_tolerating AS DOUBLE)
                   / CAST(2 * n_samples AS DOUBLE) AS apdex,
               CASE WHEN (2 * n_satisfied + n_tolerating) * 100
                         >= 94 * 2 * n_samples THEN 'excellent'
                    WHEN (2 * n_satisfied + n_tolerating) * 100
                         >= 85 * 2 * n_samples THEN 'good'
                    WHEN (2 * n_satisfied + n_tolerating) * 100
                         >= 70 * 2 * n_samples THEN 'fair'
                    ELSE 'poor' END AS apdex_band
        FROM a ORDER BY event_type
    """

    # inter-event gap histogram: digit-count buckets on whole seconds
    sql["gap_histogram"] = """
        WITH g AS (
            SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events),
        nn AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
        b AS (SELECT CASE WHEN gap_us < 1000000 THEN 0
                          ELSE CAST(length(bin(gap_us // 1000000)) AS INTEGER)
                     END AS gap_bucket, gap_us
              FROM nn),
        c AS (SELECT gap_bucket,
                     CAST(count(*) AS BIGINT) AS n_gaps,
                     min(gap_us) AS min_gap_us,
                     max(gap_us) AS max_gap_us
              FROM b GROUP BY 1),
        t AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS n_total FROM c)
        SELECT gap_bucket, n_gaps, min_gap_us, max_gap_us,
               CAST(n_gaps AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        FROM c, t ORDER BY gap_bucket
    """

    # streaming apdex: #types×3 count state + the shared coda
    sql["streaming_apdex"] = sql["apdex_score"]

    # stateful streaming twin: per-user last-event-time state,
    # per-batch delta emissions; union of deltas == the batch gap set
    sql["streaming_gap_histogram"] = sql["gap_histogram"]

    # near-dup degree histogram over the mirror-injected corpus —
    # the identical portable-MinHash pipeline (shingle_k=3, the
    # operator default) at threshold 0.5
    sql["dup_degree_stats"] = f"""
        WITH mir AS (
            SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 50000000 AS doc_id, text,
                   'mirror-of-' || source AS source
            FROM documents WHERE doc_id % 23 = 0),
        {_portable_sig_ctes('dd_', 'mir', 3)},
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM dd_banded a JOIN dd_banded b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
        sets AS (SELECT DISTINCT doc_id, h FROM dd_hs),
        sz AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY 1),
        it AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
               FROM cand c
               JOIN sets x ON x.doc_id = c.doc_a
               JOIN sets y ON y.doc_id = c.doc_b AND y.h = x.h
               GROUP BY 1, 2),
        pr AS (SELECT i.doc_a, i.doc_b
               FROM it i
               JOIN sz a ON i.doc_a = a.doc_id
               JOIN sz b ON i.doc_b = b.doc_id
               WHERE CAST(n_inter AS DOUBLE)
                     / CAST(a.n + b.n - n_inter AS DOUBLE) >= 0.5),
        ends AS (SELECT doc_a AS doc_id FROM pr
                 UNION ALL SELECT doc_b AS doc_id FROM pr),
        deg AS (SELECT doc_id, count(*) AS degree FROM ends GROUP BY 1),
        hh AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
               FROM deg GROUP BY 1),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_dup_docs FROM hh)
        SELECT CAST(degree AS BIGINT) AS degree, n_docs,
               CAST(n_docs AS DOUBLE) / CAST(n_dup_docs AS DOUBLE) AS share
        FROM hh, t ORDER BY degree
    """

    # ---- round-8 fourth wave ----

    # arrival burstiness: integer minute buckets, integer N/S2/M
    # accumulators, two fixed-shape double edge expressions
    # (fano = S2/N − N/M — mirrored verbatim)
    sql["burstiness_panel"] = """
        WITH c AS (
            SELECT event_type, epoch_us(ts) // 60000000 AS minute,
                   count(*) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        per AS (
            SELECT event_type,
                   CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(sum(c * c) AS BIGINT) AS sum_sq,
                   CAST(max(minute) - min(minute) + 1 AS BIGINT) AS n_minutes,
                   CAST(count(*) AS BIGINT) AS active_minutes
            FROM c GROUP BY 1)
        SELECT event_type, n_events, n_minutes, active_minutes, sum_sq,
               CAST(n_events AS DOUBLE) / CAST(n_minutes AS DOUBLE)
                   AS events_per_min,
               CAST(sum_sq AS DOUBLE) / CAST(n_events AS DOUBLE)
                   - CAST(n_events AS DOUBLE) / CAST(n_minutes AS DOUBLE)
                   AS fano
        FROM per ORDER BY event_type
    """

    # streaming burstiness: the (type, minute) count state + the
    # shared Fano coda
    sql["streaming_burstiness"] = sql["burstiness_panel"]

    # streaming encoding audit: per-source 4-counter state + the
    # shared classify/rate code — the batch oracle applies verbatim
    sql["streaming_encoding_audit"] = sql["encoding_audit"]

    # per-source doc-length quantiles: the KEYED point of the
    # counts-based continuous family — fragments generated from the
    # same quantile list as the Spark side, so the interpolation
    # expression cannot drift
    _dlp_sel, _dlp_fin = _contq_fragments(
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20)]
    )
    sql["doc_length_percentiles"] = f"""
        WITH c AS (
            SELECT source, n_chars AS value, count(*) AS _c
            FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        cum AS (
            SELECT source, value,
                   SUM(_c) OVER (PARTITION BY source ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
                   SUM(_c) OVER (PARTITION BY source) AS _n
            FROM c),
        p AS (
            SELECT source,
                   {_dlp_sel}
            FROM cum GROUP BY 1),
        g AS (SELECT DISTINCT source FROM documents)
        SELECT g.source,
               {_dlp_fin}
        FROM g LEFT JOIN p USING (source)
        ORDER BY source
    """

    # vocabulary overlap matrix: exact set sizes/intersections over
    # the fertility tokenization (shared verbatim), two double
    # divisions at the edge
    sql["vocab_overlap_matrix"] = f"""
        WITH st AS (
            SELECT DISTINCT source, term FROM (
                SELECT source, unnest({_TOKS}) AS term FROM documents)),
        sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v
                  FROM st GROUP BY 1),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM st a JOIN st b ON a.term = b.term
            WHERE a.source < b.source GROUP BY 1, 2)
        SELECT source_a, source_b,
               sa.v AS vocab_a, sb.v AS vocab_b, n_common,
               CAST(n_common AS DOUBLE)
                   / CAST(sa.v + sb.v - n_common AS DOUBLE) AS jaccard,
               CAST(n_common AS DOUBLE)
                   / CAST(least(sa.v, sb.v) AS DOUBLE) AS overlap_coef
        FROM inter
        JOIN sizes sa ON source_a = sa.source
        JOIN sizes sb ON source_b = sb.source
        ORDER BY source_a, source_b
    """

    # normalized-key dedup panel over the injected casefold mirrors:
    # normalization classes shared verbatim (EXPLICIT whitespace
    # sets, no \\s — Java and RE2 draw that class differently);
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all default
    sql["normalized_dedup"] = f"""
        WITH mir AS (
            SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 70000000 AS doc_id,
                   replace(upper(text), ' ', '  ') || ' !!!' AS text,
                   'mirror' AS source
            FROM documents WHERE doc_id % 7 = 0),
        keyed AS (
            SELECT doc_id, source,
                   md5(trim(regexp_replace(
                       array_to_string(regexp_extract_all(lower(text),
                           '{dedup.NORMALIZE_KEEP_CLASS}'), ''),
                       '{dedup.NORMALIZE_WS_CLASS}', ' ', 'g'))) AS k
            FROM mir),
        clusters AS (
            SELECT k, CAST(count(*) AS BIGINT) AS csize,
                   min(doc_id) AS keeper
            FROM keyed GROUP BY 1),
        per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_in_dup_clusters,
                   CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed
            FROM keyed JOIN clusters USING (k) GROUP BY 1)
        SELECT source, n_docs, n_in_dup_clusters, n_removed,
               CAST(n_removed AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   AS removal_rate
        FROM per ORDER BY source
    """

    # ---- round-8 sixth wave ----

    # the shared two-sample reduction: per-type per-distinct-cents
    # half counts at the whole-feed time midpoint (Spark:
    # analytics.half_cents_counts)
    _HALF_CENTS_CTE = """
        st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
               FROM events),
        pv AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS c_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS c_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2)
    """

    sql["wasserstein_drift"] = f"""
        WITH {_HALF_CENTS_CTE},
        stepped AS (
            SELECT event_type, cents,
                   SUM(c_ref) OVER (
                       PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_ref,
                   SUM(c_cur) OVER (
                       PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cur,
                   lead(cents) OVER (PARTITION BY event_type ORDER BY cents)
                       AS nxt,
                   SUM(c_ref) OVER (PARTITION BY event_type) AS n_ref,
                   SUM(c_cur) OVER (PARTITION BY event_type) AS n_cur
            FROM pv),
        agg AS (
            SELECT event_type,
                   CAST(max(n_ref) AS BIGINT) AS n_ref,
                   CAST(max(n_cur) AS BIGINT) AS n_cur,
                   SUM(CASE WHEN nxt IS NULL THEN CAST(0 AS HUGEINT) ELSE
                       abs(CAST(cum_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                         - CAST(cum_cur AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       * CAST(nxt - cents AS HUGEINT) END) AS acc
            FROM stepped GROUP BY 1)
        SELECT event_type, n_ref, n_cur,
               CAST(acc AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * 100.0)
                   AS w1_value
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type
    """

    # streaming twin: availableNow state == the batch reduction
    sql["streaming_wasserstein"] = sql["wasserstein_drift"]

    sql["cliffs_delta"] = f"""
        WITH {_HALF_CENTS_CTE},
        stepped AS (
            SELECT event_type, c_ref, c_cur,
                   SUM(c_cur) OVER (
                       PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cur_incl
            FROM pv),
        agg AS (
            SELECT event_type,
                   CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl - c_cur AS HUGEINT)) AS a_before,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl AS HUGEINT)) AS b_incl
            FROM stepped GROUP BY 1)
        SELECT event_type, n_ref, n_cur,
               CAST(a_before AS BIGINT) AS gt_pairs,
               CAST(CAST(n_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                    - b_incl AS BIGINT) AS lt_pairs,
               CAST(b_incl - a_before AS BIGINT) AS tie_pairs,
               CAST(a_before + b_incl - CAST(n_ref AS HUGEINT)
                    * CAST(n_cur AS HUGEINT) AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) AS delta
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type
    """

    # jackknife: md5-prefix buckets (the assign_split expression),
    # floor-quantized pseudo-values, finals shared via JK_SE_SQL
    sql["jackknife_variance"] = f"""
        WITH pb AS (
            SELECT event_type,
                   CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 20 AS bucket,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS s_b,
                   count(*) AS n_b
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        pseudo AS (
            SELECT event_type,
                   SUM(s_b) OVER (PARTITION BY event_type) AS s_all,
                   SUM(n_b) OVER (PARTITION BY event_type) AS n_all,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_buckets,
                   s_b, n_b
            FROM pb),
        q AS (
            SELECT event_type, s_all, n_all, n_buckets,
                   CASE WHEN n_all - n_b = 0 THEN CAST(0 AS HUGEINT)
                        ELSE CAST(floor(CAST(s_all - s_b AS DOUBLE)
                             / CAST(n_all - n_b AS DOUBLE) * 1000000.0)
                             AS HUGEINT) END AS q
            FROM pseudo),
        agg AS (
            SELECT event_type,
                   CAST(max(n_all) AS BIGINT) AS n_events,
                   CAST(max(n_buckets) AS BIGINT) AS n_buckets,
                   max(s_all) AS s_all,
                   SUM(q) AS sq,
                   SUM(q * q) AS sq2
            FROM q GROUP BY 1)
        SELECT event_type, n_events, n_buckets,
               CAST(s_all AS DOUBLE) / (CAST(n_events AS DOUBLE) * 100.0)
                   AS mean_value,
               {analytics.JK_SE_SQL} AS jk_se
        FROM agg WHERE n_events >= 1 ORDER BY event_type
    """

    # Spearman on doubled tie-averaged ranks: the MWU midrank identity
    # 2r = 2·cum_before + t + 1 keeps every rank an integer; finals
    # shared via SPEARMAN_RHO_SQL with HUGEINT as the wide type
    sql["spearman_corr"] = f"""
        WITH rows_xy AS (
            SELECT source, n_chars AS x,
                   length(text) - length(replace(text, chr(10), '')) + 1 AS y
            FROM documents
            WHERE text IS NOT NULL AND n_chars IS NOT NULL),
        joint AS (
            SELECT source, x, y, count(*) AS cnt
            FROM rows_xy GROUP BY 1, 2, 3),
        xr AS (
            SELECT source, x,
                   2 * (SUM(tx) OVER (PARTITION BY source ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - tx) + tx + 1 AS r2x
            FROM (SELECT source, x, SUM(cnt) AS tx FROM joint GROUP BY 1, 2)),
        yr AS (
            SELECT source, y,
                   2 * (SUM(ty) OVER (PARTITION BY source ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - ty) + ty + 1 AS r2y
            FROM (SELECT source, y, SUM(cnt) AS ty FROM joint GROUP BY 1, 2)),
        sums AS (
            SELECT source,
                   CAST(SUM(cnt) AS BIGINT) AS n_docs,
                   SUM(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sx,
                   SUM(CAST(cnt AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sy,
                   SUM(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT)
                       * CAST(r2x AS HUGEINT)) AS sxx,
                   SUM(CAST(cnt AS HUGEINT) * CAST(r2y AS HUGEINT)
                       * CAST(r2y AS HUGEINT)) AS syy,
                   SUM(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT)
                       * CAST(r2y AS HUGEINT)) AS sxy
            FROM joint
                 JOIN xr USING (source, x)
                 JOIN yr USING (source, y)
            GROUP BY 1)
        SELECT source, n_docs,
               {analytics.SPEARMAN_RHO_SQL.format(D="HUGEINT")} AS spearman_rho
        FROM sums ORDER BY source
    """

    sql["vocab_richness"] = """
        WITH tf AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS n_term
            FROM (SELECT source,
                         unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS term
                  FROM documents)
            GROUP BY 1, 2),
        per AS (
            SELECT source,
                   CAST(SUM(n_term) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN n_term = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   SUM(CAST(n_term AS HUGEINT) * CAST(n_term AS HUGEINT))
                       AS m2
            FROM tf GROUP BY 1)
        SELECT source, n_tokens, n_types, n_hapax,
               CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
               CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)
                   AS hapax_ratio,
               10000.0 * CAST(m2 - CAST(n_tokens AS HUGEINT) AS DOUBLE)
                   / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                   AS yule_k,
               CASE WHEN n_tokens >= 2 THEN
                    CAST(m2 - CAST(n_tokens AS HUGEINT) AS DOUBLE)
                    / (CAST(n_tokens AS DOUBLE)
                       * CAST(n_tokens - 1 AS DOUBLE))
                    END AS simpson_d
        FROM per WHERE n_tokens >= 1 ORDER BY source
    """

    sql["transition_entropy"] = """
        WITH p AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events),
        c AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM p WHERE to_type IS NOT NULL
            GROUP BY 1, 2),
        per AS (
            SELECT from_type,
                   CAST(SUM(n_transitions) AS BIGINT) AS n_out,
                   CAST(count(*) AS BIGINT) AS out_degree,
                   SUM(CAST(n_transitions AS DECIMAL(12,0))
                       * CAST(round(ln(CAST(n_transitions AS DOUBLE)), 9)
                              AS DECIMAL(16,9))) AS s,
                   CAST(max(n_transitions) AS BIGINT) AS top_n
            FROM c GROUP BY 1)
        SELECT from_type, n_out, out_degree,
               round(round(ln(CAST(n_out AS DOUBLE)), 9)
                     - CAST(s AS DOUBLE) / CAST(n_out AS DOUBLE), 9)
                   AS entropy,
               CAST(top_n AS DOUBLE) / CAST(n_out AS DOUBLE) AS top_share
        FROM per ORDER BY from_type
    """

    # ---- round-8 seventh wave: streaming twins (state == the batch
    # reduction, codas shared verbatim) ----
    sql["streaming_cliffs"] = sql["cliffs_delta"]
    sql["streaming_jackknife"] = sql["jackknife_variance"]

    # ---- round-9 first wave ----
    # Kendall τ-b on the dense (source, x, y) grid: the pair algebra
    # C−D = Σ c·(2P+E−S) runs as two cascaded exclusive prefix sums
    # plus a whole-partition sum — every term exact BIGINT; the final
    # τ expression is shared verbatim via analytics.KENDALL_TAU_SQL
    sql["kendall_tau"] = f"""
        WITH rows_xy AS (
            SELECT source, n_chars // 8 AS x,
                   CAST(len({_TOKS}) AS BIGINT) AS y
            FROM documents
            WHERE text IS NOT NULL AND n_chars IS NOT NULL),
        joint AS (
            SELECT source, x, y, CAST(count(*) AS BIGINT) AS cnt
            FROM rows_xy GROUP BY 1, 2, 3),
        xs AS (SELECT DISTINCT source, x FROM joint),
        ys AS (SELECT DISTINCT source, y FROM joint),
        grid AS (
            SELECT xs.source, xs.x, ys.y, coalesce(j.cnt, 0) AS c
            FROM xs JOIN ys ON xs.source = ys.source
            LEFT JOIN joint j
              ON j.source = xs.source AND j.x = xs.x AND j.y = ys.y),
        g1 AS (
            SELECT source, x, y, c,
                   coalesce(SUM(c) OVER (PARTITION BY source, y ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS e
            FROM grid),
        g2 AS (
            SELECT source, c, e,
                   coalesce(SUM(e) OVER (PARTITION BY source, x ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS p,
                   SUM(e) OVER (PARTITION BY source, x) AS s
            FROM g1),
        cdr AS (
            SELECT source, CAST(SUM(c * (2 * p + e - s)) AS BIGINT) AS cd
            FROM g2 GROUP BY 1),
        xm AS (SELECT source, x, SUM(cnt) AS tx FROM joint GROUP BY 1, 2),
        ym AS (SELECT source, y, SUM(cnt) AS ty FROM joint GROUP BY 1, 2),
        txa AS (SELECT source,
                       CAST(SUM(tx * (tx - 1)) AS BIGINT) AS tie_x,
                       CAST(SUM(tx) AS BIGINT) AS n_docs
                FROM xm GROUP BY 1),
        tya AS (SELECT source, CAST(SUM(ty * (ty - 1)) AS BIGINT) AS tie_y
                FROM ym GROUP BY 1),
        sums AS (
            SELECT source, n_docs, cd, tie_x, tie_y,
                   CAST(n_docs * (n_docs - 1) - tie_x AS BIGINT) AS dx,
                   CAST(n_docs * (n_docs - 1) - tie_y AS BIGINT) AS dy
            FROM cdr JOIN txa USING (source) JOIN tya USING (source))
        SELECT source, n_docs, cd, tie_x, tie_y,
               {analytics.KENDALL_TAU_SQL} AS tau_b
        FROM sums ORDER BY source
    """
    sql["streaming_kendall"] = sql["kendall_tau"]

    # Day-over-day W1 against the sliding previous-day reference: the
    # wasserstein_drift arithmetic keyed by (event_type, day), with
    # the reference side arriving as the SAME count relation shifted
    # one day. A day scores iff its previous day has data (n_ref >= 1
    # filter — the windowed_psi convention). The streaming twin
    # restricts to finalized days (window end <= final watermark =
    # max event ms − lateness, the probed append-emission rule; the
    # scoring rule is monotone in day so filtering the scored day is
    # sufficient).
    _WW1_CORE = """
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{day_filter}),
        stepped AS (
            SELECT event_type, day, cents,
                   SUM(c_ref) OVER (
                       PARTITION BY event_type, day ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_ref,
                   SUM(c_cur) OVER (
                       PARTITION BY event_type, day ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cur,
                   lead(cents) OVER (PARTITION BY event_type, day
                                     ORDER BY cents) AS nxt,
                   SUM(c_ref) OVER (PARTITION BY event_type, day) AS n_ref,
                   SUM(c_cur) OVER (PARTITION BY event_type, day) AS n_cur
            FROM pv),
        agg AS (
            SELECT event_type, day,
                   CAST(max(n_ref) AS BIGINT) AS n_ref,
                   CAST(max(n_cur) AS BIGINT) AS n_cur,
                   SUM(CASE WHEN nxt IS NULL THEN CAST(0 AS HUGEINT) ELSE
                       abs(CAST(cum_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                         - CAST(cum_cur AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       * CAST(nxt - cents AS HUGEINT) END) AS acc
            FROM stepped GROUP BY 1, 2)
        SELECT event_type, day, n_ref, n_cur,
               CAST(acc AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * 100.0)
                   AS w1_value
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    sql["windowed_wasserstein"] = "WITH " + _WW1_CORE.format(day_filter="")
    sql["streaming_windowed_wasserstein"] = "WITH " + _WW1_CORE.format(
        day_filter=(
            "\n                WHERE (day + 1) * 86400000 <="
            " (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
            " FROM events WHERE value IS NOT NULL)"
        )
    )

    # per-source length × quality 2-d histogram: the shared
    # quality_score CTE verbatim, fixed-width bands (floor of the
    # identical double), share from the materialized cell relation
    sql["len_quality_histogram"] = f"""
        WITH q0 AS ({sql["quality_score"]}),
        cells AS (
            SELECT d.source, d.n_chars // 64 AS len_bucket,
                   least(9, CAST(floor(q.quality / 10.0) AS INTEGER))
                       AS q_band
            FROM q0 q JOIN documents d USING (doc_id)),
        counts AS (
            SELECT source, len_bucket, q_band,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM cells GROUP BY 1, 2, 3),
        tot AS (SELECT source, SUM(n_docs) AS n_src FROM counts GROUP BY 1)
        SELECT c.source, len_bucket, q_band, n_docs,
               CAST(n_docs AS DOUBLE) / CAST(n_src AS DOUBLE) AS share
        FROM counts c JOIN tot USING (source)
        ORDER BY source, len_bucket, q_band
    """

    # Cohen's κ between the portable-MinHash signature path and the
    # exact inverted-index path at the same (0.5, 3-gram) operating
    # point: both pipelines are the registry operators' own oracle
    # machinery (shared _portable_sig_ctes; the ngram CTE block at
    # threshold 0.5); κ finals shared verbatim via dedup.KAPPA_SQL
    # Shared verdict CTE block (through the per-doc v relation, source
    # carried) — consumed by the global kappa audit and its per-source
    # rollup, so the two audits cannot drift
    _kappa_verdicts = f"""
        WITH {_portable_sig_ctes('ka_', 'documents', 3)},
        ka_cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ka_banded a JOIN ka_banded b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id),
        ka_sets AS (SELECT DISTINCT doc_id, h FROM ka_hs),
        ka_sizes AS (SELECT doc_id, count(*) AS n FROM ka_sets GROUP BY 1),
        ka_inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM ka_cand c
            JOIN ka_sets x ON x.doc_id = c.doc_a
            JOIN ka_sets y ON y.doc_id = c.doc_b AND y.h = x.h
            GROUP BY 1, 2),
        srcs AS (SELECT doc_id, source FROM documents),
        sig_pairs AS (
            SELECT i.doc_a, i.doc_b
            FROM ka_inter i
            JOIN ka_sizes sa ON i.doc_a = sa.doc_id
            JOIN ka_sizes sb ON i.doc_b = sb.doc_id
            JOIN srcs qa ON qa.doc_id = i.doc_a
            JOIN srcs qb ON qb.doc_id = i.doc_b AND qa.source = qb.source
            WHERE CAST(n_inter AS DOUBLE)
                  / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.5),
        e_t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        e_sh AS (
            SELECT doc_id, source,
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM e_t WHERE len(toks) >= 3),
        e_ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM e_sh),
        e_blk AS (SELECT source, count(*) AS n_docs FROM e_sh GROUP BY source),
        e_dfc AS (SELECT source, s, count(*) AS df FROM e_ex GROUP BY source, s),
        e_kept AS (
            SELECT e_ex.doc_id, e_ex.source, e_ex.s
            FROM e_ex
            JOIN e_dfc ON e_ex.source = e_dfc.source AND e_ex.s = e_dfc.s
            JOIN e_blk ON e_ex.source = e_blk.source
            WHERE e_dfc.df <= greatest(2, CAST(floor(0.5 * e_blk.n_docs) AS BIGINT))),
        e_sizes AS (SELECT doc_id, count(*) AS n_sh FROM e_kept GROUP BY doc_id),
        e_co AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM e_kept a JOIN e_kept b
              ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        exact_pairs AS (
            SELECT doc_a, doc_b
            FROM e_co
            JOIN e_sizes sa ON e_co.doc_a = sa.doc_id
            JOIN e_sizes sb ON e_co.doc_b = sb.doc_id
            WHERE CAST(n_inter AS DOUBLE)
                  / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
        sig_docs AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM sig_pairs
                UNION ALL SELECT doc_b FROM sig_pairs)),
        ex_docs AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM exact_pairs
                UNION ALL SELECT doc_b FROM exact_pairs)),
        v AS (
            SELECT d.doc_id, d.source,
                   s.doc_id IS NOT NULL AS v_sig,
                   e.doc_id IS NOT NULL AS v_exact
            FROM (SELECT doc_id, source FROM documents) d
            LEFT JOIN sig_docs s USING (doc_id)
            LEFT JOIN ex_docs e USING (doc_id))
    """

    sql["dedup_agreement_kappa"] = f"""
        {_kappa_verdicts},
        cm AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN v_sig AND v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(sum(CASE WHEN v_sig AND NOT v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                   CAST(sum(CASE WHEN NOT v_sig AND v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS c,
                   CAST(sum(CASE WHEN NOT v_sig AND NOT v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS d
            FROM v)
        SELECT n AS n_docs, a AS both_dup, b AS sig_only, c AS exact_only,
               CAST(a + d AS DOUBLE) / CAST(n AS DOUBLE) AS agree_rate,
               {dedup.KAPPA_SQL} AS kappa
        FROM cm
    """

    sql["dedup_agreement_by_source"] = f"""
        {_kappa_verdicts},
        cm AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN v_sig AND v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(sum(CASE WHEN v_sig AND NOT v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                   CAST(sum(CASE WHEN NOT v_sig AND v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS c,
                   CAST(sum(CASE WHEN NOT v_sig AND NOT v_exact THEN 1 ELSE 0 END)
                        AS BIGINT) AS d
            FROM v GROUP BY 1)
        SELECT source, n AS n_docs, a AS both_dup, b AS sig_only,
               c AS exact_only,
               CAST(a + d AS DOUBLE) / CAST(n AS DOUBLE) AS agree_rate,
               {dedup.KAPPA_SQL} AS kappa
        FROM cm ORDER BY source
    """

    # dup-chain closure over the winnow pair evidence: the
    # winnow_overlap_pairs CTEs verbatim, then the dedup_keepers
    # recursive min-label reachability (order-independent, so it
    # reproduces Spark's iterative propagation exactly), then two
    # keyed counts
    sql["winnow_chain_lengths"] = f"""
        WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id,
                     [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      for i in range(1, len(toks) - 1)] AS grams
              FROM t WHERE len(toks) >= 3),
        h AS (SELECT doc_id,
                     list_transform(grams,
                         s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
              FROM g),
        wn AS (SELECT doc_id,
                      CASE WHEN len(hs) >= 4
                           THEN [list_min(hs[j:j+3])
                                 for j in range(1, len(hs) - 2)]
                           ELSE [list_min(hs)] END AS wins
               FROM h),
        fps AS (SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM wn),
        dfreq AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
        kept AS (SELECT f.doc_id, f.fp
                 FROM fps f JOIN dfreq USING (fp) WHERE df <= 50),
        pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING count(*) >= 2),
        und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                UNION ALL
                SELECT doc_b, doc_a FROM pr),
        reach(node, r) AS (
            SELECT a, b FROM und
            UNION
            SELECT w.node, u.b FROM reach w JOIN und u ON w.r = u.a),
        labels AS (
            SELECT node, least(node, min(r)) AS cluster_id
            FROM reach GROUP BY node),
        sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS chain_len
                  FROM labels GROUP BY 1),
        hist AS (SELECT chain_len, CAST(count(*) AS BIGINT) AS n_chains
                 FROM sizes GROUP BY 1),
        tot AS (SELECT SUM(chain_len * n_chains) AS n_chained_docs FROM hist)
        SELECT chain_len, n_chains,
               CAST(chain_len * n_chains AS BIGINT) AS n_docs,
               CAST(chain_len * n_chains AS DOUBLE)
                   / CAST(n_chained_docs AS DOUBLE) AS doc_share
        FROM hist, tot ORDER BY chain_len
    """

    # the embedding-LSH production operating point, oracle-pinned
    sql["embedding_near_dups_prod"] = _emb_near_dup_oracle(8, 16, -1.0)

    # day-over-day KS: the _WW1_CORE day-shift pairing + the ks_drift
    # ECDF-gap coda keyed by (event_type, day); KS_STAT_SQL shared
    _WKS_CORE = """
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{day_filter}),
        tot AS (SELECT event_type, day, SUM(c_ref) AS n_ref,
                       SUM(c_cur) AS n_cur
                FROM pv GROUP BY 1, 2),
        ecdf AS (
            SELECT event_type, day,
                   SUM(c_ref) OVER w AS c_ref,
                   SUM(c_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type, day ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gaps AS (
            SELECT e.event_type, e.day, n_ref, n_cur,
                   abs(CAST(c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       AS gap
            FROM ecdf e JOIN tot USING (event_type, day)),
        mx AS (
            SELECT event_type, day, CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   MAX(gap) AS ks_num
            FROM gaps GROUP BY 1, 2)
        SELECT event_type, day, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {ks_stat} END AS ks_d
        FROM mx WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    sql["windowed_ks"] = "WITH " + _WKS_CORE.format(
        day_filter="", ks_stat=anomaly.KS_STAT_SQL
    )
    sql["streaming_windowed_ks"] = "WITH " + _WKS_CORE.format(
        day_filter=(
            "\n                WHERE (day + 1) * 86400000 <="
            " (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
            " FROM events WHERE value IS NOT NULL)"
        ),
        ks_stat=anomaly.KS_STAT_SQL,
    )

    # ---- round-9 second wave ----
    # Kruskal–Wallis components: ranks from the GLOBAL per-distinct-
    # value count relation (doubled midranks — the mannwhitney_u
    # integer-rank algebra across all k groups at once); the hashed
    # edge is all-BIGINT verdict components, H left to the consumer
    sql["kruskal_wallis"] = """
        WITH pv AS (
            SELECT event_type, value, CAST(count(*) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        tv AS (
            SELECT value, SUM(c) AS t FROM pv GROUP BY 1),
        ranked AS (
            SELECT value, t,
                   SUM(t) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t AS cum_before
            FROM tv),
        per_group AS (
            SELECT event_type,
                   CAST(SUM(c) AS BIGINT) AS n_i,
                   CAST(SUM(CAST(c AS HUGEINT)
                       * CAST(2 * cum_before + t + 1 AS HUGEINT))
                       AS BIGINT) AS r2_sum
            FROM pv JOIN ranked USING (value) GROUP BY 1),
        gtot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_total,
                   CAST(SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                       * CAST(t AS HUGEINT) - CAST(t AS HUGEINT))
                       AS BIGINT) AS tie_cube
            FROM tv)
        SELECT event_type, n_i, r2_sum, n_total, tie_cube
        FROM per_group, gtot ORDER BY event_type
    """
    sql["streaming_kruskal"] = sql["kruskal_wallis"]

    # Nonparametric trend tests over the dense daily count relation
    # (calendar-dense per type, silent days = real zeros — the
    # theil_sen_trend convention). Both emit integral verdict
    # components only.
    _DENSE_DAILY = """
        counts AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
        span AS (
            SELECT event_type, min(day) AS d0, max(day) AS d1
            FROM counts GROUP BY 1),
        days AS (
            SELECT event_type, unnest(range(d0, d1 + 1)) AS day
            FROM span),
        dense AS (
            SELECT d.event_type, d.day, coalesce(c.y, 0) AS y
            FROM days d LEFT JOIN counts c
              ON c.event_type = d.event_type AND c.day = d.day)
    """
    sql["mann_kendall_trend"] = f"""
        WITH {_DENSE_DAILY},
        s AS (
            SELECT a.event_type,
                   CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END)
                        AS BIGINT) AS s_stat
            FROM dense a JOIN dense b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY 1),
        ties AS (
            SELECT event_type,
                   CAST(SUM(t) AS BIGINT) AS n_days,
                   CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
            FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
                  FROM dense GROUP BY 1, 2)
            GROUP BY 1)
        SELECT event_type, n_days,
               coalesce(s_stat, 0) AS s_stat, tie_term
        FROM ties LEFT JOIN s USING (event_type) ORDER BY event_type
    """
    sql["streaming_mann_kendall"] = sql["mann_kendall_trend"]

    sql["runs_test"] = f"""
        WITH {_DENSE_DAILY},
        med AS (
            SELECT event_type,
                   CAST(quantile_disc(y, 0.5) AS BIGINT) AS med
            FROM dense GROUP BY 1),
        signed AS (
            SELECT d.event_type, d.day,
                   CASE WHEN d.y > m.med THEN 1 ELSE -1 END AS s
            FROM dense d JOIN med m ON d.event_type = m.event_type
            WHERE d.y <> m.med),
        runs AS (
            SELECT event_type, s,
                   CASE WHEN lag(s) OVER (PARTITION BY event_type
                                          ORDER BY day) IS DISTINCT FROM s
                        THEN 1 ELSE 0 END AS new_run
            FROM signed)
        SELECT event_type,
               CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above,
               CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below,
               CAST(SUM(new_run) AS BIGINT) AS n_runs
        FROM runs GROUP BY 1 ORDER BY event_type
    """
    sql["streaming_runs_test"] = sql["runs_test"]

    # Dedup before/after quality PSI: quality CTE verbatim, exact_dedup
    # digest keepers, then the psi_from_value_counts arithmetic
    # (ceil-rank decile cuts over the reduced q3 count relation,
    # PSI_TERM_SQL shared) with ref = all scored docs, cur = survivors
    _dqs_cuts = ",\n                   ".join(
        f"MIN(CASE WHEN cum_ref >= (({i} * t_ref + 9) // 10)"
        f" THEN value END) AS c{i}"
        for i in range(1, 10)
    )
    sql["dedup_quality_shift"] = f"""
        WITH q0 AS ({sql["quality_score"]}),
        q AS (SELECT doc_id,
                     CAST(floor(quality * 1000) AS BIGINT) AS value
              FROM q0),
        fps AS (SELECT doc_id,
                       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                           AS fp
                FROM documents),
        k AS (SELECT fp, min(doc_id) AS keeper FROM fps GROUP BY 1),
        fl AS (SELECT doc_id, doc_id = keeper AS is_keeper
               FROM fps JOIN k USING (fp)),
        pv AS (SELECT value,
                      CAST(count(*) AS BIGINT) AS d_ref,
                      CAST(SUM(CASE WHEN is_keeper THEN 1 ELSE 0 END)
                           AS BIGINT) AS d_cur
               FROM q JOIN fl USING (doc_id) GROUP BY 1),
        cum AS (SELECT value, d_ref, d_cur,
                       SUM(d_ref) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_ref,
                       SUM(d_ref) OVER () AS t_ref
                FROM pv),
        cuts AS (SELECT {_dqs_cuts} FROM cum),
        counts AS (
            SELECT {anomaly.psi_bin_case_sql(10)} AS bin,
                   CAST(SUM(d_ref) AS BIGINT) AS c_ref,
                   CAST(SUM(d_cur) AS BIGINT) AS c_cur
            FROM pv, cuts GROUP BY 1),
        t AS (SELECT SUM(c_ref) AS t_ref, SUM(c_cur) AS t_cur FROM counts)
        SELECT CAST(bin AS INTEGER) AS bin, c_ref AS n_ref, c_cur AS n_cur,
               {anomaly.PSI_TERM_SQL.format(nbins=10)} AS psi_term
        FROM counts, t ORDER BY bin
    """

    # MinHash estimate-vs-exact calibration: the _minhash_portable_oracle
    # CTEs (same md5 hash family / affine constants / band keys /
    # candidate join / exact set intersection) extended with the
    # per-pair component-match count and the integer error bucket
    _mjc_pp = dedup.portable_perm_params()
    _mjc_rpb = dedup.N_HASHES // dedup.BANDS
    _mjc_mins = ",\n                   ".join(
        f"min(({a} * hi + {b} * lo + {c}) % {dedup.MINHASH_P}) AS mh_{i}"
        for i, (a, b, c) in enumerate(_mjc_pp)
    )
    _mjc_bands = "\n            UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_id, {key} AS band_key FROM sig".format(
            bi=bi,
            key=" || '|' || ".join(
                f"CAST(mh_{bi * _mjc_rpb + r} AS VARCHAR)" for r in range(_mjc_rpb)
            ),
        )
        for bi in range(dedup.BANDS)
    )
    _mjc_match = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
        for i in range(dedup.N_HASHES)
    )
    sql["minhash_jaccard_calibration"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        shn AS (
            SELECT doc_id,
                   list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM t WHERE len(toks) >= 3),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM shn),
        hs AS (SELECT doc_id,
                      CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
               FROM ex),
        hx AS (SELECT doc_id, h >> 30 AS hi, h & 1073741823 AS lo FROM hs),
        sig AS (SELECT doc_id,
                   {_mjc_mins}
                FROM hx GROUP BY doc_id),
        banded AS (
            {_mjc_bands}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id),
        matched AS (
            SELECT c.doc_a, c.doc_b,
                   CAST({_mjc_match} AS BIGINT) AS m
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.doc_a
            JOIN sig sb ON sb.doc_id = c.doc_b),
        sets AS (SELECT DISTINCT doc_id, h FROM hs),
        sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sets x ON x.doc_id = c.doc_a
            JOIN sets y ON y.doc_id = c.doc_b AND y.h = x.h
            GROUP BY 1, 2),
        pairs AS (
            SELECT m.m,
                   coalesce(i.n_inter, 0) AS i,
                   sa.n + sb.n - coalesce(i.n_inter, 0) AS u
            FROM matched m
            LEFT JOIN inter i USING (doc_a, doc_b)
            JOIN sizes sa ON m.doc_a = sa.doc_id
            JOIN sizes sb ON m.doc_b = sb.doc_id),
        counts AS (
            SELECT least((20 * abs(m * u - i * {dedup.N_HASHES}))
                         // ({dedup.N_HASHES} * u), 19) AS err_bucket,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(m) AS BIGINT) AS sum_matches
            FROM pairs GROUP BY 1),
        tt AS (SELECT SUM(n_pairs) AS t FROM counts)
        SELECT CAST(err_bucket AS INTEGER) AS err_bucket, n_pairs,
               sum_matches,
               CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE) AS share
        FROM counts, tt ORDER BY err_bucket
    """

    # Per-day tail-quantile drift: the cont_quantiles_from_counts
    # integer rank arithmetic keyed by (type, day) on the cents axis,
    # previous-day self-join for deltas; the streaming twin restricts
    # to finalized days (the streaming_windowed_ks convention)
    _qd_sel, _qd_fin = _contq_fragments(
        [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)]
    )
    _QD_CORE = f"""
        c AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(round(value * 100) AS BIGINT) AS value,
                   count(*) AS _c
            FROM events WHERE value IS NOT NULL{{day_filter}}
            GROUP BY 1, 2, 3),
        cum AS (
            SELECT event_type, day, value,
                   SUM(_c) OVER (PARTITION BY event_type, day ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS _cum,
                   SUM(_c) OVER (PARTITION BY event_type, day) AS _n
            FROM c),
        p AS (
            SELECT event_type, day, CAST(MIN(_n) AS BIGINT) AS n_day,
                   {_qd_sel}
            FROM cum GROUP BY 1, 2),
        f AS (
            SELECT event_type, day, n_day,
               {_qd_fin}
            FROM p)
        SELECT a.event_type, a.day, a.n_day,
               a.p50 AS p50_cents, a.p95 AS p95_cents, a.p99 AS p99_cents,
               a.p50 - b.p50 AS d50_cents,
               a.p95 - b.p95 AS d95_cents,
               a.p99 - b.p99 AS d99_cents
        FROM f a LEFT JOIN f b
          ON a.event_type = b.event_type AND a.day = b.day + 1
        ORDER BY a.event_type, a.day
    """
    sql["quantile_drift"] = "WITH " + _QD_CORE.format(day_filter="")
    sql["streaming_quantile_drift"] = "WITH " + _QD_CORE.format(
        day_filter=(
            "\n              AND (epoch_us(ts) // 86400000000 + 1) * 86400000"
            " <= (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
            " FROM events WHERE value IS NOT NULL)"
        )
    )

    # Brown–Forsythe spread components: order-statistic median over
    # the integer-cents count relation (2*cum >= n, percentile_disc
    # semantics), then exact integer deviation moments per type
    sql["brown_forsythe"] = """
        WITH pv AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        cum AS (
            SELECT event_type, cents, c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cm,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM pv),
        med AS (
            SELECT event_type,
                   MIN(CASE WHEN cm * 2 >= n THEN cents END) AS med_cents
            FROM cum GROUP BY 1)
        SELECT p.event_type,
               MIN(m.med_cents) AS med_cents,
               CAST(SUM(c) AS BIGINT) AS n_i,
               CAST(SUM(CAST(c AS HUGEINT)
                   * CAST(abs(cents - m.med_cents) AS HUGEINT)) AS BIGINT)
                   AS sum_z,
               CAST(SUM(CAST(c AS HUGEINT)
                   * CAST(abs(cents - m.med_cents) AS HUGEINT)
                   * CAST(abs(cents - m.med_cents) AS HUGEINT)) AS BIGINT)
                   AS sum_z2
        FROM pv p JOIN med m USING (event_type)
        GROUP BY 1 ORDER BY 1
    """
    sql["streaming_brown_forsythe"] = sql["brown_forsythe"]

    # One-way ANOVA sufficient statistics: exact integer-cents moments
    # per type, HUGEINT accumulation, BIGINT edge
    sql["anova_oneway"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_i,
               CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS BIGINT)
                   AS sum_cents,
               CAST(SUM(CAST(round(value * 100) AS HUGEINT)
                        * CAST(round(value * 100) AS HUGEINT)) AS BIGINT)
                   AS sum_cents_sq
        FROM events WHERE value IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """
    sql["streaming_anova"] = sql["anova_oneway"]

    # Mood's median test: grand-median order statistic over the global
    # cents count relation (2*cum >= N), at-median values drop, exact
    # 2xk table
    sql["mood_median_test"] = """
        WITH pv AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        tv AS (SELECT cents, SUM(c) AS t FROM pv GROUP BY 1),
        cum AS (
            SELECT cents,
                   SUM(t) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cm,
                   SUM(t) OVER () AS n
            FROM tv),
        med AS (
            SELECT MIN(CASE WHEN cm * 2 >= n THEN cents END) AS med_cents
            FROM cum)
        SELECT event_type,
               MIN(med_cents) AS med_cents,
               CAST(SUM(CASE WHEN cents > med_cents THEN c ELSE 0 END)
                    AS BIGINT) AS n_above,
               CAST(SUM(CASE WHEN cents < med_cents THEN c ELSE 0 END)
                    AS BIGINT) AS n_below
        FROM pv, med GROUP BY 1 ORDER BY 1
    """
    sql["streaming_mood_median"] = sql["mood_median_test"]

    # Most-duplicated passages: literal 5-gram strings (the shingle
    # tokenization, occurrences kept), distinct-doc ranked, unique
    # tiebreak
    sql["top_dup_ngrams"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                   WHERE text IS NOT NULL),
        g AS (SELECT doc_id,
                     unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4]
                             for i in range(1, len(toks) - 3)]) AS gram
              FROM t),
        c AS (SELECT gram,
                     CAST(count(*) AS BIGINT) AS n_occurrences,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM g GROUP BY 1)
        SELECT gram, n_occurrences, n_docs
        FROM c WHERE n_docs >= 2
        ORDER BY n_docs DESC, n_occurrences DESC, gram
        LIMIT 20
    """

    # Weekly-shape GoF: weekday from pure integer epoch-day arithmetic
    # ((day + 4) mod 7 — 1970-01-01 was a Thursday), observed counts +
    # integer calendar shares, full-outer so silent weekdays emit zeros
    sql["dow_activity_gof"] = """
        WITH obs AS (
            SELECT event_type,
                   ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2),
        days AS (
            SELECT DISTINCT event_type,
                   epoch_us(ts) // 86400000000 AS day
            FROM events),
        cal AS (
            SELECT event_type, (day + 4) % 7 AS dow,
                   CAST(count(*) AS BIGINT) AS days_d
            FROM days GROUP BY 1, 2),
        tot AS (
            SELECT event_type, CAST(SUM(days_d) AS BIGINT) AS days_total
            FROM cal GROUP BY 1)
        SELECT coalesce(o.event_type, c.event_type) AS event_type,
               CAST(coalesce(o.dow, c.dow) AS INTEGER) AS dow,
               coalesce(o.n_events, 0) AS n_events,
               coalesce(c.days_d, 0) AS days_d,
               t.days_total
        FROM obs o
        FULL OUTER JOIN cal c
          ON o.event_type = c.event_type AND o.dow = c.dow
        JOIN tot t ON t.event_type = coalesce(o.event_type, c.event_type)
        ORDER BY 1, 2
    """

    # Per-source boilerplate report: the top_dup_ngrams CTEs keyed by
    # source, per-source row_number top-N with the same unique tiebreak
    sql["top_dup_ngrams_by_source"] = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents
                   WHERE text IS NOT NULL),
        g AS (SELECT doc_id, source,
                     unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4]
                             for i in range(1, len(toks) - 3)]) AS gram
              FROM t),
        c AS (SELECT source, gram,
                     CAST(count(*) AS BIGINT) AS n_occurrences,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM g GROUP BY 1, 2),
        r AS (SELECT source, gram, n_occurrences, n_docs,
                     row_number() OVER (PARTITION BY source
                         ORDER BY n_docs DESC, n_occurrences DESC, gram)
                         AS rk
              FROM c WHERE n_docs >= 2)
        SELECT source, gram, n_occurrences, n_docs
        FROM r WHERE rk <= 5
        ORDER BY source, n_docs DESC, n_occurrences DESC, gram
    """

    # ---- round-10 additions ----

    # The two-sample panel's remaining members ride the ks_drift CTE
    # spine (midpoint split → per-value half counts → per-type ECDF);
    # the per-term/final expressions are the operators' own shared SQL
    # constants, so the statistic literally cannot drift between
    # engines.
    _half_cte = """
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS d_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS d_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(d_ref) AS n_ref, SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1),
        ecdf AS (
            SELECT event_type, d_ref + d_cur AS l,
                   SUM(d_ref) OVER w AS c_ref,
                   SUM(d_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        terms AS (
            SELECT e.event_type, n_ref, n_cur, n_ref + n_cur AS nt,
                   c_ref + c_cur AS b, l,
                   CAST(c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT)
                       AS gap
            FROM ecdf e JOIN tot USING (event_type))
    """

    sql["anderson_darling"] = f"""
        {_half_cte},
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(SUM(CASE WHEN b < nt THEN {anomaly.AD_TERM_SQL}
                            ELSE CAST(0 AS BIGINT) END) AS BIGINT)
                       AS ad_scaled
            FROM terms GROUP BY 1)
        SELECT event_type, n_ref, n_cur, ad_scaled,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {anomaly.AD_STAT_SQL} END
                   AS ad_stat
        FROM agg ORDER BY event_type
    """
    sql["streaming_anderson_darling"] = sql["anderson_darling"]

    sql["cramer_von_mises"] = f"""
        {_half_cte},
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(first(nt) AS BIGINT) AS nt,
                   SUM(CAST(l AS HUGEINT) * gap * gap) AS cvm_num
            FROM terms GROUP BY 1)
        SELECT event_type, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {anomaly.CVM_STAT_SQL} END
                   AS cvm_stat
        FROM agg ORDER BY event_type
    """
    sql["streaming_cramer_von_mises"] = sql["cramer_von_mises"]

    sql["kuiper_drift"] = f"""
        {_half_cte},
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(greatest(MAX(gap), 0) AS BIGINT) AS d_plus_num,
                   CAST(greatest(MAX(-gap), 0) AS BIGINT) AS d_minus_num
            FROM terms GROUP BY 1)
        SELECT event_type, n_ref, n_cur, d_plus_num, d_minus_num,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN {anomaly.KUIPER_STAT_SQL} END AS kuiper_v
        FROM agg ORDER BY event_type
    """
    sql["streaming_kuiper"] = sql["kuiper_drift"]

    # Hodges–Lehmann: integer-cents pairwise-difference distribution
    # from the alphabet×alphabet grid (exact BIGINT pair counts),
    # order statistics as conditional minima over the cumulative; the
    # Moses CI rank is the operator's own shared floor expression
    sql["hodges_lehmann"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS c_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS c_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                       CAST(SUM(c_cur) AS BIGINT) AS n_cur
                FROM pv GROUP BY 1),
        diffs AS (
            SELECT r.event_type, c.cents - r.cents AS d,
                   SUM(CAST(r.c_ref AS BIGINT) * CAST(c.c_cur AS BIGINT))
                       AS pairs
            FROM pv r JOIN pv c ON r.event_type = c.event_type
            WHERE r.c_ref > 0 AND c.c_cur > 0
            GROUP BY 1, 2),
        cum AS (
            SELECT event_type, d,
                   SUM(pairs) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM diffs),
        rk AS (
            SELECT event_type, d, cum, n_ref, n_cur,
                   n_ref * n_cur AS npairs,
                   {analytics.HL_K_CI_SQL} AS k_ci
            FROM cum JOIN tot USING (event_type)),
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(MIN(CASE WHEN cum >= (npairs + 1) // 2 THEN d END)
                        AS BIGINT) AS hl_lo_cents,
                   CAST(MIN(CASE WHEN cum >= npairs // 2 + 1 THEN d END)
                        AS BIGINT) AS hl_hi_cents,
                   CAST(MIN(CASE WHEN cum >= k_ci THEN d END) AS BIGINT)
                       AS ci_lo_cents,
                   CAST(MIN(CASE WHEN cum >= npairs + 1 - k_ci THEN d END)
                        AS BIGINT) AS ci_hi_cents
            FROM rk GROUP BY 1)
        SELECT event_type, n_ref, n_cur, hl_lo_cents, hl_hi_cents,
               ci_lo_cents, ci_hi_cents,
               CAST(hl_lo_cents + hl_hi_cents AS DOUBLE) / 2
                   AS hl_shift_cents
        FROM agg ORDER BY event_type
    """
    sql["streaming_hodges_lehmann"] = sql["hodges_lehmann"]

    # Streaming weekly-shape GoF: availableNow (type, day) state ==
    # the batch daily reduction, so the batch oracle applies verbatim
    sql["streaming_dow_gof"] = sql["dow_activity_gof"]

    # Day-over-day Anderson–Darling: the _WKS_CORE day-shift pairing
    # with the fixed-point AD term sum keyed by (event_type, day);
    # AD_TERM_SQL / AD_STAT_SQL shared with the operator
    _WAD_CORE = """
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{day_filter}),
        tot AS (SELECT event_type, day, SUM(c_ref) AS n_ref,
                       SUM(c_cur) AS n_cur
                FROM pv GROUP BY 1, 2),
        ecdf AS (
            SELECT event_type, day, c_ref + c_cur AS l,
                   SUM(c_ref) OVER w AS c_ref,
                   SUM(c_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type, day ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        terms AS (
            SELECT e.event_type, e.day, n_ref, n_cur,
                   n_ref + n_cur AS nt, e.c_ref + e.c_cur AS b, l,
                   CAST(e.c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(e.c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT)
                       AS gap
            FROM ecdf e JOIN tot USING (event_type, day)),
        agg AS (
            SELECT event_type, day,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(SUM(CASE WHEN b < nt THEN {ad_term}
                            ELSE CAST(0 AS BIGINT) END) AS BIGINT)
                       AS ad_scaled
            FROM terms GROUP BY 1, 2)
        SELECT event_type, day, n_ref, n_cur, ad_scaled,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {ad_stat} END
                   AS ad_stat
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    _wad_stream_filter = (
        "\n                WHERE (day + 1) * 86400000 <="
        " (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
        " FROM events WHERE value IS NOT NULL)"
    )
    sql["windowed_anderson_darling"] = "WITH " + _WAD_CORE.format(
        day_filter="", ad_term=anomaly.AD_TERM_SQL, ad_stat=anomaly.AD_STAT_SQL
    )
    sql["streaming_windowed_anderson_darling"] = "WITH " + _WAD_CORE.format(
        day_filter=_wad_stream_filter,
        ad_term=anomaly.AD_TERM_SQL,
        ad_stat=anomaly.AD_STAT_SQL,
    )

    # Day-over-day Cliff's delta: the same day-shift pairing with the
    # pair-class cumsum coda keyed by (event_type, day)
    _WCD_CORE = """
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{day_filter}),
        stepped AS (
            SELECT event_type, day, c_ref, c_cur,
                   SUM(c_cur) OVER (
                       PARTITION BY event_type, day ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cur_incl
            FROM pv),
        agg AS (
            SELECT event_type, day,
                   CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl - c_cur AS HUGEINT)) AS a_before,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl AS HUGEINT)) AS b_incl
            FROM stepped GROUP BY 1, 2)
        SELECT event_type, day, n_ref, n_cur,
               CAST(a_before AS BIGINT) AS gt_pairs,
               CAST(CAST(n_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                    - b_incl AS BIGINT) AS lt_pairs,
               CAST(b_incl - a_before AS BIGINT) AS tie_pairs,
               CAST(a_before + b_incl - CAST(n_ref AS HUGEINT)
                    * CAST(n_cur AS HUGEINT) AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) AS delta
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    sql["windowed_cliffs_delta"] = "WITH " + _WCD_CORE.format(day_filter="")
    sql["streaming_windowed_cliffs"] = "WITH " + _WCD_CORE.format(
        day_filter=_wad_stream_filter
    )

    # Seasonal (Hirsch–Slack) Mann–Kendall: the MK oracle keyed by
    # (event_type, weekday) over the same dense daily spine; weekday
    # from pure integer epoch-day arithmetic (the dow_activity_gof
    # rule)
    sql["seasonal_mann_kendall"] = f"""
        WITH {_DENSE_DAILY},
        sd AS (SELECT event_type, CAST((day + 4) % 7 AS INTEGER) AS dow,
                      day, y
               FROM dense),
        s AS (
            SELECT a.event_type, a.dow,
                   CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END)
                        AS BIGINT) AS s_stat
            FROM sd a JOIN sd b
              ON a.event_type = b.event_type AND a.dow = b.dow
             AND a.day < b.day
            GROUP BY 1, 2),
        ties AS (
            SELECT event_type, dow,
                   CAST(SUM(t) AS BIGINT) AS n_days,
                   CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
            FROM (SELECT event_type, dow, y, CAST(count(*) AS BIGINT) AS t
                  FROM sd GROUP BY 1, 2, 3)
            GROUP BY 1, 2)
        SELECT event_type, dow, n_days,
               coalesce(s_stat, 0) AS s_stat, tie_term
        FROM ties LEFT JOIN s USING (event_type, dow)
        ORDER BY event_type, dow
    """
    sql["streaming_seasonal_mann_kendall"] = sql["seasonal_mann_kendall"]

    # Jonckheere–Terpstra: dense 24×alphabet grid, cascaded prefix
    # sums (the kendall_tau technique), integral verdict components
    sql["jonckheere_terpstra"] = """
        WITH pc AS (
            SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        vals AS (SELECT DISTINCT event_type, cents FROM pc),
        grid AS (
            SELECT v.event_type, hh.h, v.cents, coalesce(pc.c, 0) AS c
            FROM vals v
            CROSS JOIN (SELECT range AS h FROM range(24)) hh
            LEFT JOIN pc ON pc.event_type = v.event_type
                        AND pc.h = hh.h AND pc.cents = v.cents),
        staged AS (
            SELECT event_type, h, cents, c,
                   coalesce(SUM(c) OVER (
                       PARTITION BY event_type, cents ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS eq_before
            FROM grid),
        staged2 AS (
            SELECT event_type, h, cents, c, eq_before,
                   coalesce(SUM(eq_before) OVER (
                       PARTITION BY event_type, h ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS lt_before
            FROM staged),
        jt AS (
            SELECT event_type,
                   SUM(CAST(c AS HUGEINT)
                       * CAST(2 * lt_before + eq_before AS HUGEINT)) AS jt2d
            FROM staged2 GROUP BY 1),
        grp AS (
            SELECT event_type,
                   CAST(SUM(n_h) AS BIGINT) AS n_total,
                   CAST(SUM(n_h * n_h) AS BIGINT) AS sum_n2,
                   CAST(SUM(n_h * (n_h - 1) * (2 * n_h + 5)) AS BIGINT)
                       AS grp_t1,
                   CAST(SUM(n_h * (n_h - 1) * (n_h - 2)) AS BIGINT)
                       AS grp_t2,
                   CAST(SUM(n_h * (n_h - 1)) AS BIGINT) AS grp_t3
            FROM (SELECT event_type, h, SUM(c) AS n_h
                  FROM pc GROUP BY 1, 2)
            GROUP BY 1),
        val AS (
            SELECT event_type,
                   CAST(SUM(t_v * (t_v - 1) * (2 * t_v + 5)) AS BIGINT)
                       AS val_t1,
                   CAST(SUM(t_v * (t_v - 1) * (t_v - 2)) AS BIGINT)
                       AS val_t2,
                   CAST(SUM(t_v * (t_v - 1)) AS BIGINT) AS val_t3
            FROM (SELECT event_type, cents, SUM(c) AS t_v
                  FROM pc GROUP BY 1, 2)
            GROUP BY 1)
        SELECT g.event_type, n_total,
               CAST(coalesce(jt2d, 0) AS BIGINT) AS jt2, sum_n2,
               grp_t1, grp_t2, grp_t3, val_t1, val_t2, val_t3
        FROM grp g JOIN val USING (event_type) LEFT JOIN jt USING (event_type)
        ORDER BY event_type
    """
    sql["streaming_jonckheere"] = sql["jonckheere_terpstra"]

    # Day-over-day CvM and Kuiper: the _WAD_CORE day-shift spine with
    # the integer-L2 / signed-two-maxima codas; stat SQL shared
    _WCVM_CORE = """
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{day_filter}),
        tot AS (SELECT event_type, day, SUM(c_ref) AS n_ref,
                       SUM(c_cur) AS n_cur
                FROM pv GROUP BY 1, 2),
        ecdf AS (
            SELECT event_type, day, c_ref + c_cur AS l,
                   SUM(c_ref) OVER w AS c_ref,
                   SUM(c_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type, day ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        terms AS (
            SELECT e.event_type, e.day, n_ref, n_cur,
                   n_ref + n_cur AS nt, l,
                   CAST(e.c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(e.c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT)
                       AS gap
            FROM ecdf e JOIN tot USING (event_type, day)),
        agg AS (
            SELECT event_type, day,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(first(nt) AS BIGINT) AS nt,
                   SUM(CAST(l AS HUGEINT) * gap * gap) AS cvm_num,
                   CAST(greatest(MAX(gap), 0) AS BIGINT) AS d_plus_num,
                   CAST(greatest(MAX(-gap), 0) AS BIGINT) AS d_minus_num
            FROM terms GROUP BY 1, 2)
    """
    sql["windowed_cramer_von_mises"] = (
        "WITH "
        + _WCVM_CORE.format(day_filter="")
        + f"""
        SELECT event_type, day, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {anomaly.CVM_STAT_SQL}
                    END AS cvm_stat
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    )
    sql["streaming_windowed_cvm"] = (
        "WITH "
        + _WCVM_CORE.format(day_filter=_wad_stream_filter)
        + f"""
        SELECT event_type, day, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {anomaly.CVM_STAT_SQL}
                    END AS cvm_stat
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    )
    sql["windowed_kuiper"] = (
        "WITH "
        + _WCVM_CORE.format(day_filter="")
        + f"""
        SELECT event_type, day, n_ref, n_cur, d_plus_num, d_minus_num,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN {anomaly.KUIPER_STAT_SQL} END AS kuiper_v
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    )
    sql["streaming_windowed_kuiper"] = (
        "WITH "
        + _WCVM_CORE.format(day_filter=_wad_stream_filter)
        + f"""
        SELECT event_type, day, n_ref, n_cur, d_plus_num, d_minus_num,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN {anomaly.KUIPER_STAT_SQL} END AS kuiper_v
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1 ORDER BY event_type, day
    """
    )

    # Ansari–Bradley: rank spans from the half-count relation, the
    # operator's own shared f2/term/stat SQL constants
    _ab_f2_hi = anomaly.AB_F2_SQL.format(x="b_rank")
    _ab_f2_lo = anomaly.AB_F2_SQL.format(x="(b_rank - t)")
    sql["ansari_bradley"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS d_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS d_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(d_ref) AS n_ref, SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1),
        spans AS (
            SELECT event_type, d_ref AS c_ref, d_ref + d_cur AS t,
                   SUM(d_ref + d_cur) OVER (
                       PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_rank
            FROM pv),
        terms AS (
            SELECT s.event_type, n_ref, n_cur, n_ref + n_cur AS nt,
                   c_ref, t, b_rank
            FROM spans s JOIN tot USING (event_type)),
        t2 AS (
            SELECT event_type, n_ref, n_cur, c_ref, t,
                   ({_ab_f2_hi} - {_ab_f2_lo}) AS s2
            FROM terms),
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(SUM({anomaly.AB_TERM_SQL}) AS BIGINT) AS ab_scaled
            FROM t2 GROUP BY 1)
        SELECT event_type, n_ref, n_cur, ab_scaled,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN {anomaly.AB_STAT_SQL} END AS ab_stat
        FROM agg ORDER BY event_type
    """
    sql["streaming_ansari_bradley"] = sql["ansari_bradley"]

    # Mood squared-rank scale test: the ansari_bradley CTE spine with
    # the integer doubled-centered deviation; every emitted column is
    # an exact integral component (no DOUBLE at the edge at all)
    sql["mood_scale_test"] = """
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS d_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS d_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(d_ref) AS n_ref, SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1),
        spans AS (
            SELECT event_type, d_ref AS c_ref, d_ref + d_cur AS t,
                   SUM(d_ref + d_cur) OVER (
                       PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_rank
            FROM pv),
        terms AS (
            SELECT s.event_type, n_ref, n_cur, c_ref, t,
                   2 * (b_rank - t) + t - (n_ref + n_cur) AS dev
            FROM spans s JOIN tot USING (event_type))
        SELECT event_type,
               CAST(first(n_ref) AS BIGINT) AS n_ref,
               CAST(first(n_cur) AS BIGINT) AS n_cur,
               CAST(SUM(CAST(c_ref AS HUGEINT) * CAST(dev AS HUGEINT)
                        * CAST(dev AS HUGEINT)) AS BIGINT) AS m4,
               CAST(SUM(CAST(t AS HUGEINT) * CAST(dev AS HUGEINT)
                        * CAST(dev AS HUGEINT)) AS BIGINT) AS s2_pool,
               CAST(SUM(CAST(t AS HUGEINT) * CAST(dev AS HUGEINT)
                        * CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT)
                        * CAST(dev AS HUGEINT)) AS DOUBLE) AS s4_pool
        FROM terms GROUP BY 1 ORDER BY event_type
    """
    sql["streaming_mood_scale"] = sql["mood_scale_test"]

    # Per-source boilerplate mass: the top_dup_ngrams_by_source gram
    # CTEs, aggregated to a mass budget instead of a top-N
    sql["boilerplate_mass_by_source"] = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents
                   WHERE text IS NOT NULL),
        g AS (SELECT doc_id, source,
                     unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4]
                             for i in range(1, len(toks) - 3)]) AS gram
              FROM t),
        c AS (SELECT source, gram,
                     CAST(count(*) AS BIGINT) AS n_occ,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM g GROUP BY 1, 2)
        SELECT source,
               CAST(SUM(n_occ) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END)
                    AS BIGINT) AS dup_gram_occurrences,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CASE WHEN SUM(n_occ) > 0 THEN
                    CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END)
                         AS DOUBLE) / CAST(SUM(n_occ) AS DOUBLE) END
                   AS dup_mass_share
        FROM c GROUP BY 1 ORDER BY 1
    """

    # Lepage omnibus: the ansari_bradley CTE spine extended with the
    # mwu integer components and the tie-aware AB second moment; every
    # edge fragment (LEPAGE_*_SQL) is the operator's own constant,
    # shared verbatim
    sql["lepage_test"] = f"""
        WITH st AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events),
        pv AS (
            SELECT event_type, value,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 1 ELSE 0 END) AS d_ref,
                   SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2
                            THEN 0 ELSE 1 END) AS d_cur
            FROM events, st WHERE value IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(d_ref) AS n_ref, SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1),
        spans AS (
            SELECT event_type, d_ref AS c_ref, d_ref + d_cur AS t,
                   SUM(d_ref + d_cur) OVER (
                       PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_rank
            FROM pv),
        terms AS (
            SELECT s.event_type, n_ref, n_cur, n_ref + n_cur AS nt,
                   c_ref, t, b_rank
            FROM spans s JOIN tot USING (event_type)),
        t2 AS (
            SELECT event_type, n_ref, n_cur, nt, c_ref, t, b_rank,
                   ({_ab_f2_hi} - {_ab_f2_lo}) AS s2
            FROM terms),
        agg AS (
            SELECT event_type,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(first(nt) AS BIGINT) AS nt,
                   CAST(SUM({anomaly.AB_TERM_SQL}) AS BIGINT) AS ab_scaled,
                   SUM(CAST({anomaly.LEPAGE_AB2_TERM_SQL} AS HUGEINT))
                       AS ab2_scaled,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(2 * (b_rank - t) + t + 1 AS HUGEINT)) AS r2_ref,
                   SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                       * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie_cube
            FROM t2 GROUP BY 1),
        m AS (
            SELECT event_type, n_ref, n_cur, nt, ab_scaled, ab2_scaled,
                   CAST(r2_ref - CAST(n_ref AS HUGEINT) * (n_ref + 1)
                        - CAST(n_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                        AS BIGINT) AS z_num,
                   CAST(CAST(nt AS HUGEINT) * nt * nt - nt - tie_cube
                        AS BIGINT) AS tie_term
            FROM agg WHERE n_ref >= 1 AND n_cur >= 1),
        z AS (
            SELECT event_type, n_ref, n_cur,
                   {anomaly.LEPAGE_W_Z2_SQL} AS w_z2,
                   {anomaly.LEPAGE_AB_Z2_SQL} AS ab_z2
            FROM m)
        SELECT event_type, n_ref, n_cur, w_z2, ab_z2,
               w_z2 + ab_z2 AS lepage_stat
        FROM z ORDER BY event_type
    """
    sql["streaming_lepage"] = sql["lepage_test"]

    # Cohort-keyed windowed drift (KS + W1): the _WKS_CORE/_WW1_CORE
    # shapes with the bounded cohort key threaded through every key
    # list; the cohort expression mirrors util.COHORT_SQL (json k
    # bucket, NULL→-1) — see module-level COHORT_DUCK_SQL.
    _COHORT_DUCK = COHORT_DUCK_SQL
    _WKSC_CORE = f"""
        c AS (SELECT event_type, {_COHORT_DUCK} AS cohort,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3, 4),
        pv0 AS (
            SELECT event_type, cohort, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, cohort, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, cohort, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, cohort, day, cents)),
        pv AS (SELECT * FROM pv0{{day_filter}}),
        tot AS (SELECT event_type, cohort, day, SUM(c_ref) AS n_ref,
                       SUM(c_cur) AS n_cur
                FROM pv GROUP BY 1, 2, 3),
        ecdf AS (
            SELECT event_type, cohort, day,
                   SUM(c_ref) OVER w AS c_ref,
                   SUM(c_cur) OVER w AS c_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type, cohort, day ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gaps AS (
            SELECT e.event_type, e.cohort, e.day, n_ref, n_cur,
                   abs(CAST(c_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(c_cur AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       AS gap
            FROM ecdf e JOIN tot USING (event_type, cohort, day)),
        mx AS (
            SELECT event_type, cohort, day,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   MAX(gap) AS ks_num
            FROM gaps GROUP BY 1, 2, 3)
        SELECT event_type, cohort, day, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN {{ks_stat}} END AS ks_d
        FROM mx WHERE n_ref >= 1 AND n_cur >= 1
        ORDER BY event_type, cohort, day
    """
    _wstream_day_filter = (
        "\n                WHERE (day + 1) * 86400000 <="
        " (SELECT (max(epoch_us(ts)) // 1000) - 3600000"
        " FROM events WHERE value IS NOT NULL)"
    )
    sql["windowed_ks_by_cohort"] = "WITH " + _WKSC_CORE.format(
        day_filter="", ks_stat=anomaly.KS_STAT_SQL
    )
    # the ingest-column path computes the SAME panel (the cohort
    # projection is definitionally COHORT_SQL), so the oracle is shared
    sql["windowed_ks_by_cohort_enriched"] = sql["windowed_ks_by_cohort"]
    sql["streaming_windowed_ks_by_cohort"] = "WITH " + _WKSC_CORE.format(
        day_filter=_wstream_day_filter, ks_stat=anomaly.KS_STAT_SQL
    )
    _WW1C_CORE = f"""
        c AS (SELECT event_type, {_COHORT_DUCK} AS cohort,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3, 4),
        pv0 AS (
            SELECT event_type, cohort, day, cents,
                   coalesce(r.c_ref, 0) AS c_ref,
                   coalesce(u.c_cur, 0) AS c_cur
            FROM (SELECT event_type, cohort, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, cohort, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, cohort, day, cents)),
        pv AS (SELECT * FROM pv0{{day_filter}}),
        stepped AS (
            SELECT event_type, cohort, day, cents,
                   SUM(c_ref) OVER w AS cum_ref,
                   SUM(c_cur) OVER w AS cum_cur,
                   lead(cents) OVER (PARTITION BY event_type, cohort, day
                                     ORDER BY cents) AS nxt,
                   SUM(c_ref) OVER wa AS n_ref,
                   SUM(c_cur) OVER wa AS n_cur
            FROM pv
            WINDOW w AS (PARTITION BY event_type, cohort, day ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wa AS (PARTITION BY event_type, cohort, day)),
        agg AS (
            SELECT event_type, cohort, day,
                   CAST(max(n_ref) AS BIGINT) AS n_ref,
                   CAST(max(n_cur) AS BIGINT) AS n_cur,
                   SUM(CASE WHEN nxt IS NULL THEN CAST(0 AS HUGEINT) ELSE
                       abs(CAST(cum_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                         - CAST(cum_cur AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       * CAST(nxt - cents AS HUGEINT) END) AS acc
            FROM stepped GROUP BY 1, 2, 3)
        SELECT event_type, cohort, day, n_ref, n_cur,
               CAST(acc AS DOUBLE)
                   / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * 100.0)
                   AS w1_value
        FROM agg WHERE n_ref >= 1 AND n_cur >= 1
        ORDER BY event_type, cohort, day
    """
    sql["windowed_wasserstein_by_cohort"] = "WITH " + _WW1C_CORE.format(
        day_filter=""
    )
    sql["streaming_windowed_w1_by_cohort"] = "WITH " + _WW1C_CORE.format(
        day_filter=_wstream_day_filter
    )

    # Changepoint pair over the daily (type, day, Σcents, count)
    # relation. Pettitt: exact integer sign algebra via the
    # U_t = −Σ_{d≤t} r_d identity; the only double is the rounded
    # significance fragment (PETTITT_P_SQL, shared verbatim).
    _DAILY_CTE = """
        daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                         SUM(CAST(round(value * 100) AS BIGINT)) AS s,
                         count(*) AS c
                  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
    """
    sql["pettitt_test"] = f"""
        WITH {_DAILY_CTE},
        r AS (
            SELECT d.event_type, d.day AS d,
                   CAST(SUM(CASE
                       WHEN CAST(d.s AS HUGEINT) * e.c
                            > CAST(e.s AS HUGEINT) * d.c THEN 1
                       WHEN CAST(d.s AS HUGEINT) * e.c
                            < CAST(e.s AS HUGEINT) * d.c THEN -1
                       ELSE 0 END) AS BIGINT) AS r
            FROM daily d JOIN daily e USING (event_type) GROUP BY 1, 2),
        u AS (
            SELECT event_type, d,
                   -SUM(r) OVER (PARTITION BY event_type ORDER BY d
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS u
            FROM r),
        k AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(max(abs(u)) AS BIGINT) AS k_stat
              FROM u GROUP BY 1),
        ch AS (SELECT u.event_type, CAST(min(d) AS BIGINT) AS change_day
               FROM u JOIN k USING (event_type)
               WHERE abs(u) = k_stat GROUP BY 1)
        SELECT event_type, n_days, k_stat, change_day,
               {anomaly.PETTITT_P_SQL} AS p_approx
        FROM k JOIN ch USING (event_type) ORDER BY event_type
    """
    sql["streaming_pettitt"] = sql["pettitt_test"]

    # Page–Hinkley: truncating integer division throughout (both
    # engines' // and div truncate toward zero — the NOTES rule), δ =
    # 25 cents and λ = 200 cents in mu-units (×10⁴: 250000 / 2000000);
    # gaps descale to VALUE units (/10⁶)
    sql["page_hinkley"] = f"""
        WITH {_DAILY_CTE},
        mu AS (SELECT event_type, day, (s * 10000) // c AS mu FROM daily),
        cums AS (
            SELECT event_type, day,
                   SUM(mu) OVER w AS cum_mu,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS t
            FROM mu
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        xb AS (SELECT event_type, day, t, cum_mu, cum_mu // t AS xb
               FROM cums),
        m AS (
            SELECT event_type, day, t,
                   cum_mu - SUM(xb) OVER w AS cum_dev
            FROM xb
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        m2 AS (SELECT event_type, day,
                      cum_dev - t * 250000 AS m_up,
                      cum_dev + t * 250000 AS m_dn
               FROM m),
        ph AS (
            SELECT event_type, day,
                   m_up - MIN(m_up) OVER w AS ph_up,
                   MAX(m_dn) OVER w - m_dn AS ph_dn
            FROM m2
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(max(ph_up) AS DOUBLE) / 1000000.0 AS ph_up_max,
               CAST(max(ph_dn) AS DOUBLE) / 1000000.0 AS ph_dn_max,
               CAST(min(CASE WHEN ph_up > 2000000 OR ph_dn > 2000000
                             THEN day END) AS BIGINT) AS first_alarm_day,
               CAST(SUM(CASE WHEN ph_up > 2000000 OR ph_dn > 2000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days
        FROM ph GROUP BY 1 ORDER BY 1
    """
    sql["streaming_page_hinkley"] = sql["page_hinkley"]

    # Day-over-day Lepage: the _WKS_CORE day-shift pairing feeding the
    # lepage_test CTE algebra keyed by (event_type, day); the operator's
    # LEPAGE_*_SQL edge fragments verbatim (nt present in every scope
    # AB_F2_SQL is interpolated into)
    _WLEP_CORE = f"""
        c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     count(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        pv0 AS (
            SELECT event_type, day, cents AS value,
                   coalesce(r.c_ref, 0) AS d_ref,
                   coalesce(u.c_cur, 0) AS d_cur
            FROM (SELECT event_type, day, cents, c AS c_cur FROM c) u
            FULL JOIN (SELECT event_type, day + 1 AS day, cents,
                              c AS c_ref FROM c) r
            USING (event_type, day, cents)),
        pv AS (SELECT * FROM pv0{{day_filter}}),
        tot AS (SELECT event_type, day, SUM(d_ref) AS n_ref,
                       SUM(d_cur) AS n_cur
                FROM pv GROUP BY 1, 2),
        spans AS (
            SELECT event_type, day, d_ref AS c_ref, d_ref + d_cur AS t,
                   SUM(d_ref + d_cur) OVER (
                       PARTITION BY event_type, day ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_rank
            FROM pv),
        terms AS (
            SELECT s.event_type, s.day, n_ref, n_cur, n_ref + n_cur AS nt,
                   c_ref, t, b_rank
            FROM spans s JOIN tot USING (event_type, day)),
        t2 AS (
            SELECT event_type, day, n_ref, n_cur, nt, c_ref, t, b_rank,
                   ({_ab_f2_hi} - {_ab_f2_lo}) AS s2
            FROM terms),
        agg AS (
            SELECT event_type, day,
                   CAST(first(n_ref) AS BIGINT) AS n_ref,
                   CAST(first(n_cur) AS BIGINT) AS n_cur,
                   CAST(first(nt) AS BIGINT) AS nt,
                   CAST(SUM({anomaly.AB_TERM_SQL}) AS BIGINT) AS ab_scaled,
                   SUM(CAST({anomaly.LEPAGE_AB2_TERM_SQL} AS HUGEINT))
                       AS ab2_scaled,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(2 * (b_rank - t) + t + 1 AS HUGEINT)) AS r2_ref,
                   SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
                       * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie_cube
            FROM t2 GROUP BY 1, 2),
        m AS (
            SELECT event_type, day, n_ref, n_cur, nt, ab_scaled, ab2_scaled,
                   CAST(r2_ref - CAST(n_ref AS HUGEINT) * (n_ref + 1)
                        - CAST(n_ref AS HUGEINT) * CAST(n_cur AS HUGEINT)
                        AS BIGINT) AS z_num,
                   CAST(CAST(nt AS HUGEINT) * nt * nt - nt - tie_cube
                        AS BIGINT) AS tie_term
            FROM agg WHERE n_ref >= 1 AND n_cur >= 1),
        z AS (
            SELECT event_type, day, n_ref, n_cur,
                   {anomaly.LEPAGE_W_Z2_SQL} AS w_z2,
                   {anomaly.LEPAGE_AB_Z2_SQL} AS ab_z2
            FROM m)
        SELECT event_type, day, n_ref, n_cur, w_z2, ab_z2,
               w_z2 + ab_z2 AS lepage_stat
        FROM z ORDER BY event_type, day
    """
    sql["windowed_lepage"] = "WITH " + _WLEP_CORE.format(day_filter="")
    sql["streaming_windowed_lepage"] = "WITH " + _WLEP_CORE.format(
        day_filter=_wstream_day_filter
    )

    # Friedman: within-day midranks by exact sign comparisons over the
    # daily sufficient statistics; FRIEDMAN_CHI2_SQL shared verbatim
    sql["friedman_test"] = f"""
        WITH {_DAILY_CTE},
        kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
               FROM daily),
        complete AS (
            SELECT day FROM daily, kk GROUP BY day, k
            HAVING count(*) = max(k)),
        dc AS (SELECT d.* FROM daily d JOIN complete USING (day)),
        ranks AS (
            SELECT a.day, a.event_type AS et,
                   CAST(2 * SUM(CASE WHEN CAST(b.s AS HUGEINT) * a.c
                                          < CAST(a.s AS HUGEINT) * b.c
                                     THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN CAST(b.s AS HUGEINT) * a.c
                                        = CAST(a.s AS HUGEINT) * b.c
                                   THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2
            FROM dc a JOIN dc b USING (day) GROUP BY 1, 2),
        gsum AS (
            SELECT et, CAST(SUM(r2) AS BIGINT) AS r2_sum,
                   CAST(count(*) AS BIGINT) AS n_blocks
            FROM ranks GROUP BY 1),
        scalars AS (
            SELECT CAST(SUM(CAST(r2_sum AS HUGEINT)
                            * CAST(r2_sum AS HUGEINT)) AS BIGINT) AS b4n,
                   CAST(count(*) AS BIGINT) AS k
            FROM gsum),
        a4s AS (
            SELECT CAST(SUM(CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT))
                        AS BIGINT) AS a4
            FROM ranks),
        final AS (
            SELECT g.et AS event_type, g.n_blocks, s.k, g.r2_sum,
                   CAST(g.r2_sum AS DOUBLE)
                       / (2.0 * CAST(g.n_blocks AS DOUBLE)) AS mean_rank,
                   CAST(g.n_blocks * s.k * (s.k + 1) * (s.k + 1)
                        AS BIGINT) AS c4n,
                   a.a4, s.b4n
            FROM gsum g, scalars s, a4s a)
        SELECT event_type, n_blocks, k, r2_sum, mean_rank,
               {analytics.FRIEDMAN_CHI2_SQL} AS chi2_f
        FROM final ORDER BY event_type
    """
    sql["streaming_friedman"] = sql["friedman_test"]

    # Quade: the friedman within-day rank spine + integer fixed-point
    # day ranges ((s*10^4)//c, the page_hinkley rule) ranked across
    # days; QUADE_F_SQL shared verbatim
    sql["quade_test"] = f"""
        WITH {_DAILY_CTE},
        kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
               FROM daily),
        complete AS (
            SELECT day FROM daily, kk GROUP BY day, k
            HAVING count(*) = max(k)),
        dc AS (SELECT d.* FROM daily d JOIN complete USING (day)),
        cells AS (
            SELECT a.day, a.event_type AS et,
                   CAST(2 * SUM(CASE WHEN CAST(b.s AS HUGEINT) * a.c
                                          < CAST(a.s AS HUGEINT) * b.c
                                     THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN CAST(b.s AS HUGEINT) * a.c
                                        = CAST(a.s AS HUGEINT) * b.c
                                   THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2,
                   CAST(MAX((b.s * 10000) // b.c)
                        - MIN((b.s * 10000) // b.c) AS BIGINT) AS rng
            FROM dc a JOIN dc b USING (day) GROUP BY 1, 2),
        dr AS (SELECT DISTINCT day, rng FROM cells),
        q2 AS (
            SELECT x.day,
                   CAST(2 * SUM(CASE WHEN y.rng < x.rng THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN y.rng = x.rng THEN 1 ELSE 0 END)
                        + 1 AS BIGINT) AS q2
            FROM dr x, dr y GROUP BY x.day, x.rng),
        scored AS (
            SELECT c.day, c.et, k.k,
                   CAST(q.q2 * (c.r2 - (k.k + 1)) AS BIGINT) AS s4
            FROM cells c JOIN q2 q USING (day), kk k),
        pt AS (
            SELECT et, CAST(first(k) AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(s4) AS BIGINT) AS s4_sum
            FROM scored GROUP BY 1),
        scalars AS (
            SELECT CAST(SUM(CAST(s4_sum AS HUGEINT)
                            * CAST(s4_sum AS HUGEINT)) AS BIGINT) AS b16n
            FROM pt),
        a16s AS (
            SELECT CAST(SUM(CAST(s4 AS HUGEINT) * CAST(s4 AS HUGEINT))
                        AS BIGINT) AS a16
            FROM scored),
        final AS (
            SELECT p.et AS event_type, p.n_blocks, p.k, p.s4_sum,
                   a.a16, s.b16n
            FROM pt p, scalars s, a16s a)
        SELECT event_type, n_blocks, k, s4_sum,
               {analytics.QUADE_F_SQL} AS quade_f
        FROM final ORDER BY event_type
    """
    sql["streaming_quade"] = sql["quade_test"]

    # One-vs-rest per-source length panel: leave-one-out algebra over
    # the (source, n_chars) count relation; KS_STAT_SQL + the cliffs
    # pair identities shared verbatim
    sql["source_length_drift"] = f"""
        WITH counts AS (
            SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS own
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT v, CAST(SUM(own) AS BIGINT) AS g
                FROM counts GROUP BY 1),
        srcs AS (SELECT DISTINCT source FROM counts),
        grid AS (
            SELECT s.source, t.v,
                   coalesce(c.own, 0) AS c_cur,
                   t.g - coalesce(c.own, 0) AS c_ref
            FROM srcs s CROSS JOIN tot t
            LEFT JOIN counts c ON c.source = s.source AND c.v = t.v),
        kt AS (SELECT source, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur
               FROM grid GROUP BY 1),
        ecdf AS (
            SELECT source,
                   SUM(c_ref) OVER w AS ccr, SUM(c_cur) OVER w AS ccc
            FROM grid
            WINDOW w AS (PARTITION BY source ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gaps AS (
            SELECT e.source, n_ref, n_cur,
                   abs(CAST(ccr AS HUGEINT) * CAST(n_cur AS HUGEINT)
                       - CAST(ccc AS HUGEINT) * CAST(n_ref AS HUGEINT))
                       AS gap
            FROM ecdf e JOIN kt USING (source)),
        mx AS (SELECT source, CAST(first(n_ref) AS BIGINT) AS n_ref,
                      CAST(first(n_cur) AS BIGINT) AS n_cur,
                      MAX(gap) AS ks_num
               FROM gaps GROUP BY 1),
        st AS (
            SELECT source, c_ref, c_cur,
                   SUM(c_cur) OVER w AS cum_cur_incl
            FROM grid
            WINDOW w AS (PARTITION BY source ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        ca AS (
            SELECT source,
                   SUM(c_ref) AS n_ref2, SUM(c_cur) AS n_cur2,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl - c_cur AS HUGEINT)) AS a_before,
                   SUM(CAST(c_ref AS HUGEINT)
                       * CAST(cum_cur_incl AS HUGEINT)) AS b_incl
            FROM st GROUP BY 1)
        SELECT m.source, m.n_ref, m.n_cur,
               CASE WHEN m.n_ref > 0 AND m.n_cur > 0
                    THEN {anomaly.KS_STAT_SQL} END AS ks_d,
               CAST(a_before + b_incl
                    - CAST(n_ref2 AS HUGEINT) * CAST(n_cur2 AS HUGEINT)
                    AS DOUBLE)
                   / (CAST(n_ref2 AS DOUBLE) * CAST(n_cur2 AS DOUBLE))
                   AS delta
        FROM mx m JOIN ca USING (source)
        WHERE m.n_ref >= 1 AND m.n_cur >= 1
        ORDER BY m.source
    """

    # Pettitt keyed by (type, cohort): the pettitt_test CTE spine with
    # the bounded cohort key threaded through
    sql["pettitt_by_cohort"] = f"""
        WITH daily AS (
            SELECT event_type, {_COHORT_DUCK} AS cohort,
                   epoch_us(ts) // 86400000000 AS day,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS s,
                   count(*) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        r AS (
            SELECT d.event_type, d.cohort, d.day AS d,
                   CAST(SUM(CASE
                       WHEN CAST(d.s AS HUGEINT) * e.c
                            > CAST(e.s AS HUGEINT) * d.c THEN 1
                       WHEN CAST(d.s AS HUGEINT) * e.c
                            < CAST(e.s AS HUGEINT) * d.c THEN -1
                       ELSE 0 END) AS BIGINT) AS r
            FROM daily d JOIN daily e USING (event_type, cohort)
            GROUP BY 1, 2, 3),
        u AS (
            SELECT event_type, cohort, d,
                   -SUM(r) OVER (PARTITION BY event_type, cohort ORDER BY d
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS u
            FROM r),
        k AS (SELECT event_type, cohort,
                     CAST(count(*) AS BIGINT) AS n_days,
                     CAST(max(abs(u)) AS BIGINT) AS k_stat
              FROM u GROUP BY 1, 2),
        ch AS (SELECT u.event_type, u.cohort,
                      CAST(min(d) AS BIGINT) AS change_day
               FROM u JOIN k USING (event_type, cohort)
               WHERE abs(u) = k_stat GROUP BY 1, 2)
        SELECT event_type, cohort, n_days, k_stat, change_day,
               {anomaly.PETTITT_P_SQL} AS p_approx
        FROM k JOIN ch USING (event_type, cohort)
        ORDER BY event_type, cohort
    """
    sql["streaming_pettitt_by_cohort"] = sql["pettitt_by_cohort"]

    # Page–Hinkley keyed by (type, cohort): the page_hinkley CTE spine
    # with the cohort key threaded through every partition/group list
    sql["page_hinkley_by_cohort"] = f"""
        WITH daily AS (
            SELECT event_type, {_COHORT_DUCK} AS cohort,
                   epoch_us(ts) // 86400000000 AS day,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS s,
                   count(*) AS c
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        mu AS (SELECT event_type, cohort, day, (s * 10000) // c AS mu
               FROM daily),
        cums AS (
            SELECT event_type, cohort, day,
                   SUM(mu) OVER w AS cum_mu,
                   row_number() OVER (PARTITION BY event_type, cohort
                                      ORDER BY day) AS t
            FROM mu
            WINDOW w AS (PARTITION BY event_type, cohort ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        xb AS (SELECT event_type, cohort, day, t, cum_mu, cum_mu // t AS xb
               FROM cums),
        m AS (
            SELECT event_type, cohort, day, t,
                   cum_mu - SUM(xb) OVER w AS cum_dev
            FROM xb
            WINDOW w AS (PARTITION BY event_type, cohort ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        m2 AS (SELECT event_type, cohort, day,
                      cum_dev - t * 250000 AS m_up,
                      cum_dev + t * 250000 AS m_dn
               FROM m),
        ph AS (
            SELECT event_type, cohort, day,
                   m_up - MIN(m_up) OVER w AS ph_up,
                   MAX(m_dn) OVER w - m_dn AS ph_dn
            FROM m2
            WINDOW w AS (PARTITION BY event_type, cohort ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type, cohort,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(max(ph_up) AS DOUBLE) / 1000000.0 AS ph_up_max,
               CAST(max(ph_dn) AS DOUBLE) / 1000000.0 AS ph_dn_max,
               CAST(min(CASE WHEN ph_up > 2000000 OR ph_dn > 2000000
                             THEN day END) AS BIGINT) AS first_alarm_day,
               CAST(SUM(CASE WHEN ph_up > 2000000 OR ph_dn > 2000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days
        FROM ph GROUP BY 1, 2 ORDER BY 1, 2
    """
    sql["streaming_ph_by_cohort"] = sql["page_hinkley_by_cohort"]

    # Rollout-review report: extrema + deterministic argmax (smallest
    # cohort id) over the cohort W1 relation — the _WW1C_CORE CTE
    # prefix (everything before its final SELECT) wrapped once more.
    # The marker split is guarded: if _WW1C_CORE's final-SELECT line
    # is ever reworded, fail HERE with a pointed message instead of
    # emitting two stacked SELECTs that die as a DuckDB parse error
    # at driver time (r12 review).
    _ww1c = _WW1C_CORE.format(day_filter="")
    _ww1c_marker = "SELECT event_type, cohort, day, n_ref, n_cur,"
    assert _ww1c_marker in _ww1c, (
        "cohort_drift_summary oracle: _WW1C_CORE final-SELECT marker "
        "moved — update _ww1c_marker to match"
    )
    sql["cohort_drift_summary"] = (
        "WITH "
        + _ww1c.split(_ww1c_marker)[0]
        + """,
        w1 AS (
            SELECT event_type, cohort, day,
                   CAST(acc AS DOUBLE)
                       / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)
                          * 100.0) AS w1_value
            FROM agg WHERE n_ref >= 1 AND n_cur >= 1),
        ext AS (
            SELECT event_type, day,
                   CAST(count(*) AS BIGINT) AS n_cohorts,
                   MAX(w1_value) AS w1_max, MIN(w1_value) AS w1_min
            FROM w1 GROUP BY 1, 2),
        worst AS (
            SELECT w.event_type, w.day,
                   CAST(MIN(cohort) AS BIGINT) AS worst_cohort
            FROM w1 w JOIN ext USING (event_type, day)
            WHERE w1_value = w1_max GROUP BY 1, 2)
        SELECT event_type, day, n_cohorts, worst_cohort, w1_max,
               w1_max - w1_min AS w1_spread
        FROM ext JOIN worst USING (event_type, day)
        ORDER BY event_type, day
    """
    )

    return sql
