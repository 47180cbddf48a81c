"""Physical-plan assertions — the 100 TB posture checks.

These tests fail if a future change silently de-optimizes a plan:
filters must reach the parquet scan, dimension joins must broadcast,
top-K must plan TakeOrderedAndProject, and shuffle counts must stay at
the operator's budget.
"""

from __future__ import annotations

from real_time_database_monitoring_system_spark.operators import monitoring, relational
from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_three_way_topk_plan(spark, sf_dir):
    df = relational.three_way_topk(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )
    assert checks.has_take_ordered(df), "top-K must plan TakeOrderedAndProject"
    assert checks.has_broadcast_join(df), "customer dim must broadcast"
    plan = checks.explain_str(df)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan or (
        "EqualTo(l_returnflag,R)" in plan
    ), "returnflag filter must push into parquet scan"


def test_pricing_summary_single_agg_shuffle(spark, sf_dir):
    df = relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))
    # one exchange for the keyed agg + one range exchange for the sort
    assert checks.count_exchanges(df) <= 2
    plan = checks.explain_str(df)
    assert "l_shipdate" in plan and "PushedFilters" in plan


def test_pricing_summary_prunes_columns(spark, sf_dir):
    df = relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))
    plan = checks.explain_str(df)
    # partkey/suppkey are not referenced and must not be read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_partkey" not in read_schema[0]


def test_slow_sessions_prunes_columns(spark, sf_dir):
    # the age filter is derived (vs the as_of scalar) so it cannot push
    # to the scan by design; column pruning must still drop props/value
    df = monitoring.slow_sessions(load_table(spark, sf_dir, "events"))
    plan = checks.explain_str(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("props" not in ln for ln in read_schema)


def test_topk_events_take_ordered(spark, sf_dir):
    df = relational.topk_global(load_table(spark, sf_dir, "events"))
    assert checks.has_take_ordered(df)


def test_minute_corr_join_broadcasts_dim(spark, sf_dir):
    df = monitoring.minute_corr_join(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    assert checks.has_broadcast_join(df)


def test_codegen_covers_agg_pipeline(spark, sf_dir):
    # AQE's unexecuted plan hides codegen markers; plan once without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = relational.cache_hit_ratio(load_table(spark, sf_dir, "lineitem"))
        assert checks.wholestage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_paginate_keyset_plan(spark, sf_dir):
    """Key-set pagination must be a pushed-filter scan + bounded top-k —
    no global row_number window like offset pagination."""
    base = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    df = monitoring.paginate_keyset(base, ["event_id"], after=(9,), page_size=10)
    plan = checks.explain_str(df)
    assert checks.has_take_ordered(df), "LIMIT after ORDER BY must plan TakeOrderedAndProject"
    assert "Window" not in plan, "keyset pagination must not use a global window"
    assert "GreaterThan(event_id,9)" in plan, "key predicate must push into the parquet scan"


def test_paginate_keyset_matches_offset_pagination(spark, sf_dir):
    base = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    offset = monitoring.paginate(base, ["event_id"], page=2, page_size=10).collect()
    keyset = monitoring.paginate_keyset(base, ["event_id"], after=(9,), page_size=10).collect()
    assert sorted(r.event_id for r in offset) == sorted(r.event_id for r in keyset)


def test_token_stats_single_scan_with_pre_explode_carries(spark, sf_dir):
    """text._token_counts carries row-level features through the
    tokenize pass: ONE scan of documents, and the carried regexp
    expressions must sit BELOW the Generate (computed once per
    document, not once per exploded token)."""
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    df = text_ops.token_stats(load_table(spark, sf_dir, "documents"))
    tree = checks.explain_str(df, "simple")
    assert tree.count("Scan parquet") == 1, "token_stats must scan documents once"
    # executed-plan string shows expressions inline: the carried regexp
    # must appear only below the Generate node
    full = df._jdf.queryExecution().executedPlan().toString()
    gen_idx = full.find("Generate")
    assert gen_idx != -1
    assert "regexp_extract_all" not in full[:gen_idx], (
        "carried regexp must not be evaluated above the Generate (per token)"
    )


def test_chunk_documents_shuffle_free_except_sort(spark, sf_dir):
    """Chunking is embarrassingly parallel: one scan, one generator,
    map-side slice — no aggregate/join exchange (only the spread
    repartition and the display sort survive)."""
    from real_time_database_monitoring_system_spark.operators import pipeline

    df = pipeline.chunk_documents(load_table(spark, sf_dir, "documents"))
    tree = checks.explain_str(df, "simple")
    assert tree.count("Scan parquet") == 1
    assert tree.count("Generate") == 1, "exactly one posexplode generator"
    plan = checks.explain_str(df)
    assert "hashpartitioning" not in plan or "REPARTITION_BY_NUM" in plan, (
        "no keyed shuffle: the only hash exchange allowed is the spread repartition"
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all(
        "lang" not in ln and "source" not in ln for ln in read_schema
    ), "chunking must prune to doc_id+text"


def test_pii_redact_single_scan_pruned(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    df = text_ops.pii_redact(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    tree = checks.explain_str(df, "simple")
    assert tree.count("Scan parquet") == 1, "pii_redact must scan documents once"
    plan = checks.explain_str(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("lang" not in ln for ln in read_schema)


def test_weighted_sample_take_ordered(spark, sf_dir):
    """The A-ES top-k must be per-partition heaps + one k-row
    reduction (TakeOrderedAndProject), never a global sort — the
    property that keeps weighted sampling map-side at corpus scale."""
    from real_time_database_monitoring_system_spark.operators import pipeline

    df = pipeline.weighted_sample(load_table(spark, sf_dir, "documents"), k=10)
    assert checks.has_take_ordered(df), "weighted_sample must plan TakeOrderedAndProject"
    assert "Sort " not in checks.explain_str(df).replace("TakeOrderedAndProject", ""), (
        "no global Sort node expected"
    )


def test_equidepth_histogram_broadcasts_bounds(spark, sf_dir):
    """The one-row boundary relation must ship by broadcast; the feed
    itself must not shuffle for the bucket assignment."""
    from real_time_database_monitoring_system_spark.operators import analytics

    df = analytics.equidepth_histogram(load_table(spark, sf_dir, "events"))
    plan = checks.explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "bounds must broadcast"
    )


def test_round3_operator_shuffle_budgets(spark, sf_dir):
    """Pin each round-3 operator to its designed exchange budget —
    a regression that adds a shuffle (lost broadcast, extra scan,
    de-optimized window) fails here, not in the bench."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        anomaly,
        event_analytics,
        relational,
    )

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    budgets = [
        # (name, df, max exchanges, must broadcast)
        ("moment_stats", analytics.moment_stats(ev), 2, False),
        # r7: +2 exchanges from the counts-based exact median
        # (disc_quantiles_from_counts) — they shuffle the bounded
        # distinct-value relation, not the feed. r8: +2/−1 from the
        # two-level prefix sum (the (type, day) local window plus the
        # tiny chunk-totals agg replace the #types-parallelism global
        # window; the feed-scale presentation sort is gone) — one more
        # exchange, 3× the wall-clock win at 100M rows (SCALE.md)
        ("drift_cusum", anomaly.drift_cusum(ev), 6, True),
        ("scd2_enrich", relational.scd2_enrich(ev, cust), 3, True),
        ("active_users_rolling", analytics.active_users_rolling(ev), 6, True),
        ("type_correlation", analytics.type_correlation(ev), 4, False),
        ("user_entropy", event_analytics.user_entropy(ev), 3, False),
    ]
    for name, df, max_ex, need_bcast in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        if need_bcast:
            assert checks.has_broadcast_join(df), f"{name}: baseline/dim must broadcast"


def test_clustering_featurization_shuffle_budgets(spark, sf_dir):
    """Same pin for the clustering/featurization families. (The
    k-means FIT runs jobs before the plan exists; these budgets cover
    the returned query plans — the fit's own shape is the k×64-row
    combine documented in operators/clustering.py.)"""
    from real_time_database_monitoring_system_spark.operators import (
        clustering,
        dedup,
        pipeline,
    )
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # assignment itself is 0-exchange (test_clustering); the pair
        # search adds the cluster-blocked self-join + presentation sort
        ("semantic_dedup", clustering.semantic_dedup(emb), 3, False),
        ("prototypicality", clustering.prototypicality(emb), 2, True),
        ("feature_hash_embed", pipeline.feature_hash_embed(docs), 3, False),
        # spread + window-fold DF + per-doc rollup + presentation sort;
        # the old aggregate+join-back form hid its extra index
        # shuffles behind a checkpoint — this is the whole plan
        ("doc_novelty", dedup.doc_novelty(docs), 4, False),
        ("bpe_pair_stats", text_ops.bpe_pair_stats(docs), 2, False),
    ]
    for name, df, max_ex, need_bcast in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        if need_bcast:
            assert checks.has_broadcast_join(df), f"{name}: quantile table must broadcast"
    plan = text_ops.bpe_pair_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "pair head must not globally sort"


def test_late_round3_operator_shuffle_budgets(spark, sf_dir):
    """Pin the round-3 late additions (range join, fuzzy linkage,
    containment, smoothing/normalization, profiling) to their designed
    exchange budgets. Budgets include the presentation sort."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        anomaly,
        dedup,
        monitoring,
        pipeline,
    )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # sessionize window + session agg + two hour aggs + sort; both
        # window/total joins must broadcast (never shuffle the explode)
        ("interval_overlap_join", monitoring.interval_overlap_join(ev), 5, True),
        # one series window shuffle + presentation sort
        ("ewma_smooth", monitoring.ewma_smooth(ev), 2, False),
        # stats agg + broadcast back + sort: the feed itself never
        # hash-shuffles (no per-type window)
        ("minmax_normalize", pipeline.minmax_normalize(ev), 2, True),
        ("winsorized_stats", anomaly.winsorized_stats(ev), 5, True),  # r7 counts-based cuts
        # unpivot is a Generate (map-side); two-phase distinct agg + sort
        ("column_profile", analytics.column_profile(ev), 3, False),
        # blocking equi-join + presentation sort; never a cartesian
        ("fuzzy_prefix_match", dedup.fuzzy_prefix_match(docs), 3, False),
    ]
    for name, df, max_ex, need_bcast in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        if need_bcast:
            assert checks.has_broadcast_join(df), f"{name}: stats/window side must broadcast"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: quadratic join strategy crept in"
        )


def test_skew_temporal_pagerank_budgets(spark, sf_dir):
    """Second-wave pins: diagnosis/split stay broadcast-shaped; the
    PageRank loop's per-iteration cost is two keyed shuffles (its plan
    is post-materialization, so assert the FINAL query instead:
    scan-project over the checkpointed rank relation, sort only)."""
    from real_time_database_monitoring_system_spark.operators import (
        curation,
        event_analytics,
        skew,
    )

    ev = load_table(spark, sf_dir, "events")
    prof = skew.skew_profile(ev, "user_id")
    assert checks.count_exchanges(prof) <= 2
    # one-row totals ship as a broadcast nested-loop (the scalar-
    # subquery pattern), not a hash join — assert the BroadcastExchange
    assert "BroadcastExchange" in checks.explain_str(prof), "totals row must broadcast"
    assert "TakeOrderedAndProject" in checks.explain_str(prof)

    split = curation.temporal_split(ev)
    assert checks.count_exchanges(split) <= 3
    assert "BroadcastExchange" in checks.explain_str(split), "cutoff row must broadcast"

    pr = event_analytics.pagerank_transitions(ev)
    plan = checks.explain_str(pr)
    assert "CartesianProduct" not in plan
    # ranks are materialized: the returned plan must not re-run the
    # iteration joins
    assert checks.count_exchanges(pr) <= 1, "final rank read must be sort-only"


def test_round3_continuation_shuffle_budgets(spark, sf_dir):
    """Pin the round-3 continuation operators (retrieval, attribution,
    calibration, tokenizer application, portable dedup variants) to
    their designed exchange budgets. bm25's one-row corpus-stats cross
    join is the scalar-subquery pattern and legitimately plans as a
    BroadcastNestedLoopJoin; everything else must avoid quadratic
    strategies. tokenize_to_ids' global window runs over ≤ vocab_size
    rows (post-TakeOrdered), not the corpus."""
    from real_time_database_monitoring_system_spark.operators import (
        dedup,
        event_analytics,
        pipeline,
    )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # postings agg + dl/df aggs + (query,doc) agg + top-k window +
        # presentation sort; query terms and stats must broadcast
        ("bm25_search", pipeline.bm25_search(docs), 5, True, True),
        # user-keyed range join + per-conversion agg + sort
        ("touch_attribution", event_analytics.attribution(ev), 3, True, False),
        # cuts agg + presentation sort; the feed never hash-shuffles
        ("source_quantile_normalize", pipeline.source_quantile_normalize(docs), 2, True, False),
        # term counts + vocab rank (≤1000 rows) + doc reassembly + sort
        ("tokenize_to_ids", pipeline.tokenize_to_ids(docs), 4, True, False),
        # signature agg + band self-join + candidate verify + sort,
        # over ONE materialized shingle-hash pass
        ("minhash_portable", dedup.minhash_lsh_pairs_portable(docs), 5, False, False),
        # banded self-join + distinct + sort over the materialized sigs
        ("simhash_portable", dedup.simhash_pairs_portable(docs), 3, False, False),
    ]
    for name, df, max_ex, need_bcast, allow_bnlj in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        if need_bcast:
            assert checks.has_broadcast_join(df), f"{name}: small side must broadcast"
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        if not allow_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: quadratic join strategy crept in"
            )


def test_wave6_shuffle_budgets(spark, sf_dir):
    """Pin the wave-6 operators (trend regression, KL divergence,
    k-anonymity lattice, IVM delta-apply, logistic quality gate) to
    their designed exchange budgets. KL's one-row corpus total rides
    the scalar-subquery BroadcastNestedLoopJoin pattern (as bm25);
    everything else must avoid quadratic strategies. The k-anonymity
    lattice must be ONE Expand, not three aggregates."""
    import pyspark.sql.functions as F

    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        curation,
        ivm,
        pipeline,
    )
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    cust = load_table(spark, sf_dir, "customer")
    old = ev.filter(F.col("event_id") % 10 != 0)
    new = ev.filter(F.col("event_id") % 7 != 0)
    budgets = [
        # one sufficient-sums agg + presentation sort; NO window
        ("trend_slope", analytics.trend_slope_panel(ev), 2, False),
        # tf agg + spread + source/term totals + term join + final agg
        ("source_kl", pipeline.source_kl_divergence(docs), 6, True),
        # Expand agg + per-set summary + sort
        ("k_anonymity", curation.k_anonymity_audit(cust), 3, False),
        # two anti-joins + delta agg + view agg + merge join + sort
        ("ivm_delta_apply", ivm.delta_rollup_apply(old, new), 4, False),
        # one tokenize agg + presentation sort
        ("quality_logit", text_ops.quality_logit(docs), 2, False),
    ]
    for name, df, max_ex, allow_bnlj in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        if not allow_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: quadratic join strategy crept in"
            )
    lattice_plan = checks.explain_str(curation.k_anonymity_audit(cust))
    assert lattice_plan.count("Expand") >= 1


def test_wave7_shuffle_budgets(spark, sf_dir):
    """Wave-7 budgets: the contract audit is one aggregation pass
    (single-row combine + constant stack — no per-expectation scans);
    PSI's joins are all broadcast (the one-row stats/cuts/totals ride
    the scalar-subquery BNLJ pattern); the LATERAL top-k must
    decorrelate into one partitioned rank (Window), never a per-outer-
    row loop or cartesian."""
    from real_time_database_monitoring_system_spark.operators import (
        anomaly,
        curation,
        relational,
    )

    ev = load_table(spark, sf_dir, "events")
    contract = curation.data_contract_audit(ev)
    assert checks.count_exchanges(contract) <= 2
    assert "BroadcastNestedLoopJoin" not in checks.explain_str(contract)

    psi = anomaly.psi_drift(ev)
    assert checks.count_exchanges(psi) <= 4
    assert "CartesianProduct" not in checks.explain_str(psi)

    lat = relational.lateral_topk(spark, sf_dir)
    plan = checks.explain_str(lat)
    assert checks.count_exchanges(lat) <= 2
    assert "Window" in plan, "correlated LIMIT must decorrelate to a rank"
    assert "CartesianProduct" not in plan


def test_market_share_plan_broadcasts_dims(spark, sf_dir):
    """Q8-shape: all five dimension joins must broadcast (the fact
    chain is the only shuffle candidate), the share window runs over
    the cell relation, and nothing degenerates to cartesian."""
    from real_time_database_monitoring_system_spark.operators import relational

    df = relational.market_share_panel(
        *[load_table(spark, sf_dir, t)
          for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")]
    )
    plan = checks.explain_str(df)
    assert checks.count_exchanges(df) <= 3  # cell agg + window + sort
    assert checks.has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wave7_late_shuffle_budgets(spark, sf_dir):
    """Budgets for the late wave-7 operators. bigram's one-row totals
    ride the scalar-subquery BNLJ; rfm's user relation is materialized
    (diamond rule — 8→4 exchanges measured) so the purchase scan runs
    once, not once per consumer."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        event_analytics,
        monitoring,
        pipeline,
    )
    from real_time_database_monitoring_system_spark.operators import text as text_ops

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        ("bigram_logprob", pipeline.bigram_logprob_score(docs), 7, True),
        ("robust_trend", analytics.robust_trend_panel(ev), 5, False),  # r7 counts-based medians
        ("trigram_langid", text_ops.char_trigram_langid(docs), 7, False),
        ("period_over_period", monitoring.period_over_period(ev), 2, False),
        # rfm's snapshot-instant and cut-point one-row broadcasts are
        # the scalar-subquery BNLJ pattern (as bigram's corpus totals)
        ("rfm_segments", event_analytics.rfm_segments(ev), 4, True),
    ]
    for name, df, max_ex, allow_bnlj in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, f"{name}: cartesian crept in"
        if not allow_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: quadratic join strategy crept in"
            )


def test_wave8_9_shuffle_budgets(spark, sf_dir):
    """Waves 8-9: the one-row panels/snapshots ride the scalar-
    subquery BNLJ; survival's day relation and each funnel stage are
    materialized (diamond rule — 8→2 and 14→5 exchanges measured)."""
    from real_time_database_monitoring_system_spark.operators import (
        event_analytics as ea,
    )

    ev = load_table(spark, sf_dir, "events")
    budgets = [
        ("ab_test_panel", ea.ab_test_panel(ev), 4),
        ("survival_curve", ea.survival_curve(ev), 2),
        ("funnel_windowed", ea.funnel_windowed(ev), 5),
        ("user_feature_table", ea.user_feature_table(ev), 5),
    ]
    for name, df, max_ex in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        assert "CartesianProduct" not in checks.explain_str(df), name


def test_wave11_14_shuffle_budgets(spark, sf_dir):
    """Waves 11-14: small-panel operators stay at their designed
    exchange counts; the WITH TIES rank must carry WindowGroupLimit
    (map-side candidate pruning before the single-partition window)."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        anomaly,
        relational,
    )
    from real_time_database_monitoring_system_spark.operators import (
        monitoring as mon,
    )

    ev = load_table(spark, sf_dir, "events")
    budgets = [
        ("slo_burn", mon.slo_burn(ev), 2),
        ("bounce_rate_daily", mon.bounce_rate_daily(ev), 3),
        ("trend_forecast", analytics.trend_forecast(ev), 3),
        ("dispersion_panel", anomaly.dispersion_panel(ev), 3),
        ("topk_with_ties", relational.topk_with_ties(ev), 1),
    ]
    for name, df, max_ex in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        assert "CartesianProduct" not in checks.explain_str(df), name
    assert "WindowGroupLimit" in checks.explain_str(
        relational.topk_with_ties(ev)
    ), "WITH TIES rank must prune map-side"


def test_round4_checked_sketch_budgets(spark, sf_dir):
    """The verdict-column sketch forms must keep the sketch family's
    scale shape: the rank/cardinality verification pass rides a
    BROADCAST of the tiny estimate relation (#types / #days rows) back
    onto the feed — never a shuffled join against raw events — so the
    extra correctness columns cost one more keyed agg, not a second
    wide shuffle."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        monitoring,
        sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    budgets = [
        # approx agg + verify agg + 2 AQE-coalesced sort legs
        ("value_percentiles_approx_checked", monitoring.value_percentiles_approx_checked(ev), 4),
        # hourly agg + daily merge + exact agg + day join + sort
        ("hll_user_rollup_checked", analytics.hll_user_rollup_checked(ev), 5),
        # hourly agg + daily merge + verify agg + sort
        ("kll_value_rollup_checked", sketches.kll_value_rollup_checked(ev), 4),
    ]
    for name, df, max_ex in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # the estimate relation must broadcast onto the feed in both
    # verification joins
    assert "BroadcastExchange" in checks.explain_str(
        monitoring.value_percentiles_approx_checked(ev)
    )
    assert "BroadcastExchange" in checks.explain_str(
        sketches.kll_value_rollup_checked(ev)
    )


def test_session_codegen_cache_sized_for_query_surface(spark):
    """The 213-query registry needs the whole-stage-codegen class
    cache sized above the default 100 entries, or every repeated run
    (bench passes, dashboard refresh) evicts and re-compiles every
    stage — measured as a 15% headline total regression. Static conf,
    so it can only be set at session build time; pin it here."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1024


def test_materialize_reliable_mode_parity(spark, sf_dir):
    """The materialization durability switch must not change results:
    `local` (localCheckpoint — executor-loss fragile, fast) and
    `reliable` (checkpoint dir — survives executor loss) are the SAME
    computation stored differently, so a diamond-heavy operator must
    emit identical rows under both. This is the test that keeps the
    100 TB durability story from being a docstring footnote."""
    from real_time_database_monitoring_system_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731

    assert spark.conf.get("spark.graft.materialize.mode", "local") == "local"
    local_rows = key(dedup.ngram_jaccard_pairs(docs).collect())
    spark.conf.set("spark.graft.materialize.mode", "reliable")
    try:
        reliable_rows = key(dedup.ngram_jaccard_pairs(docs).collect())
    finally:
        spark.conf.set("spark.graft.materialize.mode", "local")
    assert local_rows == reliable_rows
    assert local_rows, "parity fixture must be non-empty"


def test_materialize_rejects_unknown_mode(spark, sf_dir):
    import pytest as _pytest

    from real_time_database_monitoring_system_spark.operators.util import materialize

    docs = load_table(spark, sf_dir, "documents")
    spark.conf.set("spark.graft.materialize.mode", "ram")
    try:
        with _pytest.raises(ValueError, match="materialize.mode"):
            materialize(docs.limit(1))
    finally:
        spark.conf.set("spark.graft.materialize.mode", "local")


def test_round5_operator_shuffle_budgets(spark, sf_dir):
    """Exchange budgets for the round-5 operators — the plans you'd
    want at 100×: each reduces the feed in ONE keyed aggregate and
    does all later work on broadcast-sized or per-key relations.
    BroadcastNestedLoopJoin appears ONLY as the deliberate tiny-side
    cross joins (the 1-row bounds/stats scalar join and the
    #types×9-digit Benford spine — bounded by construction, not by
    data); CartesianProduct must never appear."""
    from real_time_database_monitoring_system_spark.operators import (
        analytics,
        anomaly,
        dedup as dedup_ops,
        text as text_ops,
    )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    budgets = [
        # cells agg + spine/total joins (AQE-coalesced)
        ("benford_audit", analytics.benford_audit(ev), 4),
        # per-user agg + rank window + final agg/sort
        ("value_concentration", analytics.value_concentration(ev), 4),
        # per-value agg (materialized) + ECDF window + per-type max
        ("ks_drift", anomaly.ks_drift(ev), 4),
        # day agg (materialized) + lead window + per-type agg + sort
        ("acf_panel", anomaly.acf_panel(ev), 4),
        # grouped tokenize (materialized) + two bucket aggs + spine
        # joins + the ≤n_buckets running-total window
        ("vocab_growth", text_ops.vocab_growth(docs), 8),
        # blocked self-join on bkey + anti join + sort
        ("edit_distance_pairs", dedup_ops.edit_distance_pairs(docs), 4),
    ]
    for name, df, max_ex in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, name
    # the hot-key guard must be a broadcast ANTI join (never a shuffled
    # join over the blocked index)
    plan = checks.explain_str(dedup_ops.edit_distance_pairs(docs))
    assert "BroadcastExchange" in plan


def test_round6_late_shuffle_budgets(spark, sf_dir):
    """Winnowing = fingerprint index self-join (df agg + broadcast
    anti hot-guard + pair agg + sort); C4 rules are a pure map stage
    (spread + final sort only)."""
    from real_time_database_monitoring_system_spark.operators import (
        dedup as dedup_ops,
        text as text_ops,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = dedup_ops.winnow_overlap_pairs(docs)
    assert checks.count_exchanges(w) <= 5
    plan = checks.explain_str(w)
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # hot-fingerprint anti join
    c = text_ops.c4_rule_filter(docs)
    assert checks.count_exchanges(c) <= 2  # spread + final sort
    assert "CartesianProduct" not in checks.explain_str(c)


def test_round6_operator_shuffle_budgets(spark, sf_dir):
    """Exchange budgets for the round-6 operators. The near-dedup and
    curve plans inherit the portable-MinHash posture (banded
    candidates only, broadcast small sides, no CartesianProduct);
    embedding_drift is two grouped passes + a #labels-row join;
    13-gram decontamination is the inverted-index join with the
    benchmark side broadcast."""
    from real_time_database_monitoring_system_spark.operators import (
        curation,
        dedup as dedup_ops,
        similarity,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    bench = docs.filter((F.col("doc_id") % 7 == 0) & (F.size(toks) >= 16)).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.array_join(F.slice(toks, 4, 20), " ").alias("text"),
    )
    new = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" x"))).otherwise(
            F.col("text")
        ),
    )
    budgets = [
        # CDC join/window + band join + verify joins + final sort
        ("incremental_dedup_near", curation.incremental_dedup_near(docs, new), 7),
        # train shingle agg + broadcast bench join + keyed agg + sort
        ("decontaminate_13gram", curation.decontaminate(docs, bench, 13), 6),
        # sig agg + band self-join + verify joins + bucket agg + sort
        ("jaccard_threshold_curve", dedup_ops.jaccard_threshold_curve(docs), 7),
        # one grouped pass per snapshot + #labels-row join + sort
        (
            "embedding_drift",
            similarity.embedding_drift(
                emb.filter(F.col("vec_id") % 2 == 0),
                emb.filter(F.col("vec_id") % 2 == 1),
            ),
            4,
        ),
    ]
    for name, df, max_ex in budgets:
        n = checks.count_exchanges(df)
        assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}"
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, name


def test_round6_wave2_stat_budgets(spark, sf_dir):
    """Association + two-sample panel: ONE feed-scale exchange each
    (the keyed count/sufficient-stats aggregate); every further
    exchange operates on the ≤ #types×7 (or per-distinct-value)
    reduction, margins broadcast, never a CartesianProduct."""
    from real_time_database_monitoring_system_spark.operators import analytics

    ev = load_table(spark, sf_dir, "events")
    budgets = [
        # cells agg + margins/total aggs + final group
        ("cramers_v", analytics.cramers_v_stat(ev), 6),
        # cells agg + three entropy/MI aggregates + their margins
        ("mutual_information", analytics.mutual_information_stat(ev), 12),
        # min/max agg + one keyed sufficient-stats agg + sort. Budget
        # 4 → 5 in r12: the midpoint min/max scalar is no longer
        # eagerly checkpointed (it ran as a SEPARATE job whose
        # exchange this plan-count never saw); lazy, its single-row
        # agg exchange is visible in the one remaining job. Executed
        # exchanges are unchanged — one sequential job was removed.
        ("welch_ttest", analytics.welch_ttest(ev), 5),
        # min/max agg + per-value count + window/final agg + sort
        ("mannwhitney_u", analytics.mannwhitney_u(ev), 4),
    ]
    for name, df, budget in budgets:
        n = checks.count_exchanges(df)
        plan = checks.explain_str(df)
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"
        assert "CartesianProduct" not in plan, name
        assert "BroadcastExchange" in plan, name
    # xcorr: feed count + pair-grid join/agg + sort, all on the
    # #types×span reduction (the broadcasts sit behind the densify
    # materialize, so only the exchange budget is visible here)
    from real_time_database_monitoring_system_spark.operators import anomaly

    df = anomaly.xcorr_panel(ev)
    assert checks.count_exchanges(df) <= 5
    assert "CartesianProduct" not in checks.explain_str(df)
    # co-occurrence graph: one feed-scale distinct; pair join keyed on
    # user over the reduction; audience counts broadcast
    from real_time_database_monitoring_system_spark.operators import event_analytics

    e = event_analytics.cooccurrence_edges(ev)
    pe = checks.explain_str(e)
    assert checks.count_exchanges(e) <= 5
    assert "CartesianProduct" not in pe and "BroadcastExchange" in pe
    t = event_analytics.type_triangles(ev)
    pt = checks.explain_str(t)
    assert checks.count_exchanges(t) <= 2  # edge relation materialized
    assert "CartesianProduct" not in pt and "BroadcastExchange" in pt
    # text trio: gopher is a pure map stage; oov's vocabulary must be
    # a distributed top-K (TakeOrderedAndProject) feeding a broadcast
    # anti join; line_dedup = distinct + line window + (doc,line) anti
    # + reassembly, all on the exploded reduction
    from real_time_database_monitoring_system_spark.operators import (
        dedup as dedup_ops,
        text as text_ops,
    )

    docs = load_table(spark, sf_dir, "documents")
    g = text_ops.gopher_rule_filter(docs.select("doc_id", "text"))
    assert checks.count_exchanges(g) <= 2  # spread + final sort
    assert "CartesianProduct" not in checks.explain_str(g)
    o = text_ops.oov_rate(docs)
    po = checks.explain_str(o)
    assert checks.count_exchanges(o) <= 5
    assert "TakeOrderedAndProject" in po, "vocab top-K must not be a window"
    assert "BroadcastExchange" in po and "CartesianProduct" not in po
    ld = dedup_ops.line_dedup(docs.select("doc_id", "text"))
    assert checks.count_exchanges(ld) <= 5
    assert "CartesianProduct" not in checks.explain_str(ld)
    # js: one tf reduction + vocabulary-keyed spine joins, totals
    # broadcast; cms: one feed count, everything else on #types rows
    from real_time_database_monitoring_system_spark.operators import (
        pipeline as pipeline_ops,
        sketches as sketch_ops,
    )

    j = pipeline_ops.js_divergence(docs)
    pj = checks.explain_str(j)
    assert checks.count_exchanges(j) <= 8
    assert "CartesianProduct" not in pj and "BroadcastExchange" in pj
    c = sketch_ops.countmin_types(ev)
    pc = checks.explain_str(c)
    assert checks.count_exchanges(c) <= 4
    assert "CartesianProduct" not in pc and "BroadcastExchange" in pc


def test_round7_operator_shuffle_budgets(spark, sf_dir):
    """Freeze the round-7 operators' plan posture: bounded exchange
    counts, no CartesianProduct anywhere, broadcasts where a small
    side exists."""
    from real_time_database_monitoring_system_spark.operators import (
        dedup as dedup_ops,
        multimodal,
        pipeline as pipeline_ops,
        similarity,
        text as text_ops,
    )
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # char explode → (doc,char) counts → doc aggregate: two keyed
    # exchanges + the edge sort, no joins at all
    ce = text_ops.char_entropy(docs)
    pce = checks.explain_str(ce)
    assert checks.count_exchanges(ce) <= 3, pce
    assert "CartesianProduct" not in pce and "Join" not in pce
    # diversity panel: same shape per n, one (source,n,gram) count +
    # one (source,n) reduction + sort
    dn = text_ops.distinct_ngram_ratio(docs)
    pdn = checks.explain_str(dn)
    assert checks.count_exchanges(dn) <= 4, pdn  # spread + gram count + reduction + sort
    assert "CartesianProduct" not in pdn and "Join" not in pdn
    # PII rollup: ONE map-side scan + one keyed aggregate + sort
    pd = text_ops.pii_density_by_source(docs)
    ppd = checks.explain_str(pd)
    assert checks.count_exchanges(pd) <= 3, ppd  # spread + agg + sort
    assert "CartesianProduct" not in ppd and "Join" not in ppd
    # skew audit shares hash_sample's predicate inside one aggregate
    sk = pipeline_ops.sample_skew_audit(docs)
    psk = checks.explain_str(sk)
    assert checks.count_exchanges(sk) <= 3, psk  # spread + agg + sort
    assert "CartesianProduct" not in psk and "Join" not in psk
    # content-address dedup: decode map stage + ONE hash groupBy
    pl = multimodal.payload_dedup(docs)
    ppl = checks.explain_str(pl)
    assert checks.count_exchanges(pl) <= 3, ppl  # decode + groupBy + sort
    assert "CartesianProduct" not in ppl
    # banded relations only — never all-pairs
    for name, df in [
        ("cross_source_dup_matrix", dedup_ops.cross_source_dup_matrix(docs)),
        ("simhash_distance_hist", dedup_ops.simhash_distance_hist(docs)),
        ("split_embedding_leakage", similarity.split_embedding_leakage(emb)),
    ]:
        plan = checks.explain_str(df)
        assert "CartesianProduct" not in plan, name


def test_round7_wave3_plan_budgets(spark, sf_dir):
    """Wave-3 plan posture: CDC/bloom/negatives stay off cartesian
    products; small sides broadcast."""
    from real_time_database_monitoring_system_spark.operators import (
        curation as curation_ops,
        dedup as dedup_ops,
        similarity,
        sketches as sketch_ops,
        text as text_ops,
    )
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    cdc = dedup_ops.cdc_chunk_dedup(docs)
    pc = checks.explain_str(cdc)
    assert "CartesianProduct" not in pc
    bl = sketch_ops.bloom_fpr_audit(ev)
    pb = checks.explain_str(bl)
    assert "CartesianProduct" not in pb and "BroadcastExchange" in pb
    tp = text_ops.template_prefix_groups(docs)
    pt = checks.explain_str(tp)
    assert checks.count_exchanges(tp) <= 3, pt  # spread + agg + sort
    assert "CartesianProduct" not in pt and "Join" not in pt
    co = curation_ops.contamination_by_source(
        docs, docs.limit(5).select("doc_id", "text")
    )
    pco = checks.explain_str(co)
    assert "CartesianProduct" not in pco and "BroadcastExchange" in pco
    # theta join on label inequality against the tiny broadcast anchor
    # relation — a BroadcastNestedLoopJoin, never a shuffled cartesian.
    # The default return materializes the top-k (the sort's sampling
    # must not re-run the pair pass), which truncates lineage and
    # hides the join — assert on the un-materialized plan window
    ns = similarity.negative_samples(emb, _materialize_topk=False)
    pns = checks.explain_str(ns)
    assert "CartesianProduct" not in pns and "BroadcastNestedLoopJoin" in pns
