"""OLAP-surface semantics + plan shape: grouped subtotals, window
long tail, set ops, pivot/unpivot, histogram.

Oracle parity for every query is covered generically by
test_oracle_parity.py; these tests pin the *plan* properties (one
Expand + one aggregate shuffle, no discovery pass for pivot, map-side
histogram) and the subtotal arithmetic that parity alone would not
explain on failure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import analytics
from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_rollup_single_expand_single_agg_shuffle(spark, sf_dir):
    df = analytics.rollup_totals(load_table(spark, sf_dir, "orders"))
    tree = checks.explain_str(df, "simple")
    assert tree.count("Expand") == 1, "ROLLUP must compile to one Expand node"
    assert tree.count("Scan parquet") == 1
    # one hash exchange for the aggregate + one range exchange for the sort
    assert checks.count_exchanges(df) <= 2


def test_rollup_subtotals_are_consistent(spark, sf_dir):
    rows = analytics.rollup_totals(load_table(spark, sf_dir, "orders")).collect()
    cells = [r for r in rows if r.g_status == 0 and r.g_priority == 0]
    subtotals = {r.status: r for r in rows if r.g_status == 0 and r.g_priority == 1}
    grand = [r for r in rows if r.g_status == 1 and r.g_priority == 1]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in cells)
    for status, sub in subtotals.items():
        assert sub.n_orders == sum(r.n_orders for r in cells if r.status == status)
        assert abs(
            sub.revenue - sum(r.revenue for r in cells if r.status == status)
        ) < 1e-6 * max(1.0, abs(sub.revenue))


def test_cube_covers_all_marginals(spark, sf_dir):
    rows = analytics.cube_totals(load_table(spark, sf_dir, "documents")).collect()
    shapes = {(r.g_source, r.g_lang) for r in rows}
    assert shapes == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if (r.g_source, r.g_lang) == (1, 1)]
    cells = [r for r in rows if (r.g_source, r.g_lang) == (0, 0)]
    assert grand[0].n_docs == sum(r.n_docs for r in cells)


def test_grouping_sets_skips_cross_cells(spark, sf_dir):
    rows = analytics.grouping_sets_panel(
        load_table(spark, sf_dir, "documents")
    ).collect()
    shapes = {(r.g_source, r.g_lang) for r in rows}
    # by-source, by-lang, grand total — and NOT the (source, lang) cells
    assert shapes == {(0, 1), (1, 0), (1, 1)}


def test_window_suite_one_shuffle_shared_sort(spark, sf_dir):
    df = analytics.window_suite(load_table(spark, sf_dir, "events"))
    # one hash exchange on user_id shared by every window function +
    # one range exchange for the final display sort
    assert checks.count_exchanges(df) <= 2
    tree = checks.explain_str(df, "simple")
    assert tree.count("Scan parquet") == 1


def test_window_suite_running_total_monotone_per_user(spark, sf_dir):
    df = analytics.window_suite(load_table(spark, sf_dir, "events"))
    rows = df.filter(F.col("user_id") == 0).orderBy("seq").collect()
    assert rows, "user 0 must have events"
    prev = 0.0
    for r in rows:
        assert r.running_total >= prev - 1e-9
        prev = r.running_total
    assert abs(rows[-1].running_total - sum(r.value for r in rows)) < 1e-6
    assert rows[0].seq == 1 and rows[0].pct_rank == 0.0
    assert abs(rows[-1].cume_dist - 1.0) < 1e-12


def test_set_ops_disjoint_and_exhaustive(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = analytics.user_set_ops(events).collect()
    both = {r.user_id for r in rows if r.tag == "both"}
    only = {r.user_id for r in rows if r.tag == "click_only"}
    assert both.isdisjoint(only)
    clickers = {
        r.user_id
        for r in events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert both | only == clickers


def test_pivot_no_discovery_pass(spark, sf_dir):
    df = analytics.pivot_event_counts(load_table(spark, sf_dir, "events"))
    tree = checks.explain_str(df, "simple")
    # explicit value list ⇒ single scan, no distinct-values job;
    # lowered pivot ⇒ one agg exchange + one sort exchange only
    assert tree.count("Scan parquet") == 1
    assert checks.count_exchanges(df) <= 2


def test_pivot_lowered_equals_native(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    lowered = analytics.pivot_event_counts(events).collect()
    native = analytics.pivot_event_counts(events, use_native=True).collect()
    assert [tuple(r) for r in lowered] == [tuple(r) for r in native]


def test_pivot_row_sums_match_totals(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = analytics.pivot_event_counts(events).collect()
    total = sum(
        r.click + r.error + r.purchase + r.signup + r.view for r in rows
    )
    assert total == events.count()


def test_unpivot_triples_the_panel(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    n_types = events.select("event_type").distinct().count()
    assert analytics.unpivot_summary(events).count() == 3 * n_types


def test_histogram_mapside_and_covers_all_rows(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    df = analytics.value_histogram(events)
    tree = checks.explain_str(df, "simple")
    assert tree.count("Scan parquet") == 1
    assert checks.count_exchanges(df) <= 2
    read_schema = [
        ln for ln in checks.explain_str(df).splitlines() if "ReadSchema" in ln
    ]
    assert read_schema and all(
        "event_type" not in ln and "props" not in ln for ln in read_schema
    ), "histogram must prune to the value column"
    rows = df.collect()
    assert sum(r.n for r in rows) == events.count()
    for r in rows:
        if 1 <= r.bucket <= 10:
            assert r.lo_edge <= r.min_value and r.max_value < r.lo_edge + 50.0


def test_hll_rollup_mergeable_and_accurate(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = analytics.hll_user_rollup(events).collect()
    assert rows
    for r in rows:
        # lg_k=12 keeps HLL error ~1.6%; tiny cardinalities are exact
        assert abs(r.est_users - r.exact_users) <= max(2, 0.05 * r.exact_users)
    # mergeability: union of hourly sketches == one direct daily sketch
    direct = {
        r.day: r.est
        for r in events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    for r in rows:
        assert r.est_users == direct[r.day], (
            "merged hourly sketches must equal the direct daily sketch"
        )


def test_range_frame_uses_wall_clock_not_row_count(spark):
    """Rows 0s, 300s, 1200s apart: the 10-min RANGE frame at the third
    event must contain ONLY itself (previous events are 900s+ back),
    even though ROWS BETWEEN 1 PRECEDING would have included one."""
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7, "view", 10.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 5, 0), 7, "view", 20.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 25, 0), 7, "view", 40.0, "{}"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_id: r for r in analytics.range_frame_stats(ev).collect()}
    assert out[1].n_10min == 1 and out[1].avg_10min == 10.0
    assert out[2].n_10min == 2 and out[2].avg_10min == 15.0  # 0s is exactly 5min back
    assert out[3].n_10min == 1 and out[3].avg_10min == 40.0


def test_pareto_contribution_invariants(spark, sf_dir):
    from real_time_database_monitoring_system_spark.operators import analytics
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    out = analytics.pareto_contribution(load_table(spark, sf_dir, "events")).collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    assert abs(out[-1].cum_share - 1.0) < 1e-9
    # cum_share monotone, rows ordered by contribution
    for a, b in zip(out, out[1:]):
        assert a.n >= b.n and a.cum_share <= b.cum_share + 1e-12
    assert out[0].in_head, "largest contributor must be in the 80% head"


def test_dataset_checksum_detects_single_doc_change(spark, sf_dir):
    """Any one-document difference must flip its source's checksum;
    row order must not matter."""
    import pyspark.sql.functions as F

    from real_time_database_monitoring_system_spark.operators import analytics
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = {r.source: (r.n_docs, r.xor_checksum)
            for r in analytics.dataset_checksum(docs).collect()}
    reordered = {r.source: (r.n_docs, r.xor_checksum)
                 for r in analytics.dataset_checksum(docs.orderBy(F.desc("doc_id"))).collect()}
    assert base == reordered, "checksum must be order-independent"
    tweaked = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit("!"))).otherwise(
            F.col("text")
        ),
    )
    changed = {r.source: (r.n_docs, r.xor_checksum)
               for r in analytics.dataset_checksum(tweaked).collect()}
    src0 = docs.filter(F.col("doc_id") == 0).first().source
    assert changed[src0] != base[src0], "single-doc edit must flip the checksum"
    assert all(changed[s] == base[s] for s in base if s != src0)
