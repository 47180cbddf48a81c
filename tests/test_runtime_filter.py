"""Bloom-filter runtime pruning: exactness, the no-false-negative
superset property (including under an aggressively undersized filter),
and the map-side plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import runtime_filter as rf
from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def _fixture(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return li, keys


def test_bloom_semi_join_equals_exact_semi_join(spark, sf_dir):
    li, keys = _fixture(spark, sf_dir)
    exact = li.join(keys.distinct(), "l_orderkey", "left_semi")
    bloomed = rf.bloom_semi_join(li, keys, "l_orderkey")
    assert sorted(map(tuple, bloomed.collect())) == sorted(map(tuple, exact.collect()))


def test_bloom_prune_never_false_negative_even_undersized(spark, sf_dir):
    """A filter far too small for the key count degrades to high FPR —
    never to a miss. Exactness under mis-sizing is the property that
    makes (m, k) a pure performance knob."""
    li, keys = _fixture(spark, sf_dir)
    exact_keys = {r.l_orderkey for r in keys.distinct().collect()}
    for m_bits, k in ((1 << 20, 5), (1 << 8, 2)):
        bloom = rf.bloom_build(keys, "l_orderkey", m_bits=m_bits, k=k)
        pruned_keys = {
            r.l_orderkey
            for r in rf.bloom_prune(li, bloom, "l_orderkey")
            .select("l_orderkey")
            .distinct()
            .collect()
        }
        li_keys = {r.l_orderkey for r in li.select("l_orderkey").distinct().collect()}
        assert (exact_keys & li_keys) <= pruned_keys


def test_bloom_prune_is_map_side_on_fact(spark, sf_dir):
    """The probe filter must sit between the fact scan and any
    exchange: pruning happens before rows move."""
    li, keys = _fixture(spark, sf_dir)
    bloom = rf.bloom_build(keys, "l_orderkey")
    pruned = rf.bloom_prune(li, bloom, "l_orderkey")
    plan = checks.explain_str(pruned, "simple")
    lines = plan.splitlines()
    probe_i = next(i for i, l in enumerate(lines) if "forall" in l)
    scan_i = next(
        i for i, l in enumerate(lines) if "Scan parquet" in l and "lineitem" in l
    )
    assert probe_i < scan_i, "probe filter must be above the fact scan"
    assert not any(
        "Exchange" in l and "BroadcastExchange" not in l
        for l in lines[probe_i:scan_i]
    ), "no shuffle between fact scan and bloom probe"


def test_bloom_empty_keys_empty_result(spark, sf_dir):
    li, keys = _fixture(spark, sf_dir)
    none = keys.filter(F.lit(False))
    assert rf.bloom_semi_join(li, none, "l_orderkey").count() == 0
