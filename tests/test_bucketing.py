"""Co-located bucketed join: the shuffle must disappear."""

from __future__ import annotations

import uuid

import pytest

from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.bucketing import (
    write_bucketed,
    write_date_partitioned,
)
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    """Time-range filters on a date-partitioned feed must prune at the
    partition level (PartitionFilters), not scan-and-discard."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-15")
    plan = checks.explain_str(one_day)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "event_date" in part_lines[0], plan
    # and the semantics are unchanged
    expected = events.filter(F.to_date("ts") == "2024-01-15").count()
    assert one_day.count() == expected


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"or_b_{suffix}"
    write_bucketed(load_table(spark, sf_dir, "lineitem"), lt, ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(load_table(spark, sf_dir, "orders"), ot, ["o_orderkey"], 8, ["o_orderkey"])
    yield lt, ot
    for t in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, ot = bucketed_tables
    # force the SMJ path so bucketing (not broadcast) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li_b, or_b = spark.table(lt), spark.table(ot)
        joined = li_b.join(or_b, li_b.l_orderkey == or_b.o_orderkey)
        n_exchanges = checks.count_exchanges(joined)
        assert n_exchanges == 0, checks.explain_str(joined, "simple")
        # same join on plain parquet shuffles both sides
        li_p, or_p = load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
        plain = li_p.join(or_p, li_p.l_orderkey == or_p.o_orderkey)
        assert checks.count_exchanges(plain) == 2
        # and results agree
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
