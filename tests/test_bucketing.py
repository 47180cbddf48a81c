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


def test_zvalue_interleaves_bits(spark):
    from real_time_database_monitoring_system_spark.sources.bucketing import zvalue_sql

    rows = spark.sql(
        "SELECT " + zvalue_sql("a", "b", 4) + " AS z FROM VALUES "
        "(0L, 0L), (3L, 0L), (0L, 3L), (15L, 15L) AS t(a, b)"
    ).collect()
    # a on even bits, b on odd: (3,0)->0b0101=5, (0,3)->0b1010=10,
    # (15,15)->0b11111111=255
    assert [r.z for r in rows] == [0, 5, 10, 255]


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Row-group min/max stats must be tight in BOTH z-ordered
    dimensions: every file's user_id span AND time-bucket span should
    be a fraction of the global span (a linear sort on user_id alone
    would leave the time spans global-width in every file)."""
    import pyarrow.parquet as pq
    import glob as _glob

    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.sources.bucketing import (
        write_zordered,
    )
    from real_time_database_monitoring_system_spark.sources.registry import load_table

    raw = load_table(spark, sf_dir, "events")
    # Z-ordering interleaves BITS, so both dimensions must be scaled
    # to comparable bit widths first (zvalue_sql docstring) — here the
    # hour bucket is quantized to the same 4-bit domain as user_id;
    # unmatched widths degenerate the curve into a sort on the wider
    # column (observed: 12-bit hb vs 4-bit users left user spans at
    # full width in every file)
    mnmx = raw.agg(
        F.expr("min(unix_micros(cast(ts as timestamp)) div 3600000000)").alias("mn"),
        F.expr("max(unix_micros(cast(ts as timestamp)) div 3600000000)").alias("mx"),
    ).first()
    ev = raw.select(
        "user_id",
        (
            (F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") - mnmx.mn)
            * 15
            / (mnmx.mx - mnmx.mn)
        ).cast("long").alias("hb"),
        "value",
    )
    out = str(tmp_path / "zordered")
    write_zordered(ev, out, "user_id", "hb", bits=4, n_files=8)

    g_user = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    g_hb = ev.agg(F.max("hb") - F.min("hb")).first()[0]
    user_spans, hb_spans = [], []
    for f in _glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            cols = {row.column(i).path_in_schema: row.column(i) for i in range(row.num_columns)}
            su = cols["user_id"].statistics
            sh = cols["hb"].statistics
            user_spans.append(su.max - su.min)
            hb_spans.append(sh.max - sh.min)
    # average span per row group must shrink in BOTH dimensions
    assert sum(user_spans) / len(user_spans) < 0.7 * g_user
    assert sum(hb_spans) / len(hb_spans) < 0.7 * g_hb
