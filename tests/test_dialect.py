"""Unit tests for the PG-dialect function layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.functions import pg_dialect


def test_pattern_translation():
    f = pg_dialect.pg_to_java_pattern
    assert f("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss"
    assert f("DD/MM/YYYY HH24:MI") == "dd/MM/yyyy HH:mm"
    assert f("YYYY:MM:DD HH24:MI") == "yyyy:MM:dd HH:mm"
    assert f("MON DD, YYYY") == "MMM dd, yyyy"
    assert f("HH12:MI AM") == "hh:mm a"


def test_to_char_and_at_time_zone(spark):
    df = spark.sql("SELECT CAST('2024-03-01 13:45:30' AS TIMESTAMP_NTZ) AS t")
    row = df.select(
        pg_dialect.to_char("t", "YYYY-MM-DD HH24:MI:SS").alias("s"),
        F.date_format(pg_dialect.at_time_zone("t", "Asia/Kolkata"), "HH:mm").alias("ist"),
    ).first()
    assert row.s == "2024-03-01 13:45:30"
    assert row.ist == "19:15"  # +05:30


def test_size_pretty_int(spark):
    df = spark.createDataFrame(
        [(0,), (42,), (10240,), (10485760,), (10737418240,), (10995116277760,)], "b long"
    )
    rows = df.select(pg_dialect.size_pretty_int(F.col("b")).alias("p")).collect()
    assert [r.p for r in rows] == ["0 B", "42 B", "10 KB", "10 MB", "10 GB", "10 TB"]


def test_nullif(spark):
    df = spark.createDataFrame([(1, 1), (2, 3)], "a int, b int")
    rows = df.select(pg_dialect.nullif_(F.col("a"), F.col("b")).alias("n")).collect()
    assert [r.n for r in rows] == [None, 2]


def test_age_micros(spark):
    df = spark.sql(
        "SELECT CAST('2024-01-01 01:00:00' AS TIMESTAMP_NTZ) AS a, "
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP_NTZ) AS b"
    )
    assert df.select(pg_dialect.age_micros("a", "b").alias("d")).first().d == 3_600_000_000


def test_negative_epoch_bucket_parity_with_duckdb(spark):
    """Cross-engine determinism for pre-1970 timestamps.

    Both Spark's integer ``div`` and DuckDB's integer ``//`` truncate
    toward zero (and DuckDB's ns→µs timestamp conversion truncates the
    same way), so the engine's bucket arithmetic is exact on both sides
    of the epoch. Guards the determinism contract the oracles rely on —
    verified empirically here rather than assumed.
    """
    import duckdb

    micros = [-1, -299_999_999_999, -300_000_000_001, -300_000_000_000, 1_000_000]
    df = spark.createDataFrame([(us,) for us in micros], "us long")
    got = sorted(
        r.b for r in df.selectExpr("(us div 300000000) * 300 AS b").collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT (us // 300000000) * 300 FROM (VALUES (-1), (-299999999999),"
            " (-300000000001), (-300000000000), (1000000)) t(us)"
        ).fetchall()
    )
    assert got == want


def test_interval_pretty_pg_fixtures(spark):
    """Fixture strings follow PG's interval rendering: day part omitted
    at 0, singular at 1, plural above; zero-padded HH:MM:SS."""
    cases = [
        (0, "00:00:00"),
        (3_661_000_000, "01:01:01"),
        (86_400_000_000, "1 day 00:00:00"),
        (93_784_000_000, "1 day 02:03:04"),
        (172_801_000_000, "2 days 00:00:01"),
        (-3_661_000_000, "-01:01:01"),
        (59_999_999, "00:00:59"),
    ]
    df = spark.createDataFrame([(us,) for us, _ in cases], "us long")
    got = [r.p for r in df.select(pg_dialect.interval_pretty(F.col("us")).alias("p")).orderBy("us").collect()]
    want = [p for _, p in sorted(cases)]
    assert got == want


def test_to_char_fm_quarter_atoms(spark):
    from pyspark.sql import functions as F

    df = spark.sql(
        "SELECT timestamp'1996-02-03 04:05:06' AS ts, timestamp'2024-12-31 23:59:59' AS ts2"
    )
    row = df.select(
        pg_dialect.to_char("ts", "FMDD/FMMM/YYYY").alias("fm"),
        pg_dialect.to_char("ts", "FMHH24:FMMI:FMSS").alias("fmh"),
        pg_dialect.to_char("ts", "Q").alias("q1"),
        pg_dialect.to_char("ts2", "Q").alias("q4"),
        pg_dialect.week_of_year_pg("ts").alias("ww"),
        pg_dialect.week_of_year_pg("ts2").alias("ww_last"),
    ).collect()[0]
    assert row.fm == "3/2/1996"
    assert row.fmh == "4:5:6"
    assert (row.q1, row.q4) == ("1", "4")
    # PG WW: week 1 starts Jan 1, plain 7-day blocks -> Feb 3 = doy 34 -> week 5
    assert (row.ww, row.ww_last) == (5, 53)


def test_to_char_unsupported_atoms_raise(spark):
    import pytest as _pytest

    for bad in ("WW", "IW", "TZH:TZM"):
        with _pytest.raises(ValueError):
            pg_dialect.pg_to_java_pattern(bad)
