"""The reference's users write raw SQL (README.md:7-8 — the project
deliberately avoids the ORM). The engine serves that style too:
`register_views` + `spark.sql` must reproduce the DataFrame operators.
"""

from __future__ import annotations

import pytest

from real_time_database_monitoring_system_spark.operators import monitoring, relational
from real_time_database_monitoring_system_spark.sources.registry import load_table, register_views


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


def test_sql_slow_sessions_matches_dataframe(spark, sf_dir):
    sql = spark.sql(
        """
        WITH m AS (SELECT max(unix_micros(cast(ts AS timestamp))) AS as_of_us FROM events)
        SELECT event_id, user_id, event_type, ts,
               m.as_of_us - unix_micros(cast(ts AS timestamp)) AS age_us
        FROM events, m
        WHERE m.as_of_us - unix_micros(cast(ts AS timestamp)) > 15 * 60 * 1000000
        """
    )
    df = monitoring.slow_sessions(load_table(spark, sf_dir, "events"))
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_topk_matches_dataframe(spark, sf_dir):
    sql = spark.sql(
        "SELECT event_id, user_id, event_type, value FROM events "
        "ORDER BY value DESC, event_id ASC LIMIT 20"
    )
    df = relational.topk_global(load_table(spark, sf_dir, "events"))
    assert [tuple(r) for r in sql.collect()] == [tuple(r) for r in df.collect()]


def test_sql_scalar_subquery(spark):
    row = spark.sql(
        "SELECT (SELECT count(*) FROM nation) AS n, (SELECT max(r_regionkey) FROM region) AS m"
    ).first()
    assert row.n == 25 and row.m == 4


def test_sql_udfs_match_column_helpers(spark):
    """Every SQL UDF must agree with its pg_dialect Column twin over a
    value grid (the equality test IS the single-source-of-truth
    enforcement for the duplicated SQL bodies)."""
    from pyspark.sql import functions as F

    from real_time_database_monitoring_system_spark.functions import pg_dialect, sql_udfs

    names = sql_udfs.register_sql_functions(spark)
    assert {"age_micros", "interval_pretty", "pg_size_pretty_int", "week_of_year_pg"} <= set(names)

    sizes = spark.range(0, 45).select(
        (F.lit(2) ** F.col("id").cast("int")).cast("bigint").alias("b")
    )
    rows = sizes.select(
        "b",
        F.expr("pg_size_pretty_int(b)").alias("s_sql"),
        pg_dialect.size_pretty_int(F.col("b")).alias("s_col"),
    ).collect()
    for r in rows:
        assert r.s_sql == r.s_col, f"{r.b}: {r.s_sql} != {r.s_col}"

    us = spark.range(-5, 60).select((F.col("id") * 7_777_777_777).alias("us"))
    rows = us.select(
        "us",
        F.expr("interval_pretty(us)").alias("i_sql"),
        pg_dialect.interval_pretty(F.col("us")).alias("i_col"),
    ).collect()
    for r in rows:
        assert r.i_sql == r.i_col, f"{r.us}: {r.i_sql} != {r.i_col}"

    ts = spark.sql(
        "SELECT explode(sequence(timestamp'2023-12-28 01:02:03', "
        "timestamp'2024-01-12 01:02:03', interval 1 day)) AS ts"
    )
    rows = ts.select(
        F.expr("week_of_year_pg(ts)").alias("w_sql"),
        pg_dialect.week_of_year_pg("ts").alias("w_col"),
        F.expr("age_micros(timestamp'2024-06-01 00:00:00', ts)").alias("a_sql"),
        pg_dialect.age_micros(F.lit("2024-06-01 00:00:00").cast("timestamp"), F.col("ts")).alias("a_col"),
    ).collect()
    for r in rows:
        assert r.w_sql == r.w_col and r.a_sql == r.a_col


def test_reference_style_raw_sql_with_udfs(spark, sf_dir):
    """The reference's slow-session panel written as raw SQL with the
    registered dialect UDFs (views.py:396-407 shape) must match the
    DataFrame operator."""
    from real_time_database_monitoring_system_spark.functions import sql_udfs

    sql_udfs.register_sql_functions(spark)
    sql = spark.sql(
        """
        WITH m AS (SELECT max(cast(ts AS timestamp)) AS as_of FROM events)
        SELECT event_id, user_id, event_type, ts,
               age_micros(m.as_of, cast(ts AS timestamp)) AS age_us
        FROM events, m
        WHERE age_micros(m.as_of, cast(ts AS timestamp)) > 15 * 60 * 1000000
        """
    )
    df = monitoring.slow_sessions(load_table(spark, sf_dir, "events"))
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_chunk_text_udtf_matches_expression_chunker(spark, sf_dir):
    """The Python UDTF (Arrow) surface must agree row-for-row with the
    hot-path expression chunker — the UDTF is the extension API, the
    expression plan is the engine's own path."""
    from real_time_database_monitoring_system_spark.functions.udtfs import register_udtfs
    from real_time_database_monitoring_system_spark.operators import pipeline
    from real_time_database_monitoring_system_spark.sources.registry import (
        load_table,
        register_views,
    )

    register_views(spark, sf_dir)
    assert "chunk_text" in register_udtfs(spark)
    got = spark.sql(
        """
        SELECT doc_id, c.chunk_id, c.start, c.chunk_tokens, c.chunk_text
        FROM documents, LATERAL chunk_text(text, 32, 24) c
        ORDER BY doc_id, chunk_id
        """
    ).collect()
    want = (
        pipeline.chunk_documents(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "chunk_id", "start", "chunk_tokens", "chunk_text")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
