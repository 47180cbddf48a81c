"""SQL scalar functions for raw-SQL users.

The reference's users write raw SQL (its README is explicit about
avoiding the ORM), so the dialect helpers in `pg_dialect` are also
exposed as Spark **SQL UDFs** (``CREATE TEMPORARY FUNCTION … RETURN
expr``): pure SQL expression bodies, inlined by Catalyst into the
calling query — JVM-evaluated and codegen-eligible exactly like the
Column forms, with zero Python in the execution path.

After ``register_sql_functions(spark)`` a user can write the
reference's query shapes verbatim-ish::

    SELECT user_id, interval_pretty(age_micros(m.as_of, ts)) AS age
    FROM events, (SELECT max(cast(ts AS timestamp)) AS as_of FROM events) m
    WHERE age_micros(m.as_of, ts) > 15 * 60 * 1000000

Equality with the Column helpers is pinned by tests
(`tests/test_sql_interface.py`) — the SQL bodies are the same
expressions in SQL text.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS: dict[str, str] = {
    # exact integer-µs interval between two timestamps (pg_dialect.age_micros)
    "age_micros": """
        CREATE OR REPLACE TEMPORARY FUNCTION age_micros(as_of TIMESTAMP, ts TIMESTAMP)
        RETURNS BIGINT RETURN unix_micros(as_of) - unix_micros(ts)
    """,
    # exact integer minute bucket (monitoring._minute_bucket)
    "minute_bucket": """
        CREATE OR REPLACE TEMPORARY FUNCTION minute_bucket(ts TIMESTAMP)
        RETURNS BIGINT RETURN unix_micros(ts) div 60000000
    """,
    # epoch-aligned bucket start in seconds, arbitrary width
    "time_bucket_s": """
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket_s(width_s BIGINT, ts TIMESTAMP)
        RETURNS BIGINT RETURN (unix_micros(ts) div (width_s * 1000000)) * width_s
    """,
    # PG WW week semantics (pg_dialect.week_of_year_pg)
    "week_of_year_pg": """
        CREATE OR REPLACE TEMPORARY FUNCTION week_of_year_pg(ts TIMESTAMP)
        RETURNS INT RETURN CAST((dayofyear(ts) - 1) / 7 + 1 AS INT)
    """,
    # integer-precision pg_size_pretty (pg_dialect.size_pretty_int):
    # unit switches at 10240 of the previous one
    "pg_size_pretty_int": """
        CREATE OR REPLACE TEMPORARY FUNCTION pg_size_pretty_int(nbytes BIGINT)
        RETURNS STRING RETURN CASE
            WHEN nbytes >= CAST(1024 AS BIGINT) * 1024 * 1024 * 1024 * 1024 * 10
                THEN concat(CAST(floor(nbytes / (CAST(1024 AS BIGINT) * 1024 * 1024 * 1024 * 1024)) AS BIGINT), ' PB')
            WHEN nbytes >= CAST(1024 AS BIGINT) * 1024 * 1024 * 1024 * 10
                THEN concat(CAST(floor(nbytes / (CAST(1024 AS BIGINT) * 1024 * 1024 * 1024)) AS BIGINT), ' TB')
            WHEN nbytes >= CAST(1024 AS BIGINT) * 1024 * 1024 * 10
                THEN concat(CAST(floor(nbytes / (CAST(1024 AS BIGINT) * 1024 * 1024)) AS BIGINT), ' GB')
            WHEN nbytes >= CAST(1024 AS BIGINT) * 1024 * 10
                THEN concat(CAST(floor(nbytes / (CAST(1024 AS BIGINT) * 1024)) AS BIGINT), ' MB')
            WHEN nbytes >= CAST(1024 AS BIGINT) * 10
                THEN concat(CAST(floor(nbytes / 1024) AS BIGINT), ' KB')
            ELSE concat(nbytes, ' B')
        END
    """,
    # PG-style interval rendering (pg_dialect.interval_pretty)
    "interval_pretty": """
        CREATE OR REPLACE TEMPORARY FUNCTION interval_pretty(us BIGINT)
        RETURNS STRING RETURN concat(
            CASE WHEN us < 0 THEN '-' ELSE '' END,
            CASE WHEN abs(us) div 86400000000 = 0 THEN ''
                 WHEN abs(us) div 86400000000 = 1 THEN '1 day '
                 ELSE concat(CAST(abs(us) div 86400000000 AS STRING), ' days ')
            END,
            format_string('%02d:%02d:%02d',
                (abs(us) % 86400000000) div 3600000000,
                (abs(us) % 3600000000) div 60000000,
                (abs(us) % 60000000) div 1000000)
        )
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every dialect SQL UDF; returns the function names."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(_FUNCTIONS)
