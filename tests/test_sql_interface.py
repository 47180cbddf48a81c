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
