"""Every `queries()` entry matches its DuckDB oracle at sf0.001 —
the local twin of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from __spark_entry__ import queries
from tests.oracle_harness import compare_query, duck_connection

QUERY_NAMES = sorted(queries())


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    problems = compare_query(spark, duck, name, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    assert df.count() > 0
    assert df.columns == ["event_id", "user_id", "event_type", "ts", "age_us"]
