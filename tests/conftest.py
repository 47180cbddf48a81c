from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from real_time_database_monitoring_system_spark.session import get_local_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_local_spark(8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
