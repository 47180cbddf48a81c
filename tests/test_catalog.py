"""DDL / archive pipeline integration tests (S9-S12) on managed
tables in a temp warehouse."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.sources import catalog
from real_time_database_monitoring_system_spark.sources.registry import load_table


@pytest.fixture()
def tbl(spark):
    name = f"t_{uuid.uuid4().hex[:8]}"
    yield name
    for t in (name, name + "_archive"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_create_like_and_ensure_column(spark, sf_dir, tbl):
    region = load_table(spark, sf_dir, "region")
    catalog.create_table_like(spark, tbl, region)
    assert spark.table(tbl).count() == 0
    assert spark.table(tbl).schema == region.schema
    # idempotent: second create is a no-op
    catalog.create_table_like(spark, tbl, region)
    assert catalog.ensure_column(spark, tbl, "extra", "bigint") is True
    assert catalog.ensure_column(spark, tbl, "extra", "bigint") is False
    assert "extra" in spark.table(tbl).columns


def test_insert_check_and_truncate(spark, sf_dir, tbl):
    region = load_table(spark, sf_dir, "region")
    catalog.create_table_like(spark, tbl, region)
    catalog.insert_into(spark, tbl, region, check=F.col("r_regionkey") >= 0)
    assert spark.table(tbl).count() == 5
    with pytest.raises(ValueError, match="CHECK constraint"):
        catalog.insert_into(spark, tbl, region, check=F.col("r_regionkey") > 2)
    catalog.truncate_table(spark, tbl)
    assert spark.table(tbl).count() == 0


def test_archive_pipeline(spark, sf_dir, tbl):
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").saveAsTable(tbl)
    n = catalog.archive_table(spark, tbl, tbl + "_archive")
    assert n == 5
    assert spark.table(tbl).count() == 0
    arch = spark.table(tbl + "_archive")
    assert arch.count() == 5
    assert "archive_timestamp" in arch.columns
