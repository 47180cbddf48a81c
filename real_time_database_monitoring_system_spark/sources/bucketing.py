"""Bucketed storage for co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders,
events⋈events) is the shuffle. Writing both sides bucketed by the join
key with the same bucket count lets Spark plan a SortMergeJoin with
NO Exchange on either side — the join runs bucket-by-bucket where the
data already lives. The write pays one shuffle once; every subsequent
join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the join's Sort node
    and makes min/max skipping effective."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", partition_col: str = "event_date"
) -> None:
    """Persist a time-series feed partitioned by date — the 100 TB
    layout for append-only feeds: each day is a directory, so
    time-range predicates prune at the directory level before any file
    is opened (PartitionFilters in the scan). Writers append one new
    partition per day; compaction (`mutation.compact`) runs per
    partition."""
    from pyspark.sql import functions as F

    df.withColumn(partition_col, F.to_date(ts_col)).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both tables exist and bucketing will be used."""
    exists = all(spark.catalog.tableExists(t) for t in (left, right))
    return exists and spark.conf.get("spark.sql.sources.bucketing.enabled") == "true"
