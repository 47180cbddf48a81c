"""Streaming/batch equivalence (SURVEY §5): the streaming rollup and
alert stream must produce exactly the batch operator's result."""

from __future__ import annotations

from real_time_database_monitoring_system_spark.operators import monitoring
from real_time_database_monitoring_system_spark.sources.registry import load_table
from real_time_database_monitoring_system_spark.streaming import rollup as sr


def test_stream_rollup_equals_batch_downsample(spark, sf_dir):
    batch = monitoring.downsample_5min(load_table(spark, sf_dir, "events")).collect()
    stream = sr.stream_rollup(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


def test_stream_alerts_equals_batch_filter(spark, sf_dir):
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    batch = (
        events.filter(F.col("value") > 99.0)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )
    stream = sr.stream_alerts(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
