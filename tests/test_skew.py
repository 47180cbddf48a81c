from __future__ import annotations

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators.skew import salted_join, top_keys
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_total"))
    )
    plain = events.join(users, ["user_id"]).select("event_id", "user_id", "n_total")
    salted = salted_join(events, users, ["user_id"], salt=4).select(
        "event_id", "user_id", "n_total"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, v string")
    right = spark.createDataFrame([(1, 10), (2, 20)], "k long, w long")
    out = salted_join(left, right, ["k"], salt=3, how="left").collect()
    by_k = {r.k: r.w for r in out}
    assert len(out) == 3 and by_k[99] is None


def test_top_keys_shares_sum_below_one(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = top_keys(events, "user_id", n=5).collect()
    assert len(rows) == 5
    assert all(0 < r.share < 1 for r in rows)
    assert rows[0].n_rows >= rows[-1].n_rows
