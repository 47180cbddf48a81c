"""Custom stateful streaming operator (SURVEY §2.8/§2.9): per-key
running aggregates via ``applyInPandasWithState``.

The reference keeps "state" server-side in PostgreSQL and recomputes
panels per poll. The Spark-native replacement for continuously-updated
per-key panels is a keyed state store: here, a per-user running
max/count/last-value tracker over the event feed — the shape of any
custom stateful rollup (session windows, alert debouncing, counters).

State is one small tuple per user (bounded keys), grouped processing is
Arrow-batched, and the same code runs on a live source; tests replay
the parquet feed with availableNow and check against the batch twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .rollup import _events_stream, _run_to_memory

STATE_SCHEMA = "n_events bigint, max_value double, last_event_id bigint"
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double, last_event_id bigint"


def _track_user(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, mx, last = state.get
    else:
        n, mx, last = 0, float("-inf"), -1
    for pdf in batches:
        n += len(pdf)
        mx = max(mx, float(pdf["value"].max()))
        # event_id is monotone in the feed: the max is the latest
        last = max(last, int(pdf["event_id"].max()))
    state.update((n, mx, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "max_value": [mx], "last_event_id": [last]}
    )


def stream_user_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful per-user tracker over the replayed feed and
    return the final per-user state table."""
    src = _events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    tracked = src.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(tracked, "update")
    # update-mode emits one row per key per micro-batch: latest wins
    latest = out.groupBy("user_id").agg(
        {"n_events": "max", "max_value": "max", "last_event_id": "max"}
    )
    return latest.select(
        "user_id",
        latest["max(n_events)"].alias("n_events"),
        latest["max(max_value)"].alias("max_value"),
        latest["max(last_event_id)"].alias("last_event_id"),
    ).orderBy("user_id")


FUNNEL_STATE_SCHEMA = "t1 bigint, t2 bigint, t3 bigint"
FUNNEL_OUT_SCHEMA = "user_id bigint, t1 bigint, t2 bigint, t3 bigint"
_FUNNEL_STEPS = ("view", "click", "purchase")


def _advance_funnel(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user ordered-funnel state machine: (t1, t2, t3) = the µs
    instants the user completed each step under the strict order
    constraint (step i strictly after step i−1's recorded instant;
    −1 = not reached). Rows are processed in (ts, event_id) order
    inside each batch; across batches correctness relies on
    event-time-ordered arrival (true of the replay and of an in-order
    live source — late data would need watermark+retraction, the
    documented trade)."""
    (user_id,) = key
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    for pdf in batches:
        pdf = pdf.sort_values(["us", "event_id"])
        for us, et in zip(pdf["us"], pdf["event_type"], strict=True):
            us = int(us)
            if et == "view" and t1 < 0:
                t1 = us
            elif et == "click" and t1 >= 0 and us > t1 and t2 < 0:
                t2 = us
            elif et == "purchase" and t2 >= 0 and us > t2 and t3 < 0:
                t3 = us
    state.update((t1, t2, t3))
    yield pd.DataFrame({"user_id": [user_id], "t1": [t1], "t2": [t2], "t3": [t3]})


def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ordered funnel via a custom per-user state machine —
    the stateful-streaming restatement of `event_analytics.
    funnel_counts` (whose batch plan is one join pass per step; a
    stream cannot re-scan, so the state machine carries exactly the
    three step instants per user). The panel coda (counts +
    conversions) runs batch-side over the final state table and the
    result shares the batch funnel's oracle verbatim."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    src = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    tracked = src.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(tracked, "update")
    # update-mode: one row per key per batch; step instants only ever
    # move from −1 to a value, so max picks the final state
    final = out.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    rows = None
    for i, (step, col) in enumerate(zip(_FUNNEL_STEPS, ("t1", "t2", "t3"), strict=True)):
        one = final.agg(
            F.sum(F.when(F.col(col) >= 0, 1).otherwise(0)).cast("bigint").alias("n_users")
        ).select(
            F.lit(i + 1).alias("step_no"), F.lit(step).alias("step"), "n_users"
        )
        rows = one if rows is None else rows.unionByName(one)
    w_prev = F.lag("n_users").over(Window.orderBy("step_no"))
    return (
        rows.withColumn(
            "conversion",
            F.round(
                F.when(
                    w_prev.isNotNull() & (w_prev != 0),
                    F.col("n_users").cast("double") / w_prev.cast("double"),
                ),
                9,
            ),
        )
        .orderBy("step_no")
    )
