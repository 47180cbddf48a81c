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
