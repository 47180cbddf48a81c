"""Custom Python DataSource: a live session-activity feed.

The reference's data source is the live activity view it polls every
page load (``/root/reference/myapp/views.py:394-420`` reads
``pg_stat_activity``-style session rows). In Spark that "source you
tail" is a first-class **custom data source** (PySpark 4 DataSource
API): the engine-side code below exposes a session-activity feed as

- a **batch** relation (``spark.read.format("session_feed")``) that
  snapshots the feed, partitioned so the scan parallelizes like any
  table, and
- a **streaming** relation (``spark.readStream.format(...)``) whose
  offsets are row positions — resume-from-offset exactly like a Kafka
  topic, so the windowed rollups / alert streams in
  ``streaming.rollup`` run unchanged on top of it.

The rows here are generated deterministically (seeded xorshift-style
mixing — this container has no live database), but the protocol
surface (schema, partitions, offsets, commit) is the real API a
production tail (JDBC poll, HTTP log endpoint, …) would implement:
swap `_row_at` for the actual fetch and nothing downstream changes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEED_SCHEMA = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("state", StringType(), False),
        StructField("wait_us", LongType(), False),
        StructField("cpu_pct", DoubleType(), False),
    ]
)

_STATES = ["active", "idle", "idle in transaction", "fastpath function call"]


def _mix(x: int) -> int:
    """Deterministic 64-bit mixer (splitmix64 finalizer, public
    constant set) — the row generator's only state is the row index."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row_at(i: int) -> tuple:
    h = _mix(i)
    return (
        i,
        h % 150,
        _STATES[(h >> 8) % len(_STATES)],
        (h >> 16) % 60_000_000,
        round(((h >> 24) % 10_000) / 100.0, 2),
    )


class _FeedPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _FeedBatchReader(DataSourceReader):
    def __init__(self, n_rows: int, n_parts: int):
        self.n_rows = n_rows
        self.n_parts = n_parts

    def partitions(self) -> list[InputPartition]:
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_FeedPartition(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _FeedPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row_at(i)


class _FeedStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index, exactly a log position. Spark calls
    `read(start)` per micro-batch; `rows_per_batch` rows are served and
    the new offset returned — replayable from any committed offset."""

    def __init__(self, rows_per_batch: int, max_rows: int):
        self.rows_per_batch = rows_per_batch
        self.max_rows = max_rows

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["pos"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([_row_at(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: pure function of the offset range
        return iter([_row_at(i) for i in range(start["pos"], end["pos"])])


class SessionFeedDataSource(DataSource):
    """``session_feed`` — options: `n_rows` (batch snapshot size),
    `n_parts` (batch parallelism), `rows_per_batch` / `max_rows`
    (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "session_feed"

    def schema(self) -> StructType:
        return FEED_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FeedBatchReader(
            int(self.options.get("n_rows", 1000)),
            int(self.options.get("n_parts", 8)),
        )

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _FeedStreamReader(
            int(self.options.get("rows_per_batch", 100)),
            int(self.options.get("max_rows", 1000)),
        )


def register(spark) -> None:
    spark.dataSource.register(SessionFeedDataSource)
