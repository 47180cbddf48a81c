"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame



def materialize(df: DataFrame) -> DataFrame:
    """Materialize a DataFrame that several downstream subplans consume
    (diamond-shaped reuse).

    Spark expands each consumer into an independent physical subplan —
    a self-join on an expensive intermediate (an inverted index, a
    signature table) otherwise recomputes it per consumer, re-scanning
    the source each time (measured: 12 scans of `documents` in the
    n-gram Jaccard plan). `localCheckpoint(eager=True)` computes the
    intermediate once into executor block storage and truncates the
    lineage, so every consumer reads the materialized partitions. The
    executor-local form trades fault-tolerance for speed (an executor
    loss fails the job instead of recomputing); a production pipeline
    at corpus scale would persist the same intermediate to reliable
    storage (parquet/checkpoint dir) — the operator shape is
    unchanged."""
    return df.localCheckpoint(eager=True)


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's default parallelism before
    CPU-heavy per-row work (shingling, hashing, scoring). The test
    tables are single parquet files → one input split → one task; a
    real corpus arrives in many splits, and this keeps the local plan
    shaped like the cluster plan. The shuffle moves only the narrow
    input rows."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def with_observation(df: DataFrame, name: str, *metrics):
    """Attach zero-cost pipeline health metrics to a DataFrame:
    returns ``(df, observation)`` where the Observation collects the
    given aggregate expressions AS THE QUERY RUNS — no second pass, no
    extra job, no .count() re-scan. After any action on ``df``,
    ``observation.get`` yields the metric dict.

    This is how a 100 TB pipeline stage reports rows-in/rows-out,
    null-rates, or dropped-row counts without paying for a validation
    scan: the metrics ride the same physical plan (Spark's
    CollectMetrics node). The reference recomputes COUNT(*) panels as
    separate queries per page load (myapp/views.py:214-248); observed
    metrics make every pipeline action self-reporting instead.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
