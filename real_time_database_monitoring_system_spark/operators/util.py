"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame



def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's default parallelism before
    CPU-heavy per-row work (shingling, hashing, scoring). The test
    tables are single parquet files → one input split → one task; a
    real corpus arrives in many splits, and this keeps the local plan
    shaped like the cluster plan. The shuffle moves only the narrow
    input rows."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)
