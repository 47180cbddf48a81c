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
    n-gram Jaccard plan). Materializing computes the intermediate once
    and truncates the lineage, so every consumer reads the
    materialized partitions.

    Durability is a CONFIG SWITCH, not a footnote
    (``spark.graft.materialize.mode``):

    - ``local`` (default): ``localCheckpoint(eager=True)`` into
      executor block storage — fastest, but an executor loss fails the
      job instead of recomputing (lineage is truncated and the blocks
      are gone with the executor).
    - ``reliable``: ``checkpoint(eager=True)`` to the cluster's
      configured checkpoint dir (``sc.setCheckpointDir`` — HDFS/S3 in
      production), surviving executor loss. If no checkpoint dir is
      set, one is created under the session's warehouse dir so the
      mode works out of the box on local runs.

    Both modes return the same rows by construction (one deterministic
    computation of the same plan, then a scan of the stored
    partitions); tests/test_plans.py pins the parity. A 100 TB
    pipeline run sets ``reliable`` + an object-store checkpoint dir;
    the operator shape is identical either way."""
    spark = df.sparkSession
    mode = spark.conf.get("spark.graft.materialize.mode", "local")
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            import os
            import tempfile

            base = spark.conf.get(
                "spark.sql.warehouse.dir", tempfile.gettempdir()
            ).removeprefix("file:")
            sc.setCheckpointDir(os.path.join(base, ".graft-checkpoints"))
        # Reliable checkpoints are files, not executor blocks. Their
        # lifecycle is handled by the ContextCleaner: session.get_spark
        # sets spark.cleaner.referenceTracking.cleanCheckpoints=true at
        # builder time (the cleaner reads it once at SparkContext
        # construction), so each checkpoint's files are deleted when
        # its RDD is garbage-collected instead of accumulating for the
        # life of a long-running session (ADVICE r5).
        return df.checkpoint(eager=True)
    if mode != "local":
        raise ValueError(
            f"spark.graft.materialize.mode must be 'local' or 'reliable', got {mode!r}"
        )
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
