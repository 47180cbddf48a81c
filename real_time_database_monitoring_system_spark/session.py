"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB;
tests run on ``local[N]``. Defaults chosen so the same code path works
in both regimes:

- AQE on (runtime join selection, skew-join splitting, partition
  coalescing) — replaces hand-tuned shuffle partition counts at scale.
- Session timezone pinned to UTC and parquet NTZ inference off so
  timestamp arithmetic is identical across engines (the DuckDB oracle
  evaluates naive timestamps).
- Arrow enabled for the few pandas-UDF paths (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rtdbms-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` is only forced when given (tests/bench pass
    ``local[N]``); in production the cluster manager supplies it.
    """
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 100 TB posture: don't let tiny files explode task counts locally,
        # and keep broadcast threshold at default 10 MB (dimension tables
        # region/nation/supplier stay broadcast-able at any SF).
        .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
        # The default 100-entry whole-stage-codegen class cache evicts
        # constantly once a workload carries 100+ distinct query shapes
        # (this engine registers 213): every re-run then re-compiles
        # every stage (~0.3-1.5 s each, measured — repeat runs never
        # went warm in bench.py). Static conf, so it must be set at
        # build time. Compiled-class metadata is small; 4096 entries is
        # comfortable inside any executor/driver heap.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # materialize()'s `reliable` mode writes checkpoint FILES (not
        # executor blocks); without this the ContextCleaner never
        # deletes them and a long-running session checkpointing per
        # operator accumulates disk unboundedly. Read once by the
        # ContextCleaner at SparkContext construction, so it must be a
        # builder-time conf. With it, each checkpoint's files are
        # removed as soon as its RDD is garbage-collected.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if master:
        builder = builder.master(master)
    if driver_memory:
        builder = builder.config("spark.driver.memory", driver_memory)
    return builder.getOrCreate()


def get_local_spark(cpus: int | None = None) -> SparkSession:
    """local[N] session for tests and bench.

    `maxPartitionBytes` is lowered locally: the test tables are single
    ~1-20 MB parquet files, which the 128 MB cluster default would scan
    as ONE split (serializing every scan on one core). 4 MB splits give
    the same scan parallelism the file count of a real corpus provides.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local mode = one JVM for driver AND executors: the 1g default
    # heap starves 32 concurrent tasks (GC thrash, spills, and evicted
    # localCheckpoint blocks — measured 3× total bench regression).
    # Size it like the per-executor memory a real cluster would get.
    spark = get_spark(
        master=f"local[{n}]",
        shuffle_partitions=n,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    return spark
