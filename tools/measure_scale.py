"""Run registry entries against a stress dir and print warm timings.

Usage:
  python tools/measure_scale.py <table_dir_with_parquet> <query> [query ...]

The dir must contain the parquet table(s) the queries read (events
and/or documents); any table a query needs that is missing falls back
to $SPARK_GRAFT_SF_DIR (default sf0.1), so events-only stress dirs can
still serve documents-based loads and vice versa. Each query runs
twice warm (min reported), matching the SCALE.md protocol. Sets
spark.graft.spread.partitions=256 (the 5M-doc sizing) when the dir
holds a documents table bigger than 100 MB.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_database_monitoring_system_spark.session import get_local_spark

FALLBACK = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    stress_dir, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as entry

    spark = get_local_spark()
    docs = os.path.join(stress_dir, "documents.parquet")
    if os.path.exists(docs):
        size = sum(
            os.path.getsize(os.path.join(docs, f)) for f in os.listdir(docs)
        )
        if size > 100 * 1024 * 1024:
            spark.conf.set("spark.graft.spread.partitions", "256")
    # big files: restore cluster-like split size (the 4 MB local
    # override makes 100M-row scans 550 tasks of pure overhead)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))

    qs = entry.queries()
    # load_table(spark, sf_dir, t) reads f"{sf_dir}/{t}.parquet";
    # symlink missing tables into the stress dir instead of patching
    # the loader. lexists (not exists) so a dangling link from an
    # earlier run is detected and replaced instead of raising
    # FileExistsError on os.symlink.
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(stress_dir, f"{t}.parquet")
        if os.path.islink(p) and not os.path.exists(p):
            os.unlink(p)  # dangling link from a moved fallback
        if not os.path.lexists(p):
            src = os.path.join(FALLBACK, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, p)
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            n = fn(spark, stress_dir).count()
            times.append(time.time() - t0)
        print(f"{name}: {min(times):.2f} s ({n} rows)", flush=True)
        # release the localCheckpoint blocks the measured query's
        # materialize() calls pinned: across a multi-query campaign
        # they accumulate in executor heap and OOM'd the 5M-doc kappa
        # run after the winnow pass (r10) — each measurement should
        # start from a clean block manager
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)


if __name__ == "__main__":
    main()
