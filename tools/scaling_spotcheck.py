"""Scaling spot-check for the heaviest operators (VERDICT r12 task 6).

The sf0.1 bench can no longer demonstrate parallelism (bounded codas +
spread caps ⇒ c8/c32 ≈ 1), so this harness answers the question the
bench can't: do the spread-capped operators still scale with cores
where they must — on stress-scale inputs where the cap does NOT bind?

Runs the given queries on a stress dir (tools/build_stress.py layouts)
at the CURRENT process's core count and appends
{query: {cpus, sec, rows}} to the output JSON. Run it twice —
SPARK_GRAFT_CPUS=8 and =32 — then read the ratios out of the merged
file (ratio ≫ 1 ⇒ the operator genuinely fans out; ratio ≈ 1 ⇒
latency-bound floor, which at stress scale would be a regression).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scaling_spotcheck.py <stress_dir> <out.json> <query> [query ...]

Timing protocol matches SCALE.md: count() action, warm min of 2.
Missing tables fall back to $SPARK_GRAFT_SF_DIR symlinks, the
measure_scale.py convention.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_database_monitoring_system_spark.session import get_local_spark

FALLBACK = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    stress_dir, out_path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_local_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = os.path.join(stress_dir, "documents.parquet")
    if os.path.isdir(docs):
        size = sum(
            os.path.getsize(os.path.join(docs, f)) for f in os.listdir(docs)
        )
        if size > 100 * 1024 * 1024:
            spark.conf.set("spark.graft.spread.partitions", "256")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))

    qs = entry.queries()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(stress_dir, f"{t}.parquet")
        if os.path.islink(p) and not os.path.exists(p):
            os.unlink(p)
        if not os.path.lexists(p):
            src = os.path.join(FALLBACK, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, p)

    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            n = fn(spark, stress_dir).count()
            times.append(time.time() - t0)
        rec = results.setdefault(name, {})
        rec[f"c{cpus}_sec"] = round(min(times), 2)
        rec["rows"] = n
        lo, hi = rec.get("c8_sec"), rec.get("c32_sec")
        if lo and hi:
            rec["c8_over_c32"] = round(lo / hi, 2)
        print(f"{name}@c{cpus}: {min(times):.2f} s ({n} rows)", flush=True)
        # release pinned localCheckpoint blocks between measurements
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
