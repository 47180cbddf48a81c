"""Per-query profiling for the optimization rounds (guide §1).

For every headline bench query, measures:
- build_sec: Python-side plan construction time (py4j chatter, eager
  guard jobs that run at construction time),
- exec_sec:  noop-sink execution time (min over N passes),
- jobs:      number of Spark jobs the query triggers end-to-end
  (construction + execution) — each eager materialize/guard is a
  sequential job; at small SF job latency dominates, so a high job
  count is the first thing to look at,
- stages:    total stages across those jobs (exchange-ish proxy).

Usage: python tools/profile_queries.py [out.json] [query ...]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from bench import HEADLINE  # noqa: E402
from real_time_database_monitoring_system_spark.session import get_local_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_queries.json"
    names = sys.argv[2:] or HEADLINE
    spark = get_local_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = queries()

    # warm-up
    qs["session_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        sc.setJobGroup(f"prof_{name}", name)
        # pass 1: warm codegen/AQE; not recorded
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build1 = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_warm = time.perf_counter() - t0
        # pass 2: recorded, with job counting
        jobs_before = set(tracker.getJobIdsForGroup(f"prof_{name}"))
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(f"prof_{name}") if j not in jobs_before]
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        results[name] = {
            "build_sec": round(t_build, 3),
            "exec_sec": round(t_total - t_build, 3),
            "total_sec": round(t_total, 3),
            "warm_total_sec": round(t_warm, 3),
            "build1_sec": round(t_build1, 3),
            "jobs": len(jobs),
            "stages": n_stages,
        }
        sc.setJobGroup(None, None)
        if (i + 1) % 20 == 0:
            print(f"... {i + 1}/{len(names)}", file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    tot = sum(r["total_sec"] for r in results.values())
    jobs_tot = sum(r["jobs"] for r in results.values())
    build_tot = sum(r["build_sec"] for r in results.values())
    print(json.dumps({"n": len(results), "total_sec": round(tot, 2),
                      "build_sec_sum": round(build_tot, 2), "jobs_sum": jobs_tot,
                      "out": out_path}))


if __name__ == "__main__":
    main()
