"""Measure the embedding near-dup LSH decade points (SCALE.md's
n²/2^bits cost-curve campaign).

Usage:
  python tools/measure_ann_scale.py <embeddings_parquet_path> <bits> [<bits> ...]

Runs `similarity.embedding_near_dup_pairs` at threshold 0.95 with 8
bands × <bits> bits per band over the given table (built by
`tools/build_stress.py emb1m|emb10m`), twice warm, and prints the min
plus the surviving pair count. The sizing rule under test:
bits ≈ log2(n) + 2 holds expected random-collision candidates
(≈ bands·n²/2·2⁻ᵇⁱᵗˢ) constant per decade; a one-decade-stale setting
costs ~n× more candidates, two decades is quadratic death (measured
at 200k/6-bit in r8)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.operators import similarity
from real_time_database_monitoring_system_spark.session import get_local_spark


def main():
    path, bits_list = sys.argv[1], [int(b) for b in sys.argv[2:]]
    spark = get_local_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    emb = spark.read.parquet(path)
    n = emb.count()
    # the documents-table spread sizing applies to the vector table too
    if n > 500_000:
        spark.conf.set("spark.graft.spread.partitions", "256")
    print(f"{path}: {n} vectors", flush=True)
    for bits in bits_list:
        times = []
        for _ in range(2):
            t0 = time.time()
            pairs = similarity.embedding_near_dup_pairs(
                emb, threshold=0.95, bands=8, bits_per_band=bits
            ).count()
            times.append(time.time() - t0)
            # release this run's localCheckpoint blocks (the
            # measure_scale.py lesson)
            it = (
                spark.sparkContext._jsc.sc()
                .getPersistentRDDs()
                .values()
                .iterator()
            )
            while it.hasNext():
                it.next().unpersist(False)
        print(
            f"bits={bits}: {min(times):.1f} s ({pairs} pairs ≥ 0.95)",
            flush=True,
        )


if __name__ == "__main__":
    main()
