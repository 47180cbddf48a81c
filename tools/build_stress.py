"""Rebuild the /tmp stress tables the SCALE.md campaigns measure on.

The stress builds live in /tmp and do not survive container restarts;
this script recreates them deterministically so any session can re-run
a SCALE.md row. Construction matches the rounds-7/8 recipes:

- events 1000x (/tmp/stress1000x/events.parquet, 100M rows): 1000
  copies of sf0.1 events; each copy shifts user_id and event_id by a
  copy-specific offset (plants a 1000x user population — keyed-state
  ops grow honestly), keeps ts/type/value/props (day structure and
  the value alphabet are feed constants at any scale).
- events 100x (/tmp/stress100x/events.parquet, 10M rows): copies 0-99
  of the same construction.
- documents 1000x (/tmp/stress1000x/documents.parquet, 5M docs):
  1000 vocabulary-disjoint per-copy token rewrites of sf0.1 — every
  token gets a per-copy suffix, so copies share no shingles and the
  near-dup pair structure stays clique-free (pair counts grow
  linearly, not quadratically). Copy 0 keeps the original text, so
  the 1x corpus is an exact subset.
- documents 100x (/tmp/stress100x/documents.parquet, 500k docs):
  copies 0-99.

Usage: python tools/build_stress.py [events1000|events100|docs1000|docs100] ...
(no args = all four). ~3 GB parquet total, a few minutes on local[32].
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_database_monitoring_system_spark.session import get_local_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _copies(spark, n):
    return spark.range(n).select(F.col("id").cast("long").alias("copy"))


def build_events(spark, n_copies, out):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    big = (
        ev.crossJoin(_copies(spark, n_copies))
        .select(
            (F.col("event_id") + F.col("copy") * F.lit(n_events)).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("copy") * F.lit(n_users)).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
        .repartition(64)
    )
    big.write.mode("overwrite").parquet(out)
    print(f"{out}: {spark.read.parquet(out).count()} rows")


def build_documents(spark, n_copies, out):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # vocabulary-disjoint rewrite: suffix every token with "x<copy>"
    # ($1 backreference + a per-row dynamic suffix — Spark 4's
    # regexp_replace accepts Column replacements)
    suffixed = F.regexp_replace(
        F.col("text"),
        F.lit(r"(\S+)"),
        F.concat(F.lit("$1x"), F.col("copy").cast("string")),
    )
    big = (
        docs.crossJoin(_copies(spark, n_copies))
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(suffixed)
            .alias("text"),
            "lang",
            "source",
        )
        .select(
            "doc_id", "text", "lang", "source",
            F.length("text").alias("n_chars"),
        )
        .repartition(64)
    )
    big.write.mode("overwrite").parquet(out)
    print(f"{out}: {spark.read.parquet(out).count()} docs")


def build_embeddings(spark, n_total, out):
    """The rounds-9/10 embedding-decade construction: the sf0.1 base
    (2k vectors, kept verbatim so the 1× corpus is an exact subset) +
    fresh unit-normalized isotropic 64-d vectors, labels uniform over
    the same 10-label alphabet. Fresh vectors come from seeded numpy
    inside mapInPandas — the RNG is re-seeded from each batch's FIRST
    id, so the build is deterministic given Spark's deterministic
    range partitioning (contiguous id runs per partition)."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = base.count()
    n_fresh = n_total - n_base

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(1_000_003 + int(ids[0]))
            v = rng.standard_normal((len(ids), 64)).astype("float32")
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids + n_base,
                    "embedding": list(v),
                    "label": (ids % 10).astype("int32"),
                }
            )

    fresh = spark.range(n_fresh, numPartitions=64).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    )
    base.select("vec_id", "embedding", "label").unionByName(fresh).write.mode(
        "overwrite"
    ).parquet(out)
    print(f"{out}: {spark.read.parquet(out).count()} vectors")


def main():
    targets = sys.argv[1:] or ["events1000", "events100", "docs1000", "docs100"]
    spark = get_local_spark()
    if "events1000" in targets:
        build_events(spark, 1000, "/tmp/stress1000x/events.parquet")
    if "events100" in targets:
        build_events(spark, 100, "/tmp/stress100x/events.parquet")
    if "docs1000" in targets:
        build_documents(spark, 1000, "/tmp/stress1000x/documents.parquet")
    if "docs100" in targets:
        build_documents(spark, 100, "/tmp/stress100x/documents.parquet")
    if "emb1m" in targets:
        build_embeddings(spark, 1_000_000, "/tmp/stress1M/embeddings.parquet")
    if "emb10m" in targets:
        build_embeddings(spark, 10_000_000, "/tmp/stress10M/embeddings.parquet")


if __name__ == "__main__":
    main()
