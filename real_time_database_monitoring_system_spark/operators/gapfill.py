"""Gap-filling for time-series rollups — the `time_bucket_gapfill` +
`locf` continuous-aggregate feature class the reference's dashboards
imply (its JS downsampler simply skips missing minutes,
``/root/reference/myapp/templates/myapp/index_resource.html:230-245``;
a monitoring panel at warehouse scale needs explicit gap rows).

Spark has no native gap-filling operator; this composes one from
built-ins so Catalyst keeps the whole plan JVM-side:

1. bucket aggregation (one shuffle, map-side partial aggs),
2. a dense per-key spine via ``sequence()`` + ``explode`` — generated
   from the *aggregated* extents, so the spine stage reads buckets,
   never raw events,
3. a left join of spine onto buckets on (key, bucket) — both sides are
   post-aggregation small relative to the feed,
4. LOCF (last observation carried forward) as
   ``last(value, ignorenulls=True)`` over the per-key ordered window —
   partition-parallel across keys.

At 100 TB only step 1 touches the raw feed; steps 2-4 operate on
#keys × #buckets rows (dashboard-sized by construction, e.g. 5 metric
types × 105k 5-min buckets/year ≈ 0.5M rows), so the gap-fill itself
is never the bottleneck. A skewed-cardinality key column would show up
in step 1's shuffle, where AQE skew-join/salting (operators.skew)
already applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .monitoring import _TS_US
from .util import materialize as _materialize


def _dense_buckets(events: DataFrame, bucket_seconds: int) -> DataFrame:
    """Shared stages 1-3: bucket aggregation (the only raw-feed scan;
    materialized because the diamond — spine extents + the left join —
    would otherwise re-scan and re-aggregate it), per-key sequence()
    spine over [min, max] observed buckets, and the spine⟕buckets
    join. Rows where ``last_value`` is NULL are the gaps.

    Bucket arithmetic is integer µs division (epoch-aligned, identical
    in any engine); ``last_value`` is max_by over the unique monotone
    event_id, so downstream fills are deterministic under ties.
    """
    bucket_us = bucket_seconds * 1_000_000
    buckets = _materialize(
        events.withColumn(
            "bucket_s", F.expr(f"{_TS_US} div {bucket_us}") * bucket_seconds
        )
        .groupBy("event_type", "bucket_s")
        .agg(
            F.count("*").alias("n_points"),
            F.max_by("value", "event_id").alias("last_value"),
        )
    )
    spine = (
        buckets.groupBy("event_type")
        .agg(F.min("bucket_s").alias("mn"), F.max("bucket_s").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.lit(bucket_seconds))
            ).alias("bucket_s"),
        )
    )
    return spine.join(buckets, ["event_type", "bucket_s"], "left")


def gapfill_locf(events: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """Per-event-type 5-min rollup densified over each key's
    [min, max] bucket range: gap buckets appear with ``n_points = 0``,
    ``is_gap = true`` and the last observed value carried forward.
    """
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _dense_buckets(events, bucket_seconds)
        .select(
            "event_type",
            "bucket_s",
            F.coalesce("n_points", F.lit(0)).alias("n_points"),
            # gap = spine left-join miss (n_points IS NULL), NOT
            # last_value IS NULL: Spark's max_by(value, event_id) can
            # return NULL for a bucket that HAS points if the latest
            # reading's value is NULL, while DuckDB's arg_max skips
            # NULL args — the n_points derivation is identical in both
            F.col("n_points").isNull().alias("is_gap"),
            F.last("last_value", ignorenulls=True).over(w).alias("value_locf"),
        )
        .orderBy("event_type", "bucket_s")
    )


def gapfill_interpolate(events: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """Gap-filled rollup with LINEAR interpolation (the `interpolate()`
    companion to `locf()`): each gap bucket gets the straight-line
    value between the nearest observed buckets on either side.

    Same stage shape as `gapfill_locf` (one raw-feed agg, spine, join);
    the interpolation adds two windows over the spine — backward
    last-observed (value, bucket) and forward first-observed — both
    partition-parallel per key. Because each key's spine spans exactly
    [min, max] of its OBSERVED buckets, every gap has both neighbors;
    the formula never divides by zero on spine rows.

    Determinism contract: the interpolation is a single double
    expression with explicit casts, evaluated in the same shape by the
    oracle, rounded to 9 places at the edge (the repo-wide float-path
    rule).
    """
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward scan ("nearest observation at or after this bucket")
    # is expressed as a BACKWARD frame over DESCENDING order: Spark
    # evaluates [unboundedPreceding, currentRow] frames incrementally
    # (O(n) per partition), but a [currentRow, unboundedFollowing]
    # frame re-scans current→end for every row — O(n²) per key, which
    # benched at 22 s vs locf's 0.9 s on the sf0.1 spine
    wf = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("bucket_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("last_value").isNotNull(), F.col("bucket_s"))
    joined = _dense_buckets(events, bucket_seconds).select(
        "event_type",
        "bucket_s",
        F.coalesce("n_points", F.lit(0)).alias("n_points"),
        # spine-miss derivation, matching gapfill_locf (see note there)
        F.col("n_points").isNull().alias("is_gap"),
        F.last("last_value", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(wb).alias("pb"),
        F.last("last_value", ignorenulls=True).over(wf).alias("nv"),
        F.last(obs_bucket, ignorenulls=True).over(wf).alias("nb"),
    )
    interp = F.when(~F.col("is_gap"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            (F.col("bucket_s") - F.col("pb")).cast("double")
            / (F.col("nb") - F.col("pb")).cast("double")
        )
    )
    return (
        joined.select(
            "event_type",
            "bucket_s",
            "n_points",
            "is_gap",
            F.round(interp, 9).alias("value_interp"),
        )
        .orderBy("event_type", "bucket_s")
    )
