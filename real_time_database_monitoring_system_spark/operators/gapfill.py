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


def gapfill_locf(events: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """Per-event-type 5-min rollup densified over each key's
    [min, max] bucket range: gap buckets appear with ``n_points = 0``,
    ``is_gap = true`` and the last observed value carried forward.

    Bucket arithmetic is integer µs division (epoch-aligned, identical
    in any engine); the carried value is max_by over the unique
    monotone event_id, so LOCF is deterministic under ties.
    """
    bucket_us = bucket_seconds * 1_000_000
    # materialized: consumed twice (spine extents + the left join) —
    # without it the diamond re-scans and re-aggregates the raw feed
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
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(buckets, ["event_type", "bucket_s"], "left")
        .select(
            "event_type",
            "bucket_s",
            F.coalesce("n_points", F.lit(0)).alias("n_points"),
            F.col("last_value").isNull().alias("is_gap"),
            F.last("last_value", ignorenulls=True).over(w).alias("value_locf"),
        )
        .orderBy("event_type", "bucket_s")
    )
