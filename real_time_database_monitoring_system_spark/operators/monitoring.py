"""Monitoring-panel operators over the `events` feed.

`events(event_id, ts, user_id, event_type, value, props)` stands in for
the reference's live-activity and metric tables (`pg_stat_activity`,
`admin.system_metrics` — FIXTURES.md §1/§7): `user_id`≈pid,
`event_type`≈state, `value`≈cpu_usage, `ts`≈query_start/created_at.

Determinism: the reference computes everything relative to ``now()``
(``/root/reference/myapp/views.py:402,405,414,419``). ``now()`` inside a
correctness-checked query is non-reproducible, so every operator takes
"now" as the **maximum event time in the table** (the monitoring
snapshot instant), computed as a broadcast scalar subquery — one
column-pruned max-agg, no driver collect, scale-independent.

All interval math is exact integer microseconds (BIGINT): SURVEY §7
flags PG-interval vs Spark-interval formatting as a correctness risk,
so intervals never leave the engine as native interval types.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sketches import rank_window_ok
from .util import materialize as _materialize

_TS_US = "unix_micros(cast(ts as timestamp))"


def _minute_bucket(col_name: str) -> Column:
    """Exact integer minute bucket of a timestamp column, by name.

    Integer ``div`` truncates toward zero — empirically identical to
    DuckDB's integer ``//`` and its ns→µs timestamp conversion on BOTH
    signs (see tests/test_dialect.py negative-epoch parity test), so
    bucket math is cross-engine exact for pre-1970 data too."""
    return F.expr(f"unix_micros(cast({col_name} as timestamp)) div 60000000")

MICROS_PER_MIN = 60_000_000
MICROS_PER_HOUR = 3_600_000_000


def _us(col: Column | str) -> Column:
    """Exact epoch microseconds of a (NTZ) timestamp column. The NTZ →
    LTZ cast is value-preserving because the engine pins the session
    timezone to UTC (sources.registry.configure_session)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def with_as_of(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Attach the snapshot instant ``as_of_us`` (max event time, µs) to
    every row via a broadcast scalar aggregate — the Spark restatement
    of PG's ``now()`` at snapshot time."""
    as_of = events.agg(F.max(_us(ts_col)).alias("as_of_us"))
    return events.crossJoin(F.broadcast(as_of))


def slow_sessions(events: DataFrame, threshold_minutes: int = 15) -> DataFrame:
    """Sessions running longer than a threshold — the flagship panel.

    Reference: slow-query detection, ``now() - query_start > interval
    '15 minute'`` ordered by duration (views.py:396-407). Scan →
    computed projection (age) → interval filter → sort. Filter and
    projection sit directly on the scan, so Catalyst pushes both into
    the parquet reader.
    """
    df = with_as_of(events)
    df = df.withColumn("age_us", F.col("as_of_us") - _us("ts"))
    return (
        df.filter(F.col("age_us") > threshold_minutes * MICROS_PER_MIN)
        .select("event_id", "user_id", "event_type", "ts", "age_us")
        .orderBy(F.desc("age_us"), F.asc("event_id"))
    )


def idle_sessions(events: DataFrame, idle_type: str = "view", threshold_hours: int = 1) -> DataFrame:
    """Idle sessions: state equality AND age over threshold (conjunctive
    filter, views.py:411-421)."""
    df = with_as_of(events)
    df = df.withColumn("idle_us", F.col("as_of_us") - _us("ts"))
    return (
        df.filter((F.col("event_type") == idle_type) & (F.col("idle_us") > threshold_hours * MICROS_PER_HOUR))
        .select("event_id", "user_id", "ts", "idle_us")
        .orderBy(F.desc("idle_us"), F.asc("event_id"))
    )


def session_summary(events: DataFrame) -> DataFrame:
    """Per-state session counts: COUNT(*), COUNT(DISTINCT user),
    conditional count (views.py:506-514, 566-572 generalized to a keyed
    agg — partial aggregation map-side, one shuffle on event_type)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.when(F.col("value") > 50, 1)).alias("n_hot"),
        )
        .orderBy("event_type")
    )


def connection_load(events: DataFrame, slots_per_user: int = 250) -> DataFrame:
    """Connection-load panel: ``100 - (COUNT(*) / NULLIF(max,0)) * 100``
    with the capacity from a scalar subquery (views.py:517-523).
    Integer counts until one final double division, so the value is
    engine-exact."""
    counts = events.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("used_connections"),
        (F.countDistinct("user_id") * slots_per_user).alias("max_connections"),
    )
    return counts.select(
        "used_connections",
        "max_connections",
        (
            F.lit(100.0)
            - (
                F.col("used_connections").cast("double")
                / F.when(F.col("max_connections") == 0, F.lit(None)).otherwise(F.col("max_connections"))
            )
            * 100.0
        ).alias("connection_load_pct"),
    )


def threshold_flags(events: DataFrame) -> DataFrame:
    """Derived boolean status flags per metric row (views.py:618-638:
    cpu<95, ram<90, cache>85, disk<90, load1<10, load5<15) — narrow
    map-only projection, no shuffle."""
    v = F.col("value")
    return events.select(
        "event_id",
        "user_id",
        "value",
        (v < 95).alias("cpu_status"),
        (v < 90).alias("ram_status"),
        (v > 85).alias("cache_status"),
        (v < 90).alias("disk_status"),
        (v < 10).alias("load1_status"),
        (v < 15).alias("load5_status"),
    )


def downsample_5min(events: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """Time-bucket downsampling — the reference does this in browser JS
    (one point per ≥5-min gap, ``index_resource.html:230-245``); here it
    is a keyed aggregation on an exact integer bucket, the batch twin of
    a tumbling-window streaming agg (SURVEY §2.8 T2).

    Bucket arithmetic is integer µs division (epoch-aligned, identical
    in any engine). ``last value`` is max_by over the unique
    monotonically-assigned event_id — deterministic under ties.
    """
    bucket_us = bucket_seconds * 1_000_000
    return (
        events.withColumn("bucket_s", F.expr(f"{_TS_US} div {bucket_us}") * bucket_seconds)
        .groupBy("bucket_s")
        .agg(
            F.count("*").alias("n_points"),
            F.max_by("value", "event_id").alias("last_value"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket_s")
    )


def sliding_rollup(
    events: DataFrame, width_seconds: int = 600, slide_seconds: int = 300
) -> DataFrame:
    """Hopping (sliding) window rollup: overlapping windows of
    `width_seconds` starting every `slide_seconds` — the smoothing the
    tumbling `downsample_5min` can't give (each reading contributes to
    width/slide windows, so bucket-boundary artifacts average out).

    Built on `F.window(ts, width, slide)`, the same expression the
    streaming twin runs (`streaming.rollup.stream_sliding_rollup`):
    Spark expands each row to its width/slide covering windows
    (a Generate, map-side) and aggregates on the window start — ONE
    shuffle whose width is the overlap factor times the tumbling
    rollup's, the explicit cost of smoothing. Window starts are
    epoch-aligned under the pinned UTC session tz, emitted as exact
    integer seconds.
    """
    if width_seconds % slide_seconds != 0:
        raise ValueError("width must be a multiple of slide for aligned hops")
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.window("ts", f"{width_seconds} seconds", f"{slide_seconds} seconds").alias("w")
        )
        .agg(
            F.count("*").alias("n_points"),
            F.max_by("value", "event_id").alias("last_value"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.expr("unix_micros(cast(w.start as timestamp)) div 1000000").alias("window_s"),
            "n_points",
            "last_value",
            "sum_value",
        )
        .orderBy("window_s")
    )


def multi_grain_rollup(events: DataFrame) -> DataFrame:
    """5-minute, hourly, and daily rollups in ONE job via GROUPING
    SETS — the single-plan alternative to `rollup_cascade`'s
    sequential re-aggregation. The feed first partial-aggregates on
    the finest bucket tuple (b5 determines b1h/b1d, so this is the 5-min
    rollup — ONE raw-feed shuffle with map-side combine); the Expand
    then fans only that small table ×3 into the grain aggregate. Same
    raw-data cost as the cascade, no intermediate tables, one job.
    Grain is encoded in (grain, bucket_s); bucket math is integer µs
    division at each granularity.
    """
    base = events.select(
        F.expr(f"({_TS_US} div 300000000) * 300").alias("b5"),
        F.expr(f"({_TS_US} div 3600000000) * 3600").alias("b1h"),
        F.expr(f"({_TS_US} div 86400000000) * 86400").alias("b1d"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    agg = (
        base.groupBy("b5", "b1h", "b1d")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .groupingSets([["b5"], ["b1h"], ["b1d"]], "b5", "b1h", "b1d")
        .agg(F.sum("n").alias("n_points"), F.sum("s").cast("double").alias("sum_value"))
    )
    grain = (
        F.when(F.col("b5").isNotNull(), F.lit("5min"))
        .when(F.col("b1h").isNotNull(), F.lit("1h"))
        .otherwise(F.lit("1d"))
    )
    return (
        agg.select(
            grain.alias("grain"),
            F.coalesce("b5", "b1h", "b1d").alias("bucket_s"),
            "n_points",
            "sum_value",
        )
        .orderBy("grain", "bucket_s")
    )


def rollup_cascade(events: DataFrame) -> DataFrame:
    """Hypertable-style multi-resolution rollup: 5-minute → hourly →
    daily, each level re-aggregating the previous (the continuous-
    aggregate pattern: at scale only the finest level reads raw data;
    coarser levels read the level below — 288× less input for daily).

    Correctness requirement of re-aggregation: every measure must be
    decomposable — counts sum, decimal sums sum (exact, order-free),
    last-value propagates via max_by on the monotone event_id. Doubles
    are only produced at the output edge; the daily result is
    bit-identical to aggregating raw events directly (the oracle does
    exactly that)."""
    five_min = (
        events.withColumn("bucket_s", F.expr(f"{_TS_US} div 300000000") * 300)
        .groupBy("bucket_s")
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
            F.max("event_id").alias("last_eid"),
            F.max_by("value", "event_id").alias("last_value"),
        )
    )
    hourly = (
        five_min.withColumn("bucket_h", F.expr("bucket_s div 3600") * 3600)
        .groupBy("bucket_h")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_dec").alias("sum_dec"),
            F.max("last_eid").alias("last_eid"),
            F.max_by("last_value", "last_eid").alias("last_value"),
        )
    )
    daily = (
        hourly.withColumn("bucket_d", F.expr("bucket_h div 86400") * 86400)
        .groupBy("bucket_d")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
            F.max_by("last_value", "last_eid").alias("last_value"),
        )
    )
    return daily.select("bucket_d", "n_points", "sum_value", "last_value").orderBy("bucket_d")


def minute_corr_join(
    events: DataFrame,
    customer: DataFrame,
    left_type: str = "purchase",
    right_type: str = "error",
) -> DataFrame:
    """Minute-truncated correlation join (J4): the reference joins
    metric rows to process samples on ``TO_CHAR(ts,'YYYY:MM:DD HH24:MI')``
    string equality plus a pid hop to live sessions, DISTINCT
    (views.py:793-799). Restated as an exact integer minute-bucket
    equi-join (SURVEY §7: prefer date_trunc semantics over string
    equality) plus a dimension hop. The customer hop is UNHINTED:
    unlike region/nation, customer scales with the user population
    (1e9 rows on a large deployment), so a forced broadcast would OOM
    — the optimizer broadcasts from statistics while it fits
    (plan-asserted at test SFs) and falls back to a shuffle join
    beyond that.
    """
    a = events.filter(F.col("event_type") == left_type).select(
        _minute_bucket("ts").alias("minute_b"),
        F.col("event_id").alias("a_event_id"),
        F.col("user_id").alias("a_user_id"),
    )
    b = events.filter(F.col("event_type") == right_type).select(
        _minute_bucket("ts").alias("minute_b"),
        F.col("event_id").alias("b_event_id"),
    )
    return (
        a.join(b, "minute_b")
        .join(customer, a.a_user_id == customer.c_custkey)
        .select("minute_b", "a_event_id", "b_event_id", "c_name")
        .distinct()
        .orderBy("minute_b", "a_event_id", "b_event_id")
    )


def lag_delta(events: DataFrame) -> DataFrame:
    """LAG-over-ordered-series delta (W1, views.py:656-664). The
    reference's window is global (ORDER BY only — single-partition at
    scale); we partition by user so state stays distributed, matching
    how the panel generalizes beyond one backup series."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


def latest_per_user(events: DataFrame) -> DataFrame:
    """Top-1 per key by recency (W2: ``ORDER BY id DESC LIMIT 1``
    views.py:585-614 generalized per-key). row_number over (user, ts
    desc, id desc) — deterministic tiebreak on the unique id."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value", "event_type")
    )


def tps_per_user(events: DataFrame) -> DataFrame:
    """Rate-from-counters (A4, views.py:551-563): events per second over
    each user's active span, CASE-guarded against a zero span."""
    g = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.max(_us("ts")) - F.min(_us("ts"))).alias("span_us"),
    )
    return g.select(
        "user_id",
        "n_events",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.col("n_events").cast("double") / (F.col("span_us").cast("double") / 1e6),
        )
        .otherwise(F.lit(0.0))
        .alias("tps"),
    ).orderBy("user_id")


def retention_filter(events: DataFrame, retention_days: int = 7) -> DataFrame:
    """Retention predicate (P11, views.py:976-985): rows older than
    ``as_of - N days`` — the archive/restore cutoff."""
    df = with_as_of(events)
    cutoff = F.col("as_of_us") - F.lit(retention_days * 24 * MICROS_PER_HOUR)
    return (
        df.filter(_us("ts") < cutoff)
        .select("event_id", "event_type", "ts")
        .orderBy("event_id")
    )


def build_predicates(filters: dict[str, tuple[str, object]]) -> Column:
    """Dynamic predicate builder (P10, views.py:838-862): compose
    optional, validated filters into one Column. ``filters`` maps
    column -> (op, value) with op in {'=', '>=', '<=', '>', '<',
    'between'}. Catalyst folds and pushes the conjunction down."""
    ops = {
        "=": lambda c, v: F.col(c) == v,
        ">=": lambda c, v: F.col(c) >= v,
        "<=": lambda c, v: F.col(c) <= v,
        ">": lambda c, v: F.col(c) > v,
        "<": lambda c, v: F.col(c) < v,
        "between": lambda c, v: F.col(c).between(v[0], v[1]),
    }
    preds = [ops[op](col, val) for col, (op, val) in filters.items()]
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def drilldown_grid(events: DataFrame, filters: dict[str, tuple[str, object]]) -> DataFrame:
    """Drill-down grid with runtime-assembled WHERE (views.py:832-874):
    DISTINCT projection over dynamically filtered rows."""
    return (
        events.filter(build_predicates(filters))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .distinct()
        .orderBy("event_id")
    )


def paginate(df: DataFrame, order_cols: list[str], page: int, page_size: int = 10) -> DataFrame:
    """Pagination (O5, ``cpu_usage_grid.html:177-199``): row_number over
    a total order (caller must supply a unique ordering) windowed to
    one page. At scale prefer key-set pagination; this mirrors the
    reference's offset semantics."""
    w = Window.orderBy(*order_cols)
    lo, hi = (page - 1) * page_size + 1, page * page_size
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(lo, hi))
        .drop("rn")
    )


def paginate_keyset(
    df: DataFrame, key_cols: list[str], after: tuple | None, page_size: int = 10
) -> DataFrame:
    """Key-set pagination — the scale path for O5 and the default for
    any feed bigger than a screenful.

    ``WHERE key > last_seen ORDER BY key LIMIT n``: the lexicographic
    predicate on the (unique) key tuple pushes into the scan and the
    LIMIT becomes TakeOrderedAndProject, so each page is a bounded
    partial top-k — no global row_number sort like offset pagination
    (`paginate`), whose window is a single-task total order. `after` is
    the last key tuple of the previous page (None = first page).
    """
    out = df
    if after is not None:
        # lexicographic (k1, k2, ...) > (a1, a2, ...) without tuple
        # comparison: k1 > a1 OR (k1 = a1 AND (k2 > a2 OR ...))
        pred = F.lit(False)
        for col, val in reversed(list(zip(key_cols, after))):
            pred = (F.col(col) > F.lit(val)) | ((F.col(col) == F.lit(val)) & pred)
        out = out.filter(pred)
    return out.orderBy(*key_cols).limit(page_size)


def substring_search(df: DataFrame, cols: list[str], term: str) -> DataFrame:
    """Case-insensitive any-column substring filter (P12, the JS search
    box, ``cpu_usage_grid.html:201-214``): lower(concat_ws(' ', cols))
    LIKE %term%."""
    hay = F.lower(F.concat_ws(" ", *[F.col(c).cast("string") for c in cols]))
    return df.filter(hay.contains(term.lower()))


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """Per-user as-of join: each `left_type` event matched to the most
    recent `right_type` event at-or-before it (the temporal-join
    operator Spark lacks natively; DuckDB spells it ASOF JOIN).

    Composition: tag both streams, union, and carry the latest right
    event forward with ``last(..., ignorenulls)`` over (user, ts, tag)
    — one shuffle on user_id, state is a single carried value per row,
    no range-explosion join. Right side is deduped per (user, ts)
    (keep max event_id) so ties are deterministic in any engine.
    Equal timestamps match (right sorts before left at the same ts).

    NULL-ts right rows are excluded: Spark's ASC window default is
    NULLS FIRST, so an unfiltered NULL-ts click would be carried into
    every purchase before the user's first real click — the oracle's
    ASOF condition (p.ts >= c.ts) never matches a NULL. A NULL-ts
    LEFT row needs no filter: it sorts before any right row, carries
    nothing, and emits with a NULL match — exactly the ASOF LEFT JOIN
    result.
    """
    right = (
        events.filter(F.col("event_type") == right_type)
        .filter(F.col("ts").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"), F.max_by("value", "event_id").alias("r_value"))
        .select("user_id", "ts", "r_event_id", "r_value", F.lit(0).alias("tag"))
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.col("event_id").alias("l_event_id"),
        F.lit(None).cast("bigint").alias("r_event_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(1).alias("tag"),
    )
    unioned = right.select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("l_event_id"), "r_event_id", "r_value", "tag"
    ).unionByName(left)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "user_id",
        "ts",
        "l_event_id",
        "tag",
        F.last("r_event_id", ignorenulls=True).over(w).alias("matched_click_id"),
        F.last("r_value", ignorenulls=True).over(w).alias("matched_click_value"),
        F.last(F.when(F.col("tag") == 0, _us("ts")), ignorenulls=True).over(w).alias("matched_us"),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            F.col("l_event_id").alias("event_id"),
            "user_id",
            "ts",
            "matched_click_id",
            "matched_click_value",
            (_us("ts") - F.col("matched_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


VALUE_BANDS: list[tuple[int, float, float]] = [
    (0, 0.0, 25.0),
    (1, 25.0, 50.0),
    (2, 50.0, 100.0),
    (3, 100.0, 200.0),
    (4, 200.0, 1e9),
]


def value_band_join(events: DataFrame) -> DataFrame:
    """Range join: match each metric row to its [lo, hi) band — the
    range-predicate join Spark has no native operator for. The band
    dimension is tiny and broadcast, so the non-equi condition runs as
    a BroadcastNestedLoopJoin over 5 rows per record — no shuffle, no
    range explosion; at scale with a LARGE range side, the standard
    rewrite is binning both sides to an equi-key first (the approach
    `minute_corr_join` takes for time). Mirrors the reference's
    range-checked optimization panel (`system_optimization`
    min/max check, index_resource.html:198-214)."""
    spark = events.sparkSession
    bands = spark.createDataFrame(VALUE_BANDS, "band_id int, lo double, hi double")
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("band_id")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-state latency/usage percentiles (p50/p95/p99) —
    the aggregation a monitoring dashboard actually wants from the
    metric feed. Exact `percentile` (linear interpolation over the
    sorted values) so the oracle matches bit-for-bit; at 100 TB swap
    in `approx_percentile` (see `value_percentiles_approx`), trading
    a bounded rank error for one pass and tiny state."""
    return (
        events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


def value_percentiles_approx(events: DataFrame, accuracy: int = 10000) -> DataFrame:
    """The sketch path: approx_percentile (KLL-style) — single pass,
    mergeable state, the right choice at corpus scale. Verified in
    tests against the exact percentiles within rank-error tolerance."""
    return (
        events.groupBy("event_type")
        .agg(
            F.expr(f"approx_percentile(value, 0.5, {accuracy})").alias("p50"),
            F.expr(f"approx_percentile(value, 0.95, {accuracy})").alias("p95"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .orderBy("event_type")
    )


def value_percentiles_approx_checked(events: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Verdict-column form of `value_percentiles_approx`, built so a
    deterministic engine can oracle it: the HASHED output carries the
    exact percentiles/cardinalities plus booleans asserting the sketch
    estimates sit inside their PUBLISHED error bounds; the raw
    estimates (whose exact values no other engine reproduces beyond
    the unsaturated regime) stay out of the output.

    The percentile booleans are RANK bounds, not value bounds — the GK
    summary guarantees rank(est) ∈ p·n ± n/accuracy under any merge
    order, so `[count(<est), count(≤est)]` must intersect that window
    (tie-robust at any scale, not just the exact regime). The
    cardinality boolean allows 3σ of approx_count_distinct's default
    5% rsd plus an absolute floor for tiny groups. A deterministic
    oracle emits literal TRUE; any estimator-contract violation
    hash-mismatches."""
    approx = events.groupBy(F.col("event_type").alias("a_et")).agg(
        F.expr(f"approx_percentile(value, 0.5, {accuracy})").alias("a50"),
        F.expr(f"approx_percentile(value, 0.95, {accuracy})").alias("a95"),
        F.approx_count_distinct("user_id").alias("au"),
    )
    g = (
        # null-SAFE join back: groupBy keeps a NULL event_type group in
        # both engines, so the verification join must not drop it (an
        # inner equi-join never matches NULL keys)
        events.join(
            F.broadcast(approx), F.col("event_type").eqNullSafe(F.col("a_et"))
        )
        .drop("a_et")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            # rank-bound target: NON-NULL value count. percentile() and
            # the lt/le counters all skip NULL values, so using count(*)
            # here would inflate the target rank whenever a group has
            # NULL values and falsely redden a correct sketch (ADVICE r4).
            F.count("value").alias("n_values"),
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("percentile(value, 0.5)").alias("p50_exact"),
            F.expr("percentile(value, 0.95)").alias("p95_exact"),
            F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
            F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
            F.sum((F.col("value") < F.col("a95")).cast("long")).alias("lt95"),
            F.sum((F.col("value") <= F.col("a95")).cast("long")).alias("le95"),
            F.first("au").alias("au"),
        )
    )
    def _rank_ok(lt: str, le: str, p: float):
        return rank_window_ok(
            F.col(lt), F.col(le), F.col("n_values"), p, eps=1.0 / accuracy
        )

    card_tol = F.greatest(F.lit(5.0), F.lit(0.15) * F.col("exact_users"))
    return g.select(
        "event_type",
        "n_events",
        "exact_users",
        "p50_exact",
        "p95_exact",
        _rank_ok("lt50", "le50", 0.5).alias("p50_in_rank_bound"),
        _rank_ok("lt95", "le95", 0.95).alias("p95_in_rank_bound"),
        (F.abs(F.col("au") - F.col("exact_users")) <= card_tol).alias("users_in_bound"),
    ).orderBy("event_type")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (the batch twin of
    `session_window`): a new session starts when the gap to the
    previous event exceeds the threshold.

    lag → boundary flag → running sum = session ordinal, then one
    aggregate per (user, session). All integer µs math — deterministic
    in any engine. In Structured Streaming the same semantics come
    from ``F.session_window`` with a watermark; this form also serves
    the reference-style batch dashboards (session counts/durations per
    user, views.py:566-572 generalized).
    """
    gap_us = gap_minutes * MICROS_PER_MIN
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (_us("ts") - F.lag(_us("ts")).over(w)).isNull()
            | ((_us("ts") - F.lag(_us("ts")).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_no", F.sum("is_start").over(w_run))
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min(_us("ts")).alias("start_us"),
            F.max(_us("ts")).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
        .orderBy("user_id", "session_no")
    )


def props_key_histogram(events: DataFrame) -> DataFrame:
    """JSON prop extraction + histogram (the reference ships rows to JS
    as JSON, views.py:816; here JSON work stays in the engine):
    get_json_object on the props column, grouped count."""
    return (
        events.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .orderBy("k")
    )


ENGINE_NAME = "real_time_database_monitoring_system_spark"
ENGINE_VERSION = "2.0"


def engine_info(events: DataFrame) -> DataFrame:
    """Engine metadata panel — the S4 function-call sources the
    reference surfaces via ``SELECT version()`` (views.py:579-582) and
    uptime via ``now() - pg_postmaster_start_time()`` (views.py:538-541).

    Version is an engine constant; "now" is the snapshot instant (max
    event time, as everywhere in this engine) and "start" the minimum —
    one column-pruned min/max aggregate, no driver collect.
    """
    return events.agg(
        F.min(_us("ts")).alias("started_us"), F.max(_us("ts")).alias("as_of_us")
    ).select(
        F.lit(ENGINE_NAME).alias("engine"),
        F.lit(ENGINE_VERSION).alias("version"),
        "as_of_us",
        (F.col("as_of_us") - F.col("started_us")).alias("uptime_us"),
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured props analytics on Spark 4's VARIANT type: the
    JSON column is parsed ONCE per row into the binary variant encoding
    and every typed field extraction reads that — where the classic
    `get_json_object` path (props_histogram) re-parses the string per
    extraction. At warehouse scale, ingest pipelines store the variant
    column; here the parse rides in the same projection.

    Typed NULL contract: `variant_get(v, path, type)` yields NULL for
    missing paths, which `count(k)` then excludes — identical to the
    JSON-path oracle semantics. `try_parse_json` (not strict
    `parse_json`) keeps malformed rows as NULL rather than aborting the
    query — the lenient semantics of both the JSON-path oracle and the
    legacy `get_json_object` path.
    """
    return (
        events.select("event_type", F.try_parse_json(F.col("props")).alias("v"))
        .select("event_type", F.expr("variant_get(v, '$.k', 'bigint')").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def interval_overlap_join(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Interval-overlap join (range join): user sessions × per-type
    "busy hours", matched on time-interval overlap — the operator
    behind "which sessions were exposed to the incident window"
    questions. Spark has no native range join, and the naive spelling
    (cross join + overlap predicate) is a nested-loop scan of
    sessions × windows.

    Scale shape: the canonical *bucket-split equi-join*. Each session
    interval explodes to the hour buckets it spans (`sequence`), each
    busy-hour window lives in exactly one bucket, and the overlap
    candidates come from a plain hash equi-join on the bucket id —
    shuffle-bounded, never quadratic. The exact overlap predicate then
    filters candidates. Because a window occupies a single bucket, no
    candidate pair can appear twice, so no dedup pass is needed; with
    variable-width windows the same plan buckets by the max window
    width. The busy-hours side here is dimension-sized (types × hours),
    so it is additionally broadcast — the explode side never shuffles
    at all.

    "Busy" is scale-free and division-free: an hour is busy for a type
    when ``cnt · n_hours · 2 > 3 · total`` (integer cross-
    multiplication of "count > 1.5× the type's mean hourly count") —
    exact in any engine. The 1.5 multiplier matters at scale: a dense
    feed's hourly counts concentrate around the mean (relative
    variance shrinks with rate), so a 2× cutoff that fires on sparse
    test data silently selects NOTHING on production-density data —
    found empirically when the 10× stress corpus returned zero
    windows. Overlap is measure-positive (strict inequalities):
    touching endpoints do not match. All µs integer math.
    """
    hour_us = MICROS_PER_HOUR
    by_hour = events.groupBy(
        "event_type", F.expr(f"{_TS_US} div {hour_us}").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    totals = by_hour.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_hours")
    )
    windows = (
        by_hour.join(totals, "event_type")
        .filter(F.col("cnt") * F.col("n_hours") * 2 > 3 * F.col("total"))
        .select(
            "event_type",
            "hr",
            (F.col("hr") * hour_us).alias("win_start_us"),
            ((F.col("hr") + F.lit(1)) * hour_us).alias("win_end_us"),
            "cnt",
        )
    )
    sessions = sessionize(events, gap_minutes)
    exploded = sessions.select(
        "user_id",
        "session_no",
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.expr("start_us div 3600000000"), F.expr("end_us div 3600000000")
            )
        ).alias("hr"),
    )
    return (
        exploded.join(F.broadcast(windows), "hr")
        .filter(
            (F.col("start_us") < F.col("win_end_us"))
            & (F.col("end_us") > F.col("win_start_us"))
        )
        .select(
            "user_id",
            "session_no",
            "event_type",
            "win_start_us",
            (
                F.least("end_us", "win_end_us")
                - F.greatest("start_us", "win_start_us")
            ).alias("overlap_us"),
        )
        .orderBy("user_id", "session_no", "event_type", "win_start_us")
    )


def ewma_smooth(events: DataFrame, depth: int = 8) -> DataFrame:
    """Per-series EWMA smoothing (α = 1/2) as an exact finite window:
    the classic time-series denoiser, truncated at ``depth`` lags so
    the result is a deterministic rational instead of an
    order-sensitive float recurrence. Weights are 2^(depth-1-i) for
    lag i; the normalizer counts only lags that exist, so the series
    head is smoothed over what it has (no warm-up bias, no NULLs).

    Series key is (user_id, event_type): partitions stay bounded per
    user at any feed size — never a whole-type global window. One
    window shuffle; the ``depth`` lags evaluate in a single pass over
    each sorted partition. Arithmetic: value is exact DECIMAL(18,2),
    weights are integer powers of two, so the weighted sum is exact
    decimal; the ONLY inexact step is the final double division, which
    is IEEE-identical in any engine.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    lags = [dec if i == 0 else F.lag(dec, i).over(w) for i in range(depth)]
    num = None
    den = None
    for i, lagged in enumerate(lags):
        weight = 1 << (depth - 1 - i)
        term = F.coalesce(lagged * F.lit(weight), F.lit(0).cast("decimal(18,2)"))
        hit = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = hit if den is None else den + hit
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        _us("ts").alias("us"),
        "value",
        (num.cast("double") / den.cast("double")).alias("ewma"),
    ).orderBy("event_id")


def freshness_audit(events: DataFrame, stale_minutes: int = 60) -> DataFrame:
    """Per-source data-freshness panel: each event_type's latest
    arrival, its lag behind the feed's snapshot instant, and a stale
    flag — the first page of any ingestion dashboard ("which upstream
    stopped sending?"). The reference's uptime/last-refresh panels
    (views.py engine-info family) generalized per stream.

    ONE column-pruned keyed aggregate (max µs + count per type); the
    snapshot instant is max(last_us) over the #types-row relation —
    the same value as a feed-wide max without a second scan (the
    `health_score` rule). The flag is integer comparison. At 100 TB
    this reads two columns once and ships #types rows.
    """
    per_type = _materialize(
        events.groupBy("event_type").agg(
            F.max(_us("ts")).alias("last_us"), F.count("*").alias("n_events")
        )
    )
    as_of = per_type.agg(F.max("last_us").alias("as_of_us"))
    return (
        per_type.crossJoin(F.broadcast(as_of))
        .select(
            "event_type",
            "n_events",
            "last_us",
            (F.col("as_of_us") - F.col("last_us")).alias("lag_us"),
            (
                F.col("as_of_us") - F.col("last_us")
                > F.lit(stale_minutes * MICROS_PER_MIN)
            ).alias("is_stale"),
        )
        .orderBy("event_type")
    )


def latency_percentile_panel(events: DataFrame, bucket_seconds: int = 3600) -> DataFrame:
    """Per-time-bucket p50/p95/p99 of the metric value — the latency
    panel every monitoring deployment renders next to the mean-based
    `downsample_5min` (reference dashboard charts mean/max only,
    index_resource.html:230-245; percentiles are what the mean hides).

    One keyed aggregate: percentile_disc is an order-statistic sketch
    per (bucket) group with map-side partial state, so the feed is
    scanned once and shuffles once on the bucket key. Output is
    #buckets rows. Exact order statistics over doubles — both engines
    select an actual element, no interpolation ambiguity."""
    if bucket_seconds <= 0:
        raise ValueError("latency_percentile_panel: bucket_seconds must be positive")
    us = bucket_seconds * 1_000_000
    bucket = F.expr(f"({_TS_US}) div {us} * {bucket_seconds}").alias("bucket_s")
    return (
        events.select(bucket, "value")
        .groupBy("bucket_s")
        .agg(
            F.count("*").alias("n"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
        )
        .orderBy("bucket_s")
    )


def trending_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-`k` event types per day by count, with rank — the
    "what's trending" rollup. The window ranks the per-(day, type)
    COUNT relation (#days × #types rows), never the feed; ties break
    on type name for determinism."""
    if k <= 0:
        raise ValueError("trending_types: k must be positive")
    day = F.expr(f"({_TS_US}) div 86400000000").alias("day_no")
    counts = events.select(day, "event_type").groupBy("day_no", "event_type").agg(
        F.count("*").alias("n")
    )
    return trending_from_daily(counts, k)


def trending_from_daily(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank coda over per-(day_no, event_type) count rows — SHARED by
    `trending_types` and its streaming twin
    (`streaming.rollup.stream_trending_types`) so the rank order and
    tiebreak cannot drift between them."""
    w = Window.partitionBy("day_no").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("day_no", "rnk")
    )


def period_over_period(events: DataFrame) -> DataFrame:
    """Day-over-day and week-over-week change panel per event type —
    the growth-rate view every monitoring dashboard puts next to raw
    counts (the reference charts raw daily counts only, views.py chart
    panels; operators compare them across periods). DoD compares to
    the PREVIOUS OBSERVED day 1 day back, WoW to 7 days back — days
    with no traffic yield NULL changes rather than comparing against
    the wrong period (lag is taken over a dense integer day axis via a
    self-join, not row-offset LAG, which would silently skip gaps).

    Shape: one keyed count reduces the feed to the (type, day)
    relation; both comparisons are self-joins of that tiny relation
    shifted by the integer day delta — never a window or join over the
    feed. Changes are single final double divisions of exact counts."""
    from .util import materialize as _materialize

    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    # materialized: the daily relation feeds itself twice as the
    # shifted comparison sides (diamond rule — otherwise the feed
    # count re-runs once per period join)
    daily = _materialize(
        events.groupBy("event_type", day.alias("day_no")).agg(
            F.count("*").alias("n")
        )
    )
    return pop_from_daily(daily)


def pop_from_daily(daily: DataFrame) -> DataFrame:
    """The gap-safe comparison coda over a (event_type, day_no, n)
    relation — shared by the batch operator above and the streaming
    twin (`streaming.rollup.stream_period_over_period`), so the
    documented batch-twin contract cannot drift between copies."""
    prev1 = daily.select(
        "event_type", (F.col("day_no") + 1).alias("day_no"), F.col("n").alias("n_dod")
    )
    prev7 = daily.select(
        "event_type", (F.col("day_no") + 7).alias("day_no"), F.col("n").alias("n_wow")
    )
    return (
        daily.join(prev1, ["event_type", "day_no"], "left")
        .join(prev7, ["event_type", "day_no"], "left")
        .select(
            "event_type",
            F.col("day_no").cast("bigint").alias("day_no"),
            "n",
            (
                (F.col("n") - F.col("n_dod")).cast("double")
                / F.col("n_dod").cast("double")
            ).alias("dod_change"),
            (
                (F.col("n") - F.col("n_wow")).cast("double")
                / F.col("n_wow").cast("double")
            ).alias("wow_change"),
        )
        .orderBy("event_type", "day_no")
    )


def slo_burn(events: DataFrame, budget_pct: float = 1.0) -> DataFrame:
    """SLO error-budget burn panel: daily error rate against a
    `budget_pct` objective, the day's burn-rate multiple, and the
    cumulative share of the period's budget consumed — the SRE
    dashboard the reference's raw error counters (views.py error
    panels) feed into once an availability objective exists.

    burn_rate = error_rate / budget (1× = exactly on budget);
    cum_budget_used = cumulative errors / (budget × cumulative total).

    Determinism: counts are exact integers; each output ratio is ONE
    pinned-order double division (the budget enters as an exact
    rational: budget_pct/100). Scale shape: one keyed count reduces
    the feed to #days rows; the cumulative windows run over that tiny
    relation (single-partition by design, like the funnel panel)."""
    if budget_pct <= 0:
        raise ValueError("slo_burn: budget_pct must be positive")
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = events.groupBy(day.alias("day_no")).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    return slo_burn_from_daily(daily, budget_pct)


def slo_burn_from_daily(daily: DataFrame, budget_pct: float = 1.0) -> DataFrame:
    """Burn-rate coda over per-(day_no) (n_total, n_errors) rows —
    SHARED by `slo_burn` and the streaming twin
    (`streaming.rollup.stream_slo_burn`) so the burn math and the
    budget parameter cannot drift between them."""
    if budget_pct <= 0:
        raise ValueError("slo_burn: budget_pct must be positive")
    w_cum = Window.orderBy("day_no").rowsBetween(Window.unboundedPreceding, 0)
    frac = budget_pct / 100.0
    return (
        daily.withColumn("cum_errors", F.sum("n_errors").over(w_cum))
        .withColumn("cum_total", F.sum("n_total").over(w_cum))
        .select(
            F.col("day_no").cast("bigint").alias("day_no"),
            "n_total",
            "n_errors",
            F.expr(
                "round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 9)"
            ).alias("error_rate"),
            F.expr(
                f"round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE)"
                f" / {frac!r}, 9)"
            ).alias("burn_rate"),
            F.expr(
                f"round(CAST(cum_errors AS DOUBLE)"
                f" / ({frac!r} * CAST(cum_total AS DOUBLE)), 9)"
            ).alias("cum_budget_used"),
        )
        .orderBy("day_no")
    )


def bounce_rate_daily(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Daily session bounce rate: the share of sessions containing
    exactly one event, keyed to the session's start day — the classic
    engagement metric layered on the same 30-minute sessionizer as
    `sessionize` (shared semantics, so the two panels can never
    disagree about what a session is).

    One window shuffle on user_id (the sessionizer), one group per
    (user, session), then a #days-row panel. Rates are single final
    double divisions of exact counts."""
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.expr(_TS_US)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        flagged.withColumn("session_no", F.sum("is_start").over(w_run))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(f"min({_TS_US}) div 86400000000").alias("day_no"),
        )
    )
    return bounce_panel_from_sessions(sessions)


def bounce_panel_from_sessions(sessions: DataFrame) -> DataFrame:
    """Bounce panel coda over per-session (day_no, n_events) rows —
    SHARED by `bounce_rate_daily` and the streaming twin
    (`streaming.rollup.stream_bounce_rate`) so the bounce definition
    and rounding cannot drift between them."""
    return (
        sessions.groupBy("day_no")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.expr(
                "round(CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE), 9)"
            ),
        )
        .orderBy("day_no")
    )


def nearest_event_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """Bidirectional as-of ("ASOF NEAREST") join: each `left_type`
    event matched to the CLOSER of the latest `right_type` at-or-
    before it and the earliest strictly-after it — the sensor-
    alignment semantics (QuestDB's nearest join) that plain backward
    ASOF gets wrong when the next reading is closer than a stale
    previous one. Ties prefer the backward match (the reading that
    already existed).

    Composition: the `asof_join` union-carry, run in BOTH directions
    in one window pass — backward via `last(ignorenulls)` over the
    ascending (ts, tag) order, forward via the DESC-order backward
    frame (the `gapfill` forward-scan rule: never an
    unboundedFollowing growing frame). ONE shuffle on user_id; no
    range join, no explosion. Right side deduped per (user, ts) with
    max event_id so both engines resolve ties identically."""
    right = (
        events.filter(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"))
        .select("user_id", "ts", "r_event_id", F.lit(0).alias("tag"))
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.col("event_id").alias("l_event_id"),
        F.lit(None).cast("bigint").alias("r_event_id"),
        F.lit(1).alias("tag"),
    )
    unioned = right.select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("l_event_id"),
        "r_event_id", "tag",
    ).unionByName(left)
    us = F.expr(_TS_US)
    # backward: right rows at the same ts sort BEFORE left (tag 0 < 1)
    # so equal timestamps match backward; forward: strictly later
    # rights only (left sorts before right in the reversed order)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "user_id",
        "ts",
        "l_event_id",
        F.last(F.when(F.col("tag") == 0, F.col("r_event_id")), ignorenulls=True)
        .over(w_back)
        .alias("prev_id"),
        F.last(F.when(F.col("tag") == 0, us), ignorenulls=True)
        .over(w_back)
        .alias("prev_us"),
        F.last(F.when(F.col("tag") == 0, F.col("r_event_id")), ignorenulls=True)
        .over(w_fwd)
        .alias("next_id"),
        F.last(F.when(F.col("tag") == 0, us), ignorenulls=True)
        .over(w_fwd)
        .alias("next_us"),
        "tag",
    ).filter(F.col("tag") == 1)
    d_prev = us - F.col("prev_us")
    d_next = F.col("next_us") - us
    pick_prev = F.col("next_us").isNull() | (
        F.col("prev_us").isNotNull() & (d_prev <= d_next)
    )
    return carried.select(
        F.col("l_event_id").alias("event_id"),
        "user_id",
        F.when(pick_prev, F.col("prev_id")).otherwise(F.col("next_id")).alias(
            "nearest_id"
        ),
        F.when(pick_prev, d_prev).otherwise(-d_next).alias("signed_gap_us"),
    ).orderBy("event_id")


def health_score(events: DataFrame, stale_minutes: int = 60) -> DataFrame:
    """Composite engine-health scorecard — the single number at the
    top of the reference's dashboard (its status banner derives from
    per-metric threshold flags, views.py:618-638), computed from the
    SAME panel aggregates the detail views show so the headline can
    never disagree with the drill-downs: overall error rate, stale
    ingest sources, and error-budget burn fold into a 0-100 score
    with a band.

    score = 100 − 40·min(1, burn) − 30·err_share − 30·stale_share,
    every input an exact ratio of integer counts, the fold one
    pinned-order double expression.

    All three inputs are O(#types)-row aggregates of ONE feed scan
    (conditional aggregation — the scan is shared, not repeated);
    the combine is a single-row cross join chain."""
    us = F.expr(_TS_US)
    per_type = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max(us).alias("last_us"),
    )
    panel = per_type.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", F.col("n")).otherwise(0)).alias(
            "n_errors"
        ),
        F.count("*").alias("n_sources"),
        F.max("last_us").alias("as_of_us"),
    )
    stale = (
        per_type.crossJoin(F.broadcast(panel.select("as_of_us")))
        .filter(
            F.col("as_of_us") - F.col("last_us")
            > F.lit(stale_minutes).cast("bigint") * F.lit(60_000_000).cast("bigint")
        )
        .agg(F.count("*").alias("n_stale"))
    )
    return (
        panel.crossJoin(F.broadcast(stale))
        .select(
            "n_total",
            "n_errors",
            "n_sources",
            F.col("n_stale").cast("bigint").alias("n_stale"),
            F.expr(
                "round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 9)"
            ).alias("error_rate"),
            F.expr(
                "round(100.0"
                " - 40.0 * least(1.0, CAST(n_errors AS DOUBLE)"
                "   / CAST(n_total AS DOUBLE) / 0.01)"
                " - 30.0 * (CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))"
                " - 30.0 * (CAST(n_stale AS DOUBLE) / CAST(n_sources AS DOUBLE)), 9)"
            ).alias("score"),
        )
        .withColumn(
            "band",
            F.when(F.col("score") >= 90, "healthy")
            .when(F.col("score") >= 70, "degraded")
            .otherwise("critical"),
        )
    )


def value_percentiles_interp(events: DataFrame) -> DataFrame:
    """`value_percentiles` (continuous p50/p95/p99 per event type) in
    the counts-based shape — the interpolated completion of the
    round-7 percentile_disc conversion family: Spark's `percentile`
    AGGREGATE buffers every group value in executor memory (a
    feed-scale OOM at 100 TB), while
    `util.cont_quantiles_from_counts` runs over the per-distinct-
    value count relation with exact integer rank arithmetic and one
    fixed-shape interpolation expression at the edge (mirrored
    verbatim by the oracle, so the doubles are bit-identical
    cross-engine). Same numbers as the aggregate at every SF —
    pinned by tests — with bounded state instead of buffered
    groups."""
    from .util import cont_quantiles_from_counts

    return cont_quantiles_from_counts(
        events,
        ["event_type"],
        "value",
        [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)],
    ).orderBy("event_type")
