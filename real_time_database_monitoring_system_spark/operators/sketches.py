"""Mergeable-sketch analytics (Datasketches KLL / theta / frequent
items) — the companions to `analytics.hll_user_rollup` that complete
the sketch family a 100 TB rollup architecture needs:

- **KLL quantiles** (`kll_value_rollup`): percentiles, like distinct
  counts, cannot be re-aggregated (`percentile` of percentiles is
  wrong), so classic engines re-scan raw data per granularity. KLL
  sketches make the hourly rollup the only raw-feed pass; every
  coarser granularity merges fixed-size sketch state.
- **Theta set operations** (`theta_user_overlap`): HLL can only
  union. Theta sketches support intersection/difference, answering
  "users who did BOTH X and Y" from per-segment sketch state without
  re-scanning or shuffling raw user sets.
- **Frequent items** (`approx_topk_types`): `approx_top_k`'s
  bounded-memory accumulate/combine state survives any partitioning,
  where an exact global top-k needs a full groupBy over every key.

Determinism notes per operator are in their docstrings: theta and
top-k are EXACT below their saturation thresholds (the regime the
sf0.01 oracle runs in), KLL is exact while n ≤ k; beyond those, the
estimates stay within published error bounds (property-tested) but are
no longer cross-engine comparable — the production regime trades that
for mergeability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import materialize as _materialize


def rank_window_ok(lt: Column, le: Column, n: Column, p: float, eps: float) -> Column:
    """True iff an estimate whose feasible rank interval is
    [lt+1, le] (lt = #values strictly below it, le = #values at or
    below it — tie-robust) intersects the inclusive percentile target
    rank ceil(p·n) within a normalized rank tolerance of eps·n + 1.

    This is THE verdict predicate of the checked sketch forms
    (`kll_value_rollup_checked`, `value_percentiles_approx_checked`):
    extracted so its falsifiability is unit-testable directly — a
    regression that degenerates it to always-TRUE turns the verdict
    columns into constants, which only a driver round would catch."""
    nd = n.cast("double")
    tol = nd * F.lit(float(eps)) + F.lit(1.0)
    t = F.ceil(F.lit(p) * nd).cast("double")
    return (lt.cast("double") < t + tol) & (le.cast("double") >= t - tol)


def kll_value_rollup(events: DataFrame, k: int = 16384) -> DataFrame:
    """Daily value percentiles (p50/p95/p99) computed by MERGING
    hourly KLL sketches — one raw-feed pass at the finest granularity,
    merges above. Exact while each day's n ≤ k (holds at oracle/test
    scale); ~1.7% rank error at k=200-scale sizing on real volumes.
    Exact `percentile` rides along as the accuracy reference.

    Rows-only for the driver: KLL compaction is randomized above the
    exact regime, and no other engine reproduces the estimator.
    """
    hourly = (
        events.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy("hour")
        .agg(
            F.expr(f"kll_sketch_agg_double(value, {k})").alias("sk"),
            F.count("*").alias("n_points"),
        )
    )
    daily = (
        hourly.withColumn("day", F.date_trunc("day", "hour"))
        .groupBy("day")
        .agg(
            F.expr("kll_merge_agg_double(sk)").alias("sk"),
            F.sum("n_points").alias("n_points"),
        )
    )
    # percentile_disc, not percentile: KLL's get_quantile returns the
    # smallest retained item with inclusive rank ≥ p (an order
    # statistic) — the interpolating `percentile` differs by up to one
    # inter-item gap even in the exact regime
    exact = (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
                "exact_p50"
            ),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias(
                "exact_p95"
            ),
        )
    )
    return (
        daily.join(exact, "day")
        .select(
            "day",
            "n_points",
            F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("p50"),
            F.expr("kll_sketch_get_quantile_double(sk, 0.95)").alias("p95"),
            F.expr("kll_sketch_get_quantile_double(sk, 0.99)").alias("p99"),
            "exact_p50",
            "exact_p95",
        )
        .orderBy("day")
    )


def kll_value_rollup_checked(events: DataFrame, k: int = 16384) -> DataFrame:
    """Verdict-column form of `kll_value_rollup` so a deterministic
    engine can oracle the merge cascade: hashed output = per-day
    n_points + the exact discrete percentiles (percentile_disc — the
    order-statistic semantics KLL's get_quantile implements) + three
    booleans asserting each merged-sketch quantile lands inside KLL's
    published normalized rank error (~0.04% at k=16384; the 0.5%+1
    tolerance is generous). The booleans are RANK bounds computed by
    counting values below/at the estimate — tie-robust and valid in
    the saturated regime too, not just the exact one. A deterministic
    oracle emits literal TRUE; any estimator-contract violation
    hash-mismatches. The raw sketch values stay out of the hash. Day
    keys are integer epoch-µs buckets (the repo's cross-engine time
    convention)."""
    hourly = events.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("hour_bucket")
    ).agg(F.expr(f"kll_sketch_agg_double(value, {k})").alias("sk"))
    daily = (
        hourly.groupBy(F.expr("hour_bucket div 24").alias("d_bucket"))
        .agg(F.expr("kll_merge_agg_double(sk)").alias("sk"))
        .select(
            "d_bucket",
            F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("k50"),
            F.expr("kll_sketch_get_quantile_double(sk, 0.95)").alias("k95"),
            F.expr("kll_sketch_get_quantile_double(sk, 0.99)").alias("k99"),
        )
    )
    g = (
        events.withColumn(
            "day_bucket", F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        )
        # null-SAFE join back: a NULL ts yields a NULL day bucket, which
        # GROUP BY keeps in both engines — the verification join must
        # not drop that group (inner equi-joins never match NULL keys)
        .join(F.broadcast(daily), F.col("day_bucket").eqNullSafe(F.col("d_bucket")))
        .drop("d_bucket")
        .groupBy("day_bucket")
        .agg(
            F.count("*").alias("n_points"),
            # rank-bound target: NON-NULL value count — percentile_disc
            # and the lt/le counters skip NULL values, so count(*) would
            # shift the target rank on NULL-bearing groups and falsely
            # redden a correct sketch (ADVICE r4)
            F.count("value").alias("n_values"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("exact_p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("exact_p95"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("exact_p99"),
            *[
                agg
                for p, kcol in ((0.5, "k50"), (0.95, "k95"), (0.99, "k99"))
                for agg in (
                    F.sum((F.col("value") < F.col(kcol)).cast("long")).alias(f"lt_{kcol}"),
                    F.sum((F.col("value") <= F.col(kcol)).cast("long")).alias(f"le_{kcol}"),
                )
            ],
        )
    )
    def _rank_ok(kcol: str, p: float):
        return rank_window_ok(
            F.col(f"lt_{kcol}"), F.col(f"le_{kcol}"), F.col("n_values"), p, eps=0.005
        )

    return g.select(
        "day_bucket",
        "n_points",
        "exact_p50",
        "exact_p95",
        "exact_p99",
        _rank_ok("k50", 0.5).alias("p50_in_rank_bound"),
        _rank_ok("k95", 0.95).alias("p95_in_rank_bound"),
        _rank_ok("k99", 0.99).alias("p99_in_rank_bound"),
    ).orderBy("day_bucket")


def theta_user_overlap(events: DataFrame, lg_k: int = 16) -> DataFrame:
    """Pairwise event-type audience overlap from per-type theta
    sketches over user_id: |A|, |B|, |A∪B|, |A∩B| for every unordered
    type pair — computed on sketch state, never by joining raw user
    sets. The per-type sketch table is #types rows; the pair join is a
    broadcast self-join over that tiny table.

    Theta estimates are EXACT while a sketch retains < 2^lg_k entries.
    The default lg_k=16 keeps 65k entries — exact for every driver data
    scale (user cardinality is ~1.5k per sf0.1, so the oracle contract
    holds with ~40× headroom) at a few hundred KB of sketch state;
    saturated sketches estimate within ~1% at lg_k=16
    (property-tested at lg_k=12), the price of answering intersections
    without raw data.
    """
    per_type = (
        events.groupBy("event_type")
        .agg(F.expr(f"theta_sketch_agg(user_id, {lg_k})").alias("sk"))
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.expr("theta_sketch_estimate(sk_a)").alias("users_a"),
            F.expr("theta_sketch_estimate(sk_b)").alias("users_b"),
            F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").alias(
                "users_union"
            ),
            F.expr(
                "theta_sketch_estimate(theta_intersection(sk_a, sk_b))"
            ).alias("users_both"),
        )
        .orderBy("type_a", "type_b")
    )


def approx_topk_types(events: DataFrame, k: int = 100, max_tracked: int = 10000) -> DataFrame:
    """Most frequent event types via `approx_top_k`'s bounded-memory
    accumulate/combine sketch. Two separate exactness conditions:
    counts are EXACT while distinct keys ≤ `max_tracked`, and the
    result is ROW-COMPLETE (every key present, matching an unbounded
    GROUP BY oracle) only while distinct keys ≤ `k` — hence the k=100
    default, far above any plausible event-type cardinality. At
    production key cardinalities the sketch keeps the heavy tail only —
    the point is the fixed-size mergeable state.

    The sketch's own output order is arbitrary under count ties, so
    rows are exploded and re-sorted deterministically (count desc,
    item) before returning.
    """
    return (
        events.agg(
            F.expr(f"approx_top_k(event_type, {k}, {max_tracked})").alias("tk")
        )
        .select(F.explode("tk").alias("entry"))
        .select(
            F.col("entry.item").alias("event_type"),
            F.col("entry.count").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


def countmin_types(
    events: DataFrame, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min sketch audit over event-type frequencies: the CMS
    estimate (min over `depth` hash rows of the hashed bucket's total)
    next to the exact count, with the overshoot — the verdict-column
    form every sketch entry here uses (`hll_user_rollup_checked`),
    proving the one-sided CMS guarantee estimate ≥ exact on real data.
    CMS is the sketch a streaming pipeline keeps when even
    approx_top_k's candidate map is too much state: depth×width
    counters, mergeable by addition, point-queryable.

    The hash family is the repo's portable md5 form (60-bit prefix →
    mod width, salted by the row index), so the DuckDB oracle computes
    the identical placement and the entire audit is integer-exact.

    Scale shape: ONE keyed count reduces the feed to #types rows;
    hashing, bucket totals (depth×width cells max) and the min-fold
    all run on that reduction — the sketch materialization costs
    nothing beyond the count every frequency query already does.
    Output #types rows."""
    if depth < 1 or width < 1:
        raise ValueError("countmin_types: depth and width must be ≥ 1")
    exact = _materialize(
        events.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    )
    hashed = exact.select(
        "event_type",
        "exact_n",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("d"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("d"), F.col("event_type"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(int(width)),
        ),
    )
    cells = hashed.groupBy("d", "bucket").agg(
        F.sum("exact_n").alias("cell_total")
    )
    return (
        hashed.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("event_type")
        .agg(
            F.first("exact_n").alias("exact_n"),
            F.min("cell_total").alias("cm_estimate"),
        )
        .select(
            "event_type",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
            (F.col("cm_estimate") - F.col("exact_n"))
            .cast("bigint")
            .alias("overshoot"),
            (F.col("cm_estimate") >= F.col("exact_n")).alias("never_under"),
        )
        .orderBy("event_type")
    )


def bloom_fpr_audit(
    events: DataFrame, m_bits: int = 1024, k_hashes: int = 4
) -> DataFrame:
    """Bloom-filter false-positive audit in the repo's verdict-column
    sketch form (`countmin_types` convention): build a deterministic
    Bloom filter over one membership set, probe it with a DISJOINT
    set, and report the observed false-positive rate next to the
    fill-factor prediction — the table that sizes m and k before a
    runtime filter ships (`runtime_filter`'s semi-join is the
    production consumer).

    Membership set = even user_ids, probe set = odd (deterministic,
    disjoint by construction, so every probe hit IS a false
    positive). Bit j of user u is the md5-prefix integer of 'j:u'
    mod m — portable, engine-identical. fpr_expected is the standard
    fill^k approximation computed as fixed-order MULTIPLICATIONS
    ((f·f)·(f·f) for k=4) — never pow(), the transcendental-emission
    rule.

    Scale shape: both sides reduce to DISTINCT user relations first;
    the filter itself is ≤ m rows and BROADCAST to the probe side —
    the feed is never joined to itself. Output: one verdict row."""
    if k_hashes != 4:
        raise ValueError("bloom_fpr_audit: the pinned emission is k=4")
    users = events.select(F.col("user_id").cast("bigint").alias("u")).distinct()
    js = F.explode(F.expr(f"sequence(0, {k_hashes - 1})")).alias("j")
    bit = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("u").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % m_bits
    )
    ref = users.filter(F.col("u") % 2 == 0)
    probe = users.filter(F.col("u") % 2 == 1)
    bits = _materialize(
        ref.select("u", js).select(bit.alias("bit")).distinct()
    )
    probe_bits = probe.select("u", js).select("u", bit.alias("bit"))
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("u")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == k_hashes)
    )
    counts = (
        ref.agg(F.count("*").alias("n_ref"))
        .crossJoin(probe.agg(F.count("*").alias("n_probe")))
        .crossJoin(bits.agg(F.count("*").alias("n_bits_set")))
        .crossJoin(hits.agg(F.count("*").alias("n_false_positives")))
    )
    return counts.select(
        F.col("n_ref").cast("bigint").alias("n_ref_users"),
        F.col("n_probe").cast("bigint").alias("n_probe_users"),
        F.col("n_bits_set").cast("bigint").alias("n_bits_set"),
        F.col("n_false_positives").cast("bigint").alias("n_false_positives"),
        F.expr(
            "CASE WHEN n_probe > 0 THEN"
            " round(CAST(n_false_positives AS DOUBLE)"
            " / CAST(n_probe AS DOUBLE), 9) END"
        ).alias("fpr_observed"),
        F.expr(
            f"round(((CAST(n_bits_set AS DOUBLE) / {m_bits}.0)"
            f" * (CAST(n_bits_set AS DOUBLE) / {m_bits}.0))"
            f" * ((CAST(n_bits_set AS DOUBLE) / {m_bits}.0)"
            f" * (CAST(n_bits_set AS DOUBLE) / {m_bits}.0)), 9)"
        ).alias("fpr_expected"),
    )
