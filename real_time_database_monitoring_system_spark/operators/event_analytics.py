"""Sequence analytics over the event feed: ordered-step funnels and
cohort retention — the product-analytics staples a monitoring feed
grows into once questions shift from \"what is the value now\" to
\"what do users do over time\".

Both operators reduce the feed to per-user scalars FIRST (min
timestamps, first-seen week) and run every later stage on those
user-level relations — at 100 TB the raw feed is scanned once per
funnel step (with the step filter pushed to the scan) and the
joins/aggregations operate on #users-sized tables.

Determinism: step times are integer µs minima, cohort weeks are
integer days-since-epoch div 7 (no engine week-start conventions),
ratios are single double divisions rounded at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .pipeline import content_hash_bucket
from .util import materialize as _materialize

_TS_US = "unix_micros(cast(ts as timestamp))"


def funnel_counts(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered funnel: how many users performed step 1, then step 2
    STRICTLY AFTER their first step 1, then step 3 after that — the
    order constraint is what separates a funnel from three overlapping
    COUNT(DISTINCT) panels.

    One pass per step over the feed (step filter pushed down), each
    reduced to a per-user min-µs scalar conditioned on the previous
    step's time via a user-keyed join. Output: one row per step with
    the surviving user count and the step-over-step conversion.
    """
    if steps is None:
        steps = ["view", "click", "purchase"]
    if not steps:
        raise ValueError("funnel_counts needs at least one step")
    us = F.expr(_TS_US)
    prev: DataFrame | None = None
    counts: list[tuple[str, DataFrame]] = []
    for step in steps:
        stage = events.filter(F.col("event_type") == step).select(
            "user_id", us.alias("us")
        )
        if prev is not None:
            stage = (
                stage.join(prev, "user_id")
                .filter(F.col("us") > F.col("prev_us"))
                .select("user_id", "us")
            )
        # materialized: each stage feeds the next stage's join AND its
        # own count row (diamond rule — 8→5 exchanges measured)
        from .util import materialize as _materialize

        cur = _materialize(stage.groupBy("user_id").agg(F.min("us").alias("prev_us")))
        counts.append((step, cur))
        prev = cur
    rows = None
    for i, (step, cur) in enumerate(counts):
        one = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("step_no"), F.lit(step).alias("step"), "n_users"
        )
        rows = one if rows is None else rows.unionByName(one)
    # global window over a #steps-row relation — never the feed
    w_prev = F.lag("n_users").over(Window.orderBy("step_no"))
    return (
        rows.withColumn(
            "conversion",
            F.round(
                F.when(
                    w_prev.isNotNull() & (w_prev != 0),
                    F.col("n_users").cast("double") / w_prev.cast("double"),
                ),
                9,
            ),
        )
        .orderBy("step_no")
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Retention matrix: users grouped by first-seen week (integer
    days-since-epoch div 7 — identical in every engine, no week-start
    convention), counted per week offset they return in. The classic
    cohort triangle.

    Feed reduces to distinct (user, week) once; first-seen week is an
    agg over that; the matrix is a join + count over user-level rows.
    """
    wk = F.expr("datediff(date(cast(ts as timestamp)), date'1970-01-01') div 7")
    # diamond rule: the feed-wide distinct feeds BOTH the first-seen
    # aggregate and the join below — materialize or it recomputes per
    # consumer (two full distinct shuffles over the feed)
    user_weeks = _materialize(events.select("user_id", wk.alias("wk")).distinct())
    first = user_weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        user_weeks.join(first, "user_id")
        .groupBy(
            F.col("cohort_wk"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_wk", "week_offset")
    )


def _transition_edges(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n_transitions): consecutive-event edges
    per user — one window shuffle on user_id (lead over the per-user
    µs+id ordering; the unique event_id tiebreak makes consecutive
    pairs deterministic), then a keyed count. Shared by the Markov
    matrix and the PageRank operator so the two read the same graph."""
    w = Window.partitionBy("user_id").orderBy(F.expr(_TS_US), "event_id")
    return (
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user — the \"user flow\" panel: from each event type,
    where do users go next, and with what probability.

    One window shuffle on user_id (see `_transition_edges`), then a
    keyed count; the probability denominator is an exact integer
    window sum over the (tiny) #types² matrix, so the only double is
    the final division.
    """
    pairs = _transition_edges(events)
    total = Window.partitionBy("from_type")
    return (
        pairs.withColumn(
            "p",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(total).cast("double"),
                9,
            ),
        )
        .orderBy("from_type", "to_type")
    )


def top_session_paths(
    events: DataFrame, gap_minutes: int = 30, k: int = 25
) -> DataFrame:
    """Most common within-session event-type paths: sessionize per
    user (same 30-min inactivity gap as `monitoring.sessionize`),
    stitch each session's ordered event types into a `a>b>c` path
    string, and count paths — the "what do sessions actually do"
    pattern table that the transition matrix (one hop) cannot show.

    The path is a per-(user, session) collect sorted on (µs,
    event_id, type) structs — group-bounded state with a unique
    tiebreak, so the string is deterministic. One window shuffle on
    user_id (sessionizer), one group collect on (user, session), one
    keyed count on the path, TakeOrderedAndProject for the top-k.
    Paths are capped at the session length; a 100 TB deployment would
    additionally cap path length (first N steps) to bound string
    width — semantics, not scale, so not done here.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.expr(_TS_US)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_no", F.sum("is_start").over(w_run))
    paths = (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.expr(_TS_US).alias("us"), "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count("*").alias("path_len"),
        )
    )
    return paths_from_sessions(paths, k)


def paths_from_sessions(paths: DataFrame, k: int = 25) -> DataFrame:
    """Path-frequency coda over per-session (path, path_len) rows —
    SHARED by `top_session_paths` and the streaming twin
    (`streaming.rollup.stream_session_paths`) so the rollup contract
    (count, tiebreak order, top-k) cannot drift between them."""
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"), F.max("path_len").alias("path_len"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def user_entropy(events: DataFrame) -> DataFrame:
    """Per-user engagement diversity: Shannon entropy of each user's
    event-type distribution, H = ln(n) − (Σ c·ln c)/n over exact
    per-type counts — 0 for single-behavior users, ln(#types) for
    uniform explorers. The segmentation feature behind "power user vs
    bot" cuts that raw counts can't express.

    Two keyed aggregations (user×type counts, then per-user combine) —
    both with map-side partials, nothing quadratic. Determinism
    follows `unigram_logprob_score`: each ln is rounded to 9 dp and
    accumulated in decimal (exact, order-independent under any
    parallelism); the single double division happens at the edge.
    """
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    term = (
        F.col("c").cast("decimal(12,0)")
        * F.round(F.log(F.col("c").cast("double")), 9).cast("decimal(16,9)")
    )
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.sum(term).alias("s"),
        F.countDistinct("event_type").alias("n_types"),
    )
    h = F.round(
        F.round(F.log(F.col("n_events").cast("double")), 9)
        - F.col("s").cast("double") / F.col("n_events").cast("double"),
        9,
    )
    return per_user.select(
        "user_id", "n_events", "n_types", h.alias("entropy")
    ).orderBy("user_id")


def conversion_latency(events: DataFrame, first: str = "view", then: str = "purchase") -> DataFrame:
    """How long users take to convert: per-user µs gap between the
    first `first`-step event and the first `then`-step event strictly
    after it, summarized as order-statistic percentiles (p25/p50/p90)
    plus the converting-user count. The funnel says HOW MANY convert;
    this says HOW FAST.

    Same per-user-scalar reduction shape as `funnel_counts` — the
    summary aggregates #users rows, never the feed.
    """
    us = F.expr(_TS_US)
    t1 = (
        events.filter(F.col("event_type") == first)
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    t2 = (
        events.filter(F.col("event_type") == then)
        .select("user_id", us.alias("us"))
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.min("t1").alias("t1"))
    )
    lat = t2.select((F.col("t2") - F.col("t1")).alias("latency_us"))
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_us)").cast("long").alias("p25_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_us)").cast("long").alias("p50_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_us)").cast("long").alias("p90_us"),
    )


def pagerank_transitions(events: DataFrame, n_iter: int = 3) -> DataFrame:
    """PageRank over the event-type transition graph — which states of
    the user journey hold structural importance once indirect flows
    are counted (a type reached mostly FROM important types outranks
    one with the same raw in-count). The second iterative operator in
    the repo after k-means, built on the same exactness trick: ranks
    live in integer millionths and every update is truncating integer
    arithmetic, so the fixed-iteration result is bit-reproducible and
    fully oracle-backed by an unrolled-CTE SQL twin (generated from
    the same n_iter, so the two cannot drift).

    Update rule (damping 0.85, all integer `div`):
        r'(v) = (150000 div N) + Σ_u (r(u) · 850 · w(u,v)) div (1000 · W(u))
    where W(u) is u's total out-weight. Truncation loses ≤1 millionth
    per term — the price of exactness; dangling-node mass is dropped
    (the standard simplified variant), documented here.

    Scale shape: the graph here is #types² (tiny), but the operator is
    written for graphs that aren't — per iteration ONE join of the
    rank vector to the edge list on the source key and one aggregation
    by destination (both keyed shuffles; GraphX/Pregel does exactly
    this dance), with the rank relation materialized per iteration to
    truncate lineage (the k-means/`dup_clusters` rule). Edges and
    out-weights are computed once, before the loop.
    """
    from .util import materialize as _materialize

    edges = _transition_edges(events)
    outw = edges.groupBy("from_type").agg(F.sum("n_transitions").alias("w_out"))
    ew = _materialize(edges.join(outw, "from_type"))
    nodes = events.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    nodes = _materialize(nodes.crossJoin(F.broadcast(nn)))
    ranks = nodes.select("node", "n", F.expr("1000000 div n").alias("r"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(ew, ranks.node == ew.from_type)
            .select(
                F.col("to_type").alias("node"),
                # DECIMAL(38,0) intermediate (oracle: HUGEINT): the
                # raw bigint product r*850*w overflows int64 once a
                # single edge weight exceeds ~1e13 — reachable on the
                # feed sizes this operator targets. `div` on decimals
                # still truncates toward zero and returns bigint, so
                # the value is bit-identical where bigint sufficed.
                F.expr(
                    "(CAST(r AS DECIMAL(38,0)) * 850 * n_transitions)"
                    " div (CAST(w_out AS DECIMAL(38,0)) * 1000)"
                ).alias("term"),
            )
            .groupBy("node")
            .agg(F.sum("term").alias("s"))
        )
        ranks = _materialize(
            nodes.join(contrib, "node", "left").select(
                "node",
                "n",
                (F.expr("150000 div n") + F.coalesce(F.col("s"), F.lit(0))).alias("r"),
            )
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_ppm"),
        (F.col("r").cast("double") / F.lit(1000000.0)).alias("rank"),
    ).orderBy("node")


def attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_minutes: int = 30,
) -> DataFrame:
    """Marketing-style touch attribution: for every `conversion` event,
    the LAST and FIRST touch event (of `touch_types`) by the same user
    inside the lookback window ending at the conversion — the
    complement of `conversion_latency` (which aggregates; this
    attributes each conversion individually). Unattributed conversions
    survive with NULL touch columns and n_touches = 0.

    Shape: two pushed-down type filters over the feed, ONE user-keyed
    range join (candidates bounded by per-user activity inside the
    lookback window — never cross-user), a per-conversion keyed
    aggregate (`max_by`/`min_by` over (touch_us, touch_id), map-side
    combinable), and a left join back for the unattributed rows. No
    window over the feed, nothing quadratic; at 100 TB the only big
    shuffle is the user-keyed join both sides of which were already
    filtered to the relevant event types.
    """
    if lookback_minutes <= 0:
        raise ValueError("attribution: lookback_minutes must be positive")
    if not touch_types:
        raise ValueError("attribution: touch_types must be non-empty")
    us = F.expr(_TS_US)
    horizon_us = lookback_minutes * 60 * 1_000_000
    # diamond rule: `conv` feeds the range join AND the final left
    # join back — materialize or the conversion filter+scan of the
    # feed runs once per consumer
    conv = _materialize(
        events.filter(F.col("event_type") == conversion).select(
            F.col("event_id").alias("conv_id"),
            "user_id",
            us.alias("conv_us"),
        )
    )
    touch = events.filter(F.col("event_type").isin(list(touch_types))).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        us.alias("touch_us"),
    )
    # touch_id != conv_id matters only when `conversion` is also in
    # `touch_types` (self-attribution); harmless otherwise
    matched = (
        conv.join(
            touch,
            (F.col("user_id") == F.col("t_user"))
            & (F.col("touch_us") <= F.col("conv_us"))
            & (F.col("touch_us") > F.col("conv_us") - F.lit(horizon_us))
            & (F.col("touch_id") != F.col("conv_id")),
            "inner",
        )
        .groupBy("conv_id")
        .agg(
            F.expr(
                "max_by(struct(touch_id, touch_type, touch_us), struct(touch_us, touch_id))"
            ).alias("lt"),
            F.expr(
                "min_by(struct(touch_id, touch_type, touch_us), struct(touch_us, touch_id))"
            ).alias("ft"),
            F.count("*").alias("n_touches"),
        )
    )
    return (
        conv.join(matched, "conv_id", "left")
        .select(
            "conv_id",
            "user_id",
            "conv_us",
            F.col("lt.touch_id").alias("last_touch_id"),
            F.col("lt.touch_type").alias("last_touch_type"),
            F.col("lt.touch_us").alias("last_touch_us"),
            F.col("ft.touch_id").alias("first_touch_id"),
            F.col("ft.touch_type").alias("first_touch_type"),
            F.col("ft.touch_us").alias("first_touch_us"),
            F.coalesce("n_touches", F.lit(0)).alias("n_touches"),
        )
        .orderBy("conv_id")
    )


# integer quintile score from four percentile_disc cut points — a
# monotone comparison chain evaluated verbatim by both engines (cuts
# are order statistics of bigint metrics, so every comparison is
# integer-exact; ties land identically)
_RFM_SCORE_SQL = (
    "CAST(1 + CAST({m} > {c}1 AS INT) + CAST({m} > {c}2 AS INT)"
    " + CAST({m} > {c}3 AS INT) + CAST({m} > {c}4 AS INT) AS INT)"
)


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events — the standard behavioral-segmentation panel a
    monitoring stack feeds to lifecycle campaigns: quintile-score each
    user on how recently, how often, and how much they purchased, then
    band the (R, F) grid into named segments.

    Determinism: all three metrics are exact integers (µs recency vs
    the snapshot instant, purchase count, cent-quantized spend), the
    quintile cut points are `percentile_disc` order statistics over
    the USER relation, and scoring is a monotone integer-comparison
    chain — no floats anywhere.

    Scale shape: one filtered keyed aggregation reduces the feed to
    #purchasers rows; the snapshot instant and the 12 cut points are
    one-row broadcast aggregates of that relation; scoring and
    labeling are map-side. The feed is scanned once."""
    from .util import materialize as _materialize

    us = F.expr(_TS_US)
    # materialized: the user relation feeds the snapshot instant, the
    # cut points AND the scoring projection (diamond rule — without it
    # the purchase scan+agg re-runs once per consumer)
    per_user = _materialize(
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(us).alias("last_us"),
            F.count("*").alias("freq"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("mon_cents"),
        )
    )
    return rfm_from_per_user(per_user)


def rfm_from_per_user(per_user: DataFrame) -> DataFrame:
    """Quintile-scoring coda over a (user_id, last_us, freq,
    mon_cents) relation — shared by the batch operator above and the
    streaming twin (`streaming.rollup.stream_rfm_segments`), so the
    batch-twin contract cannot drift. Expects `per_user` to be
    materialized/self-join-safe (it feeds three consumers)."""
    snap = per_user.agg(F.max("last_us").alias("as_of_us"))
    base = per_user.crossJoin(F.broadcast(snap)).withColumn(
        "rec_us", F.col("as_of_us") - F.col("last_us")
    )
    cuts = base.agg(
        *[
            F.expr(f"CAST(percentile_disc({q / 5}) WITHIN GROUP (ORDER BY {m}) AS BIGINT)")
            .alias(f"{c}{q}")
            for m, c in (("rec_us", "rc"), ("freq", "fc"), ("mon_cents", "mc"))
            for q in (1, 2, 3, 4)
        ]
    )
    scored = base.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "rec_us",
        "freq",
        "mon_cents",
        # recency: smaller is better → reverse the chain
        F.expr(
            "CAST(5 - (CAST(rec_us > rc1 AS INT) + CAST(rec_us > rc2 AS INT)"
            " + CAST(rec_us > rc3 AS INT) + CAST(rec_us > rc4 AS INT)) AS INT)"
        ).alias("r_score"),
        F.expr(_RFM_SCORE_SQL.format(m="freq", c="fc")).alias("f_score"),
        F.expr(_RFM_SCORE_SQL.format(m="mon_cents", c="mc")).alias("m_score"),
    )
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .otherwise("hibernating")
    )
    return scored.withColumn("segment", segment).orderBy("user_id")


# pooled two-proportion z-statistic — pinned-order doubles over exact
# integer counts, shared verbatim with the oracle (one sqrt, round 9;
# NULL when a variant has no users or the pooled rate is degenerate)
AB_Z_SQL = (
    "round(CASE WHEN n_a > 0 AND n_b > 0"
    " AND (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b) THEN"
    " (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    "  - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
    " / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    " * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END, 9)"
)


def ab_test_panel(events: DataFrame) -> DataFrame:
    """A/B experiment readout over the feed: users split
    deterministically into control/treatment by content hash of their
    id (the same rerun-stable assignment rule as `pipeline.
    hash_sample` — never rand(), so the experiment is reproducible
    across engines and reruns), outcome = did the user purchase.
    Reports per-arm users/conversions/rate, the relative lift, and the
    pooled two-proportion z-statistic — the decision panel an
    experimentation stack derives from this exact query shape.

    Determinism: assignment is md5-derived, conversions are exact
    integer counts, and the lift/z combine is one pinned-order double
    expression (single sqrt, round 9) shared verbatim with the oracle.

    Scale shape: ONE scan reduces the feed to per-user (arm,
    converted) scalars — a keyed aggregation with map-side partials —
    then a single conditional-aggregation row. No windows, no joins
    over the feed. The panel is ALWAYS exactly one row: an arm with
    no users reports n=0 and NULL rate/lift/z (the guards in
    `AB_Z_SQL`), never a vanished row — a filter+cross-join shape
    would silently emit zero rows when either arm is empty."""
    arm = content_hash_bucket(F.col("user_id").cast("string"), buckets=2)
    per_user = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    return (
        per_user.select(arm.alias("arm"), "converted")
        .agg(
            F.count(F.when(F.col("arm") == 0, F.lit(1))).alias("n_a"),
            F.coalesce(
                F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("conv_a"),
            F.count(F.when(F.col("arm") == 1, F.lit(1))).alias("n_b"),
            F.coalesce(
                F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("conv_b"),
        )
        .select(
            "n_a",
            "conv_a",
            F.expr(
                "round(CASE WHEN n_a > 0 THEN"
                " CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END, 9)"
            ).alias("rate_a"),
            "n_b",
            "conv_b",
            F.expr(
                "round(CASE WHEN n_b > 0 THEN"
                " CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END, 9)"
            ).alias("rate_b"),
            F.expr(
                "round(CASE WHEN conv_a > 0 AND n_b > 0 THEN"
                " (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
                " / (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - 1.0 END, 9)"
            ).alias("relative_lift"),
            F.expr(AB_Z_SQL).alias("z_stat"),
        )
    )


def survival_curve(events: DataFrame, censor_days: int = 7) -> DataFrame:
    """Kaplan–Meier user-retention curve: survival probability by
    lifetime day, with right-censoring for users still active near the
    feed's end — the statistically correct "how long do users stay"
    answer (`cohort_retention` counts returns per cohort; KM handles
    the users whose lifetimes we have not finished observing, which
    naive churn rates systematically bias).

    A user's lifetime is last_seen − first_seen in integer days; users
    whose last event is within `censor_days` of the feed maximum are
    censored (they exit the at-risk set without counting as churn).
    S(t) = Π_{t_j ≤ t} (1 − d_j / n_j) over event days.

    Determinism: lifetimes/counts are exact integers; each step factor
    enters as round(ln(1 − d/n), 9) accumulated as a DECIMAL window
    sum over the day order (order-independent BY VALUE — decimal
    addition is exact), with one exp at the edge; the day every
    remaining user churns pins S to exactly 0 through a flag rather
    than exp(-inf).

    Scale shape: one keyed aggregation reduces the feed to #users
    rows, a second to the #distinct-lifetime-days relation; the KM
    recursion is windows over THAT tiny relation. The feed is scanned
    once."""
    us = F.expr(_TS_US)
    feed_max = events.agg(F.max(us).alias("feed_max_us"))
    per_user = (
        events.groupBy("user_id")
        .agg(F.min(us).alias("first_us"), F.max(us).alias("last_us"))
        .crossJoin(F.broadcast(feed_max))
        .select(
            F.expr("(last_us - first_us) div 86400000000").alias("day"),
            (
                F.col("feed_max_us") - F.col("last_us")
                < F.lit(censor_days) * F.lit(86_400_000_000)
            )
            .cast("int")
            .alias("censored"),
        )
    )
    from .util import materialize as _materialize

    # materialized: the day relation feeds the grand total AND the
    # at-risk windows (diamond rule)
    days = _materialize(
        per_user.groupBy("day").agg(
            F.count("*").cast("bigint").alias("n_exits"),
            F.sum(F.lit(1) - F.col("censored")).cast("bigint").alias("n_deaths"),
            F.sum("censored").cast("bigint").alias("n_censored"),
        )
    )
    total = days.agg(F.sum("n_exits").alias("n_total"))
    w_prior = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = (
        days.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("n_exits").over(w_prior), F.lit(0)),
        )
        .withColumn(
            "ln_factor",
            F.expr(
                "CASE WHEN n_deaths = 0 THEN CAST(0.0 AS DECIMAL(20,9))"
                " WHEN n_deaths < n_risk THEN CAST(round(ln(1.0"
                " - CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9)"
                " AS DECIMAL(20,9))"
                " ELSE CAST(0.0 AS DECIMAL(20,9)) END"
            ),
        )
        .withColumn(
            "extinct",
            F.max(
                F.when(F.col("n_deaths") >= F.col("n_risk"), 1).otherwise(0)
            ).over(w_cum),
        )
        .withColumn("cum_ln", F.sum("ln_factor").over(w_cum))
    )
    return at_risk.select(
        F.col("day").alias("lifetime_day"),
        "n_risk",
        "n_deaths",
        "n_censored",
        F.expr(
            "CASE WHEN extinct = 1 THEN 0.0"
            " ELSE round(exp(CAST(cum_ln AS DOUBLE)), 9) END"
        ).alias("survival"),
    ).orderBy("lifetime_day")


def funnel_windowed(
    events: DataFrame,
    steps: list[str] | None = None,
    max_lag_minutes: int = 12 * 60,
) -> DataFrame:
    """Time-boxed ordered funnel: step i counts only if it happens
    AFTER the user's step i−1 AND within `max_lag_minutes` of it — the
    attribution-window form real funnels use (an unbounded funnel
    credits a purchase to a view from months ago; `funnel_counts`
    keeps the unbounded semantics for parity, this is the production
    variant).

    Same scale shape as the unbounded funnel: one pushed-filter scan
    per step reduced to a per-user min-µs scalar conditioned on the
    previous step via a user-keyed join; the lag bound is one more
    integer-µs predicate on that join. Output adds the per-step median
    lag (an order statistic over converting users)."""
    if steps is None:
        steps = ["view", "click", "purchase"]
    if not steps:
        raise ValueError("funnel_windowed needs at least one step")
    if max_lag_minutes <= 0:
        raise ValueError("funnel_windowed: max_lag_minutes must be positive")
    from .util import materialize as _materialize
    lag_us = max_lag_minutes * 60 * 1_000_000
    us = F.expr(_TS_US)
    prev: DataFrame | None = None
    stages: list[tuple[str, DataFrame, DataFrame]] = []
    for step in steps:
        stage = events.filter(F.col("event_type") == step).select(
            "user_id", us.alias("us")
        )
        if prev is not None:
            stage = (
                stage.join(prev, "user_id")
                .filter(
                    (F.col("us") > F.col("prev_us"))
                    & (F.col("us") <= F.col("prev_us") + F.lit(lag_us))
                )
                .select("user_id", "us", F.col("prev_us").alias("from_us"))
            )
            # materialized: each stage feeds the next stage's join,
            # its own count row, AND the median (diamond rule)
            cur = _materialize(
                stage.groupBy("user_id").agg(
                    F.min("us").alias("prev_us"), F.min("from_us").alias("from_us")
                )
            )
            # median lag from the previous step among converters
            med = cur.select((F.col("prev_us") - F.col("from_us")).alias("lag"))
        else:
            cur = _materialize(
                stage.groupBy("user_id").agg(F.min("us").alias("prev_us"))
            )
            med = None
        stages.append((step, cur, med))
        prev = cur
    rows = None
    for i, (step, cur, med) in enumerate(stages):
        one = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("step_no"), F.lit(step).alias("step"), "n_users"
        )
        if med is not None:
            m = med.agg(
                F.expr(
                    "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag)"
                    " AS BIGINT)"
                ).alias("median_lag_us")
            )
            one = one.crossJoin(F.broadcast(m))
        else:
            one = one.withColumn("median_lag_us", F.lit(None).cast("bigint"))
        rows = one if rows is None else rows.unionByName(one)
    w_prev = F.lag("n_users").over(Window.orderBy("step_no"))
    return (
        rows.withColumn(
            "conversion",
            F.round(
                F.when(
                    w_prev.isNotNull() & (w_prev != 0),
                    F.col("n_users").cast("double") / w_prev.cast("double"),
                ),
                9,
            ),
        )
        .orderBy("step_no")
    )


def user_feature_table(events: DataFrame) -> DataFrame:
    """Feature-store materialization: the per-user feature vector a
    churn/propensity model trains on, assembled in ONE keyed
    aggregation — activity volume, per-type counts (conditional
    aggregates, no pivot discovery pass), recency vs the snapshot
    instant, active-day span, spend, and rate features. This is the
    batch feature-engineering job every ML platform schedules against
    the event lake; at 100 TB it is one column-pruned scan + one
    user-keyed shuffle with map-side partials, and the output is the
    training table itself.

    Determinism: counts/µs/cent-spend are exact integers; the two
    rate features are single final double divisions rounded at the
    edge. The snapshot instant is the broadcast max event time (the
    repo's now() rule)."""
    us = F.expr(_TS_US)
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").cast("int").alias("n_types"),
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
            for t in ("view", "click", "purchase", "signup", "error")
        ],
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
        F.count_distinct(F.expr(f"{_TS_US} div 86400000000"))
        .cast("bigint")
        .alias("active_days"),
        (F.sum(F.when(F.col("event_type") == "purchase",
                      F.col("value").cast("decimal(18,2)")).otherwise(F.lit(0))) * 100)
        .cast("bigint")
        .alias("spend_cents"),
    )
    return features_from_per_user(per_user)


def features_from_per_user(per_user: DataFrame) -> DataFrame:
    """Snapshot + rate-feature coda over the aggregated per-user
    relation — shared by the batch operator above and the streaming
    twin (`streaming.rollup.stream_user_feature_table`), so the
    batch-twin contract cannot drift."""
    snap = per_user.agg(F.max("last_us").alias("as_of_us"))
    return (
        per_user.crossJoin(F.broadcast(snap))
        .select(
            "user_id",
            "n_events",
            "n_types",
            "n_view",
            "n_click",
            "n_purchase",
            "n_signup",
            "n_error",
            (F.col("as_of_us") - F.col("last_us")).alias("recency_us"),
            F.expr("(last_us - first_us) div 86400000000 + 1").alias("span_days"),
            "active_days",
            "spend_cents",
            F.expr(
                "round(CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE), 9)"
            ).alias("events_per_active_day"),
            F.expr(
                "round(CAST(active_days AS DOUBLE)"
                " / CAST((last_us - first_us) div 86400000000 + 1 AS DOUBLE), 9)"
            ).alias("activity_density"),
        )
        .orderBy("user_id")
    )


def _type_edges(events: DataFrame):
    """Shared core of the behavioral co-occurrence graph: nodes are
    event types, an edge (a < b) carries the number of users who did
    BOTH. The only feed-scale work is ONE distinct on (user, type);
    the self-join runs on that reduction keyed by user, where each
    user contributes at most #types rows per side — the pair fanout is
    ≤ T(T−1)/2 per user, LINEAR in users for the bounded type
    vocabulary (documented; a high-cardinality node set would need the
    `ngram_jaccard_pairs` hot-key cutoffs instead). Returns the
    materialized (user, type) relation and the edge relation."""
    ut = _materialize(events.select("user_id", "event_type").distinct())
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    edges = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("shared_users"))
    )
    return ut, edges


def cooccurrence_edges(events: DataFrame) -> DataFrame:
    """Event-type co-occurrence graph: for every pair of types, how
    many users did both, each side's own audience, and the Jaccard
    audience overlap — the "do clickers also purchase?" panel behind
    funnel design, and the graph `type_triangles` mines. Complements
    `transition_matrix` (SEQUENTIAL next-step structure) with
    unordered set co-membership.

    Jaccard = shared / (a + b − shared) over exact distinct-user
    counts — one pinned round(9) division; everything upstream is
    integer. Per-type audience sizes broadcast onto the ≤ T²/2 edge
    rows.

    Scale shape: one distinct (the `user_set_ops` shuffle), a
    user-keyed self-join on the reduction with bounded per-user
    fanout, and a ≤ T²/2-row aggregate. No feed self-join, no
    CartesianProduct."""
    ut, edges = _type_edges(events)
    counts = ut.groupBy("event_type").agg(
        F.count("*").alias("n_users")
    )
    ca = counts.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    cb = counts.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        edges.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("users_a").cast("bigint").alias("users_a"),
            F.col("users_b").cast("bigint").alias("users_b"),
            F.col("shared_users").cast("bigint").alias("shared_users"),
            F.expr(
                "round(CAST(shared_users AS DOUBLE)"
                " / CAST(users_a + users_b - shared_users AS DOUBLE), 9)"
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def type_triangles(events: DataFrame, min_shared: int = 2) -> DataFrame:
    """Triangles of the co-occurrence graph: triples of event types
    whose audiences pairwise overlap by ≥ `min_shared` users — the
    behavioral-cluster detector ("view + click + purchase form one
    journey; error sits outside it"). The classic ordered triangle
    enumeration: edges carry a < b, so joining ab ⋈ bc ⋈ ac yields
    each triangle exactly once with a < b < c, no dedup pass.

    `support` is the weakest pairwise overlap (the bottleneck edge) —
    exact integer min.

    Scale shape: inherits `_type_edges`' single feed-scale distinct;
    the triangle join runs on the ≤ T²/2-row edge relation, broadcast
    both times (T is the bounded type vocabulary). Output ≤ C(T,3)
    rows."""
    _, edges = _type_edges(events)
    strong = _materialize(
        edges.filter(F.col("shared_users") >= F.lit(int(min_shared)))
    )
    ab = strong.select(
        F.col("type_a").alias("ta"),
        F.col("type_b").alias("tb"),
        F.col("shared_users").alias("w_ab"),
    )
    bc = strong.select(
        F.col("type_a").alias("tb"),
        F.col("type_b").alias("tc"),
        F.col("shared_users").alias("w_bc"),
    )
    ac = strong.select(
        F.col("type_a").alias("ta"),
        F.col("type_b").alias("tc"),
        F.col("shared_users").alias("w_ac"),
    )
    return (
        ab.join(F.broadcast(bc), "tb")
        .join(F.broadcast(ac), ["ta", "tc"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("tc").alias("type_c"),
            F.col("w_ab").cast("bigint").alias("w_ab"),
            F.col("w_bc").cast("bigint").alias("w_bc"),
            F.col("w_ac").cast("bigint").alias("w_ac"),
            F.expr("CAST(least(w_ab, w_bc, w_ac) AS BIGINT)").alias("support"),
        )
        .orderBy("type_a", "type_b", "type_c")
    )


def gap_histogram(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap histogram on a power-of-two second
    grid — the empirical arrival-pattern panel that justifies (or
    indicts) every session-gap and watermark constant in the layer:
    the session cutoff (`stream_sessions`' 30 min) should sit in a
    histogram valley, and the watermark lateness should cover the
    gap mass, not a guess.

    Buckets are INTEGER properties (binary digit count of the gap in
    whole seconds — the `seqlen_histogram` rule, no log2 double);
    sub-second gaps land in bucket 0. Exact integer µs arithmetic
    throughout; the only double is the final share division.

    Scale shape: one user-keyed window (LAG over the user's event
    order — the shuffle `lag_delta` already pays), reduced map-side
    to (bucket) counts. Output ~40 rows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    gaps = (
        events.select(
            "user_id",
            "event_id",
            (us - F.lag(us).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    # INTEGER div to whole seconds (a double /1e6 truncates wrong at
    # representation boundaries), then digit-count bucket
    bucket = F.when(
        F.col("gap_us") < 1_000_000, F.lit(0)
    ).otherwise(
        F.length(
            F.conv(F.expr("gap_us div 1000000").cast("string"), 10, 2)
        ).cast("int")
    )
    # diamond rule: the bucket counts feed BOTH the total row and the
    # final select — materialize or the user window + aggregate
    # subtree recomputes per consumer (caught by the plan budget test)
    counted = _materialize(
        gaps.select(bucket.alias("gap_bucket"), "gap_us")
        .groupBy("gap_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )
    total = counted.agg(F.sum("n_gaps").cast("bigint").alias("n_total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            "gap_bucket",
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
            (F.col("n_gaps").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("gap_bucket")
    )


def minute_counts(events: DataFrame) -> DataFrame:
    """Per-(event_type, minute) arrival counts — the bounded count
    relation `burstiness_panel` reduces and the exact state shape its
    streaming twin maintains (alphabet = #types × observed minutes,
    the `apdex_from_class_counts` sharing pattern)."""
    minute = F.expr(f"{_TS_US} div 60000000")
    return (
        events.filter(F.col("ts").isNotNull())
        .select("event_type", minute.alias("minute"))
        .groupBy("event_type", "minute")
        .agg(F.count("*").alias("c"))
    )


def burstiness_from_minute_counts(counts: DataFrame) -> DataFrame:
    """Shared coda of `burstiness_panel` / `stream_burstiness`: the
    Fano-factor reduction over a (event_type, minute, c) count
    relation. All accumulations are exact integers; the two emitted
    doubles are fixed-shape expressions over those integers
    (correctly-rounded divisions and one subtraction — mirrored
    verbatim by the oracle, so engines agree bit for bit):

        events_per_min = N / M
        fano           = S2 / N  -  N / M

    with N = Σc, S2 = Σc², M = span minutes (max − min + 1, so silent
    minutes count as zeros without materializing them — the identity
    Σ(c−μ)²/M = S2/M − μ² over the span needs only the observed
    rows). Fano > 1 ⇒ super-Poisson burstiness (alert floods,
    thundering herds); ≈ 1 ⇒ Poisson arrivals; < 1 ⇒ regular/paced
    traffic (schedulers, heartbeats)."""
    per = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
        (F.max("minute") - F.min("minute") + 1).cast("bigint").alias("n_minutes"),
        F.count("*").cast("bigint").alias("active_minutes"),
    )
    n_d = F.col("n_events").cast("double")
    m_d = F.col("n_minutes").cast("double")
    return per.select(
        "event_type",
        "n_events",
        "n_minutes",
        "active_minutes",
        "sum_sq",
        (n_d / m_d).alias("events_per_min"),
        (F.col("sum_sq").cast("double") / n_d - n_d / m_d).alias("fano"),
    ).orderBy("event_type")


def burstiness_panel(events: DataFrame) -> DataFrame:
    """Arrival burstiness per event type: the Fano factor (variance /
    mean of per-minute arrival counts over the type's observed span) —
    the dispersion diagnostic that separates Poisson-like traffic from
    alert floods and paced schedulers, and the principled way to size
    rate limits and anomaly thresholds (a 99.9th-percentile threshold
    tuned on Poisson assumptions fires constantly on fano≫1 traffic).

    Exactness: integer minute buckets (µs div), integer count sums
    and sum-of-squares; doubles only in the two fixed-shape edge
    expressions (see `burstiness_from_minute_counts`).

    Scale shape: one map-side-combinable keyed count to the bounded
    (type, minute) relation, then a #types-row reduction. No joins,
    no windows, no per-value buffering — the same state bound the
    streaming twin keeps forever."""
    return burstiness_from_minute_counts(minute_counts(events))


def transition_entropy(events: DataFrame) -> DataFrame:
    """Per-state predictability of the user journey: Shannon entropy
    of each event type's NEXT-type distribution over the first-order
    transition graph — 0 nats means the next step is fully determined
    (a funnel edge or a bot loop), ln(out_degree) means users scatter
    uniformly. The scalar that ranks `transition_matrix` rows by how
    much routing information each state carries, plus the top-branch
    share as the plain-language companion (entropy says "how
    predictable", top_share says "predictable TO WHERE").

    Rides `_transition_edges` (the same one-window-shuffle graph the
    Markov matrix and PageRank read), then a #types-row aggregate.
    Determinism is the `user_entropy` contract verbatim: each ln is
    rounded to 9 dp at its call site and accumulated count-weighted in
    DECIMAL (order-independent); the edge is one double division
    inside a round(…, 9)."""
    edges = _transition_edges(events)
    term = (
        F.col("n_transitions").cast("decimal(12,0)")
        * F.round(F.log(F.col("n_transitions").cast("double")), 9).cast(
            "decimal(16,9)"
        )
    )
    per = edges.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("n_out"),
        F.count("*").cast("bigint").alias("out_degree"),
        F.sum(term).alias("s"),
        F.max("n_transitions").cast("bigint").alias("top_n"),
    )
    return per.select(
        "from_type",
        "n_out",
        "out_degree",
        F.round(
            F.round(F.log(F.col("n_out").cast("double")), 9)
            - F.col("s").cast("double") / F.col("n_out").cast("double"),
            9,
        ).alias("entropy"),
        (F.col("top_n").cast("double") / F.col("n_out").cast("double")).alias(
            "top_share"
        ),
    ).orderBy("from_type")
