"""Skew-aware join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) handles most skew at runtime. Salting
is the explicit fallback for the pathological case AQE cannot fix:
a *broadcast-ineligible* join where a handful of keys dominate (e.g.
one monitoring `user_id` owning 10% of a 100 TB event feed).

`salted_join` replicates the right side `salt` times and scatters the
left side across the replicas, so a hot key's rows spread over `salt`
tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting.

    The left (large, skewed) side gets a random salt in [0, salt);
    the right side is exploded `salt` times, one copy per salt value —
    acceptable when the right side is much smaller than the left but
    too big to broadcast. Result equals ``left.join(right, on, how)``
    for inner/left_semi/left joins (an unmatched *right* row would be
    emitted once per replica, so right/full joins are rejected).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    salted_left = left.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, [*on, SALT_COL], how).drop(SALT_COL)


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: the n heaviest keys with their row share —
    run before choosing between broadcast / AQE / salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(n)
    )


def skew_profile(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Join-key skew diagnosis as ONE declarative plan: the n heaviest
    keys with their row share and the key-space skew ratio
    (hottest-key count ÷ mean per-key count) — the number that decides
    between plain shuffle join, AQE skew split, and `salted_join`.

    Unlike `top_keys` (which runs a separate driver-side count
    action), everything here rides one plan: per-key counts (map-side
    partials), a one-row global aggregate broadcast back, and a
    TakeOrdered head. Shares and the ratio are single double divisions
    of exact integers; ties break on the key for determinism.

    The counts relation feeds two consumers (the totals row and the
    head), so it is materialized — otherwise each branch re-scans and
    re-aggregates the full feed (the repo diamond rule).
    """
    from .util import materialize as _materialize

    counts = _materialize(df.groupBy(key).agg(F.count("*").alias("cnt")))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(key),
            "cnt",
            (F.col("cnt").cast("double") / F.col("n_rows").cast("double")).alias(
                "share"
            ),
            (
                (F.col("cnt") * F.col("n_keys")).cast("double")
                / F.col("n_rows").cast("double")
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(n)
    )


def join_cardinality_estimate(
    left: DataFrame, right: DataFrame, key: str, n_top: int = 10
) -> DataFrame:
    """Predict an equi-join's output size BEFORE running it — the
    planning diagnostic behind the broadcast/salt/bucket decision at
    100 TB: |A ⋈ B| = Σ_k cnt_A(k) · cnt_B(k). Returns one row with
    the exact predicted cardinality, matched-key count, and the top
    key's contribution (the skew share: if one key contributes most of
    the output, `salted_join` is the answer, not AQE).

    Cost: one keyed count per side (map-side partials), an inner join
    of the two COUNT relations (#distinct-keys rows, not the feeds),
    and a one-row aggregate. The feeds themselves are scanned once
    each and never joined."""
    ca = left.groupBy(key).agg(F.count("*").alias("cnt_a"))
    cb = right.groupBy(key).agg(F.count("*").alias("cnt_b"))
    per_key = ca.join(cb, key).select(
        F.col(key), (F.col("cnt_a") * F.col("cnt_b")).alias("pairs")
    )
    return per_key.agg(
        F.sum("pairs").alias("est_rows"),
        F.count("*").alias("n_matched_keys"),
        F.max("pairs").alias("max_key_pairs"),
    ).select(
        "est_rows",
        "n_matched_keys",
        "max_key_pairs",
        (F.col("max_key_pairs").cast("double") / F.col("est_rows").cast("double")).alias(
            "top_key_share"
        ),
    )
