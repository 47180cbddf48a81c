"""Relational core: joins, global/keyed aggregations, sorts/top-K,
set-shaped operators (SURVEY §2.3, §2.4, §2.6) over the TPC-H-ish
tables.

Scale posture: dimension sides (`customer`, `nation`, `region`) are
explicitly broadcast where the reference joins a big fact to a small
catalog (its J1–J3 all join live activity against catalogs); top-K is
always ORDER BY + LIMIT so Spark plans `TakeOrderedAndProject`
(per-partition heap + driver merge, no global sort); aggregates that
feed the oracle use exact decimal accumulation (order-independent) and
only convert to double at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def three_way_topk(lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 100) -> DataFrame:
    """3-way inner equi-join, filter, top-K (J1: pg_locks ⋈ pg_class ⋈
    pg_stat_activity with NOT granted + sort, views.py:436-457).

    Fact-to-fact join (lineitem⋈orders) shuffles on the join key;
    the customer dimension is broadcast. LIMIT after ORDER BY plans as
    TakeOrderedAndProject; ties broken by the unique (orderkey,
    linenumber) pair (SURVEY §7 top-K determinism).
    """
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(F.col("o_orderstatus") == "F"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("l_orderkey", "l_linenumber", "c_name", "o_orderdate", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(k)
    )


def left_join_rollup(customer: DataFrame, orders: DataFrame, nation: DataFrame) -> DataFrame:
    """Two-hop LEFT OUTER join with COALESCE fallback (J3: auth_user ⟕
    auth_user_groups ⟕ auth_group + COALESCE(name,'No Role Assigned'),
    views.py:48-56).

    The nullable side is orders-after-2001 aggregated per customer
    (pre-aggregate before the join: the shuffle moves one row per
    customer, not one per order); nation is broadcast.
    """
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_recent"))
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("n_name", F.lit("No Nation")).alias("nation_name"),
            F.coalesce("n_recent", F.lit(0)).alias("recent_orders"),
            F.when(F.col("n_recent").isNull(), "No Recent Orders").otherwise("Active").alias("activity"),
        )
        .orderBy("c_custkey")
    )


def customers_without_recent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join (J6: ``id NOT IN (SELECT user_id FROM ...)`` group
    assignment, apps.py:55-69) — left_anti keeps NOT-IN semantics
    without materializing the subquery driver-side."""
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def urgent_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi-join (J7/P15: EXISTS-style membership, views.py:161-164,
    227-229): customers holding at least one URGENT order."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def cross_join_lookup(region: DataFrame, nation: DataFrame) -> DataFrame:
    """Cross join + theta filter (J5: ``FROM auth_group g,
    auth_permission p WHERE ...``, apps.py:28-33). The filter collapses
    it to an equi-join; Catalyst detects that and plans a hash join —
    declared cross, executed equi."""
    return (
        region.crossJoin(nation)
        .filter((F.col("r_regionkey") == F.col("n_regionkey")) & F.col("r_name").like("A%"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


def nations_per_region(region: DataFrame, nation: DataFrame) -> DataFrame:
    """STRING_AGG (A6, views.py:966-971): nation names per region as a
    sorted CSV string. collect_list order is nondeterministic under
    shuffle, so we array_sort before joining — deterministic at any
    parallelism."""
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey, "left")
        .groupBy("r_name")
        .agg(
            F.count("n_name").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ", ").alias("nation_list"),
        )
        .orderBy("r_name")
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Keyed aggregation battery (generalizes the reference's global
    scalar aggs A1-A5 to grouped form; shape of TPC-H Q1). Decimal
    accumulation keeps sums exact and order-independent — a double SUM
    over a shuffled table is partition-order dependent and would break
    oracle hash-matching; decimal also survives 100 TB row counts
    (38-digit headroom)."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    # keep intermediate factors narrow (8,2)/(8,4) so products stay well
    # inside decimal(38,_) in any engine — exact, order-independent sums
    one_minus_disc = (F.lit(1) - disc).cast("decimal(8,2)")
    one_plus_tax = (F.lit(1) + tax).cast("decimal(8,2)")
    charge_factor = (one_minus_disc * one_plus_tax).cast("decimal(8,4)")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(price * charge_factor).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty").cast("double") / F.col("count_order").cast("double"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """Multi-join + keyed decimal aggregation + top-K (TPC-H Q3 shape,
    generalizing the reference's join panels to revenue analytics).
    Customer-segment filter is pushed to the broadcast dim; revenue is
    an exact decimal sum; top-K plans TakeOrderedAndProject with the
    group key as tiebreak."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_f = (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")).cast("decimal(8,2)")
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("2000-06-01").cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("2000-06-01").cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * disc_f).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """6-way join + per-nation revenue (TPC-H Q5 shape): the full
    dimension chain region→nation→customer joins the fact chain
    orders→lineitem→supplier with a same-nation constraint. Dims are
    broadcast; the two fact joins shuffle on their keys; revenue is
    decimal-exact."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_f = (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")).cast("decimal(8,2)")
    return (
        lineitem.join(orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(price * disc_f).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def cache_hit_ratio(lineitem: DataFrame) -> DataFrame:
    """SUM-ratio aggregation (A3: cache-hit percentage
    ``SUM(blks_hit)/NULLIF(SUM(blks_hit)+SUM(blks_read),0)*100``,
    views.py:527-534), keyed by linestatus. Integer counts, one final
    double division."""
    hits = F.count(F.when(F.col("l_returnflag") == "N", 1))
    total = F.count("*")
    return (
        lineitem.groupBy("l_linestatus")
        .agg(hits.alias("hits"), (total - hits).alias("misses"))
        .select(
            "l_linestatus",
            "hits",
            "misses",
            (
                F.col("hits").cast("double")
                * 100.0
                / F.when(F.col("hits") + F.col("misses") == 0, F.lit(None)).otherwise(F.col("hits") + F.col("misses"))
            ).alias("hit_pct"),
        )
        .orderBy("l_linestatus")
    )


def topk_global(events: DataFrame, k: int = 20) -> DataFrame:
    """Global top-K (O2: top-20 bloat/size/resource panels,
    views.py:431-432, 475, 495-496): TakeOrderedAndProject, unique
    tiebreak."""
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(k)
    )


def distinct_types(events: DataFrame) -> DataFrame:
    """DISTINCT projection (P14, views.py:833, 794) — partial-agg
    dedup before the shuffle."""
    return events.select("event_type").distinct().orderBy("event_type")


def table_catalog(tables: dict[str, DataFrame]) -> DataFrame:
    """Catalog/metadata scan (S5: pg_class ⋈ pg_namespace size listing,
    views.py:460-476): one row per table with its row count — a union
    of column-pruned count aggregates."""
    parts = []
    for name, df in sorted(tables.items()):
        parts.append(df.agg(F.count("*").alias("n_rows")).select(F.lit(name).alias("table_name"), "n_rows"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name")


def customer_rollup(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP aggregation (region → nation → grand total)
    — the OLAP subtotal shape. One pass computes every level; the
    engine expands grouping sets without re-scanning (contrast: the
    reference would issue one query per level). Account balances sum
    in exact decimal."""
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


def parts_by_brand(part: DataFrame) -> DataFrame:
    """LIKE-filtered keyed aggregation on the parts catalog (P7/P8 on
    a second table): brand-level stats for one product family."""
    return (
        part.filter(F.col("p_type").like("%AR%"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double").alias("total_retail"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand")
    )


def top_supplier_per_nation(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Top-1-per-group on a second table (W2 generalized): richest
    supplier per nation via row_number, deterministic tiebreak."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supplier.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("n_name")
    )


def priority_bands(orders: DataFrame) -> DataFrame:
    """CASE WHEN classification (F10, views.py:553-559;
    db_helpers.py:29-33): priority → severity rank, totalprice → band,
    then a keyed count."""
    sev = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .otherwise(9)
    )
    band = (
        F.when(F.col("o_totalprice") >= 300000, "XL")
        .when(F.col("o_totalprice") >= 150000, "L")
        .when(F.col("o_totalprice") >= 50000, "M")
        .otherwise("S")
    )
    return (
        orders.select(sev.alias("severity"), band.alias("price_band"))
        .groupBy("severity", "price_band")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("severity", "price_band")
    )


def net_price_ratio(lineitem: DataFrame) -> DataFrame:
    """ROUND / NULLIF / cast battery (F6, F7, F9, views.py:489-493,
    518, 529): exact decimal net price rounded to 2 places; ratio with
    NULLIF zero-guard (l_tax=0 rows exercise the NULL path)."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    # exact 4-decimal product; no re-rounding to 2dp (half-case rounding
    # of decimals differs between engines — SURVEY §7 determinism)
    net = price * (F.lit(1).cast("decimal(18,2)") - disc)
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            net.cast("double").alias("net_price"),
            (
                F.col("l_extendedprice")
                / F.when(F.col("l_tax") == 0, F.lit(None)).otherwise(F.col("l_tax"))
            ).alias("price_per_tax"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def scd2_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) temporal join: enrich
    each event with the dimension version that was VALID AT ITS EVENT
    TIME — the warehouse operator behind "what tier was this customer
    when the event happened" questions, which a plain (current-state)
    dimension join answers wrongly for history.

    The version table is derived deterministically here (two versions
    per customer split at the feed's midpoint µs; tier upgrades in v2)
    because the testdata ships no SCD source — the JOIN is the
    operator under test, the versioning is fixture. Plan shape: the
    join is an EQUI-join on the customer key with the validity range
    as a post-join filter — a hash join Catalyst can broadcast
    (dimension versions = 2× customers, still dimension-sized at any
    feed scale), never a range-explosion or nested-loop join. Exactly
    one version matches each event by construction ([from, to)
    half-open intervals partition the timeline).
    """
    ts_us = F.expr("unix_micros(cast(ts as timestamp))")
    # integer div — a double midpoint would round differently per engine
    bounds = events.agg(
        F.expr(
            "(min(unix_micros(cast(ts as timestamp)))"
            " + max(unix_micros(cast(ts as timestamp)))) div 2"
        ).alias("mid_us")
    )
    base = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") >= 5000.0, "gold")
        .when(F.col("c_acctbal") >= 0.0, "standard")
        .otherwise("delinquent")
        .alias("tier_v1"),
    )
    long_min, long_max = -(1 << 62), (1 << 62)
    v1 = base.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "segment",
        F.col("tier_v1").alias("tier"),
        F.lit(1).alias("version"),
        F.lit(long_min).alias("valid_from_us"),
        F.col("mid_us").alias("valid_to_us"),
    )
    v2 = base.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "segment",
        # v2: everyone moves one tier up (the "slowly changing" part)
        F.when(F.col("tier_v1") == "delinquent", "standard")
        .otherwise("gold")
        .alias("tier"),
        F.lit(2).alias("version"),
        F.col("mid_us").alias("valid_from_us"),
        F.lit(long_max).alias("valid_to_us"),
    )
    dim = v1.unionByName(v2)
    return (
        events.select("event_id", "user_id", ts_us.alias("us"), "value")
        .join(
            F.broadcast(dim),
            ["user_id"],
        )
        .filter(
            (F.col("us") >= F.col("valid_from_us"))
            & (F.col("us") < F.col("valid_to_us"))
        )
        .select("event_id", "user_id", "us", "value", "segment", "tier", "version")
        .orderBy("event_id")
    )


def fk_integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Referential-integrity audit across the star schema's FK edges:
    for each child→parent edge, the child row count and the number of
    orphans (child keys with no parent row, anti-join semantics — a
    NULL key never matches, so it counts as an orphan). The data-
    quality gate a warehouse runs after every load; the reference
    trusts PostgreSQL constraints, which parquet lakes don't have.

    Each edge is one left-anti join aggregated to a single row. The
    parent side reduces to its distinct key column first, so dimension
    edges broadcast; the one fact⋈fact edge (lineitem→orders) shuffles
    on the key like any large join — at scale, bucketing both tables
    on orderkey (sources.bucketing) removes that exchange too. The 4
    one-row results union into the audit table.
    """
    edges = [
        ("lineitem.l_orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        ("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"),
        ("customer.c_nationkey->nation", customer, "c_nationkey", nation, "n_nationkey"),
        ("nation.n_regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = None
    for name, child, fk, parent, pk in edges:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        n_rows = child.agg(F.count("*").alias("n_rows"))
        n_orphans = child.join(keys, fk, "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        row = (
            n_rows.crossJoin(n_orphans)
            .select(
                F.lit(name).alias("fk_edge"),
                "n_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


# correlated LATERAL subquery — ONE SQL text evaluated verbatim by
# both engines (Spark 4 lateral correlated subqueries and DuckDB
# LATERAL agree on these semantics). The per-nation LIMIT is
# decorrelated by Catalyst into a partitioned rank, not N scans.
LATERAL_TOPK_SQL = """
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) AS c
    ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey
"""


def lateral_topk(spark, sf_dir: str):
    """Top-2 customers by balance per nation via a correlated LATERAL
    subquery — the "for each row of A, run this parameterized query
    over B" surface (reference users write this as a loop of
    parameterized cursors, views.py cursor/execute pattern; SQL
    engines express it as LATERAL). Catalyst decorrelates the
    correlated LIMIT into a single join + per-key rank — one plan, no
    per-nation round trips — so at 100 TB this costs one shuffle of
    the customer side, not #nations queries."""
    from ..sources.registry import register_views

    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPK_SQL)


def market_share_panel(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Supplier-nation market share per (customer region, order year) —
    the TPC-H Q8 shape: the nation dimension plays TWO roles (the
    customer side defines the MARKET, the supplier side the
    competitor), so it joins twice under different aliases, and the
    share denominator is the market's own total rather than a grand
    total.

    Plan: the fact chain lineitem⋈orders shuffles on the order key;
    every dimension (customer, both nation roles, region, supplier)
    broadcasts; revenue aggregates decimal-exact into the
    (region, year, supplier-nation) cell relation; the share window
    runs over that O(#regions × #years × #nations) relation, never
    the facts. One fact shuffle + one cell-level window at any scale.
    """
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_f = (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")).cast("decimal(8,2)")
    cust_nat = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cells = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(
            "r_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
        )
        .agg(F.sum(price * disc_f).alias("revenue_raw"))
    )
    market = Window.partitionBy("r_name", "o_year")
    return (
        cells.withColumn("market_raw", F.sum("revenue_raw").over(market))
        .select(
            "r_name",
            "o_year",
            "supp_nation",
            F.col("revenue_raw").cast("double").alias("revenue"),
            (
                F.col("revenue_raw").cast("double")
                / F.col("market_raw").cast("double")
            ).alias("market_share"),
        )
        .orderBy("r_name", "o_year", "supp_nation")
    )


def topk_with_ties(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k by value WITH TIES (ANSI `FETCH FIRST k ROWS WITH TIES`):
    every row whose rank ≤ k survives, so equal values at the boundary
    all appear — the semantics a leaderboard needs when truncating at
    a tie would be arbitrary. Spark has no WITH TIES clause; `rank()`
    over the value ordering is the standard lowering (and what
    Catalyst would desugar to).

    The rank window is value-ordered with NO partition — but
    WindowGroupLimit pushes the rank filter to the map side (each
    partition keeps only its own rank-≤-k candidates before the
    single-partition window), so the global sort touches a bounded
    candidate set, not the feed. Deterministic: ties are the POINT, so
    the final presentation sort carries event_id as tiebreaker."""
    if k <= 0:
        raise ValueError("topk_with_ties: k must be positive")
    w = Window.orderBy(F.desc("value"))
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .withColumn("rnk", F.rank().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy(F.desc("value"), F.asc("event_id"))
    )
