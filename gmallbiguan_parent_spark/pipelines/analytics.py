"""OVER-window and multidimensional rollup queries (SURVEY.md §2.5-2.6).

The reference has no SQL OVER-window functions — its ranking is
`order by ... limit` in ClickHouse and its stateful per-key firsts are
Flink keyed state (SURVEY §2.5). This module is the Spark-native
expression of that surface plus the multidimensional rollups a serving
layer adds on top (cube/rollup — "not present in the reference",
SURVEY §2.4, provided here as engine capability):

- top-N per group (row_number) — per-priority best orders
- running totals (sum over rows-between) — cumulative daily GMV
- lag deltas — day-over-day GMV change
- ROLLUP — region/nation hierarchy totals with grouping ids
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table
from .dwm import SESSION_GAP_S  # single source of the session gap; >= gap starts a session


def topn_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice within each order priority —
    row_number over (partition by priority order by price desc, key).
    One shuffle on the partition key; Spark runs it as a WindowExec
    after a sort within partitions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("rn"),
            F.col("o_orderkey").alias("order_id"),
            dec("o_totalprice").alias("total_amount"),
        )
    )


def running_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative GMV by day over one quarter — sum over
    rows between unbounded preceding and current row, plus a lag()
    day-over-day delta. The daily pre-aggregate keeps the window input
    tiny (days, not orders) — aggregate first, window after."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"))
        .agg(F.sum(dec("o_totalprice")).alias("gmv"))
    )
    w = Window.orderBy("dt")
    return daily.select(
        "dt",
        "gmv",
        F.sum("gmv").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_gmv"),
        (F.col("gmv") - F.lag("gmv").over(w)).alias("gmv_delta"),
    )


def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy: per-nation, per-region
    subtotal, and grand total in one pass (Spark expands grouping sets
    into a single shuffle with grouping-id tagging)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
    )
    return (
        base.rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(dec("o_totalprice")).alias("order_amount"),
            F.count("*").alias("order_ct"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag() marks session starts, a running sum over the marks assigns
    session ids — then rolled up PER USER (session counts/sizes). Uses
    the same >= gap rule (and the same SESSION_GAP_S constant) as
    dwm.user_sessions, whose per-session detail form pairs with the
    streaming session_window twin. One shuffle on user_id; both window
    functions reuse the same sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        ev.select("user_id", "event_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") >= SESSION_GAP_S * 1_000_000)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_session = marked.groupBy("user_id", "session_id").agg(
        F.count("*").alias("ev_ct"),
        F.min("event_id").alias("entry_event_id"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("session_ct"),
        F.max("ev_ct").alias("max_session_events"),
        F.sum("ev_ct").alias("total_events"),
        F.min("entry_event_id").alias("first_entry_event"),
    )


def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface (absent in the reference — SURVEY §2.3
    'no semi/anti joins'; provided as engine capability): customers with
    no orders via left_anti, rolled up per nation alongside the
    left_semi active count. Both plan as broadcast joins with the
    orders key-set as the build side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    keys = orders.select("o_custkey")
    inactive = cust.join(keys, cust.c_custkey == keys.o_custkey, "left_anti")
    active = cust.join(keys, cust.c_custkey == keys.o_custkey, "left_semi")
    merged = (
        inactive.select("c_nationkey", F.lit(0).alias("is_active"))
        .unionByName(active.select("c_nationkey", F.lit(1).alias("is_active")))
    )
    return (
        merged.join(F.broadcast(nation), merged.c_nationkey == nation.n_nationkey, "inner")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(F.when(F.col("is_active") == 0, 1).otherwise(0)).alias("inactive_ct"),
            F.sum(F.when(F.col("is_active") == 1, 1).otherwise(0)).alias("active_ct"),
        )
    )


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-semijoin shape (TPC-H q18): orders whose total line
    quantity exceeds a threshold — the grouped-HAVING subquery becomes
    an aggregate + semi-join back to the fact. The aggregate runs first
    (small result), so the semijoin broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey, "inner")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("user_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            dec("o_totalprice").alias("total_amount"),
            "total_qty",
        )
    )


def gmv_7d_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: 7-day moving average of daily GMV — the
    frame is a value range over the day number (not a row count), so
    gap days shrink the window correctly. Daily pre-aggregate first;
    the window input is days, not orders."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01"))
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum(dec("o_totalprice")).alias("gmv"))
        .withColumn("day_no", F.datediff("dt", F.lit("1997-01-01")))
    )
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    # divide in DOUBLE on both engines: Spark's exact-decimal quotient
    # rounds .045 up where DuckDB's decimal/bigint goes through double
    # and sees .04499…, a 1-cent divergence first seen at sf0.1
    return daily.select(
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        "gmv",
        F.round(F.sum("gmv").over(w).cast("double") / F.count("*").over(w), 2).alias("gmv_7d_avg"),
        F.count("*").over(w).alias("days_in_window"),
    )


def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchical rollup: each nation's GMV as a
    fraction of its region's total — the percent-of-parent OLAP pattern
    (priority_share is share-of-grand-total; this is the two-level
    variant). Aggregate once at the leaf grain, then a window SUM over
    the parent key; the ratio divides in DOUBLE on both engines (decimal
    quotients round differently between Spark and DuckDB — see
    gmv_7d_moving_avg). Dims broadcast; one fact shuffle at the
    (nation) grain, the parent window runs on ~25 aggregated rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    leaf = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.sum(dec("o_totalprice")).alias("gmv"))
    )
    w = Window.partitionBy("region_name")
    return leaf.select(
        "region_name", "nation_name", "gmv",
        F.round(F.col("gmv").cast("double") / F.sum("gmv").over(w).cast("double") * 100, 4)
        .alias("region_share_pct"),
    )


def order_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 rank-distribution family: percent_rank + cume_dist + ntile
    over a partitioned window (per order priority, price order) rolled
    into per-decile band stats — the remaining OVER-window functions the
    engine's window family didn't yet exercise. Same partitioning shape
    as topn_orders_per_priority: the sort is per-priority, never global;
    both rank ratios are exact (rank-1)/(n-1)-style rationals computed
    identically in both engines and rounded at 6 dp."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )
    return ranked.groupBy("priority", "decile").agg(
        F.count("*").alias("order_ct"),
        F.round(F.max("pr"), 6).alias("pct_rank_max"),
        F.round(F.max("cd"), 6).alias("cume_dist_max"),
    )


def region_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, order priority) with GROUPING flags — all four
    grouping-set combinations (detail, per-region, per-priority, grand
    total) in one pass. Spark expands the cube with an Expand node
    feeding a single hash aggregate: one shuffle regardless of how many
    grouping sets (at 100 TB the 4x row expansion happens map-side and
    partial aggregation collapses it before the exchange)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select(
            F.col("r_name").alias("region_name"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
    )
    return base.cube("region_name", "priority").agg(
        F.sum(dec("o_totalprice")).alias("order_amount"),
        F.count("*").alias("order_ct"),
        F.grouping("region_name").cast("int").alias("g_region"),
        F.grouping("priority").cast("int").alias("g_priority"),
    )


def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native PIVOT (relational transpose): order counts per priority
    pivoted on order status into columns — the `.pivot()` API surface
    (Catalyst lowers an explicit value list to the same single-pass
    conditional aggregate as a hand-written CASE pivot, with no extra
    distinct-values scan because the statuses are enumerated). One
    partial-aggregated shuffle on the groupBy key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "priority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


def customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT): customers who ordered in both
    1996 and 1997 (retained), only 1996 (churned), only 1997
    (acquired). Spark plans INTERSECT as a left-semi and EXCEPT as a
    left-anti aggregate join — both distinct-by-construction; the year
    filters push to the two orders scans and each branch shuffles once
    on the customer key."""
    orders = load_table(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= f"{y}-01-01") & (F.col("o_orderdate") < f"{y + 1}-01-01")
            ).select("o_custkey")
        )

    c96, c97 = year_custs(1996), year_custs(1997)
    tagged = (
        c96.intersect(c97).withColumn("status", F.lit("retained"))
        .unionByName(c96.subtract(c97).withColumn("status", F.lit("churned")))
        .unionByName(c97.subtract(c96).withColumn("status", F.lit("acquired")))
    )
    return tagged.select(F.col("o_custkey").alias("customer_id"), "status")


def gmv_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated date spine (sequence +
    explode — no data shuffle to build it) left-joined to daily GMV,
    missing days forward-filled with last_value(ignore nulls). The
    spine generation is a single-row sequence explode, so the only
    shuffle is the daily aggregate; the forward fill is one unpartitioned
    window over ~90 rows (a bounded date range — at scale you'd
    partition the fill by series key, which the per-user variant of
    this pattern does for free)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
        )
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum(dec("o_totalprice")).alias("gmv"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("1997-01-01")), F.to_date(F.lit("1997-03-31")),
                F.expr("interval 1 day"),
            )
        ).alias("dt")
    )
    joined = spine.join(daily, "dt", "left")
    w = Window.orderBy("dt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.select(
        "dt",
        F.col("gmv").alias("gmv_raw"),
        F.last("gmv", ignorenulls=True).over(w).alias("gmv_filled"),
        F.when(F.col("gmv").isNull(), 1).otherwise(0).alias("is_filled"),
    )


def order_price_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family within a group: percent_rank, cume_dist,
    and ntile(4) of every order's price within its priority. The rank
    values are integer ratios, so the doubles are bit-identical across
    engines — no rounding needed. One shuffle on the partition key;
    all three functions share a single sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


def user_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) aggregation: each user's first and last
    event type in one hash aggregate — no window, no self-join, ONE
    shuffle on the group key (the window formulation would sort every
    partition; argmax is a running comparison). The comparison key is a
    fixed-width sortable string (epoch micros + event id) so ties on
    ts break deterministically and identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string("%019d%010d", F.unix_micros("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("ev_ct"),
        F.min_by("event_type", key).alias("first_type"),
        F.max_by("event_type", key).alias("last_type"),
        F.max_by("value", key).alias("last_value"),
    )


def order_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function rollup: orders and GMV by (year, quarter,
    day-of-week). The calendar parts are scalar expressions on the
    order date — computed in the scan stage, one shuffle for the
    aggregate. Day-of-week is emitted as the locale-independent
    abbreviated name so both engines agree on encoding."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.date_format("o_orderdate", "E").alias("dow"),
        )
        .agg(
            F.count("*").alias("order_ct"),
            F.sum(dec("o_totalprice")).alias("gmv"),
        )
    )


def user_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key gap filling — the scale-correct form of gmv_gapfill: each
    user gets a date spine spanning their own active range (sequence +
    explode, computed from a per-key aggregate, no global calendar),
    zero-filled counts, and days-since-last-activity via a forward fill
    that is PARTITIONED by the key — every window here shuffles once on
    user_id and sorts only within a key, so the pattern holds at any
    key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("dt")).agg(F.count("*").alias("ev_ct"))
    spans = daily.groupBy("user_id").agg(F.min("dt").alias("a"), F.max("dt").alias("b"))
    spine = spans.select(
        "user_id", F.explode(F.sequence("a", "b", F.expr("interval 1 day"))).alias("dt")
    )
    joined = spine.join(daily, ["user_id", "dt"], "left")
    w = (
        Window.partitionBy("user_id").orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_active = F.last(F.when(F.col("ev_ct").isNotNull(), F.col("dt")), ignorenulls=True).over(w)
    return joined.select(
        "user_id", "dt",
        F.coalesce("ev_ct", F.lit(0)).alias("ev_ct"),
        F.datediff(F.col("dt"), last_active).alias("gap_days"),
    )


def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of which rollup/cube
    are shorthands: exactly two aggregation grains (per-status, per-
    priority) in one pass, no detail or grand-total rows. Same Expand +
    single-shuffle hash aggregate plan as cube, but only the requested
    sets are expanded (2x, not 4x)."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS gmv,
               COUNT(*) AS order_ct
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each later
    stage must happen at-or-after the user's FIRST completion of the
    previous stage. Three chained conditional-min aggregates — each is
    one shuffle on user_id, and stages 2/3 filter on a broadcast-sized
    per-user timestamp map (the per-user firsts are one row per user,
    re-joined to events). Output: per first-view date, users entering
    each stage."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    funnel = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return funnel.groupBy(F.to_date("v_ts").alias("cohort_dt")).agg(
        F.count("*").alias("viewed"),
        F.count("c_ts").alias("clicked"),
        F.count("p_ts").alias("purchased"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 6 * 3600


def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel — the serving-layer funnel the
    reference's ClickHouse sink exposes: per user, the MAXIMUM funnel
    level (view -> click -> purchase) reachable by a time-ordered
    event chain whose whole span fits in FUNNEL_WINDOW_S of its first
    event; output is the level histogram. Complements
    conversion_funnel (first-completion chaining, no window bound)
    with the bounded-session semantics windowFunnel defines.

    Plan: one shuffle on user_id collects each user's (ts, step)
    events; the level is a GREEDY ARRAY FOLD over the sorted list —
    dp[i] tracks the LATEST chain-start time achieving level i (a
    later start only loosens the window bound, so the greedy dominates
    every feasible chain; the DuckDB oracle proves it by computing the
    same levels DECLARATIVELY as exists-joins). No per-user quadratic,
    no theta join — the fold is O(events/user), the scale path a
    3-way range join could never be."""
    ev = load_table(spark, sf_dir, "events")
    step_idx = F.when(F.col("event_type") == FUNNEL_STEPS[0], 1)
    for i, s in enumerate(FUNNEL_STEPS[1:], start=2):
        step_idx = step_idx.when(F.col("event_type") == s, i)
    per_user = (
        ev.filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"), step_idx.cast("int").alias("s")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    W = F.lit(FUNNEL_WINDOW_S * 1_000_000).cast("long")
    neg = F.lit(-1).cast("long")
    acc0 = F.array(neg, neg, neg)

    def fold(acc, e):
        d1, d2, d3 = acc[0], acc[1], acc[2]
        nd1 = F.when(e.s == 1, F.greatest(d1, e.t)).otherwise(d1)
        nd2 = F.when((e.s == 2) & (d1 >= 0) & (e.t - d1 <= W), F.greatest(d2, d1)).otherwise(d2)
        nd3 = F.when((e.s == 3) & (d2 >= 0) & (e.t - d2 <= W), F.greatest(d3, d2)).otherwise(d3)
        return F.array(nd1, nd2, nd3)

    dp = F.aggregate("evs", acc0, fold)
    level = (
        F.when(dp[2] >= 0, 3)
        .when(dp[1] >= 0, 2)
        .when(dp[0] >= 0, 1)
        .otherwise(0)
    )
    return (
        per_user.select(level.alias("level"))
        .groupBy("level")
        .agg(F.count("*").alias("user_ct"))
    )


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted as retained in each later week they were active. Two
    shuffles (per-user first, then the (cohort, week-offset) count-
    distinct); the cohort assignment joins back on user_id, which at
    scale is the same bucketed key as every other per-user aggregate."""
    ev = load_table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("dt"))
    firsts = ev.groupBy("user_id").agg(F.min("dt").alias("first_dt"))
    act = (
        ev.dropDuplicates(["user_id", "dt"])
        .join(firsts, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "first_dt").cast("date").alias("cohort_week"),
            (F.datediff(F.date_trunc("week", "dt"), F.date_trunc("week", "first_dt")) / 7)
            .cast("int").alias("week_offset"),
        )
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )


def activity_drop_bag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set-op: EXCEPT ALL subtracts row MULTIPLICITIES —
    each (user, event_type) occurrence in the first half of the month
    not matched one-for-one by a second-half occurrence survives.
    Distinct-EXCEPT would collapse those counts; the bag form measures
    HOW MUCH activity dropped, not just whether it did. Spark plans
    both halves' scans with pushed date filters and one hash-partition
    exchange per side."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("dt")
    )
    first_half = ev.filter(F.col("dt") < "2024-01-16").select("user_id", "event_type")
    second_half = ev.filter(F.col("dt") >= "2024-01-16").select("user_id", "event_type")
    return (
        first_half.exceptAll(second_half)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("lost_ct"))
    )


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders priced above the GLOBAL
    average — the single-value subquery computes once and broadcasts
    into every task's filter (no per-row re-evaluation). The average of
    doubles is a single deterministic reduction at this size; both
    engines compare against the identical value because the comparison
    is on raw doubles, not a reformatted literal."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority AS priority,
               COUNT(*) AS order_ct,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS gmv
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
    """)


def priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each priority's share of total GMV via a
    window over the AGGREGATE (sum over an empty frame on 5 rows, not
    on the fact table) — the aggregate-then-window ordering is what
    keeps this scalable: the unpartitioned window sees only one row
    per group. The share divides in DOUBLE on both engines (the
    gmv_7d_moving_avg recipe) and the sum keeps its native decimal
    width — no narrowing cast to overflow at large SFs."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.sum(dec("o_totalprice")).alias("gmv"),
        F.count("*").alias("order_ct"),
    )
    total = F.sum("gmv").over(Window.partitionBy())
    return agg.select(
        "priority", "gmv", "order_ct",
        F.round(F.col("gmv").cast("double") * 100 / total.cast("double"), 2).alias("gmv_pct"),
    )


def event_spike_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on the daily event-value
    series — the monitoring primitive (spike/drop flags vs a 7-day
    trailing mean). The window ORDER BY runs over the per-day aggregate
    (rows = days, dimension-bounded — allowlisted single-partition
    series like running_gmv), never the raw events. The trailing frame
    EXCLUDES the current day (ROWS -7..-1) so a spike can't mask
    itself; days with under 3 trailing observations are warm-up and
    dropped. Frame sums stay exact decimal; only the mean division and
    ratio happen in double, and flags compare the ROUNDED ratio so both
    engines decide identically at the threshold."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.sum(dec("value")).alias("day_value")
    )
    w = Window.orderBy("dt").rowsBetween(-7, -1)
    base_sum = F.sum("day_value").over(w)
    base_ct = F.count("day_value").over(w)
    mean = base_sum.cast("double") / base_ct.cast("double")
    ratio = F.round(F.col("day_value").cast("double") / mean, 6)
    scored = daily.select(
        "dt",
        "day_value",
        base_ct.alias("trail_ct"),
        F.round(mean, 6).alias("trail_mean"),
        ratio.alias("ratio"),
    )
    return scored.filter(F.col("trail_ct") >= 3).select(
        "dt", "day_value", "trail_ct", "trail_mean", "ratio",
        ((F.col("ratio") > 1.3) | (F.col("ratio") < 0.7)).alias("is_spike"),
    )


GMV_WIN_START = "1997-01-01"
GMV_WIN_END = "1997-04-01"


def _daily_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-quarter daily GMV series — shared by the EWMA/Holt/CUSUM
    smoothers so the three twins and their oracles can never diverge on
    the series definition. The series stays EXACT DECIMAL (gmv_d): the
    smoothers' recurrences fold in decimal arithmetic, because a float
    recursion re-rounded every step gives each of ~90 steps a chance to
    land on a half-way double and flip the 6th decimal differently per
    engine — observed once at sf0.1 (ewma, 1-ulp-at-6dp divergence)
    before the decimal rewrite. Doubles appear only at the output edge."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= GMV_WIN_START) & (F.col("o_orderdate") < GMV_WIN_END)
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"))
        .agg(F.sum(dec("o_totalprice")).alias("gmv_d"))
    )


def _dlit(x: float) -> Column:
    """One-decimal constant as an exact decimal literal (0.3, 0.7, ...).
    Guards the width: a 2-dp constant (0.25) would be silently rounded
    by the cast on BOTH engines, so the oracle gate could never catch
    the corruption — fail at plan-build time instead."""
    import decimal

    d = decimal.Decimal(str(x))
    if d != d.quantize(decimal.Decimal("0.1")):
        raise ValueError(f"_dlit expects a 1-dp constant, got {x!r}")
    return F.lit(str(x)).cast("decimal(2,1)")


EWMA_ALPHA = 0.3
EWMA_BETA = 1.0 - EWMA_ALPHA  # 0.7 — computed once so both engines
                              # embed the bit-identical double literal


def gmv_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily GMV over one
    quarter — the smoothing/forecast-baseline primitive (e_t = a*x_t +
    (1-a)*e_{t-1}). The recurrence is inherently sequential, but the
    SERIES is tiny (days, not orders): aggregate first (one corpus
    shuffle), then fold the ordered day array with F.aggregate in a
    single tiny task — the 'pre-aggregate, then sequential-fold the
    small series' recipe for any recursive smoother at warehouse scale.
    Each step rounds to 6 dp IN EXACT DECIMAL (see _daily_gmv: a double
    recursion diverged 1 ulp at sf0.1); the oracle replays the same
    decimal recurrence with a recursive CTE."""
    daily = _daily_gmv(spark, sf_dir)
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("dt", "gmv_d"))).alias("s")
    )
    step = F.aggregate(
        F.col("s"),
        F.array().cast("array<struct<dt:string,gmv:decimal(28,4),ewma:decimal(28,6)>>"),
        lambda acc, e: F.concat(
            acc,
            F.array(F.struct(
                e.dt.alias("dt"),
                e.gmv_d.alias("gmv"),
                F.when(
                    F.size(acc) == 0, F.round(e.gmv_d, 6).cast("decimal(28,6)")
                ).otherwise(
                    F.round(
                        _dlit(EWMA_ALPHA) * e.gmv_d
                        + _dlit(EWMA_BETA) * F.element_at(acc, -1).ewma,
                        6,
                    ).cast("decimal(28,6)")
                ).alias("ewma"),
            )),
        ),
    )
    return (
        series.select(F.explode(step).alias("r"))
        .select(
            "r.dt",
            F.col("r.gmv").cast("double").alias("gmv"),
            F.col("r.ewma").cast("double").alias("ewma"),
        )
        .orderBy("dt")
    )


HOLT_ALPHA = 0.4
HOLT_CALPHA = 1.0 - HOLT_ALPHA
HOLT_BETA = 0.2
HOLT_CBETA = 1.0 - HOLT_BETA


def gmv_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over the daily GMV series —
    level + trend + one-step-ahead forecast (the planning number an
    inventory/revenue dashboard shows). Two COUPLED recurrences
    (l_t = a*x_t + (1-a)*(l+b); b_t = B*(l_t-l) + (1-B)*b) folded over
    the pre-aggregated day array exactly like gmv_ewma, with a
    struct-typed accumulator carrying (series, level, trend). Exact
    decimal throughout (see _daily_gmv); trend can go negative — both
    engines' decimal ROUND is half-away-from-zero, so signs are safe."""
    daily = _daily_gmv(spark, sf_dir)
    series = daily.agg(F.array_sort(F.collect_list(F.struct("dt", "gmv_d"))).alias("s"))
    D6 = "decimal(28,6)"
    acc0 = F.struct(
        F.array().cast(f"array<struct<dt:string,gmv:decimal(28,4),level:{D6},trend:{D6}>>").alias("arr"),
        F.lit(None).cast(D6).alias("l"),
        F.lit(None).cast(D6).alias("b"),
    )

    def step(acc, e):
        first = acc.l.isNull()
        l_new = F.when(first, F.round(e.gmv_d, 6).cast(D6)).otherwise(
            F.round(
                _dlit(HOLT_ALPHA) * e.gmv_d + _dlit(HOLT_CALPHA) * (acc.l + acc.b), 6
            ).cast(D6)
        )
        b_new = F.when(first, F.lit("0").cast(D6)).otherwise(
            F.round(
                _dlit(HOLT_BETA) * (l_new - acc.l) + _dlit(HOLT_CBETA) * acc.b, 6
            ).cast(D6)
        )
        entry = F.struct(
            e.dt.alias("dt"), e.gmv_d.alias("gmv"),
            l_new.alias("level"), b_new.alias("trend"),
        )
        return F.struct(
            F.concat(acc.arr, F.array(entry)).alias("arr"),
            l_new.alias("l"),
            b_new.alias("b"),
        )

    folded = F.aggregate(F.col("s"), acc0, step).getField("arr")
    return (
        series.select(F.explode(folded).alias("r"))
        .select(
            "r.dt",
            F.col("r.gmv").cast("double").alias("gmv"),
            F.col("r.level").cast("double").alias("level"),
            F.col("r.trend").cast("double").alias("trend"),
            (F.col("r.level") + F.col("r.trend")).cast("double").alias("forecast_next"),
        )
        .orderBy("dt")
    )


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value is
    credited to the user's most recent PRECEDING non-purchase event
    type — the marketing-analytics primitive behind channel ROI
    dashboards. Purchases with no preceding touch attribute to
    'direct'.

    Plan: one keyed window (last_value with ignoreNulls over the
    user's event sequence, (ts, event_id) total order), then a small
    per-channel aggregate. Revenue sums in decimal."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(w)
    purchases = (
        ev.select("user_id", "event_type", "ts", "event_id", "value")
        .withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce("touch", F.lit("direct")).alias("channel"),
            dec("value").alias("revenue"),
        )
    )
    return (
        purchases.groupBy("channel")
        .agg(
            F.count("*").alias("purchase_ct"),
            F.sum("revenue").cast("decimal(28,4)").alias("revenue"),
        )
        .orderBy("channel")
    )


CUSUM_K = 0.5   # slack, in sigmas
CUSUM_H = 4.0   # decision threshold, in sigmas


def gmv_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily GMV series — the
    standard monitoring chart for mean shifts (s+ accumulates upward
    drift beyond a k*sigma slack, s- downward; a flag fires when
    either passes H*sigma). mu and sigma come from one decimal-summed
    aggregate; the coupled recurrences fold over the day array like
    gmv_ewma/gmv_holt (pre-aggregate, then sequential-fold the tiny
    series)."""
    return _cusum_over_daily(_daily_gmv(spark, sf_dir))


def _cusum_over_daily(daily: DataFrame) -> DataFrame:
    """The CUSUM stats + decimal fold over a (dt, gmv_d decimal(28,4))
    daily series — factored out so the streaming alert screen
    (stream_gmv_cusum) folds EXACTLY the batch arithmetic over its
    ledger-reaggregated series and the two can never drift."""
    gmv_dbl = F.col("gmv_d").cast("double")
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum(F.round(gmv_dbl, 9).cast("decimal(28,9)")).alias("s1"),
        F.sum(F.round(gmv_dbl * gmv_dbl, 12).cast("decimal(38,12)")).alias("s2"),
    )
    mu = F.round(F.col("s1").cast("double") / F.col("n").cast("double"), 6)
    var = F.round(
        F.col("s2").cast("double") / F.col("n").cast("double") - mu * mu, 6
    )
    sg = F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
    # sigma passes through sqrt, so mu/sigma are double-computed ONCE,
    # then pinned to exact decimal — the fold itself never re-rounds a
    # double (the per-step half-way risk the ewma rewrite eliminated).
    # A 6dp-rounded double is never half-way at 6dp, so the cast is
    # engine-identical.
    D7 = "decimal(32,7)"
    base = (
        daily.agg(F.array_sort(F.collect_list(F.struct("dt", "gmv_d"))).alias("s"))
        .crossJoin(F.broadcast(stats))
        .select(
            "s",
            mu.cast("decimal(28,6)").alias("mu"),
            (_dlit(CUSUM_K) * sg.cast("decimal(28,6)")).alias("slack"),
            (_dlit(CUSUM_H) * sg.cast("decimal(28,6)")).alias("thresh"),
        )
    )
    acc0 = F.struct(
        F.array().cast(f"array<struct<dt:string,gmv:decimal(28,4),s_pos:{D7},s_neg:{D7}>>").alias("arr"),
        F.lit("0").cast(D7).alias("sp"),
        F.lit("0").cast(D7).alias("sn"),
    )

    def step(acc, e):
        zero = F.lit("0").cast(D7)
        sp = F.greatest(
            zero, (acc.sp + e.gmv_d - F.col("mu") - F.col("slack")).cast(D7)
        )
        sn = F.greatest(
            zero, (acc.sn + F.col("mu") - e.gmv_d - F.col("slack")).cast(D7)
        )
        entry = F.struct(e.dt.alias("dt"), e.gmv_d.alias("gmv"), sp.alias("s_pos"), sn.alias("s_neg"))
        return F.struct(F.concat(acc.arr, F.array(entry)).alias("arr"), sp.alias("sp"), sn.alias("sn"))

    folded = F.aggregate(F.col("s"), acc0, step).getField("arr")
    return (
        base.select(F.explode(folded).alias("r"), "thresh")
        .select(
            "r.dt",
            F.col("r.gmv").cast("double").alias("gmv"),
            F.round("r.s_pos", 6).cast("double").alias("s_pos"),
            F.round("r.s_neg", 6).cast("double").alias("s_neg"),
            ((F.col("r.s_pos") > F.col("thresh"))
             | (F.col("r.s_neg") > F.col("thresh"))).alias("shift_flag"),
        )
        .orderBy("dt")
    )


RFM_ASOF = "1998-08-02"  # dataset end date (TPC-H convention)
RFM_Q = 5


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the e-commerce marketing rollup the
    reference's serving layer points toward: per customer, Recency
    (days since last order at the dataset as-of date), Frequency
    (order count), Monetary (total spend); each scored into quintiles
    and rolled up per (r, f, m) segment.

    Scale: quintile boundaries are exact percentile_disc cut points
    over the customer-level aggregate (the quality_buckets recipe — a
    1-row broadcast + when-chains, NO global ntile sort over the
    customer dimension, which is millions of rows at warehouse scale).
    Recency scores reverse (low days = best), matching RFM practice."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF).cast("date"), F.max("o_orderdate")).alias("rec"),
        F.count("*").alias("freq"),
        F.sum(dec("o_totalprice")).alias("mon"),
    )
    cuts = per_cust.agg(*[
        F.expr(f"percentile_disc({q / RFM_Q}) WITHIN GROUP (ORDER BY {c})").alias(f"{c}{q}")
        for c in ("rec", "freq", "mon")
        for q in range(1, RFM_Q)
    ])

    def score(c):
        b = F.lit(1)
        for q in range(1, RFM_Q):
            b = b + F.when(F.col(c) > F.col(f"{c}{q}"), 1).otherwise(0)
        return b

    scored = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey", "rec", "freq", "mon",
        (F.lit(RFM_Q + 1) - score("rec")).alias("r_score"),  # low recency = best
        score("freq").alias("f_score"),
        score("mon").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("cust_ct"),
            F.sum("mon").cast("decimal(28,4)").alias("segment_value"),
            F.min("o_custkey").alias("min_custkey"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the 'what do users do next' primitive behind funnel
    design and next-action prediction. P(cur | prev) = count(prev->cur)
    / count(prev->*), with counts exact and probabilities rounded.

    Plan: one lag window partitioned by user (corpus-scale but keyed —
    no global sort; (ts, event_id) tiebreak makes sequences total),
    one (prev, cur) aggregate, row totals broadcast back. The matrix
    is |event_types|^2 cells regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    trans = pairs.groupBy("prev_type", F.col("event_type").alias("cur_type")).agg(
        F.count("*").alias("ct")
    )
    row_tot = trans.groupBy("prev_type").agg(F.sum("ct").alias("row_tot"))
    prob = F.round(F.col("ct").cast("double") / F.col("row_tot").cast("double"), 6)
    return (
        trans.join(F.broadcast(row_tot), "prev_type")
        .select("prev_type", "cur_type", "ct", prob.alias("p"))
        .orderBy("prev_type", "cur_type")
    )


SEQSIM_QUERY_MOD = 97   # query users: user_id % 97 == 0
SEQSIM_TOP_K = 5
SEQSIM_GRAM = 3


def user_sequence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k behavior-sequence similarity (the trajectory
    top-k search shape — REPOSE, ICDE 2021 — on event logs): each query
    user's chronological event-type sequence is compared to every other
    user's by Jaccard over SEQSIM_GRAM-gram sets, keeping the TOP_K most
    similar users — the 'users who behave like this one' primitive
    behind audience lookalikes and anomaly triage.

    Plan: per-user sequences come from ONE user-keyed window (total
    order by (ts, event_id)); gram sets collapse to one distinct array
    per user; candidates come from a POSTING join on shared grams
    (exact for Jaccard > 0 — a pair with no shared gram can't score),
    so no user-x-user crossJoin ever materializes. With this corpus's
    tiny event-type alphabet the posting lists are dense (documented —
    real alphabets of pages/SKUs make the same join selective); the
    per-pair intersection count is the join's group size, set sizes
    join back per user, and a per-query window keeps TOP_K. All counts
    exact integers; jaccard is the exact-decimal division pattern."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("seq", F.collect_list("event_type").over(w))
        .groupBy("user_id")
        .agg(F.max("seq").alias("seq"))
    )
    k = SEQSIM_GRAM
    n = F.greatest(F.size("seq") - (k - 1), F.lit(0))
    grams = F.array_distinct(
        F.when(
            F.size("seq") >= k,
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.concat_ws(">", F.slice("seq", i + 1, k)),
            ),
        ).otherwise(F.array(F.concat_ws(">", F.col("seq"))))
    )
    sets = seq.select("user_id", grams.alias("grams"), F.size(grams).alias("n_grams"))
    post = sets.select("user_id", "n_grams", F.explode("grams").alias("gram"))
    q = post.filter(F.col("user_id") % SEQSIM_QUERY_MOD == 0).select(
        F.col("user_id").alias("q_user"), F.col("n_grams").alias("q_n"), "gram"
    )
    c = post.select(
        F.col("user_id").alias("c_user"), F.col("n_grams").alias("c_n"), "gram"
    )
    inter = (
        q.join(c, "gram")
        .filter(F.col("q_user") != F.col("c_user"))
        .groupBy("q_user", "q_n", "c_user", "c_n")
        .agg(F.count("*").alias("inter_ct"))
    )
    jac = (
        F.col("inter_ct").cast("decimal(18,6)")
        / (F.col("q_n") + F.col("c_n") - F.col("inter_ct"))
    ).cast("decimal(9,6)")
    ranked = inter.select(
        "q_user", "c_user", "inter_ct", jac.alias("jaccard")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_user").orderBy(
                F.desc("jaccard"), F.asc("c_user")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= SEQSIM_TOP_K).select(
        "q_user", F.col("rank").cast("int").alias("rank"), "c_user", "inter_ct", "jaccard"
    )


QUERIES = {
    "rfm_segments": rfm_segments,
    "event_transition_matrix": event_transition_matrix,
    "user_sequence_similarity": user_sequence_similarity,
    "gmv_ewma": gmv_ewma,
    "gmv_holt": gmv_holt,
    "gmv_cusum": gmv_cusum,
    "last_touch_attribution": last_touch_attribution,
    "topn_orders_per_priority": topn_orders_per_priority,
    "event_spike_days": event_spike_days,
    "order_seasonality": order_seasonality,
    "user_daily_gapfill": user_daily_gapfill,
    "sales_grouping_sets": sales_grouping_sets,
    "conversion_funnel": conversion_funnel,
    "window_funnel": window_funnel,
    "weekly_retention": weekly_retention,
    "activity_drop_bag_diff": activity_drop_bag_diff,
    "above_avg_orders": above_avg_orders,
    "priority_share": priority_share,
    "region_priority_cube": region_priority_cube,
    "priority_status_pivot": priority_status_pivot,
    "customer_retention": customer_retention,
    "gmv_gapfill": gmv_gapfill,
    "order_price_rank": order_price_rank,
    "user_first_last": user_first_last,
    "running_gmv": running_gmv,
    "region_rollup": region_rollup,
    "sessionize": sessionize,
    "inactive_customers": inactive_customers,
    "big_orders": big_orders,
    "gmv_7d_moving_avg": gmv_7d_moving_avg,
    "order_percentile_bands": order_percentile_bands,
    "nation_share_of_region": nation_share_of_region,
}

_RFM_CUTS = ", ".join(
    f"quantile_disc({c}, {q / RFM_Q}) AS {c}{q}"
    for c in ("rec", "freq", "mon") for q in range(1, RFM_Q)
)


def _rfm_score_sql(c: str, reverse: bool = False) -> str:
    base = "1 + " + " + ".join(
        f"CASE WHEN {c} > {c}{q} THEN 1 ELSE 0 END" for q in range(1, RFM_Q)
    )
    return f"{RFM_Q + 1} - ({base})" if reverse else base


ORACLES = {
    "priority_status_pivot": """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
    "last_touch_attribution": """
    WITH seq AS (
        SELECT user_id, event_type, value, ts, event_id,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM events
    )
    SELECT COALESCE(touch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS purchase_ct,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS revenue
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
    "gmv_cusum": f"""
    WITH RECURSIVE daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS gmv
        FROM orders
        WHERE o_orderdate >= DATE '{GMV_WIN_START}' AND o_orderdate < DATE '{GMV_WIN_END}'
        GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(CAST(gmv AS DOUBLE), 9) AS DECIMAL(28,9))) AS s1,
               SUM(CAST(ROUND(CAST(gmv AS DOUBLE) * CAST(gmv AS DOUBLE), 12) AS DECIMAL(38,12))) AS s2
        FROM daily
    ), ms AS (
        SELECT ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mu,
               ROUND(sqrt(GREATEST(ROUND(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       * ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6), 6), 0.0)), 6) AS sigma
        FROM stats
    ), md AS (
        SELECT CAST(mu AS DECIMAL(28,6)) AS mu,
               CAST({CUSUM_K!r} AS DECIMAL(2,1)) * CAST(sigma AS DECIMAL(28,6)) AS slack,
               CAST({CUSUM_H!r} AS DECIMAL(2,1)) * CAST(sigma AS DECIMAL(28,6)) AS thresh
        FROM ms
    ), idx AS (
        SELECT dt, gmv, ROW_NUMBER() OVER (ORDER BY dt) AS i FROM daily
    ), c AS (
        SELECT x.dt, x.gmv, x.i,
               CAST(GREATEST(CAST(0 AS DECIMAL(32,7)), CAST(x.gmv - m.mu - m.slack AS DECIMAL(32,7))) AS DECIMAL(32,7)) AS s_pos,
               CAST(GREATEST(CAST(0 AS DECIMAL(32,7)), CAST(m.mu - x.gmv - m.slack AS DECIMAL(32,7))) AS DECIMAL(32,7)) AS s_neg
        FROM idx x, md m WHERE x.i = 1
        UNION ALL
        SELECT x.dt, x.gmv, x.i,
               CAST(GREATEST(CAST(0 AS DECIMAL(32,7)), CAST(p.s_pos + x.gmv - m.mu - m.slack AS DECIMAL(32,7))) AS DECIMAL(32,7)),
               CAST(GREATEST(CAST(0 AS DECIMAL(32,7)), CAST(p.s_neg + m.mu - x.gmv - m.slack AS DECIMAL(32,7))) AS DECIMAL(32,7))
        FROM idx x JOIN c p ON x.i = p.i + 1, md m
    )
    SELECT c.dt, CAST(c.gmv AS DOUBLE) AS gmv,
           CAST(ROUND(c.s_pos, 6) AS DOUBLE) AS s_pos,
           CAST(ROUND(c.s_neg, 6) AS DOUBLE) AS s_neg,
           (c.s_pos > m.thresh OR c.s_neg > m.thresh) AS shift_flag
    FROM c, md m
    ORDER BY c.dt
    """,
    "gmv_holt": f"""
    WITH RECURSIVE daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS gmv
        FROM orders
        WHERE o_orderdate >= DATE '{GMV_WIN_START}' AND o_orderdate < DATE '{GMV_WIN_END}'
        GROUP BY 1
    ), idx AS (
        SELECT dt, gmv, ROW_NUMBER() OVER (ORDER BY dt) AS i FROM daily
    ), h AS (
        SELECT dt, gmv, i, CAST(ROUND(gmv, 6) AS DECIMAL(28,6)) AS level,
               CAST(0 AS DECIMAL(28,6)) AS trend
        FROM idx WHERE i = 1
        UNION ALL
        SELECT x.dt, x.gmv, x.i,
               CAST(ROUND(CAST({HOLT_ALPHA!r} AS DECIMAL(2,1)) * x.gmv
                        + CAST({HOLT_CALPHA!r} AS DECIMAL(2,1)) * (p.level + p.trend), 6) AS DECIMAL(28,6)),
               CAST(ROUND(CAST({HOLT_BETA!r} AS DECIMAL(2,1))
                          * (CAST(ROUND(CAST({HOLT_ALPHA!r} AS DECIMAL(2,1)) * x.gmv
                                      + CAST({HOLT_CALPHA!r} AS DECIMAL(2,1)) * (p.level + p.trend), 6) AS DECIMAL(28,6))
                             - p.level)
                        + CAST({HOLT_CBETA!r} AS DECIMAL(2,1)) * p.trend, 6) AS DECIMAL(28,6))
        FROM idx x JOIN h p ON x.i = p.i + 1
    )
    SELECT dt, CAST(gmv AS DOUBLE) AS gmv, CAST(level AS DOUBLE) AS level,
           CAST(trend AS DOUBLE) AS trend,
           CAST(level + trend AS DOUBLE) AS forecast_next
    FROM h ORDER BY dt
    """,
    "user_sequence_similarity": f"""
    WITH seq AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    ), g AS (
        SELECT user_id,
               CASE WHEN len(s) >= {SEQSIM_GRAM} THEN
                   list_distinct([array_to_string(s[i:i+{SEQSIM_GRAM} - 1], '>')
                                  for i in range(1, len(s) - {SEQSIM_GRAM} + 2)])
               ELSE [array_to_string(s, '>')] END AS grams
        FROM seq
    ), post AS (
        SELECT user_id, len(grams) AS n, unnest(grams) AS gram FROM g
    ), inter AS (
        SELECT q.user_id AS q_user, q.n AS q_n, c.user_id AS c_user, c.n AS c_n,
               COUNT(*) AS inter_ct
        FROM post q JOIN post c ON q.gram = c.gram AND q.user_id <> c.user_id
        WHERE q.user_id % {SEQSIM_QUERY_MOD} = 0
        GROUP BY 1, 2, 3, 4
    ), ranked AS (
        SELECT q_user, c_user, CAST(inter_ct AS BIGINT) AS inter_ct,
               CAST(CAST(inter_ct AS DECIMAL(18,6)) / (q_n + c_n - inter_ct) AS DECIMAL(9,6)) AS jaccard,
               ROW_NUMBER() OVER (
                   PARTITION BY q_user
                   ORDER BY CAST(CAST(inter_ct AS DECIMAL(18,6)) / (q_n + c_n - inter_ct) AS DECIMAL(9,6)) DESC,
                            c_user ASC
               ) AS rank
        FROM inter
    )
    SELECT q_user, CAST(rank AS INTEGER) AS rank, c_user, inter_ct, jaccard
    FROM ranked WHERE rank <= {SEQSIM_TOP_K}
    """,
    "event_transition_matrix": """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), trans AS (
        SELECT prev_type, event_type AS cur_type, COUNT(*) AS ct
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ), rt AS (
        SELECT prev_type, CAST(SUM(ct) AS BIGINT) AS row_tot FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.cur_type, CAST(t.ct AS BIGINT) AS ct,
           ROUND(CAST(t.ct AS DOUBLE) / CAST(r.row_tot AS DOUBLE), 6) AS p
    FROM trans t JOIN rt r ON t.prev_type = r.prev_type
    ORDER BY t.prev_type, t.cur_type
    """,
    "gmv_ewma": f"""
    WITH RECURSIVE daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS gmv
        FROM orders
        WHERE o_orderdate >= DATE '{GMV_WIN_START}' AND o_orderdate < DATE '{GMV_WIN_END}'
        GROUP BY 1
    ), idx AS (
        SELECT dt, gmv, ROW_NUMBER() OVER (ORDER BY dt) AS i FROM daily
    ), ew AS (
        SELECT dt, gmv, i, CAST(ROUND(gmv, 6) AS DECIMAL(28,6)) AS ewma FROM idx WHERE i = 1
        UNION ALL
        SELECT x.dt, x.gmv, x.i,
               CAST(ROUND(CAST({EWMA_ALPHA!r} AS DECIMAL(2,1)) * x.gmv
                        + CAST({EWMA_BETA!r} AS DECIMAL(2,1)) * e.ewma, 6) AS DECIMAL(28,6))
        FROM idx x JOIN ew e ON x.i = e.i + 1
    )
    SELECT dt, CAST(gmv AS DOUBLE) AS gmv, CAST(ewma AS DOUBLE) AS ewma FROM ew ORDER BY dt
    """,
    "rfm_segments": f"""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), DATE '{RFM_ASOF}') AS rec,
               COUNT(*) AS freq,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
        FROM orders GROUP BY 1
    ), cuts AS (
        SELECT {_RFM_CUTS} FROM per_cust
    ), scored AS (
        SELECT o_custkey, mon,
               {_rfm_score_sql('rec', reverse=True)} AS r_score,
               {_rfm_score_sql('freq')} AS f_score,
               {_rfm_score_sql('mon')} AS m_score
        FROM per_cust, cuts
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS cust_ct,
           CAST(SUM(mon) AS DECIMAL(28,4)) AS segment_value,
           MIN(o_custkey) AS min_custkey
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    "event_spike_days": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS dt,
                   SUM(CAST(value AS DECIMAL(18,4))) AS day_value
            FROM events GROUP BY 1
        ), win AS (
            SELECT dt, day_value,
                   SUM(day_value) OVER w AS base_sum,
                   COUNT(day_value) OVER w AS base_ct
            FROM daily
            WINDOW w AS (ORDER BY dt ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT dt, day_value,
               CAST(base_ct AS BIGINT) AS trail_ct,
               ROUND(CAST(base_sum AS DOUBLE) / CAST(base_ct AS DOUBLE), 6) AS trail_mean,
               ROUND(CAST(day_value AS DOUBLE) / (CAST(base_sum AS DOUBLE) / CAST(base_ct AS DOUBLE)), 6) AS ratio,
               (ROUND(CAST(day_value AS DOUBLE) / (CAST(base_sum AS DOUBLE) / CAST(base_ct AS DOUBLE)), 6) > 1.3
                OR ROUND(CAST(day_value AS DOUBLE) / (CAST(base_sum AS DOUBLE) / CAST(base_ct AS DOUBLE)), 6) < 0.7) AS is_spike
        FROM win
        WHERE base_ct >= 3
    """,
    "priority_share": """
        WITH agg AS (
            SELECT o_orderpriority AS priority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv,
                   CAST(COUNT(*) AS BIGINT) AS order_ct
            FROM orders GROUP BY 1
        )
        SELECT priority, gmv, order_ct,
               ROUND(CAST(gmv AS DOUBLE) * 100 / CAST(SUM(gmv) OVER () AS DOUBLE), 2) AS gmv_pct
        FROM agg
    """,
    "activity_drop_bag_diff": """
        WITH a AS (
            SELECT user_id, event_type FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-16'
        ), b AS (
            SELECT user_id, event_type FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
        ), d AS (
            SELECT user_id, event_type FROM a
            EXCEPT ALL
            SELECT user_id, event_type FROM b
        )
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS lost_ct
        FROM d GROUP BY 1, 2
    """,
    "above_avg_orders": """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
    """,
    # declarative exists-join twin of the greedy fold: level k iff a
    # time-ordered chain of the first k steps fits in the window
    "window_funnel": f"""
    WITH ue AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ), v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l1 AS (SELECT DISTINCT user_id FROM v),
    l2 AS (
        SELECT DISTINCT v.user_id FROM v JOIN c
        ON v.user_id = c.user_id AND c.ts >= v.ts
           AND c.ts <= v.ts + INTERVAL {FUNNEL_WINDOW_S} SECOND
    ), l3 AS (
        SELECT DISTINCT v.user_id FROM v
        JOIN c ON v.user_id = c.user_id AND c.ts >= v.ts
        JOIN p ON p.user_id = v.user_id AND p.ts >= c.ts
                  AND p.ts <= v.ts + INTERVAL {FUNNEL_WINDOW_S} SECOND
    ), lev AS (
        SELECT u.user_id,
               CASE WHEN l3.user_id IS NOT NULL THEN 3
                    WHEN l2.user_id IS NOT NULL THEN 2
                    WHEN l1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS level
        FROM ue u
        LEFT JOIN l1 ON u.user_id = l1.user_id
        LEFT JOIN l2 ON u.user_id = l2.user_id
        LEFT JOIN l3 ON u.user_id = l3.user_id
    )
    SELECT CAST(level AS INTEGER) AS level, CAST(COUNT(*) AS BIGINT) AS user_ct
    FROM lev GROUP BY level
    """,
    "conversion_funnel": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1
        ), c AS (
            SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1
        ), p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1
        )
        SELECT CAST(v.v_ts AS DATE) AS cohort_dt,
               CAST(COUNT(*) AS BIGINT) AS viewed,
               CAST(COUNT(c.c_ts) AS BIGINT) AS clicked,
               CAST(COUNT(p.p_ts) AS BIGINT) AS purchased
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
        GROUP BY 1
    """,
    "weekly_retention": """
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS first_dt FROM events GROUP BY 1
        ), act AS (
            SELECT DISTINCT e.user_id,
                   CAST(date_trunc('week', f.first_dt) AS DATE) AS cohort_week,
                   CAST(date_diff('day', date_trunc('week', f.first_dt),
                                  date_trunc('week', CAST(e.ts AS DATE))) / 7 AS INTEGER) AS week_offset
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT cohort_week, week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM act GROUP BY 1, 2
    """,
    "sales_grouping_sets": """
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv,
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    "user_daily_gapfill": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS dt, COUNT(*) AS ev_ct
            FROM events GROUP BY 1, 2
        ), spans AS (
            SELECT user_id, MIN(dt) AS a, MAX(dt) AS b FROM daily GROUP BY 1
        ), spine AS (
            SELECT user_id, unnest(generate_series(a, b, INTERVAL 1 DAY))::DATE AS dt FROM spans
        ), j AS (
            SELECT s.user_id, s.dt, d.ev_ct
            FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.dt = d.dt
        ), f AS (
            SELECT user_id, dt, CAST(COALESCE(ev_ct, 0) AS BIGINT) AS ev_ct,
                   last_value(CASE WHEN ev_ct IS NOT NULL THEN dt END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY dt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_active
            FROM j
        )
        SELECT user_id, dt, ev_ct,
               CAST(date_diff('day', last_active, dt) AS INTEGER) AS gap_days
        FROM f
    """,
    "order_seasonality": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               strftime(o_orderdate, '%a') AS dow,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
        FROM orders GROUP BY 1, 2, 3
    """,
    "user_first_last": """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS ev_ct,
               arg_min(event_type, printf('%019d%010d', epoch_us(ts), event_id)) AS first_type,
               arg_max(event_type, printf('%019d%010d', epoch_us(ts), event_id)) AS last_type,
               arg_max(value, printf('%019d%010d', epoch_us(ts), event_id)) AS last_value
        FROM events GROUP BY user_id
    """,
    "gmv_gapfill": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS dt,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        ), spine AS (
            SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31', INTERVAL 1 DAY))::DATE AS dt
        ), j AS (
            SELECT s.dt, d.gmv FROM spine s LEFT JOIN daily d ON s.dt = d.dt
        )
        SELECT dt, gmv AS gmv_raw,
               CAST(last_value(gmv IGNORE NULLS) OVER (
                    ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS gmv_filled,
               CAST(CASE WHEN gmv IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_filled
        FROM j
    """,
    "order_price_rank": """
        SELECT o_orderkey AS order_id,
               o_orderpriority AS priority,
               percent_rank() OVER w AS price_pct_rank,
               cume_dist() OVER w AS price_cume_dist,
               CAST(ntile(4) OVER w AS INTEGER) AS price_quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "region_priority_cube": """
        SELECT r.r_name AS region_name,
               o.o_orderpriority AS priority,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(GROUPING(r.r_name) AS INTEGER) AS g_region,
               CAST(GROUPING(o.o_orderpriority) AS INTEGER) AS g_priority
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY CUBE (r.r_name, o.o_orderpriority)
    """,
    "customer_retention": """
        WITH c96 AS (SELECT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
             c97 AS (SELECT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        SELECT o_custkey AS customer_id, 'retained' AS status
        FROM (SELECT o_custkey FROM c96 INTERSECT SELECT o_custkey FROM c97)
        UNION ALL
        SELECT o_custkey AS customer_id, 'churned' AS status
        FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97)
        UNION ALL
        SELECT o_custkey AS customer_id, 'acquired' AS status
        FROM (SELECT o_custkey FROM c97 EXCEPT SELECT o_custkey FROM c96)
    """,
    "topn_orders_per_priority": """
        WITH r AS (
            SELECT o_orderpriority AS priority, o_orderkey AS order_id,
                   CAST(o_totalprice AS DECIMAL(18,4)) AS total_amount,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        )
        SELECT priority, CAST(rn AS INTEGER) AS rn, order_id, total_amount
        FROM r WHERE rn <= 3
    """,
    "running_gmv": """
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT dt, gmv,
               CAST(SUM(gmv) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(18,4)) AS running_gmv,
               CAST(gmv - LAG(gmv) OVER (ORDER BY dt) AS DECIMAL(18,4)) AS gmv_delta
        FROM daily
    """,
    "region_rollup": """
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount,
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    "sessionize": """
        WITH marked AS (
            SELECT user_id, event_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM marked
        ), sessions AS (
            SELECT user_id, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        ), per_session AS (
            SELECT user_id, session_id,
                   CAST(COUNT(*) AS BIGINT) AS ev_ct,
                   CAST(MIN(event_id) AS BIGINT) AS entry_event_id
            FROM sessions GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS session_ct,
               CAST(MAX(ev_ct) AS BIGINT) AS max_session_events,
               CAST(SUM(ev_ct) AS BIGINT) AS total_events,
               CAST(MIN(entry_event_id) AS BIGINT) AS first_entry_event
        FROM per_session GROUP BY user_id
    """,
    "big_orders": """
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
        )
        SELECT o.o_orderkey AS order_id,
               o.o_custkey AS user_id,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(o.o_totalprice AS DECIMAL(18,4)) AS total_amount,
               b.total_qty
        FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
    """,
    "nation_share_of_region": """
        WITH leaf AS (
            SELECT r.r_name AS region_name, n.n_name AS nation_name,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        )
        SELECT region_name, nation_name, gmv,
               ROUND(CAST(gmv AS DOUBLE) / CAST(SUM(gmv) OVER (PARTITION BY region_name) AS DOUBLE) * 100, 4)
                   AS region_share_pct
        FROM leaf
    """,
    "order_percentile_bands": """
        WITH ranked AS (
            SELECT o_orderpriority AS priority,
                   PERCENT_RANK() OVER w AS pr,
                   CUME_DIST() OVER w AS cd,
                   NTILE(10) OVER w AS decile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        )
        SELECT priority, CAST(decile AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               ROUND(MAX(pr), 6) AS pct_rank_max,
               ROUND(MAX(cd), 6) AS cume_dist_max
        FROM ranked GROUP BY 1, 2
    """,
    "gmv_7d_moving_avg": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS dt,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv,
                   date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS day_no
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
            GROUP BY 1, 3
        )
        SELECT strftime(dt, '%Y-%m-%d') AS dt, gmv,
               ROUND(CAST(SUM(gmv) OVER w AS DOUBLE) / COUNT(*) OVER w, 2) AS gmv_7d_avg,
               CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
        FROM daily
        WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "inactive_customers": """
        WITH tagged AS (
            SELECT c_nationkey,
                   CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                        THEN 1 ELSE 0 END AS is_active
            FROM customer c
        )
        SELECT n.n_name AS nation_name,
               CAST(SUM(CASE WHEN is_active = 0 THEN 1 ELSE 0 END) AS BIGINT) AS inactive_ct,
               CAST(SUM(CASE WHEN is_active = 1 THEN 1 ELSE 0 END) AS BIGINT) AS active_ct
        FROM tagged t JOIN nation n ON t.c_nationkey = n.n_nationkey
        GROUP BY 1
    """,
}
