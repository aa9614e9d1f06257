"""Headline analytical queries over the star schema (benchmark drivers).

These exercise the same operator classes as the reference's DWS/serving
surface (multi-way joins, grouped exact aggregation, top-N) at the
largest table sizes, so they anchor bench.py. Shapes follow the classic
pricing-summary / shipping-priority / local-supplier-volume patterns
re-expressed on the driver testdata schema.

Scale notes (100 TB): lineitem-side scans carry pushed filters; every
dim join is broadcast; the aggregates are partial/final hash aggs with a
single shuffle on the group keys; top-N plans as TakeOrderedAndProject
(no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shape: grouped pricing summary with decimal-exact sums and
    rounded averages over a shipdate-filtered lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    charge = (dec("l_extendedprice") * (1 - dec("l_discount")) * (1 + dec("l_tax"))).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape: segment-filtered customer ⋈ orders ⋈ lineitem, top 10
    orders by discounted revenue. Customer dim broadcasts; the orders ⋈
    lineitem join shuffles on the order key (at 100 TB both sides would
    be bucketed on the key to make this co-located)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)"))
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("order_id"))
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shape: six-way join (lineitem⋈orders⋈customer⋈supplier⋈nation
    ⋈region) where supplier and customer share a nation; revenue per
    nation. All dims broadcast; one shuffle for the orders join + one
    for the final groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "inner")
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum((dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)"))
            .alias("revenue")
        )
    )


def late_shipment_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shape: EXISTS correlated subquery — orders in a quarter that
    have at least one line item shipped more than 60 days after the
    order date, counted per priority. Exercises Catalyst's subquery
    decorrelation: the EXISTS rewrites to a left-semi hash join on
    l_orderkey (one shuffle each side at scale; the quarter filter is
    pushed to the orders scan)."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o.o_orderpriority AS priority, COUNT(*) AS order_ct
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
        GROUP BY o.o_orderpriority
    """)


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shape: correlated *scalar* subquery — revenue from line items
    whose quantity is below half the average quantity for their part,
    over two brands. Catalyst decorrelates the scalar AVG into a
    per-partkey aggregate joined back to lineitem; the brand filter
    broadcasts through the part dim. (l_quantity is integral, so the
    double AVG is exact and the < comparison is deterministic.)"""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS small_qty_revenue,
               COUNT(*) AS line_ct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2')
          AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """)


def price_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: orders banded by a small range table joined on
    o_totalprice BETWEEN lo AND hi. With no equality key Spark plans a
    BroadcastNestedLoopJoin — correct and cheap ONLY because the band
    table is tiny (each row scans 4 bands); at scale, if the bands were
    many, the scan-stage alternative is a when/otherwise chain or a
    width_bucket expression, trading the join for pure projection."""
    bands = spark.createDataFrame(
        [("low", 0.0, 50_000.0), ("mid", 50_000.0, 150_000.0),
         ("high", 150_000.0, 300_000.0), ("whale", 300_000.0, 1e12)],
        "band string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("order_ct"),
            F.sum(dec("o_totalprice")).alias("gmv"),
        )
    )


def order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact: per-order lifecycle milestones —
    first/last line shipment, fulfillment spans in days, line count.
    One shuffle on the order key for the lineitem rollup, then a
    co-keyed join back to orders (bucketed co-location at scale).
    Bounded to one quarter of orders so the result stays small."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count("*").alias("line_ct"),
    )
    j = orders.join(ship, orders.o_orderkey == ship.l_orderkey, "inner")
    return j.select(
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_dt"),
        F.to_date("first_ship").alias("first_ship_dt"),
        F.to_date("last_ship").alias("last_ship_dt"),
        F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate")).alias("days_to_first_ship"),
        F.datediff(F.to_date("last_ship"), F.to_date("first_ship")).alias("ship_span_days"),
        "line_ct",
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shape: promotion revenue share within one shipdate month — a
    conditional-aggregate ratio over lineitem⋈part. The month filter is
    pushed into the lineitem parquet scan, part broadcasts, and the two
    revenue sums stay exact decimal until the final double division
    (the proven ratio recipe)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("promo_revenue"),
            F.sum(disc).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue", "total_revenue",
        F.round(
            F.col("promo_revenue").cast("double") * 100 / F.col("total_revenue").cast("double"), 2
        ).alias("promo_pct"),
    )


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shape: revenue matching three OR'd (brand × part-size ×
    quantity) branches. The disjunction mixes columns from BOTH join
    sides, so it evaluates post-join, while the per-side implications
    Catalyst can extract (and the partkey equi-join itself) still prune;
    part broadcasts and the whole thing is one scan + one conditional
    aggregate — the optimizer showcase of the original Q19."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(16, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(31, 50) & q.between(20, 30))
    )
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .filter(cond)
        .agg(
            F.sum(disc).alias("revenue"),
            F.count("*").alias("line_ct"),
        )
    )


def two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shape: shipping volume between two nations — supplier nation ⋈
    customer nation with a DISJUNCTIVE cross-pair condition ((N1→N2) OR
    (N2→N1)), revenue per (supp_nation, cust_nation, ship_year). The
    disjunction references both join sides so it evaluates post-join,
    but each nation dim broadcasts and the only shuffles are the
    lineitem⋈orders key join and the final 3-key groupBy — the plan the
    original Q7 is designed to elicit."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "inner"
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner"
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"), "inner")
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(disc).alias("revenue"), F.count("*").alias("line_ct"))
    )


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shape: top 20 customers by revenue lost to returns
    (l_returnflag = 'R') in a half-year window, with their nation. The
    returnflag + date filters push into the scans, customer and nation
    broadcast, and the top-20 plans as TakeOrderedAndProject over the
    per-customer aggregate (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(disc).alias("returned_revenue"), F.count("*").alias("returned_lines"))
        .orderBy(F.desc("returned_revenue"), F.asc("customer_id"))
        .limit(20)
    )


def ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shape: order-priority counts per shipping-delay bucket — the
    conditional CASE-sum split of high (1-URGENT/2-HIGH) vs low
    priority, bucketed by days between order and ship date (the
    testdata schema has no shipmode/commitdate, so the delay bucket
    plays Q12's shipmode role). One lineitem⋈orders key join, bucket
    derived in projection, one small groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay > 60, "late").when(delay > 30, "slow").otherwise("ontime")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .select(bucket.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_priority_ct"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_priority_ct"),
        )
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shape: distinct-supplier counts per (brand, type, size) with
    a NOT IN exclusion subquery. The lineitem (partkey, suppkey) pairs
    stand in for partsupp; the NOT IN plans as Spark's NULL-AWARE anti
    join (s_suppkey is non-null, so it degenerates to a broadcast anti
    join — the planner feature this query exists to exercise). The
    count(distinct) is a two-phase exact distinct aggregate."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p.p_brand AS brand, p.p_type AS part_type, p.p_size AS part_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_ct
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """)


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shape: suppliers who were the LAST to ship on finalized
    multi-supplier orders — a doubly-correlated EXISTS (another supplier
    participated) + NOT EXISTS (no other supplier shipped later). Both
    subqueries decorrelate to semi/anti joins of lineitem against
    itself on the order key; at scale all three lineitem legs shuffle
    on l_orderkey once (co-partitioned), and the supplier dim
    broadcasts. Top 10 by count with name tiebreak."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s.s_name AS supplier_name, COUNT(*) AS waiting_ct
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY waiting_ct DESC, supplier_name ASC
        LIMIT 10
    """)


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shape: for each small part, the supplier(s) offering its
    MINIMUM unit cost — a correlated scalar-MIN subquery that Catalyst
    decorrelates into a per-part aggregate joined back on (partkey,
    cost) equality. Unit cost is extendedprice/quantity (the lineitem
    bridge stands in for partsupp.ps_supplycost); IEEE division and MIN
    are bit-deterministic on both engines, so the equality join-back
    is exact. Ordered by supplier balance like the original."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH cost AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT p.p_partkey AS part_id, p.p_brand AS brand, s.s_name AS supplier_name,
               s.s_acctbal AS acctbal, c.unit_cost AS unit_cost
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        WHERE p.p_size <= 10
          AND c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                             WHERE c2.l_partkey = p.p_partkey)
        ORDER BY acctbal DESC, part_id ASC, supplier_name ASC
        LIMIT 25
    """)


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shape: the supplier(s) with MAXIMUM quarterly revenue — an
    aggregate view referenced twice (once as the join input, once under
    MAX) with an equality filter against the scalar. Catalyst computes
    the revenue aggregate, broadcasts the 1-row MAX, and the equality
    compares exact decimals, so ties surface deterministically (the
    original Q15's correctness subtlety)."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY supplier_id ASC
    """)


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shape: parts whose shipped value exceeds a FRACTION of the
    corpus-adaptive threshold (1.5x the mean part value) — a grouped
    aggregate filtered against a scalar subquery over the same
    aggregate. The per-part sums stay exact
    decimal; only the threshold comparison happens in double (identical
    cast + multiply on both engines)."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH pv AS (
            SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS part_value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey AS part_id, part_value
        FROM pv
        WHERE CAST(part_value AS DOUBLE) >
              (SELECT CAST(SUM(part_value) AS DOUBLE) / COUNT(*) * 1.5 FROM pv)
        ORDER BY part_value DESC, part_id ASC
    """)


def promo_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shape: suppliers who shipped a LARGE volume of promo parts —
    nested IN chains (supplier IN (grouped-HAVING subquery whose rows
    filter on part IN (...))). Both INs decorrelate to left-semi joins;
    the inner HAVING aggregate groups on (suppkey, partkey) — the
    partsupp grain. Quantities FLOOR before the integer cast because
    CAST(DOUBLE AS BIGINT) truncates in Spark but rounds in DuckDB —
    FLOOR is engine-identical."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 50
        )
        ORDER BY supplier_id ASC
    """)


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shape: one nation's share of regional revenue per year — a
    conditional-sum ratio over the full multi-way join (lineitem ⋈
    orders ⋈ customer ⋈ nation ⋈ region on the customer side, supplier
    joined for the share predicate). Numerator and denominator stay
    exact decimal per year; the share divides in double (the proven
    ratio recipe)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey, "inner")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .filter(F.col("r_name") == "ASIA")
    )
    agg = j.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(
            F.when(F.col("s_nationkey") == 1, disc).otherwise(zero)
        ).alias("nation_revenue"),
        F.sum(disc).alias("region_revenue"),
    )
    return agg.select(
        "order_year", "nation_revenue", "region_revenue",
        F.round(
            F.col("nation_revenue").cast("double") / F.col("region_revenue").cast("double"), 6
        ).alias("market_share"),
    )


def product_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shape: profit per supplier-nation per year over a part-name
    filtered join. Profit = discounted revenue minus a quantity-scaled
    cost (retailprice stands in for ps_supplycost); every term stays
    exact decimal through the two-key groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    # Unit cost = 10% of retail, derived in DOUBLE (IEEE-identical on
    # both engines) then cast through the repo-standard dec() edge;
    # quantity FLOORs before the integer cast (Spark truncates, DuckDB
    # rounds). Decimal products/differences stay exact from there.
    unit_cost = (F.col("p_retailprice") * 0.1).cast("decimal(18,4)")
    qty = F.floor("l_quantity").cast("long")
    profit = (
        dec("l_extendedprice") * (1 - dec("l_discount")) - unit_cost * qty
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "inner")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey, "inner")
        .join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(profit).alias("profit"), F.count("*").alias("line_ct"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shape: the distribution of orders-per-customer INCLUDING
    zero-order customers — a LEFT OUTER join aggregated twice (count
    per customer, then customers per count). The outer join keeps the
    null group (order_ct = 0 bucket); two cheap key-partitioned
    aggregates, no skew (counts are bounded)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_ct"))
    )
    return (
        per_cust.groupBy("order_ct")
        .agg(F.count("*").alias("customer_ct"))
        .orderBy(F.desc("customer_ct"), F.desc("order_ct"))
    )


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shape: pure scan-side filter + single aggregate — the
    predicate-pushdown showcase (year x discount-band x quantity cap,
    all reaching the parquet scan; no join, no groupBy key, one
    partial/final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,6)"))
            .alias("forecast_revenue"),
            F.count("*").alias("line_ct"),
        )
    )


LARGE_ORDER_QTY = 250


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shape: customers who placed very large orders — the
    group-then-semi-join showcase: the lineitem aggregate finds order
    keys whose total quantity exceeds the threshold (a HAVING over the
    fact table), and only those keys join orders and customer. At
    scale the qualifying key set is tiny, so the planner turns the
    orders/customer side into broadcast-range joins; the only
    corpus-scale work is the one quantity aggregate (map-side
    partial). Total order (o_totalprice DESC, o_orderkey) before the
    LIMIT makes the top-20 deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            dec("o_totalprice").alias("o_totalprice"),
            F.col("sum_qty").cast("decimal(28,4)").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


DORMANT_SINCE = "1998-06-01"


def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shape: customers with ABOVE-AVERAGE positive account balance
    and NO RECENT orders (none since DORMANT_SINCE), rolled up per
    nation — the scalar-subquery + anti-join showcase (TPC-H groups by
    phone country code and requires no orders ever; this schema has no
    phone and every customer orders, so nation plays the code's role
    and recency plays dormancy's). The average is a 1-row broadcast
    computed decimal-exact (sum of decimal / count, rounded once at
    6 dp) so the balance cut is engine-identical; the anti join keys
    on custkey — at scale the customer dim shuffles once against the
    filtered orders key projection (the date filter pushes to the
    scan), no broadcast of the big side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        F.round(
            F.sum(dec("c_acctbal")).cast("double") / F.count("*"), 6
        ).cast("decimal(18,6)").alias("ab")
    )
    recent = orders.filter(F.col("o_orderdate") >= DORMANT_SINCE).select(
        F.col("o_custkey").alias("c_custkey")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(dec("c_acctbal") > F.col("ab"))
        .join(recent, "c_custkey", "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count("*").alias("cust_ct"),
        F.sum(dec("c_acctbal")).cast("decimal(28,4)").alias("bal_sum"),
    )


QUERIES = {
    "pricing_summary": pricing_summary,
    "large_volume_customers": large_volume_customers,
    "dormant_rich_customers": dormant_rich_customers,
    "forecast_revenue_change": forecast_revenue_change,
    "price_band_stats": price_band_stats,
    "order_lifecycle": order_lifecycle,
    "shipping_priority": shipping_priority,
    "local_supplier_volume": local_supplier_volume,
    "late_shipment_check": late_shipment_check,
    "small_qty_revenue": small_qty_revenue,
    "promo_revenue_share": promo_revenue_share,
    "disjunctive_revenue": disjunctive_revenue,
    "two_nation_volume": two_nation_volume,
    "returned_item_report": returned_item_report,
    "ship_delay_priority": ship_delay_priority,
    "supplier_part_counts": supplier_part_counts,
    "waiting_suppliers": waiting_suppliers,
    "min_cost_supplier": min_cost_supplier,
    "top_revenue_supplier": top_revenue_supplier,
    "important_part_values": important_part_values,
    "promo_stock_suppliers": promo_stock_suppliers,
    "nation_market_share": nation_market_share,
    "product_profit_rollup": product_profit_rollup,
    "customer_order_distribution": customer_order_distribution,
}

ORACLES = {
    "large_volume_customers": f"""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {LARGE_ORDER_QTY}
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               CAST(o.o_totalprice AS DECIMAL(18,4)) AS o_totalprice,
               b.sum_qty
        FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
                   JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    "dormant_rich_customers": f"""
        WITH ab AS (
            SELECT CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
                        AS DECIMAL(18,6)) AS ab
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS cust_ct,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS bal_sum
        FROM customer, ab
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) > ab
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{DORMANT_SINCE}'
          )
        GROUP BY c_nationkey
    """,
    "promo_revenue_share": """
        WITH j AS (
            SELECT CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS disc,
                   p.p_type
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
        ), agg AS (
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS promo_revenue,
                   CAST(SUM(disc) AS DECIMAL(28,6)) AS total_revenue
            FROM j
        )
        SELECT promo_revenue, total_revenue,
               ROUND(CAST(promo_revenue AS DOUBLE) * 100 / CAST(total_revenue AS DOUBLE), 2) AS promo_pct
        FROM agg
    """,
    "disjunctive_revenue": """
        SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 16 AND 30 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_disc_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))
                    * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_charge,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l.l_orderkey AS order_id,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               o.o_orderpriority AS priority,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderdate < TIMESTAMP '1998-01-01'
        JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
        WHERE l.l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, order_id ASC
        LIMIT 10
    """,
    "price_band_stats": """
        WITH bands(band, lo, hi) AS (
            VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                   ('high', 150000.0, 300000.0), ('whale', 300000.0, 1e12)
        )
        SELECT b.band,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS gmv
        FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY 1
    """,
    "order_lifecycle": """
        WITH ship AS (
            SELECT l_orderkey, MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
                   CAST(COUNT(*) AS BIGINT) AS line_ct
            FROM lineitem GROUP BY 1
        )
        SELECT o.o_orderkey AS order_id,
               CAST(o.o_orderdate AS DATE) AS order_dt,
               CAST(s.first_ship AS DATE) AS first_ship_dt,
               CAST(s.last_ship AS DATE) AS last_ship_dt,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(s.first_ship AS DATE)) AS INTEGER) AS days_to_first_ship,
               CAST(date_diff('day', CAST(s.first_ship AS DATE), CAST(s.last_ship AS DATE)) AS INTEGER) AS ship_span_days,
               line_ct
        FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
    """,
    "late_shipment_check": """
        SELECT o.o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o.o_orderpriority
    """,
    "small_qty_revenue": """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS small_qty_revenue,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2')
          AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """,
    "two_nation_volume": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "returned_item_report": """
        SELECT c.c_custkey AS customer_id, c.c_name AS customer_name, n.n_name AS nation_name,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS returned_revenue,
               CAST(COUNT(*) AS BIGINT) AS returned_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
            AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY returned_revenue DESC, customer_id ASC
        LIMIT 20
    """,
    "ship_delay_priority": """
        SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 60 THEN 'late'
                    WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 30 THEN 'slow'
                    ELSE 'ontime' END AS delay_bucket,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_ct,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_ct
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "supplier_part_counts": """
        SELECT p.p_brand AS brand, p.p_type AS part_type, p.p_size AS part_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_ct
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "waiting_suppliers": """
        SELECT s.s_name AS supplier_name, CAST(COUNT(*) AS BIGINT) AS waiting_ct
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY waiting_ct DESC, supplier_name ASC
        LIMIT 10
    """,
    "min_cost_supplier": """
        WITH cost AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT p.p_partkey AS part_id, p.p_brand AS brand, s.s_name AS supplier_name,
               s.s_acctbal AS acctbal, c.unit_cost AS unit_cost
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        WHERE p.p_size <= 10
          AND c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                             WHERE c2.l_partkey = p.p_partkey)
        ORDER BY acctbal DESC, part_id ASC, supplier_name ASC
        LIMIT 25
    """,
    "top_revenue_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY supplier_id ASC
    """,
    "important_part_values": """
        WITH pv AS (
            SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS part_value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey AS part_id, part_value
        FROM pv
        WHERE CAST(part_value AS DOUBLE) >
              (SELECT CAST(SUM(part_value) AS DOUBLE) / COUNT(*) * 1.5 FROM pv)
        ORDER BY part_value DESC, part_id ASC
    """,
    "promo_stock_suppliers": """
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 50
        )
        ORDER BY supplier_id ASC
    """,
    "nation_market_share": """
        WITH j AS (
            SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
                   s.s_nationkey,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS disc
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
                AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        ), agg AS (
            SELECT CAST(order_year AS INTEGER) AS order_year,
                   CAST(SUM(CASE WHEN s_nationkey = 1 THEN disc ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS nation_revenue,
                   CAST(SUM(disc) AS DECIMAL(28,6)) AS region_revenue
            FROM j GROUP BY 1
        )
        SELECT order_year, nation_revenue, region_revenue,
               ROUND(CAST(nation_revenue AS DOUBLE) / CAST(region_revenue AS DOUBLE), 6) AS market_share
        FROM agg
    """,
    "product_profit_rollup": """
        SELECT n.n_name AS nation_name,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
               CAST(SUM(CAST(
                   CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                   - CAST(p.p_retailprice * 0.1 AS DECIMAL(18,4)) * CAST(FLOOR(l.l_quantity) AS BIGINT)
               AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS profit,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """,
    "customer_order_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_ct
            FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1
        )
        SELECT order_ct, CAST(COUNT(*) AS BIGINT) AS customer_ct
        FROM per_cust GROUP BY 1
        ORDER BY customer_ct DESC, order_ct DESC
    """,
    "forecast_revenue_change": """
        SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS forecast_revenue,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "local_supplier_volume": """
        SELECT n.n_name AS nation_name,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
            AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        GROUP BY 1
    """,
}
