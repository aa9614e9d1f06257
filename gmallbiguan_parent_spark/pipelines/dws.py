"""DWS layer — windowed aggregates (SURVEY.md §2.4, §2.8-2.9).

Reference parity (paths under /root/reference):
- A1 visitor stats window agg:  RT/app/dws2/VisitorStatsApp.java:190-240
- A2 product stats w/ exact distinct sets: RT/app/dws2/ProductStatsApp.java:280-335
- A3 province stats SQL tumble + count(distinct): RT/app/dws2/ProvinceStatsSqlApp.java:65-80
- A4 keyword window count:      RT/app/dws2/KeywordStatspp.java:64-70
- U1 ik_analyze UDTF:           RT/app/func/KeywordUDTF.java:12-22
- U2 column-to-row unpivot:     RT/app/func/KeywordProductC2RUDTF.java:11-35
- ST5 tumbling windows:         RT/app/dws2/VisitorStatsApp.java:213

The reference's 10 s tumbling windows become F.window(ts, ...) — width
here is 10 minutes because the testdata event stream is sparser than an
app log; the plan shape (event-time tumble + groupBy dims + exact
countDistinct) is identical. Java Set-based distinct accumulation (A2)
maps to countDistinct, which Spark executes as a partial/final two-phase
aggregate (no driver-side set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec, tokenize
from ..io import load_table, load_table_spread

WINDOW = "10 minutes"


def visitor_stats_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/ST5: union-of-streams visitor stats. The reference unions 4
    streams keyed by (ar,ch,vc,is_new) into 10 s tumbles; here the dim
    key is event_type and pv/uv/value_sum are the measures. One shuffle:
    groupBy(window, event_type) with partial aggregation map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.sum(dec("value")).cast("decimal(18,4)").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("stt"),
            F.col("w.end").alias("edt"),
            "event_type", "pv_ct", "uv_ct", "value_sum",
        )
    )


def province_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: province-level order rollup — `count(distinct order_id)`,
    `sum(split_total_amount)` grouped by province dims
    (RT/app/dws2/ProvinceStatsSqlApp.java:65-80). Nation plays province.
    Dims broadcast; the only shuffle is the final groupBy, and
    countDistinct(o_orderkey) keeps exact Set semantics (A2)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy(
            F.col("n_nationkey").alias("province_id"),
            F.col("n_name").alias("province_name"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(dec("o_totalprice")).cast("decimal(18,4)").alias("order_amount"),
        )
    )


def product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+J4: product stats with exact distinct order counts. The
    reference reduces 7 streams into per-sku windows, accumulating
    order-id Sets for exact distinct (RT/app/bean2/ProductStats.java:77-87)
    then enriches 4 dims. Here: lineitem rolled up per part with
    countDistinct(l_orderkey), then broadcast-joined to part dims —
    aggregate FIRST, enrich AFTER, so the dim join runs on the small
    aggregated side exactly like the reference
    (RT/app/dws2/ProductStatsApp.java:337-411)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = li.groupBy(F.col("l_partkey").alias("sku_id")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("order_sku_num"),
        F.sum(dec("l_extendedprice")).cast("decimal(18,4)").alias("order_amount"),
        F.countDistinct("l_orderkey").alias("order_ct"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", dec("l_extendedprice")).otherwise(F.lit(0).cast("decimal(18,4)"))
        ).cast("decimal(18,4)").alias("refund_amount"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_orderkey"))
        ).alias("refund_order_ct"),
    )
    return (
        agg.join(F.broadcast(part), agg.sku_id == part.p_partkey, "left")
        .select(
            "sku_id",
            F.col("p_name").alias("sku_name"),
            F.col("p_brand").alias("tm_name"),
            dec("p_retailprice").alias("sku_price"),
            "order_sku_num", "order_amount", "order_ct",
            "refund_amount", "refund_order_ct",
        )
    )


def keyword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+A4: tokenize → explode → count per keyword, the lateral-UDTF
    keyword pipeline (RT/app/dws2/KeywordStatspp.java:52-70) on the
    documents table. tokenize is regexp_extract_all (codegen'd), not a
    Python UDF; `source` is the doc source, mirroring the constant
    source='SEARCH' column."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(tokenize("text")).alias("keyword"))
        .filter(F.length("keyword") >= 2)
        .groupBy("keyword", "source")
        .agg(F.count("*").alias("ct"))
    )


def keyword_c2r_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: column-to-row unpivot. The reference's KeywordProductC2RUDTF
    turns (click_ct, cart_ct, order_ct) into rows tagged CLICK/CART/ORDER,
    emitting only positive counts (RT/app/func/KeywordProductC2RUDTF.java:20-34).
    Pure built-in: conditional counts per day, then stack() + filter>0."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("click_ct"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("cart_ct"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("order_ct"),
    )
    return (
        daily.select(
            "dt",
            F.expr("stack(3, 'CLICK', click_ct, 'CART', cart_ct, 'ORDER', order_ct) AS (source, ct)"),
        )
        .filter(F.col("ct") > 0)
    )


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-to-column pivot (the inverse of the U2 unpivot): daily event
    counts pivoted into one column per event type. Explicit pivot values
    keep the plan single-pass (no distinct-values pre-query)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("dt"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


QUERIES = {
    "visitor_stats_window": visitor_stats_window,
    "province_stats": province_stats,
    "product_stats": product_stats,
    "keyword_stats": keyword_stats,
    "keyword_c2r_stack": keyword_c2r_stack,
    "event_type_pivot": event_type_pivot,
}

ORACLES = {
    "visitor_stats_window": """
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS stt,
               time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS edt,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_sum
        FROM events GROUP BY 1, 2, 3
    """,
    "province_stats": """
        SELECT n.n_nationkey AS province_id,
               n.n_name AS province_name,
               CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    """,
    "product_stats": """
        WITH agg AS (
            SELECT l_partkey AS sku_id,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS order_sku_num,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS order_ct,
                   CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END), 0) AS DECIMAL(18,4)) AS refund_amount,
                   CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS BIGINT) AS refund_order_ct
            FROM lineitem GROUP BY 1
        )
        SELECT a.sku_id, p.p_name AS sku_name, p.p_brand AS tm_name,
               CAST(p.p_retailprice AS DECIMAL(18,4)) AS sku_price,
               a.order_sku_num, a.order_amount, a.order_ct,
               a.refund_amount, a.refund_order_ct
        FROM agg a LEFT JOIN part p ON a.sku_id = p.p_partkey
    """,
    "keyword_stats": """
        SELECT keyword, source, CAST(COUNT(*) AS BIGINT) AS ct
        FROM (
            SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS keyword
            FROM documents
        )
        WHERE length(keyword) >= 2
        GROUP BY keyword, source
    """,
    "event_type_pivot": """
        SELECT CAST(ts AS DATE) AS dt,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events GROUP BY 1
    """,
    "keyword_c2r_stack": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS dt,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cart_ct,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_ct
            FROM events GROUP BY 1
        ), stacked AS (
            SELECT dt, 'CLICK' AS source, click_ct AS ct FROM daily
            UNION ALL SELECT dt, 'CART', cart_ct FROM daily
            UNION ALL SELECT dt, 'ORDER', order_ct FROM daily
        )
        SELECT dt, source, ct FROM stacked WHERE ct > 0
    """,
}
