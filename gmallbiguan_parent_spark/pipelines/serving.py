"""Serving layer — the 8 dashboard queries (SURVEY.md §2.4 A5-A11, §2.6).

Reference parity (paths under /root/reference, PUB/ =
gmall-publisher2/src/main/java/com/atguigu/gmall/):
- A5  GMV sum w/ day filter:      PUB/mapper/ProductStatsMapper.java:19-20
- A6  group-by+having+top-N ×3:   PUB/mapper/ProductStatsMapper.java:25-45
- A7  visitor rollup by new-flag: PUB/mapper/VisitorStatsMapper.java:14-16
- A8  hourly rollup w/ cond. sum: PUB/mapper/VisitorStatsMapper.java:24-27
- A9  weighted keyword score:     PUB/mapper/KeywordStatsMapper.java:16-21
- A10 province rollup:            PUB/mapper/ProvinceStatsMapper.java:14-16
- A11 derived ratio metrics:      PUB/bean/VisitorStats.java:37-66
- O1  order by ... desc limit N:  TakeOrderedAndProject in Spark

The ClickHouse idioms map 1:1: toYYYYMMDD → date_format, toHour → hour,
multiIf → chained when/otherwise. Every LIMIT query carries a total
order (measure DESC, key ASC tiebreak) so top-N is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table

GMV_MONTH = ("1997-03-01", "1997-04-01")


def gmv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: GMV per day over one month — `sum(order_amount) where
    toYYYYMMDD(stt)=date` generalized to a grouped day report. The date
    filter is pushed into the parquet scan (partition pruning on a
    date-partitioned gold table at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderdate") >= GMV_MONTH[0]) & (F.col("o_orderdate") < GMV_MONTH[1]))
        .groupBy(F.date_format("o_orderdate", "yyyyMMdd").alias("dt"))
        .agg(F.sum(dec("o_totalprice")).alias("order_amount"))
    )


def sugar_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 serving shell: the Sugar dashboard's JSON response envelope —
    the reference's REST layer wraps every mapper result in
    {status, msg, data:{categories, series}}
    (PUB/controller/SugarController.java:33-469, the GMV endpoint's
    big-string concat). Here the shaping is pure SQL over gmv_daily:
    day keys become `categories`, amounts (in exact integer cents)
    become the aligned `series`, serialized with to_json — byte-
    identical between Spark and DuckDB, so the envelope itself is
    oracle-gated. An HTTP layer would return this string verbatim;
    it contributes no query semantics."""
    gmv = gmv_daily(spark, sf_dir)
    rows = gmv.select(
        "dt",
        F.round(F.col("order_amount") * 100).cast("long").alias("cents"),
    )
    packed = rows.agg(F.sort_array(F.collect_list(F.struct("dt", "cents"))).alias("s"))
    return packed.select(
        F.to_json(F.struct(
            F.lit(0).alias("status"),
            F.lit("success").alias("msg"),
            F.struct(
                F.transform("s", lambda r: r.dt).alias("categories"),
                F.transform("s", lambda r: r.cents).alias("series"),
            ).alias("data"),
        )).alias("envelope")
    )


def top_trademarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/O1: `group by tm having sum(order_amount)>0 order by desc
    limit N` — brand ≈ trademark. Spark plans TakeOrderedAndProject
    (no global sort of the full aggregate). Tiebreak on tm_name keeps
    the limit deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy(F.col("p_brand").alias("tm_name"))
        .agg(F.sum(dec("l_extendedprice")).alias("order_amount"))
        .filter(F.col("order_amount") > 0)
        .orderBy(F.desc("order_amount"), F.asc("tm_name"))
        .limit(10)
    )


def top_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (category3 variant): top part types by amount + distinct order
    count (the spu flavor also sums order_ct,
    PUB/mapper/ProductStatsMapper.java:42-45)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy(F.col("p_type").alias("category_name"))
        .agg(
            F.sum(dec("l_extendedprice")).alias("order_amount"),
            F.countDistinct("l_orderkey").alias("order_ct"),
        )
        .filter(F.col("order_amount") > 0)
        .orderBy(F.desc("order_amount"), F.asc("category_name"))
        .limit(10)
    )


def top_spus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (SPU variant): `group by spu_id,spu_name` with BOTH
    `sum(order_amount)` AND `sum(order_ct)`, having, desc limit —
    PUB/mapper/ProductStatsMapper.java:42-46. The two-aggregate shape is
    what distinguishes it from the trademark/category3 reads: the
    reference sums *pre-aggregated* per-window order counts from the
    stats table, so the twin is two-level — a daily product-stats
    aggregate (amount + exact distinct order count per spu per day),
    then a SPU rollup summing both measures. spu ≈ (p_partkey, p_name):
    the id+name grouping pair the reference uses. Both groupBys share
    the spu key prefix, so AQE coalesces them into one shuffle exchange
    reused across levels; countDistinct stays in the daily layer where
    cardinality per group is small."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy(
            F.col("p_partkey").alias("spu_id"),
            F.col("p_name").alias("spu_name"),
            F.to_date("l_shipdate").alias("dt"),
        )
        .agg(
            F.sum(dec("l_extendedprice")).alias("day_amount"),
            F.countDistinct("l_orderkey").alias("day_ct"),
        )
    )
    return (
        daily.groupBy("spu_id", "spu_name")
        .agg(
            F.sum("day_amount").alias("order_amount"),
            F.sum("day_ct").alias("order_ct"),
        )
        .filter(F.col("order_amount") > 0)
        .orderBy(F.desc("order_amount"), F.asc("spu_id"))
        .limit(10)
    )


def visitor_new_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: measures grouped by is_new flag. is_new derives from the P8
    repair (first-seen day) — new visitors are users on their first
    active day."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    flagged = (
        ev.select("user_id", "event_id", F.col("value"), F.to_date("ts").alias("dt"))
        .withColumn("first_dt", F.min("dt").over(w))
        .withColumn("is_new", F.when(F.col("dt") == F.col("first_dt"), "1").otherwise("0"))
    )
    return flagged.groupBy("is_new").agg(
        F.count("*").alias("pv_ct"),
        F.countDistinct("user_id").alias("uv_ct"),
        F.sum(dec("value")).alias("value_sum"),
    )


def visitor_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: hourly rollup with conditional sums — `sum(if(is_new='1',
    uv_ct,0)) ... group by toHour(stt)`. hour() on the event time,
    when/otherwise for the conditional measure."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hr"))
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("buy_ct"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("err_ct"),
        )
    )


def keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: weighted score — `sum(ct * multiIf(source='SEARCH',10,...))`.
    The multiIf becomes a when/otherwise chain over event_type; the
    JSON `k` field plays the keyword."""
    ev = load_table(spark, sf_dir, "events")
    weight = (
        F.when(F.col("event_type") == "purchase", 10)
        .when(F.col("event_type") == "click", 3)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(0)
    )
    return (
        ev.withColumn("keyword", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("keyword").isNotNull())
        .groupBy("keyword")
        .agg(F.sum(weight).alias("score"))
        .orderBy(F.desc("score"), F.asc("keyword"))
        .limit(20)
    )


def province_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: `sum(order_amount) group by province_id, province_name` —
    nation-level amount rollup via broadcast dims."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy(F.col("n_nationkey").alias("province_id"), F.col("n_name").alias("province_name"))
        .agg(F.sum(dec("o_totalprice")).alias("order_amount"))
    )


def bounce_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: derived ratio metrics with HALF_UP rounding — bounce rate
    `uj*100/sv`, avg value per event — computed as decimal expressions
    exactly like PUB/bean/VisitorStats.java:40-63 (scale 2). Ratios are
    decimal-divided then rounded so both engines round identical exact
    values."""
    from .dwm import JUMP_TIMEOUT_S
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = (
        ev.select("user_id", "event_id", "ts", "value", F.to_date("ts").alias("dt"))
        .withColumn("next_ts", F.lead("ts").over(w))
        .withColumn(
            "is_jump",
            (F.col("next_ts").isNull()
             | (F.unix_micros("next_ts") - F.unix_micros("ts") > JUMP_TIMEOUT_S * 1_000_000)).cast("int"),
        )
    )
    daily = base.groupBy("dt").agg(
        F.count("*").alias("pv_ct"),
        F.sum("is_jump").alias("uj_ct"),
        F.sum(dec("value")).alias("value_sum"),
    )
    # ratios divide in DOUBLE on both engines (the gmv_7d_moving_avg
    # recipe): decimal quotients round differently between Spark and
    # DuckDB, and the sum keeps its native decimal(28,4) width so large
    # SFs can't overflow-NULL a narrowing cast.
    return daily.select(
        "dt", "pv_ct", "uj_ct",
        F.round(F.col("uj_ct").cast("double") * 100 / F.col("pv_ct"), 2)
        .alias("bounce_rate"),
        F.round(F.col("value_sum").cast("double") / F.col("pv_ct"), 2)
        .alias("value_per_pv"),
    )


QUERIES = {
    "gmv_daily": gmv_daily,
    "sugar_envelope": sugar_envelope,
    "top_trademarks": top_trademarks,
    "top_categories": top_categories,
    "top_spus": top_spus,
    "visitor_new_rollup": visitor_new_rollup,
    "visitor_hourly": visitor_hourly,
    "keyword_score": keyword_score,
    "province_rollup": province_rollup,
    "bounce_ratio": bounce_ratio,
}

ORACLES = {
    "gmv_daily": """
        SELECT strftime(o_orderdate, '%Y%m%d') AS dt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    """,
    "sugar_envelope": """
        WITH g AS (
            SELECT strftime(o_orderdate, '%Y%m%d') AS dt,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS amt
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT CAST(to_json(struct_pack(
                   status := 0,
                   msg := 'success',
                   data := struct_pack(
                       -- COALESCE: DuckDB list() over zero rows is NULL,
                       -- Spark collect_list is [] — match Spark's []
                       categories := COALESCE(list(dt ORDER BY dt), []),
                       series := COALESCE(list(CAST(ROUND(amt * 100) AS BIGINT) ORDER BY dt), [])
                   ))) AS VARCHAR) AS envelope
        FROM g
    """,
    "top_trademarks": """
        SELECT p.p_brand AS tm_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
        HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) > 0
        ORDER BY order_amount DESC, tm_name ASC
        LIMIT 10
    """,
    "top_categories": """
        SELECT p.p_type AS category_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount,
               CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS order_ct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
        HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) > 0
        ORDER BY order_amount DESC, category_name ASC
        LIMIT 10
    """,
    "top_spus": """
        WITH daily AS (
            SELECT p.p_partkey AS spu_id, p.p_name AS spu_name,
                   CAST(l.l_shipdate AS DATE) AS dt,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS day_amount,
                   COUNT(DISTINCT l.l_orderkey) AS day_ct
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2, 3
        )
        SELECT spu_id, spu_name,
               CAST(SUM(day_amount) AS DECIMAL(18,4)) AS order_amount,
               CAST(SUM(day_ct) AS BIGINT) AS order_ct
        FROM daily
        GROUP BY 1, 2
        HAVING SUM(day_amount) > 0
        ORDER BY order_amount DESC, spu_id ASC
        LIMIT 10
    """,
    "visitor_new_rollup": """
        WITH flagged AS (
            SELECT user_id, value,
                   CAST(ts AS DATE) AS dt,
                   MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_dt
            FROM events
        )
        SELECT CASE WHEN dt = first_dt THEN '1' ELSE '0' END AS is_new,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_sum
        FROM flagged GROUP BY 1
    """,
    "visitor_hourly": """
        SELECT CAST(hour(ts) AS INTEGER) AS hr,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_ct,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS buy_ct,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err_ct
        FROM events GROUP BY 1
    """,
    "keyword_score": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS keyword,
               CAST(SUM(CASE event_type WHEN 'purchase' THEN 10 WHEN 'click' THEN 3
                        WHEN 'view' THEN 2 WHEN 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY 1
        ORDER BY score DESC, keyword ASC
        LIMIT 20
    """,
    "province_rollup": """
        SELECT n.n_nationkey AS province_id, n.n_name AS province_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS order_amount
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    """,
    "bounce_ratio": """
        WITH j AS (
            SELECT user_id, event_id, ts, value, CAST(ts AS DATE) AS dt,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
            FROM events
        ), daily AS (
            SELECT dt,
                   CAST(COUNT(*) AS BIGINT) AS pv_ct,
                   CAST(SUM(CASE WHEN next_ts IS NULL
                            OR epoch_us(next_ts) - epoch_us(ts) > 600 * 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_sum
            FROM j GROUP BY dt
        )
        SELECT dt, pv_ct, uj_ct,
               ROUND(CAST(uj_ct AS DOUBLE) * 100 / pv_ct, 2) AS bounce_rate,
               ROUND(CAST(value_sum AS DOUBLE) / pv_ct, 2) AS value_per_pv
        FROM daily
    """,
}
