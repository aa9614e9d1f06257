"""DWD layer — parse, split, repair (SURVEY.md §2.2).

Reference parity (paths under /root/reference):
- P1 JSON parse map:        RT/app/dwd2/BaseLogApp2.java:63-69
- P5 3-way log split:       RT/app/dwd2/BaseLogApp2.java:116-166
- P8 new/old-visitor repair: RT/app/dwd2/BaseLogApp2.java:71-113
- P3 null/short filter:     RT/app/dwd2/BaseDBApp2.java:54-60
- P7 type normalization:    RT/app/func/TableProcessFunction.java:184-188

Mapped onto the driver testdata: the `events` table plays the behavior
log (`user_id`≈mid, `event_type`≈log type, `props`≈nested JSON payload).
All plans are declarative DataFrame ops — the JSON parse is
`get_json_object` (codegen'd), the split is filtered projections of one
scan, the repair is a window function instead of Flink keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table


def json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F1: parse the JSON `props` payload and aggregate by the
    extracted field — the from_json/get_json_object equivalent of the
    reference's fastjson map (RT/app/dwd2/BaseLogApp2.java:63-69).
    get_json_object stays inside whole-stage codegen; no Python UDF."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("k").isNotNull())  # P3: drop unparseable records
        .groupBy("k")
        .agg(
            F.count("*").alias("ev_ct"),
            F.sum(dec("value")).alias("value_sum"),
        )
    )


def log_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/O3: single-pass multi-output split. The reference routes one
    Kafka stream to start/page/display topics via side outputs
    (RT/app/dwd2/BaseLogApp2.java:116-166); here three filtered
    projections of ONE scan are tagged and re-unioned so the driver can
    hash-check the routing in a single result. Catalyst collapses the
    three branches into one scan read (verified via .explain)."""
    ev = load_table(spark, sf_dir, "events")
    start = ev.filter(F.col("event_type") == "signup").select(
        F.lit("start").alias("log_type"), "event_id", "user_id")
    page = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.lit("page").alias("log_type"), "event_id", "user_id")
    err = ev.filter(F.col("event_type") == "error").select(
        F.lit("err").alias("log_type"), "event_id", "user_id")
    union = start.unionByName(page).unionByName(err)
    return union.groupBy("log_type").agg(
        F.count("*").alias("ct"),
        F.countDistinct("user_id").alias("user_ct"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def is_new_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: new/old-visitor repair. The reference keeps per-mid first-visit
    date in keyed ValueState and rewrites is_new=1 -> 0 for returning
    devices (RT/app/dwd2/BaseLogApp2.java:71-113; note the reference
    discards the repaired stream — we implement the documented intent,
    SURVEY §7.5.2). Batch formulation: min(event_date) over user — a
    single shuffle by user_id, then a day-level rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    repaired = (
        ev.select("user_id", F.to_date("ts").alias("dt"))
        .withColumn("first_dt", F.min("dt").over(w))
        .withColumn("is_new", F.when(F.col("dt") == F.col("first_dt"), "1").otherwise("0"))
    )
    return repaired.groupBy("dt", "is_new").agg(
        F.count("*").alias("pv_ct"),
        F.countDistinct("user_id").alias("uv_ct"),
    )


def split_behavior_log(logs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """P5 on the reference's true nested log shape (FIXTURES.md §1,
    sample records RT/app/dwd2/BaseLogApp2.java:172-191): one parsed
    log DataFrame with `start`/`page` structs and a `displays` array
    splits into the three DWD outputs:

      start   — rows with a non-null start struct
      page    — rows with a page struct (the main stream)
      display — one row per displays[i], annotated with its page_id
                (the reference injects page_id into each display)

    Three filtered projections of ONE input; Catalyst shares the scan.
    The display branch is explode() — the F2/array side-output path."""
    start = logs.filter(F.col("start").isNotNull()).select(
        F.col("common.mid").alias("mid"), F.col("start.entry").alias("entry"), "ts"
    )
    page = logs.filter(F.col("start").isNull() & F.col("page").isNotNull()).select(
        F.col("common.mid").alias("mid"),
        F.col("page.page_id").alias("page_id"),
        F.col("page.last_page_id").alias("last_page_id"),
        F.col("page.during_time").alias("during_time"),
        "ts",
    )
    display = (
        logs.filter(F.col("displays").isNotNull())
        .select(
            F.col("common.mid").alias("mid"),
            F.col("page.page_id").alias("page_id"),
            F.explode("displays").alias("d"),
            "ts",
        )
        .select(
            "mid", "page_id",
            F.col("d.item").alias("item"),
            F.col("d.item_type").alias("item_type"),
            F.col("d.order").alias("display_order"),
            "ts",
        )
    )
    return start, page, display


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+P2+F4: re-serialize / re-parse. The reference formats beans
    back to JSON strings before Kafka (to_json of struct,
    RT/app/dwm2/OrderWideApp2.java:328-332) and parses datetime strings
    into epoch + derived date/hour columns on ingest (OrderInfo bean,
    RT/app/dwm2/OrderWideApp2.java:104-139). Round-trip: order →
    formatted create_time string → to_json → from_json → re-parse with
    to_timestamp → derive create_date / create_hour / create_ts."""
    orders = load_table(spark, sf_dir, "orders")
    serialized = orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
                F.col("o_totalprice").alias("total_amount"),
            )
        ).alias("payload"),
    )
    schema = "id bigint, create_time string, total_amount double"
    parsed = serialized.select(
        F.from_json("payload", schema).alias("j")
    ).select("j.id", "j.create_time", "j.total_amount")
    enriched = parsed.select(
        F.col("id").alias("order_id"),
        F.col("create_time"),
        F.date_format(F.to_timestamp("create_time"), "yyyy-MM-dd").alias("create_date"),
        F.hour(F.to_timestamp("create_time")).alias("create_hour"),
        (F.unix_timestamp(F.to_timestamp("create_time")) * 1000).alias("create_ts"),
        dec("total_amount").alias("total_amount"),
    )
    return enriched.groupBy("create_date").agg(
        F.count("*").alias("order_ct"),
        F.min("create_ts").alias("min_ts"),
        F.sum("total_amount").alias("amount_sum"),
    )


def order_age_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: the reference's 365-day-year age arithmetic
    (RT/app/dwm2/OrderWideApp2.java:199-219), applied to order age as of
    a fixed date (wall-clock pinned for determinism, SURVEY §7.5.7):
    floor(datediff(asof, o_orderdate)/365)."""
    from ..functions import age_years

    orders = load_table(spark, sf_dir, "orders")
    asof = F.lit("2026-01-01").cast("date")
    return (
        orders.withColumn("age_years", age_years(F.col("o_orderdate"), asof))
        .groupBy("age_years")
        .agg(
            F.count("*").alias("order_ct"),
            F.sum(dec("o_totalprice")).alias("amount_sum"),
        )
    )


QUERIES = {
    "json_parse_props": json_parse_props,
    "log_split": log_split,
    "is_new_repair": is_new_repair,
    "json_roundtrip": json_roundtrip,
    "order_age_summary": order_age_summary,
}

ORACLES = {
    "json_parse_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS ev_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_sum
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY 1
    """,
    "log_split": """
        WITH tagged AS (
            SELECT 'start' AS log_type, event_id, user_id FROM events WHERE event_type = 'signup'
            UNION ALL
            SELECT 'page' AS log_type, event_id, user_id FROM events WHERE event_type IN ('view','click')
            UNION ALL
            SELECT 'err' AS log_type, event_id, user_id FROM events WHERE event_type = 'error'
        )
        SELECT log_type,
               CAST(COUNT(*) AS BIGINT) AS ct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_ct,
               CAST(MIN(event_id) AS BIGINT) AS min_event_id,
               CAST(MAX(event_id) AS BIGINT) AS max_event_id
        FROM tagged GROUP BY log_type
    """,
    "is_new_repair": """
        WITH repaired AS (
            SELECT user_id, CAST(ts AS DATE) AS dt,
                   MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_dt
            FROM events
        )
        SELECT dt,
               CASE WHEN dt = first_dt THEN '1' ELSE '0' END AS is_new,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_ct
        FROM repaired GROUP BY 1, 2
    """,
    "json_roundtrip": """
        WITH parsed AS (
            SELECT o_orderkey AS order_id,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
                   o_totalprice AS total_amount
            FROM orders
        ), enriched AS (
            SELECT order_id,
                   strftime(strptime(create_time, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d') AS create_date,
                   CAST(epoch(strptime(create_time, '%Y-%m-%d %H:%M:%S')) * 1000 AS BIGINT) AS create_ts,
                   CAST(total_amount AS DECIMAL(18,4)) AS total_amount
            FROM parsed
        )
        SELECT create_date,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(MIN(create_ts) AS BIGINT) AS min_ts,
               CAST(SUM(total_amount) AS DECIMAL(18,4)) AS amount_sum
        FROM enriched GROUP BY 1
    """,
    "order_age_summary": """
        SELECT CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') / 365.0) AS BIGINT) AS age_years,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS amount_sum
        FROM orders GROUP BY 1
    """,
}
