"""DWM layer — dedup, sessionization, wide joins (SURVEY.md §2.2-2.3).

Reference parity (paths under /root/reference):
- P9  UV daily dedup:       RT/app/dwm2/UV2.java:61-112 (keyed state + 1d TTL)
- ST4 CEP jump detection:   RT/app/dwm2/UJump2.java:88-137 (10 s timeout);
      intended predicate per RT/app/dwm/UserJumpDetailApp.java:104-117
      (SURVEY §7.5.1 documents the always-false bug we do NOT replicate)
- J1  interval join order⋈detail:  RT/app/dwm2/OrderWideApp2.java:170-185
- J2  interval join payment⋈order: RT/app/dwm2/PaymentWideApp2.java:70-82
- J3  async dim joins ×6:   RT/app/dwm2/OrderWideApp2.java:189-322

Spark-first shape: keyed state → window functions over (user, ts); the
per-record async Phoenix/Redis dim lookups → broadcast hash joins of the
whole dim tables (left joins — enrich-if-found keeps the row,
RT/app/func/DimAsyncFunction.java:75-78). At 100 TB the fact side stays
partitioned by its join key; every dim here is << the 64 MB broadcast
threshold so no dim join ever shuffles the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table

# 10-minute jump timeout: the reference uses 10 s on an app-log stream
# (RT/app/dwm2/UJump2.java:114); testdata events are sparser so the
# timeout scales to 10 min. Semantics identical: entry page with no
# follow-up within the timeout = bounce.
JUMP_TIMEOUT_S = 600


def uv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: daily unique-visitor filter. Reference keeps last-visit-date in
    keyed state with 1-day TTL and passes only the first event per
    (mid, day). Batch: row_number over (user, day) ordered by (ts,
    event_id) — event_id tiebreak makes the pick deterministic. The
    single shuffle is the window partition; the rollup reuses it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "dt").orderBy("ts", "event_id")
    firsts = (
        ev.select("user_id", "event_id", "ts", F.to_date("ts").alias("dt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return firsts.groupBy("dt").agg(
        F.count("*").alias("uv_ct"),
        F.min("event_id").alias("first_event_id"),
    )


def user_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4: bounce detection. CEP pattern 'entry then nothing within
    timeout' becomes lead(ts) over (user order by ts): a jump is an event
    whose next event for the same user is absent or > timeout later.
    End-of-data counts as timeout, matching the reference emitting on
    watermark passing (RT/app/dwm2/UJump2.java:114-137)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    jumps = (
        ev.select("user_id", "event_id", "ts", F.to_date("ts").alias("dt"))
        .withColumn("next_ts", F.lead("ts").over(w))
        .withColumn(
            "is_jump",
            F.col("next_ts").isNull()
            | (F.unix_micros("next_ts") - F.unix_micros("ts") > JUMP_TIMEOUT_S * 1_000_000),
        )
    )
    return jumps.groupBy("dt").agg(
        F.sum(F.when(F.col("is_jump"), 1).otherwise(0)).alias("uj_ct"),
        F.count("*").alias("ev_ct"),
    )


# 30-minute inactivity gap — the classic web-analytics session cut;
# the reference's jump detection is the 1-event special case of the
# same gap rule (RT/app/dwm2/UJump2.java:88-137 watermarks a 10 s gap).
SESSION_GAP_S = 1800


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts at the first event
    and at every event AT LEAST SESSION_GAP_S after its predecessor
    (>= not > — the exact merge rule of Spark's session_window, whose
    per-event window is [ts, ts+gap) — so the streaming twin
    stream_user_sessions_q produces identical sessions).
    Batch shape: lag(ts) marks session starts, a running sum numbers
    them, one (user_id)-partitioned agg summarizes — all three steps
    share the single (user_id) shuffle (HashPartitioning(user_id)
    satisfies the (user_id, session_seq) clustering, so Catalyst inserts
    no second exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        ev.select("user_id", "event_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") >= SESSION_GAP_S * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return marked.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("ev_ct"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


def order_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J3: the OrderWide pipeline. Facts lineitem⋈orders equi-join
    (the reference's ±5 ms interval join is a dedup guard, not
    semantics — SURVEY §2.3 J1), then broadcast dim enrichment:
    customer→nation→region on the order side, part + supplier on the
    line side — six dim hops like the reference's six async joins
    (RT/app/dwm2/OrderWideApp2.java:189-322), all LEFT joins
    (keep-row-on-miss, RT/app/func/DimAsyncFunction.java:75-78).
    Filter on o_orderdate is pushed into the parquet scan.

    Broadcast discipline (VERDICT r8 #5): nation/region are
    CATALOG-CONSTANT (25/5 rows at every SF) and carry a hard broadcast
    hint; customer/part/supplier SCALE WITH THE CORPUS, so their hint
    is left to Catalyst/AQE — under autoBroadcastJoinThreshold they
    broadcast exactly as before (gate/bench plans unchanged, PLANS.md
    asserts it), past it they degrade to a shuffled join instead of
    forcing a multi-GB broadcast at 100 TB (the 100x core probe in
    SCALE_100X.md measures both shapes)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-02-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    wide = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .join(part, li.l_partkey == part.p_partkey, "left")
        .join(supp, li.l_suppkey == supp.s_suppkey, "left")
    )
    return wide.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("n_name").alias("province_name"),
        F.col("r_name").alias("region_name"),
        F.col("p_name").alias("sku_name"),
        F.col("p_brand").alias("tm_name"),
        F.col("s_name").alias("supplier_name"),
        dec("l_extendedprice").alias("order_price"),
        F.col("l_quantity").cast("long").alias("sku_num"),
        (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)").alias("split_total_amount"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("create_date"),
    )


def payment_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: payment⋈order interval join, bound (-30 min, 0] — a payment
    joins the order it pays within 30 minutes
    (RT/app/dwm2/PaymentWideApp2.java:70-82). Mapped to events:
    `purchase` (payment) joins the same user's latest preceding `view`
    /`click` (order activity) within 30 min. The range condition rides
    on the user_id equi-join so it shuffles once by user_id; in
    streaming this same plan runs as a watermarked stream-stream join."""
    ev = load_table(spark, sf_dir, "events")
    pay = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"),
        F.col("user_id").alias("pay_user"),
        F.col("ts").alias("pay_ts"),
        F.col("value").alias("pay_value"),
    )
    act = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("act_id"),
        F.col("user_id").alias("act_user"),
        F.col("ts").alias("act_ts"),
    )
    joined = pay.join(
        act,
        (F.col("pay_user") == F.col("act_user"))
        & (F.col("act_ts") <= F.col("pay_ts"))
        & (F.unix_micros("act_ts") > F.unix_micros("pay_ts") - 1800 * 1_000_000),
        "inner",
    )
    return joined.groupBy(F.col("pay_user").alias("user_id")).agg(
        F.countDistinct("pay_id").alias("paid_ct"),
        F.count("*").alias("pair_ct"),
        F.sum(dec("pay_value")).alias("pay_value_sum"),
    )


QUERIES = {
    "uv_daily": uv_daily,
    "user_jump": user_jump,
    "user_sessions": user_sessions,
    "order_wide": order_wide,
    "payment_wide": payment_wide,
}

_SESSIONS_ORACLE_BODY = f"""
        WITH marked AS (
            SELECT user_id, event_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), seq AS (
            SELECT user_id, event_id, ts,
                   SUM(CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts) >= {SESSION_GAP_S} * 1000000
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM marked
        )
"""

ORACLES = {
    "user_sessions": _SESSIONS_ORACLE_BODY + """
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS ev_ct,
               CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
        FROM seq GROUP BY user_id, session_seq
    """,
    "uv_daily": """
        WITH firsts AS (
            SELECT user_id, event_id, CAST(ts AS DATE) AS dt,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT dt, CAST(COUNT(*) AS BIGINT) AS uv_ct,
               CAST(MIN(event_id) AS BIGINT) AS first_event_id
        FROM firsts WHERE rn = 1 GROUP BY dt
    """,
    "user_jump": """
        WITH j AS (
            SELECT user_id, event_id, ts, CAST(ts AS DATE) AS dt,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
            FROM events
        )
        SELECT dt,
               CAST(SUM(CASE WHEN next_ts IS NULL
                             OR epoch_us(next_ts) - epoch_us(ts) > 600 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct,
               CAST(COUNT(*) AS BIGINT) AS ev_ct
        FROM j GROUP BY dt
    """,
    "order_wide": """
        SELECT l.l_orderkey AS order_id,
               l.l_linenumber AS detail_id,
               o.o_custkey AS user_id,
               c.c_name AS user_name,
               n.n_name AS province_name,
               r.r_name AS region_name,
               p.p_name AS sku_name,
               p.p_brand AS tm_name,
               s.s_name AS supplier_name,
               CAST(l.l_extendedprice AS DECIMAL(18,4)) AS order_price,
               CAST(l.l_quantity AS BIGINT) AS sku_num,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS split_total_amount,
               strftime(o.o_orderdate, '%Y-%m-%d') AS create_date
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
            AND o.o_orderdate >= TIMESTAMP '1997-01-01'
            AND o.o_orderdate < TIMESTAMP '1997-02-01'
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        LEFT JOIN part p ON l.l_partkey = p.p_partkey
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    "payment_wide": """
        WITH pay AS (
            SELECT event_id AS pay_id, user_id AS pay_user, ts AS pay_ts, value AS pay_value
            FROM events WHERE event_type = 'purchase'
        ), act AS (
            SELECT event_id AS act_id, user_id AS act_user, ts AS act_ts
            FROM events WHERE event_type IN ('view','click')
        )
        SELECT pay_user AS user_id,
               CAST(COUNT(DISTINCT pay_id) AS BIGINT) AS paid_ct,
               CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(SUM(CAST(pay_value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS pay_value_sum
        FROM pay JOIN act
          ON pay_user = act_user
         AND act_ts <= pay_ts
         AND epoch_us(act_ts) > epoch_us(pay_ts) - 1800 * 1000000
        GROUP BY pay_user
    """,
}
