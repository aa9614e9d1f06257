"""Time-series operators Spark lacks natively, composed scale-first.

Two of the brief's canonical custom-operator cases:

``hypertable_rollup`` — the TimescaleDB continuous-aggregate /
"hypertable rollup" pattern: multi-grain time aggregates where each
coarser grain re-aggregates the PREVIOUS grain's (tiny) output instead
of re-scanning the raw table. The alternative single-pass formulation —
GROUPING SETS over (hour, day, month) — scans raw once but its Expand
node replicates every raw row once per grain, tripling the shuffle; the
cascade shuffles raw rows exactly once (into the finest grain, with
map-side partial agg) and every later shuffle is grain-sized. At 100 TB
the finest grain is the incrementally-maintained materialized view and
the coarser grains are derived from it for free — the cascade here is
that architecture expressed as one batch plan.

``spike_window_impact`` — a KEYLESS range join (point-in-interval with
no equi key), the case where Spark's planner falls back to
BroadcastNestedLoopJoin and dies when neither side fits in memory. The
scale-safe formulation buckets time into fixed bins: each interval
explodes into the bins it overlaps, each point keys by its bin, and the
join becomes an EQUI join on the bin id (shuffle-partitionable at any
scale) followed by the exact boundary filter. Interval count × bins/
interval rows on one side, |points| on the other — never |points| ×
|intervals|.

Reference parity: the reference's interval joins are keyed
(RT/app/dwm2/OrderWideApp2.java intervalJoin on order_id); this module
covers the keyless/range generalization its engine has no answer for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# Spike windows: hours whose event count exceeds SPIKE_FACTOR x the
# overall hourly mean open a window [hour - 30 min, hour + 90 min).
# The window is deliberately NOT bin-aligned so the exact boundary
# filter after the bin equi-join is doing real work.
SPIKE_FACTOR = 1.5
WINDOW_BEFORE_MIN = 30
WINDOW_AFTER_MIN = 90
BIN_SECONDS = 3600


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    w_start: str,
    w_end: str,
    bin_seconds: int = BIN_SECONDS,
) -> DataFrame:
    """Generic keyless point-in-interval join via time binning.

    Returns points x the intervals containing them ([w_start, w_end)),
    as an equi join on the bin id. Each interval contributes
    ceil(span/bin)+1 rows (one per overlapped bin); each point exactly
    one. Correct for arbitrary interval widths; pick bin_seconds near
    the typical interval span so the fan-out per interval stays small.

    The two sides join on a generated __bin column and the boundary
    filter references columns unqualified, so the inputs must not share
    column names (and must not carry __bin) — enforced loudly.
    """
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"interval_bin_join: column collision {sorted(dup)}")
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError("interval_bin_join: __bin is reserved")
    # F.floor, NOT a truncating cast: a cast rounds toward zero, which
    # for pre-1970 (negative-epoch) timestamps makes bin 0 span
    # (-bin, +bin) — double width. Completeness would survive (both
    # sides truncate identically and the interval enumerates the full
    # bin range), but only via a subtle monotonicity argument, and the
    # double-width bin doubles the false-positive fan-out at the epoch.
    # floor keeps every bin uniform, so the documented "generic, any
    # timestamp" contract holds without caveats.
    b = F.lit(bin_seconds)
    lo = F.floor(F.unix_timestamp(F.col(w_start)) / b).cast("long")
    hi = F.floor(F.unix_timestamp(F.col(w_end)) / b).cast("long")
    binned_iv = intervals.select(
        "*", F.explode(F.sequence(lo, hi)).alias("__bin")
    )
    binned_pt = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    return (
        binned_pt.join(binned_iv, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(w_start)) & (F.col(point_ts) < F.col(w_end))
        )
        .drop("__bin")
    )


def _dec(c: Column) -> Column:
    return c.cast("decimal(18,4)")


def spike_window_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic attributable to each detected spike: hours whose event
    count exceeds 1.5x the overall hourly mean open a misaligned
    [h-30min, h+90min) window; count/sum/distinct-user the events
    falling inside each window (windows overlap; an event counts once
    per window it falls in).

    Plan: one hour-grain aggregate (partial map-side) finds the spikes;
    the mean is a 1-row broadcast; the window set explodes into its 3
    covering hour bins and equi-joins the events on the bin id — the
    keyless range join never goes near BroadcastNestedLoopJoin, so the
    same plan holds when the interval side is also huge. Value sums are
    exact decimal for order independence.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("c")
    )
    mean = hourly.agg(F.avg("c").alias("avg_c"))
    wins = (
        hourly.crossJoin(F.broadcast(mean))
        .filter(F.col("c") > F.lit(SPIKE_FACTOR) * F.col("avg_c"))
        .select(
            F.col("h").alias("spike_hour"),
            (F.col("h") - F.expr(f"INTERVAL {WINDOW_BEFORE_MIN} MINUTES")).alias("w_start"),
            (F.col("h") + F.expr(f"INTERVAL {WINDOW_AFTER_MIN} MINUTES")).alias("w_end"),
        )
    )
    hits = interval_bin_join(
        ev.select("ts", "user_id", "value"), wins, "ts", "w_start", "w_end"
    )
    return hits.groupBy("spike_hour").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_dec(F.col("value"))).cast("decimal(28,4)").alias("sum_value"),
    )


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day → month cascading rollup of the event stream, unioned
    with a grain label — the continuous-aggregate pattern. Decimal sums
    make the cascade EXACTLY equal to aggregating raw at every grain
    (decimal addition is associative), which is what the oracle checks.

    Plan: raw events shuffle once (hour grain, map-side partial agg)
    into a localCheckpoint — WITHOUT it Spark recomputes the shared
    hour subtree under every union branch (3 raw scans, 6 exchanges;
    the checkpoint makes it 1 scan, and the later grains aggregate
    ~720 checkpointed rows). This checkpoint IS the continuous
    aggregate a hypertable materializes. Compare GROUPING SETS: its
    Expand would shuffle 3x the raw rows.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket_start")).agg(
        F.count("*").alias("n_events"),
        F.sum(_dec(F.col("value"))).alias("sum_value"),
    ).localCheckpoint()
    day = hour.groupBy(F.date_trunc("day", "bucket_start").alias("bucket_start")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
    )
    month = day.groupBy(F.date_trunc("month", "bucket_start").alias("bucket_start")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
    )

    def tag(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_start",
            "n_events",
            F.col("sum_value").cast("decimal(28,4)").alias("sum_value"),
        )

    return tag(hour, "hour").unionByName(tag(day, "day")).unionByName(tag(month, "month"))


QUERIES = {
    "spike_window_impact": spike_window_impact,
    "hypertable_rollup": hypertable_rollup,
}

ORACLES = {
    # reference semantics: a plain inequality (range) join — DuckDB's
    # IEJoin executes it natively, proving the bin formulation exact
    "spike_window_impact": f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events GROUP BY 1
    ), m AS (
        SELECT AVG(c) AS avg_c FROM hourly
    ), wins AS (
        SELECT h AS spike_hour,
               h - INTERVAL {WINDOW_BEFORE_MIN} MINUTE AS w_start,
               h + INTERVAL {WINDOW_AFTER_MIN} MINUTE AS w_end
        FROM hourly, m WHERE c > {SPIKE_FACTOR} * avg_c
    )
    SELECT CAST(w.spike_hour AS TIMESTAMP) AS spike_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_value
    FROM events e JOIN wins w ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY 1
    """,
    # reference semantics: every grain aggregated straight off the raw
    # table — equals the cascade because decimal sums are associative
    "hypertable_rollup": """
    SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4))
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4))
    FROM events GROUP BY 2
    """,
}
