"""Statistical summaries and sketches.

Exact percentiles/stddev are oracle-checked (Spark's exact `percentile`
interpolates identically to DuckDB's quantile_cont). The HLL approx
variant is the 100 TB path — approx_count_distinct keeps distinct
counting single-pass and mergeable where exact countDistinct would
shuffle every key; its engine-specific sketch makes it a rows-only
check (asserted within relative error in tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 + stddev of event value per type — one shuffle,
    percentile computed per group. At 100 TB the exact form gives way to
    approx_percentile (see approx_distinct_stats) — same plan shape,
    mergeable sketch instead of a sort."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.round(F.stddev_samp("value"), 4).alias("value_std"),
        F.count("*").alias("n"),
    )


def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per day next to the exact count
    — the library surface (uv_approx exposed; tests assert the
    relative-error contract on it). The approx column is what survives
    at 100 TB: single-pass, fixed-size mergeable state, no per-key
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.countDistinct("user_id").alias("uv_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("uv_approx"),
        F.count("*").alias("pv_ct"),
    )


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of the HLL sketch: the raw uv_approx value is
    engine-specific (no SQL oracle can replay HLL++ internals), so the
    gate emits the exact side PLUS a rigorous bounds verdict — uv_approx
    within 3x the configured rsd (0.02) of exact, with an absolute slack
    of 2 for tiny days. The oracle reproduces the exact columns and
    asserts the verdict column is TRUE, converting the former rows-only
    check into a full hash check: a sketch drifting out of its error
    contract now FAILS the gate instead of passing unobserved."""
    raw = approx_distinct_raw(spark, sf_dir)
    tol = F.greatest(F.lit(2.0), F.lit(3 * 0.02) * F.col("uv_exact").cast("double"))
    ok = F.abs(F.col("uv_approx").cast("double") - F.col("uv_exact").cast("double")) <= tol
    return raw.select("dt", "uv_exact", "pv_ct", ok.alias("uv_approx_ok"))


def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF through the grouped-map path: per-user inter-event
    gap statistics computed in pandas (applyInPandas) — the slot a
    genuinely non-SQL aggregation (t-digest, sequence model features)
    plugs into. This one IS SQL-expressible on purpose, so the oracle
    validates the full Arrow round-trip: median and max gap in seconds,
    rounded to 3 dp."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact integer microseconds: no float rounding anywhere (a
        # median of ints is at worst a .5, exactly representable)
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps_us = (pdf["ts"].astype("int64").diff().dropna() // 1000)
        if gaps_us.empty:
            return pd.DataFrame(
                {"user_id": [pdf["user_id"].iloc[0]], "ev_ct": [len(pdf)],
                 "median_gap_us": [None], "max_gap_us": [None]}
            )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "ev_ct": [len(pdf)],
                "median_gap_us": [float(gaps_us.median())],
                "max_gap_us": [int(gaps_us.max())],
            }
        )

    return (
        ev.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(per_user, schema="user_id long, ev_ct long, median_gap_us double, max_gap_us long")
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event type — the data
    profiler's binning primitive. The bin id is a pure scalar
    expression (floor(value / width)), so binning happens in the scan
    stage and the only shuffle is the (event_type, bin) aggregate;
    partial aggregation collapses each bin map-side, so the exchange
    carries at most types x bins rows per task regardless of input
    size."""
    ev = load_table(spark, sf_dir, "events")
    width = F.lit(25.0)
    bin_id = F.floor(F.col("value") / width).cast("int")
    return (
        ev.groupBy("event_type", bin_id.alias("bin_id"))
        .agg(
            F.count("*").alias("ct"),
            F.sum(dec("value")).alias("value_sum"),
        )
        .withColumn("bin_lo", (F.col("bin_id") * width).cast("double"))
    )


def approx_percentiles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile next to the exact answer — the library surface
    (raw approx values exposed; tests assert the rank-error contract).
    The sketch is the 100 TB path: fixed-size mergeable state and no
    per-group sort, where exact percentile must buffer every value.
    accuracy=10000 bounds rank error to 1/10000 of each group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("percentile(value, 0.99)").alias("p99_exact"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("p99_approx"),
        F.count("*").alias("n"),
    )


def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form of the percentile sketch: approx_percentile's
    returned element is engine-specific, but its rank-error guarantee
    (<= 1/accuracy = 1e-4) is checkable in value space — the approx
    value must lie between the exact discrete percentiles at q -+ 0.005
    (a 50x slack over the sketch bound, covering discreteness at small
    groups, yet still a 0.5% rank window). The oracle reproduces the
    exact columns and asserts both verdicts TRUE — a sketch outside its
    rank contract now fails the gate instead of passing rows-only."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.99)").alias("p99_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("p99_approx"),
        F.expr("percentile_disc(0.495) WITHIN GROUP (ORDER BY value)").alias("p50_lo"),
        F.expr("percentile_disc(0.505) WITHIN GROUP (ORDER BY value)").alias("p50_hi"),
        F.expr("percentile_disc(0.985) WITHIN GROUP (ORDER BY value)").alias("p99_lo"),
        F.expr("percentile_disc(0.995) WITHIN GROUP (ORDER BY value)").alias("p99_hi"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "event_type",
        F.round("p50_exact", 4).alias("p50_exact"),
        F.round("p99_exact", 4).alias("p99_exact"),
        "n",
        F.col("p50_approx").between(F.col("p50_lo"), F.col("p50_hi")).alias("p50_ok"),
        F.col("p99_approx").between(F.col("p99_lo"), F.col("p99_hi")).alias("p99_ok"),
    )


def value_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc): the smallest actual data
    value at-or-above the target rank — no interpolation, so the answer
    is always a real observation (what SLO/latency reporting wants).
    Same single-shuffle grouped-sort plan as the continuous form."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_disc"),
        F.count("*").alias("n"),
    )


def value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-moment aggregates: Pearson correlation and sample covariance
    of event value vs hour-of-day, per type — single-pass mergeable
    moments (the same partial/final shape as sum/avg), so one shuffle
    regardless of scale. Rounded to 4 dp, where both engines' co-moment
    recurrences agree."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.corr(F.col("value"), hr), 4).alias("value_hour_corr"),
        F.round(F.covar_samp(F.col("value"), hr), 4).alias("value_hour_covar"),
        F.count("*").alias("n"),
    )


def daily_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if, bool_or (ANY), bool_and
    (EVERY) per day — the monitoring-rollup primitives. All three fold
    map-side like any other aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.expr("count_if(value > 500)").alias("big_value_ct"),
        F.expr("bool_or(event_type = 'error')").alias("any_error"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
        F.count("*").alias("n"),
    )


def order_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection (median/MAD — the data-quality screen
    that survives heavy-tailed money amounts where mean/stddev don't):
    per order priority, the exact median and median-absolute-deviation
    of the order total via percentile_disc, then count orders with
    |x - median| > 3*MAD. percentile_disc returns actual decimal data
    values, so every comparison is exact in both engines.

    Plan: two grouped percentile aggregates (counts-map, bounded
    memory) with the tiny per-priority stats broadcast back onto the
    scan — no sorts, no row-level shuffles beyond the two aggs."""
    from pyspark.sql import functions as F

    from ..functions import dec
    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("priority"), dec("o_totalprice").alias("amt")
    )
    # Spark's percentile_disc returns DOUBLE even over decimal input
    # (DuckDB's quantile_disc keeps DECIMAL); the result is an actual
    # 4-dp data value, so the cast back to decimal is exact and keeps
    # the MAD subtraction in exact arithmetic on both engines.
    med = base.groupBy("priority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY amt)")
        .cast("decimal(18,4)").alias("med")
    )
    dev = base.join(F.broadcast(med), "priority").select(
        "priority", "med", F.abs(F.col("amt") - F.col("med")).alias("absdev")
    )
    mad = dev.groupBy("priority", "med").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY absdev)")
        .cast("decimal(18,4)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.select("priority", "mad")), "priority")
        .groupBy("priority")
        .agg(
            F.count("*").alias("order_ct"),
            F.first("med").alias("median_amt"),
            F.first("mad").alias("mad_amt"),
            F.sum(F.when(F.col("absdev") > 3 * F.col("mad"), 1).otherwise(0)).alias("outlier_ct"),
        )
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_EVAL_TOP = 20


def cms_bucket_entries(token_col):
    """array<struct<r,bucket>> — the CMS_DEPTH salted-md5 bucket slots of
    a token; the single hash definition the batch sketch, its probes,
    and the streaming ledger twin all share."""
    from ..functions import md5_bigint

    return F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            (md5_bigint(token_col, salt=f"cms{r}:") % CMS_WIDTH).alias("bucket"),
        )
        for r in range(CMS_DEPTH)
    ])


def cms_eval_probes(spark: SparkSession, sf_dir: str, sketch: DataFrame) -> DataFrame:
    """Evaluate a (r, bucket, cnt) sketch against exact truth for the
    corpus's CMS_EVAL_TOP tokens — shared by cms_heavy_hitters and the
    streaming ledger twin, so both produce byte-identical reports."""
    from ..functions import tokenize
    from ..io import load_table_spread

    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("token"))
    truth = (
        toks.groupBy("token")
        .agg(F.count("*").alias("true_ct"))
        .orderBy(F.desc("true_ct"), F.asc("token"))
        .limit(CMS_EVAL_TOP)
    )
    probes = truth.select(
        "token", "true_ct", F.explode(cms_bucket_entries(F.col("token"))).alias("h")
    ).select("token", "true_ct", "h.r", "h.bucket")
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "inner")
        .groupBy("token", "true_ct")
        .agg(F.min("cnt").alias("est_ct"))
        .orderBy(F.desc("true_ct"), F.asc("token"))
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimation, evaluated against exact
    truth for the corpus's top tokens. The sketch is CMS_DEPTH x
    CMS_WIDTH counters; each token increments one bucket per row
    (md5-salted hash, portable to the oracle), and a point estimate is
    the MIN over its row buckets — always >= the true count (the CMS
    guarantee; tests assert it).

    Why this is the 100 TB shape: the sketch build is ONE (row, bucket)
    keyed aggregate — partial aggregation merges counters map-side, so
    the shuffle carries at most DEPTH*WIDTH rows per task regardless of
    corpus size (this additive mergeability is the whole point of CMS;
    the same plan serves streaming via update-mode agg). The evaluation
    join probes CMS_EVAL_TOP tokens x DEPTH buckets — broadcast-tiny.
    Every arithmetic step is exact integers, so the DuckDB oracle
    replays the sketch bit-for-bit."""
    from ..functions import tokenize
    from ..io import load_table_spread

    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("token"))
    rows = toks.select(
        "token", F.explode(cms_bucket_entries(F.col("token"))).alias("h")
    ).select("token", "h.r", "h.bucket")
    sketch = rows.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    return cms_eval_probes(spark, sf_dir, sketch)


QUERIES = {
    "cms_heavy_hitters": cms_heavy_hitters,
    "order_outlier_stats": order_outlier_stats,
    "value_percentiles": value_percentiles,
    "value_correlation": value_correlation,
    "daily_flags": daily_flags,
    "value_percentile_disc": value_percentile_disc,
    "approx_distinct_stats": approx_distinct_stats,
    "user_gap_stats": user_gap_stats,
    "value_histogram": value_histogram,
    "approx_value_percentiles": approx_value_percentiles,
}

ORACLES = {
    "cms_heavy_hitters": """
        WITH toks AS (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
            FROM documents
        ), hashes AS (
            SELECT token, r.r AS r,
                   (('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || ':' || token), 1, 15))::BIGINT % 1024) AS bucket
            FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(r)
        ), sketch AS (
            SELECT r, bucket, COUNT(*) AS cnt FROM hashes GROUP BY 1, 2
        ), truth AS (
            SELECT token, COUNT(*) AS true_ct FROM toks GROUP BY 1
            ORDER BY true_ct DESC, token ASC LIMIT 20
        ), probes AS (
            SELECT t.token, t.true_ct, r.r AS r,
                   (('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || ':' || t.token), 1, 15))::BIGINT % 1024) AS bucket
            FROM truth t CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(r)
        )
        SELECT p.token, CAST(p.true_ct AS BIGINT) AS true_ct,
               CAST(MIN(s.cnt) AS BIGINT) AS est_ct
        FROM probes p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
        GROUP BY 1, 2
        ORDER BY true_ct DESC, token ASC
    """,
    "order_outlier_stats": """
        WITH base AS (
            SELECT o_orderpriority AS priority,
                   CAST(o_totalprice AS DECIMAL(18,4)) AS amt
            FROM orders
        ), med AS (
            SELECT priority, quantile_disc(amt, 0.5) AS med FROM base GROUP BY 1
        ), dev AS (
            SELECT b.priority, m.med, ABS(b.amt - m.med) AS absdev
            FROM base b JOIN med m USING (priority)
        ), mad AS (
            SELECT priority, med, quantile_disc(absdev, 0.5) AS mad
            FROM dev GROUP BY 1, 2
        )
        SELECT d.priority,
               CAST(COUNT(*) AS BIGINT) AS order_ct,
               MAX(m.med) AS median_amt,
               MAX(m.mad) AS mad_amt,
               CAST(SUM(CASE WHEN d.absdev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS outlier_ct
        FROM dev d JOIN mad m USING (priority)
        GROUP BY 1
    """,
    # The approx sketches are gate-checked via invariant verdicts: the
    # Spark side computes the sketch AND its rigorous error-bound check;
    # the oracle reproduces the exact columns and asserts the verdict
    # TRUE — hash parity now fails if a sketch leaves its contract.
    "approx_distinct_stats": """
        SELECT CAST(ts AS DATE) AS dt,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_exact,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               TRUE AS uv_approx_ok
        FROM events GROUP BY 1
    """,
    "approx_value_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
               ROUND(quantile_cont(value, 0.99), 4) AS p99_exact,
               CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS p50_ok,
               TRUE AS p99_ok
        FROM events GROUP BY 1
    """,
    "value_histogram": """
        SELECT event_type,
               CAST(FLOOR(value / 25.0) AS INTEGER) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS ct,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS value_sum,
               CAST(CAST(FLOOR(value / 25.0) AS INTEGER) * 25.0 AS DOUBLE) AS bin_lo
        FROM events GROUP BY 1, 2
    """,
    "user_gap_stats": """
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS ev_ct,
               CAST(quantile_cont(gap_us, 0.5) AS DOUBLE) AS median_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM gaps GROUP BY user_id
    """,
    "value_correlation": """
        SELECT event_type,
               ROUND(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS value_hour_corr,
               ROUND(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS value_hour_covar,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "daily_flags": """
        SELECT CAST(ts AS DATE) AS dt,
               CAST(count_if(value > 500) AS BIGINT) AS big_value_ct,
               bool_or(event_type = 'error') AS any_error,
               bool_and(value >= 0) AS all_nonneg,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "value_percentile_disc": """
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50_disc,
               quantile_disc(value, 0.9) AS p90_disc,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "value_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.9), 4) AS p90,
               ROUND(quantile_cont(value, 0.99), 4) AS p99,
               ROUND(stddev_samp(value), 4) AS value_std,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
}
