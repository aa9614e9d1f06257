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


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per day next to the exact count
    (rows-only driver check; the relative-error contract is asserted in
    tests). The approx column is what survives at 100 TB: single-pass,
    fixed-size mergeable state, no per-key shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.countDistinct("user_id").alias("uv_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("uv_approx"),
        F.count("*").alias("pv_ct"),
    )


QUERIES = {
    "value_percentiles": value_percentiles,
    "approx_distinct_stats": approx_distinct_stats,
}

ORACLES = {
    # approx_distinct_stats intentionally omitted: HLL sketches are
    # engine-specific (rows-only check; tests assert <5% relative error).
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
