"""End-to-end medallion flow (EP1, SURVEY §3): bronze events → DWD
split written through the routed sink → windowed gold written through
the idempotent partition overwrite → serving query over the gold table.
Exercises the full pipeline+IO stack the way a production deployment
wires it, including an idempotent replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.functions import dec
from gmallbiguan_parent_spark.io import load_table, route_to_sinks, write_partition_overwrite

SF = "/root/testdata/sf0.001"


def test_full_warehouse_flow(spark, tmp_path):
    # bronze → DWD: tag and route the log split to per-sink dirs
    ev = load_table(spark, SF, "events")
    tagged = ev.withColumn(
        "sink_table",
        F.when(F.col("event_type") == "signup", "dwd_start_log")
        .when(F.col("event_type").isin("view", "click"), "dwd_page_log")
        .otherwise("dwd_other_log"),
    )
    dwd = str(tmp_path / "dwd")
    route_to_sinks(tagged, dwd)

    pages = spark.read.parquet(f"{dwd}/sink_table=dwd_page_log")
    assert pages.count() == ev.filter(F.col("event_type").isin("view", "click")).count()

    # DWD → gold: daily stats, partitioned by day, idempotent overwrite
    gold_path = str(tmp_path / "gold" / "visitor_stats")
    daily = pages.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt")).agg(
        F.count("*").alias("pv_ct"),
        F.countDistinct("user_id").alias("uv_ct"),
        F.sum(dec("value")).cast("decimal(18,4)").alias("value_sum"),
    )
    write_partition_overwrite(daily, gold_path, ["dt"])
    first = spark.read.parquet(gold_path).count()

    # replay the same batch — idempotent, no duplicates
    write_partition_overwrite(daily, gold_path, ["dt"])
    assert spark.read.parquet(gold_path).count() == first

    # gold → serving: A5-style day rollup over the gold table
    gold = spark.read.parquet(gold_path)
    total = gold.agg(
        F.sum("pv_ct").alias("pv"), F.sum("value_sum").cast("decimal(18,4)").alias("amt")
    ).collect()[0]
    direct = pages.agg(
        F.count("*").alias("pv"),
        F.sum(dec("value")).cast("decimal(18,4)").alias("amt"),
    ).collect()[0]
    assert total.pv == direct.pv
    assert total.amt == direct.amt
