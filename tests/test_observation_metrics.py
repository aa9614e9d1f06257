"""Observation API coverage: pipeline-embedded metrics (row counts,
conditional sums) collected for free with the action — what a
production run wires to its monitoring instead of extra count() jobs."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_observe_collects_pipeline_metrics_without_extra_jobs(spark):
    from gmallbiguan_parent_spark.io import load_table

    obs = Observation("ingest")
    li = load_table(spark, SF_DIR, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("discounted"),
        F.min("l_shipdate").alias("first_ship"),
    )
    out = li.groupBy("l_returnflag").count().collect()
    m = obs.get
    assert m["rows"] == load_table(spark, SF_DIR, "lineitem").count()
    assert 0 < m["discounted"] < m["rows"]
    assert m["first_ship"] is not None
    assert sum(r["count"] for r in out) == m["rows"]
