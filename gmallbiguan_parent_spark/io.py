"""Table IO over the driver-generated testdata.

The reference reads everything from Kafka topics and writes to
Phoenix/ClickHouse (SURVEY.md §2.1 S1-S11). In the Spark-first design
the warehouse layers are parquet tables; batch jobs read them directly
and Structured Streaming jobs replay them as file streams. Readers here
keep scans declarative so Catalyst pushes filters/projections into the
parquet scan (check via .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan — no .cache(), no
    collect; Catalyst prunes columns/filters at the scan.

    events.ts is TIMESTAMP(NANOS) in the parquet footer, which Spark's
    reader only accepts as a raw long (spark.sql.legacy.parquet.
    nanosAsLong, set in session.py). Convert to a microsecond timestamp
    here — DuckDB performs the same ns→µs truncation, so both engines
    see identical values."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
