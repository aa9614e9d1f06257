"""Kafka IO builders — the concrete S1-S4 mapping (SURVEY.md §2.1).

No broker exists in the test container, so nothing here is exercised by
the driver gate; the builders are the production seam. Each batch/
streaming pipeline in this repo reads a DataFrame and is agnostic to
whether it came from a parquet replay (tests) or these readers (prod):

    raw = read_topic_stream(spark, "ods_base_log")
    parsed = parse_json_value(raw, LOG_SCHEMA)       # P1
    ... existing pipeline transformations ...
    write_topic_stream(result, checkpoint, topic="dwd_page_log")

Reference parity:
- S1 consumer source:  MyKafkaUtil.getKafkaSource (RT/utils/MyKafkaUtil.java:21-26)
- S2 fixed-topic sink: MyKafkaUtil.getKafkaSink (:34-36)
- S3 dynamic-topic exactly-once sink: getKafkaSinkBySchema (:38-44) —
  the per-record sink_table becomes a per-row `topic` COLUMN, which the
  Kafka sink honors natively; exactly-once ≈ checkpoint + idempotent
  downstream (the reference's transactional producer maps to Kafka
  producer idempotence settings passed via options).
- S4 SQL DDL source: getKafkaDDL (:46-54) — `kafka_ddl` emits the
  CREATE TABLE statement for the SQL API path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BOOTSTRAP = "localhost:9092"


def read_topic_stream(
    spark: SparkSession,
    topic: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: subscribe to a topic as an unbounded stream of (key, value,
    timestamp, ...) rows. Batch replay of the same topic:
    spark.read.format("kafka") with the same options."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def parse_json_value(raw: DataFrame, schema: str) -> DataFrame:
    """P1 on the Kafka envelope: value bytes → string → from_json."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j"), "timestamp"
    ).select("j.*", "timestamp")


def topic_payload(df: DataFrame, topic: str | None = None) -> DataFrame:
    """The Kafka record projection shared by write_topic_stream and the
    broker-less format tests: value = to_json(struct(all non-topic
    cols)) (P11), plus the per-row `topic` column when routing
    dynamically (S3 — the reference's KafkaSerializationSchema reading
    sink_table per record). Keeping this separate lets tests drive the
    EXACT production serialization through a file sink when no broker
    exists (tests/test_kafka_format.py)."""
    payload_cols = [c for c in df.columns if c != "topic"]
    return df.select(
        *([F.col("topic")] if topic is None else []),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def write_topic_stream(
    df: DataFrame,
    checkpoint: str,
    topic: str | None = None,
    bootstrap: str = DEFAULT_BOOTSTRAP,
):
    """S2/S3: write a stream to Kafka. With `topic=None`, each row must
    carry a `topic` column — the dynamic-topic router. The value payload
    is topic_payload's to_json(struct(*))."""
    out = topic_payload(df, topic)
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer


def kafka_ddl(table: str, topic: str, schema_ddl: str, bootstrap: str = DEFAULT_BOOTSTRAP) -> str:
    """S4: the SQL-API declaration of a topic-backed table."""
    return f"""
        CREATE TABLE {table} ({schema_ddl})
        USING kafka
        OPTIONS (
          'kafka.bootstrap.servers' = '{bootstrap}',
          'subscribe' = '{topic}',
          'startingOffsets' = 'latest'
        )
    """
