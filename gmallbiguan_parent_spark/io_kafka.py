"""Kafka IO builders — the concrete S1-S4 mapping (SURVEY.md §2.1).

No broker exists in the test container, so the transport
(format("kafka")) is the one environment-gated hop; everything else —
option assembly, envelope parsing, payload serialization, dynamic topic
routing with the DEFAULT_TOPIC fallback — is plain code driven by the
broker-less contract tests (tests/test_kafka_format.py,
tests/test_kafka_contract.py). Each batch/streaming pipeline in this
repo reads a DataFrame and is agnostic to whether it came from a
parquet replay (tests) or these readers (prod):

    raw = read_topic_stream(spark, "ods_base_log", group_id="g1")
    parsed = parse_json_value(raw, LOG_SCHEMA)       # P1
    ... existing pipeline transformations ...
    write_topic_stream(result, checkpoint, topic="dwd_page_log")

Reference parity (RT/utils/MyKafkaUtil.java):
- S1 consumer source:  getKafkaSource(topic, groupId) (:21-26) — group
  id + bootstrap servers → kafka_source_options.
- S2 fixed-topic sink: getKafkaSink(topic) (:34-36).
- S3 dynamic-topic exactly-once sink: getKafkaSinkBySchema (:38-44) —
  the per-record sink_table becomes a per-row `topic` COLUMN (the Kafka
  sink honors it natively) with the reference's DEFAULT_TOPIC fallback
  for rows that route nowhere; EXACTLY_ONCE + the 15-minute
  TRANSACTION_TIMEOUT_CONFIG map to producer idempotence + the same
  transaction timeout in kafka_sink_options (checkpoint + idempotent
  producer is Spark's exactly-once shape for Kafka).
- S4 SQL DDL source: getKafkaDDL(topic, groupId) (:46-54) — kafka_ddl
  emits the CREATE TABLE statement for the SQL API path, group id
  included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BOOTSTRAP = "localhost:9092"
# the reference's fallback topic for dynamically-routed records whose
# serializer yields no destination (MyKafkaUtil.java:19)
DEFAULT_TOPIC = "DEFAULT_DATA"
# getKafkaSinkBySchema's TRANSACTION_TIMEOUT_CONFIG (:42): 15 minutes
TRANSACTION_TIMEOUT_MS = 15 * 60 * 1000


def kafka_source_options(
    topic: str,
    group_id: str = "gmall",
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """S1 option surface — getKafkaSource's consumer Properties
    (GROUP_ID_CONFIG + BOOTSTRAP_SERVERS_CONFIG) in Spark spelling."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(
    checkpoint: str,
    topic: str | None = None,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    exactly_once: bool = True,
) -> dict[str, str]:
    """S2/S3 option surface. With topic=None (the dynamic router) no
    `topic` option is set — each row's `topic` column routes it.
    exactly_once mirrors getKafkaSinkBySchema's Semantic.EXACTLY_ONCE:
    idempotent producer + acks=all + the reference's 15-minute
    transaction timeout; Spark's checkpoint supplies the replay side of
    the guarantee."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "checkpointLocation": checkpoint,
    }
    if exactly_once:
        opts["kafka.enable.idempotence"] = "true"
        opts["kafka.acks"] = "all"
        opts["kafka.transaction.timeout.ms"] = str(TRANSACTION_TIMEOUT_MS)
    if topic is not None:
        opts["topic"] = topic
    return opts


def read_topic_stream(
    spark: SparkSession,
    topic: str,
    group_id: str = "gmall",
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: subscribe to a topic as an unbounded stream of (key, value,
    timestamp, ...) rows. Batch replay of the same topic:
    spark.read.format("kafka") with the same options."""
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(topic, group_id, bootstrap, starting_offsets))
        .load()
    )


def parse_json_value(raw: DataFrame, schema: str) -> DataFrame:
    """P1 on the Kafka envelope: value bytes → string → from_json."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j"), "timestamp"
    ).select("j.*", "timestamp")


def topic_payload(df: DataFrame, topic: str | None = None) -> DataFrame:
    """The Kafka record projection shared by write_topic_stream and the
    broker-less contract tests: value = to_json(struct(all non-topic
    cols)) (P11), plus the per-row `topic` column when routing
    dynamically (S3 — the reference's KafkaSerializationSchema reading
    sink_table per record), null-routed rows falling back to
    DEFAULT_TOPIC exactly like FlinkKafkaProducer's default-topic
    argument. Keeping this separate lets tests drive the EXACT
    production serialization through a file sink when no broker exists."""
    payload_cols = [c for c in df.columns if c != "topic"]
    return df.select(
        *(
            [F.coalesce(F.col("topic"), F.lit(DEFAULT_TOPIC)).alias("topic")]
            if topic is None
            else []
        ),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def write_topic_stream(
    df: DataFrame,
    checkpoint: str,
    topic: str | None = None,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    exactly_once: bool = True,
):
    """S2/S3: write a stream to Kafka. With `topic=None`, each row must
    carry a `topic` column — the dynamic-topic router. The value payload
    is topic_payload's to_json(struct(*))."""
    out = topic_payload(df, topic)
    return out.writeStream.format("kafka").options(
        **kafka_sink_options(checkpoint, topic, bootstrap, exactly_once)
    )


def kafka_ddl(
    table: str,
    topic: str,
    schema_ddl: str,
    group_id: str = "gmall",
    bootstrap: str = DEFAULT_BOOTSTRAP,
) -> str:
    """S4: the SQL-API declaration of a topic-backed table —
    getKafkaDDL's connector/topic/servers/group.id/startup surface in
    Spark DDL spelling (format is json via the pipeline's from_json,
    not a connector option, because Spark's Kafka table exposes raw
    bytes)."""
    return f"""
        CREATE TABLE {table} ({schema_ddl})
        USING kafka
        OPTIONS (
          'kafka.bootstrap.servers' = '{bootstrap}',
          'subscribe' = '{topic}',
          'kafka.group.id' = '{group_id}',
          'startingOffsets' = 'latest'
        )
    """
