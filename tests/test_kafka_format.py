"""Broker-less exercise of the Kafka S1-S3 MESSAGE FORMAT path
(SURVEY §2.1): a topic dump (JSON-lines text, exactly what a Kafka
value byte-stream deserializes to) replays as a file stream through the
real `parse_json_value` envelope parser, a pipeline transformation, and
the real `topic_payload` dynamic-topic serializer into a routed sink.
Only the transport (format("kafka")) is environment-gated; every
serialization/derivation step here is the production code path."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import load_table
from gmallbiguan_parent_spark.io_kafka import parse_json_value, topic_payload

SF = "/root/testdata/sf0.001"
SCHEMA = "event_id long, user_id long, event_type string, amount double"


def test_topic_json_roundtrip_with_dynamic_routing(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", F.col("value").alias("amount")
    )

    # producer side: the topic dump is to_json(struct(*)) lines — the
    # exact bytes write_topic_stream would hand the broker
    dump = str(tmp_path / "topic_dump")
    topic_payload(ev, topic="ods_events").write.text(dump)

    # consumer side: file-stream the dump, parse with the real envelope
    # parser (S1's from_json path), route per event_type (S3), and
    # re-serialize with the real payload builder into a partitioned sink
    raw = (
        spark.readStream.schema("value string").text(dump)
        .withColumn("timestamp", F.current_timestamp())
    )
    parsed = parse_json_value(raw, SCHEMA).drop("timestamp")
    routed = parsed.withColumn("topic", F.concat(F.lit("dwd_"), F.col("event_type")))
    out_dir = str(tmp_path / "sink")
    (
        topic_payload(routed).writeStream.outputMode("append")
        .partitionBy("topic")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start(out_dir)
        .awaitTermination()
    )

    back = spark.read.parquet(out_dir)
    # routing: one topic directory per event_type, correctly populated
    want_topics = {f"dwd_{r.event_type}" for r in ev.select("event_type").distinct().collect()}
    assert {r.topic for r in back.select("topic").distinct().collect()} == want_topics
    per_topic = {r.topic: r.ct for r in back.groupBy("topic").agg(F.count("*").alias("ct")).collect()}
    want_counts = {
        f"dwd_{r.event_type}": r.ct
        for r in ev.groupBy("event_type").agg(F.count("*").alias("ct")).collect()
    }
    assert per_topic == want_counts

    # payload: decoding the final value bytes returns the original rows
    decoded = back.select(F.from_json("value", SCHEMA).alias("j")).select("j.*")
    got = sorted(tuple(r) for r in decoded.collect())
    want = sorted(tuple(r) for r in ev.collect())
    assert got == want
