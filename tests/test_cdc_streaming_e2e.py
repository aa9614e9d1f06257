"""EP2 streaming capstone (SURVEY §3): the CDC stream routed per
microbatch inside foreachBatch — facts land under their sink_table,
dim ops apply to the dim snapshot with update/delete semantics, config
is re-read per batch. Composes cdc routing + route_to_sinks +
apply_cdc_to_dim under a real checkpointed stream."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import apply_cdc_to_dim


def _write_cdc_file(path, rows):
    pq.write_table(
        pa.table(
            {
                "table": pa.array([r[0] for r in rows]),
                "type": pa.array([r[1] for r in rows]),
                "id": pa.array([r[2] for r in rows], pa.int64()),
                "name": pa.array([r[3] for r in rows]),
                "ts": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        str(path),
    )


def test_streaming_cdc_routes_facts_and_applies_dims(spark, tmp_path):
    src = tmp_path / "cdc_src"
    src.mkdir()
    facts = str(tmp_path / "facts")
    dim_path = str(tmp_path / "dim_user")
    chk = str(tmp_path / "chk")

    _write_cdc_file(
        src / "b1.parquet",
        [
            ("order_info", "insert", 1, "o1", 100),
            ("order_info", "insert", 2, "o2", 101),
            ("user_info", "insert", 10, "alice", 100),
            ("user_info", "insert", 11, "bob", 100),
            ("unknown_tbl", "insert", 99, "x", 100),   # no config entry -> dropped
        ],
    )

    fact_tables = {"order_info"}
    dim_tables = {"user_info"}

    def process_batch(batch_df, batch_id):
        # per-microbatch config consultation (the 5 s poll equivalent)
        routed = batch_df.withColumn(
            "sink_table",
            F.when(F.col("table").isin(*fact_tables), F.concat(F.lit("dwd_"), F.col("table")))
            .when(F.col("table").isin(*dim_tables), F.concat(F.lit("dim_"), F.col("table")))
            .otherwise(F.lit(None)),
        ).filter(F.col("sink_table").isNotNull())
        fact_rows = routed.filter(F.col("table").isin(*fact_tables)).select(
            "sink_table", "id", "name", "ts"
        )
        if fact_rows.take(1):
            fact_rows.write.mode("append").partitionBy("sink_table").parquet(facts)
        dim_rows = routed.filter(F.col("table").isin(*dim_tables)).select(
            "id", "name", "type", "ts"
        )
        if dim_rows.take(1):
            apply_cdc_to_dim(spark, dim_rows, dim_path, "id")

    def run():
        schema = spark.read.parquet(str(src / "b1.parquet")).schema
        stream = spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet").parquet(str(src))
        (
            stream.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .start()
            .awaitTermination()
        )

    run()
    got_facts = {r.id for r in spark.read.parquet(f"{facts}/sink_table=dwd_order_info").collect()}
    assert got_facts == {1, 2}
    got_dim = {r.id: r.name for r in spark.read.parquet(dim_path).collect()}
    assert got_dim == {10: "alice", 11: "bob"}

    # second microbatch: dim update + delete, new fact; resume from checkpoint
    _write_cdc_file(
        src / "b2.parquet",
        [
            ("order_info", "insert", 3, "o3", 200),
            ("user_info", "update", 11, "BOB", 200),
            ("user_info", "delete", 10, None, 200),
        ],
    )
    run()
    got_facts = {r.id for r in spark.read.parquet(f"{facts}/sink_table=dwd_order_info").collect()}
    assert got_facts == {1, 2, 3}
    got_dim = {r.id: r.name for r in spark.read.parquet(dim_path).collect()}
    assert got_dim == {11: "BOB"}
