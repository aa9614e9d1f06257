"""CDC apply semantics (insert/update/delete, last-op-wins) and
streaming checkpoint restart recovery (ST7): a resumed query processes
only new files, no duplicates."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import apply_cdc_to_dim, compact_table


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_apply_cdc_insert_update_delete(spark, tmp_path):
    path = str(tmp_path / "dim_user")
    batch1 = spark.createDataFrame(
        [
            (1, "alice", "insert", 100),
            (2, "bob", "insert", 100),
            (3, "carol", "bootstrap-insert", 100),
        ],
        "id long, name string, type string, ts long",
    )
    apply_cdc_to_dim(spark, batch1, path, "id")
    got = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert got == {1: "alice", 2: "bob", 3: "carol"}

    batch2 = spark.createDataFrame(
        [
            (2, "BOB", "update", 200),     # update wins
            (3, None, "delete", 200),      # delete removes
            (4, "dan", "insert", 200),
            (4, "DAN", "update", 201),     # same batch: last op per key wins
        ],
        "id long, name string, type string, ts long",
    )
    apply_cdc_to_dim(spark, batch2, path, "id")
    got = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert got == {1: "alice", 2: "BOB", 4: "DAN"}


def test_streaming_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def write_file(name, event_id, ts, user, etype, value):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([event_id], pa.int64()),
                    "ts": pa.array([ts], pa.timestamp("us")),
                    "user_id": pa.array([user], pa.int64()),
                    "event_type": pa.array([etype]),
                    "value": pa.array([value], pa.float64()),
                    "props": pa.array(["{}"]),
                }
            ),
            str(src / name),
        )

    write_file("f1.parquet", 1, _ts("2024-01-01T00:00:00"), 10, "view", 1.0)

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "f1.parquet")).schema
        ).option("pathGlobFilter", "*.parquet").parquet(str(src))
        (
            stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .start(sink)
            .awaitTermination()
        )

    run()
    assert sorted(r.event_id for r in spark.read.parquet(sink).collect()) == [1]

    # new file lands; the RESUMED query (same checkpoint) picks up only it
    write_file("f2.parquet", 2, _ts("2024-01-01T00:01:00"), 11, "click", 2.0)
    run()
    assert sorted(r.event_id for r in spark.read.parquet(sink).collect()) == [1, 2]

    # a third resume with nothing new appends nothing (no duplicates)
    run()
    assert sorted(r.event_id for r in spark.read.parquet(sink).collect()) == [1, 2]


def test_compact_table_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(1000).repartition(16).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 16
    compact_table(spark, path, 2)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 2
    assert spark.read.parquet(path).count() == 1000
