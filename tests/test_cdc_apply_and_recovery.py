"""CDC apply semantics (insert/update/delete, last-op-wins) and
streaming checkpoint restart recovery (ST7): a resumed query processes
only new files, no duplicates."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import apply_cdc_to_dim, compact_table

SF_DIR = "/root/testdata/sf0.001"


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


def test_build_sink_ddl_matches_checktable_semantics(spark, tmp_path):
    """The config-driven DDL generator mirrors TableProcessFunction.
    checkTable: pk defaults to 'id', extend defaults to empty, columns
    come from the sink_columns CSV in order, everything is a string."""
    from gmallbiguan_parent_spark.pipelines.cdc import build_sink_ddl, ensure_sink_tables

    ddl = build_sink_ddl("dim_user", "id,name,birthday", "id", None, database="g")
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS g.dim_user (`id` STRING, `name` STRING, "
        "`birthday` STRING) USING PARQUET TBLPROPERTIES ('sink.pk' = 'id')"
    )
    # pk/extend defaults (checkTable: pk -> 'id', ext -> '')
    assert "('sink.pk' = 'id')" in build_sink_ddl("t", "a,b")
    # the extend clause slot sits between USING and TBLPROPERTIES
    ddl_ext = build_sink_ddl("t", "a,b", None, "PARTITIONED BY (a)")
    assert "USING PARQUET PARTITIONED BY (a) TBLPROPERTIES" in ddl_ext
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_sink_ddl("t", " , ")

    # ensure_sink_tables: creates only hbase/insert routes, idempotent
    class Row:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    rows = [
        Row(sink_type="hbase", operate_type="insert", sink_table="dim_a",
            sink_columns="x,y", sink_pk="x", sink_extend=None),
        Row(sink_type="kafka", operate_type="insert", sink_table="dwd_b",
            sink_columns=None, sink_pk=None, sink_extend=None),
        Row(sink_type="hbase", operate_type="delete", sink_table="dim_c",
            sink_columns="x", sink_pk=None, sink_extend=None),
    ]
    spark.sql("DROP TABLE IF EXISTS dim_a")
    ddls = ensure_sink_tables(spark, rows, location_root=str(tmp_path))
    assert len(ddls) == 1 and "dim_a" in ddls[0]
    assert [f.name for f in spark.table("dim_a").schema.fields] == ["x", "y"]
    assert all(f.dataType.simpleString() == "string" for f in spark.table("dim_a").schema.fields)
    # second pass: IF NOT EXISTS makes the checkTable pass restart-safe
    ddls2 = ensure_sink_tables(spark, rows, location_root=str(tmp_path))
    assert ddls2 == ddls
    assert spark.table("dim_a").schema == spark.table("dim_a").schema
    spark.sql("DROP TABLE IF EXISTS dim_a")


def test_cdc_auto_ddl_routes_into_declared_schema(spark):
    """End-to-end: the router auto-creates the dim sink from config and
    the routed write lands in the declared all-string schema."""
    from gmallbiguan_parent_spark.pipelines.cdc import cdc_auto_ddl

    out = cdc_auto_ddl(spark, SF_DIR)
    assert [f.name for f in out.schema.fields] == ["event_id", "user_id"]
    assert all(f.dataType.simpleString() == "string" for f in out.schema.fields)
    app = "".join(ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId)
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES dim_signup_{app}").collect()
    }
    assert props.get("sink.pk") == "event_id"
    assert out.count() > 0
