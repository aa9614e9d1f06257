"""Sink-layer semantics (SURVEY.md §2.1 S9/S10): idempotent partition
overwrite, dim snapshot merge, dynamic sink routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import (
    merge_dim_snapshot,
    route_to_sinks,
    write_partition_overwrite,
)


def test_partition_overwrite_is_idempotent_and_partial(spark, tmp_path):
    path = str(tmp_path / "gold")
    day1 = spark.createDataFrame([("2024-01-01", 1, 10.0)], "dt string, k long, v double")
    day2 = spark.createDataFrame([("2024-01-02", 2, 20.0)], "dt string, k long, v double")
    write_partition_overwrite(day1, path, ["dt"])
    write_partition_overwrite(day2, path, ["dt"])
    # replay day1 with corrected value — must replace ONLY day1
    day1_fixed = spark.createDataFrame([("2024-01-01", 1, 11.0)], "dt string, k long, v double")
    write_partition_overwrite(day1_fixed, path, ["dt"])
    # partition columns come back type-inferred (DateType here)
    got = {(str(r.dt), r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 11.0), ("2024-01-02", 20.0)}


def test_merge_dim_snapshot_upserts_by_key(spark, tmp_path):
    path = str(tmp_path / "dim_user")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    merge_dim_snapshot(spark, v1, path, "id")
    v2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, name string")
    merge_dim_snapshot(spark, v2, path, "id")
    got = {(r.id, r.name) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}  # latest-wins per key


def test_route_to_sinks_splits_by_sink_table(spark, tmp_path):
    base = str(tmp_path / "routed")
    df = spark.createDataFrame(
        [("dwd_a", 1), ("dwd_a", 2), ("dwd_b", 3)], "sink_table string, payload long"
    )
    route_to_sinks(df, base)
    a = spark.read.parquet(f"{base}/sink_table=dwd_a")
    b = spark.read.parquet(f"{base}/sink_table=dwd_b")
    assert sorted(r.payload for r in a.collect()) == [1, 2]
    assert [r.payload for r in b.collect()] == [3]


def test_jdbc_read_options_partitioned():
    from gmallbiguan_parent_spark.io_jdbc import jdbc_read_options

    opts = jdbc_read_options(
        "jdbc:mysql://h/db", "table_process",
        partition_column="id", lower_bound=1, upper_bound=1000, num_partitions=8,
    )
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("1", "1000", "8")
    import pytest
    with pytest.raises(ValueError):
        jdbc_read_options("jdbc:mysql://h/db", "t", partition_column="id")


def test_jdbc_write_drops_transient_cols(spark):
    from gmallbiguan_parent_spark.io_jdbc import jdbc_write_options

    opts = jdbc_write_options("jdbc:ch://h/db", "visitor_stats", batch_size=5000)
    assert opts["batchsize"] == "5000" and opts["isolationLevel"] == "NONE"
    # the transient-drop path is a plain DataFrame.drop — assert shape
    df = spark.createDataFrame([(1, "x", "helper")], "id long, name string, tmp string")
    assert df.drop(*["tmp"]).columns == ["id", "name"]


def test_multi_format_round_trips(spark, tmp_path):
    """parquet/orc are self-describing; csv/json round-trip exactly
    when the writer's schema is passed back to the reader."""
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import (
        IO_FORMATS, load_table, read_table_format, write_table_format,
    )
    from tests.conftest import SF_DIR

    src = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .limit(200)
    )
    want = sorted(tuple(r) for r in src.collect())
    for fmt in IO_FORMATS:
        path = str(tmp_path / f"t_{fmt}")
        write_table_format(src, path, fmt)
        back = read_table_format(spark, path, fmt, schema=src.schema)
        assert back.schema == src.schema, fmt
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, f"{fmt} round-trip mismatch"


def test_untyped_csv_read_is_schema_on_read(spark, tmp_path):
    from gmallbiguan_parent_spark.io import read_table_format, write_table_format

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    path = str(tmp_path / "untyped_csv")
    write_table_format(df, path, "csv")
    raw = read_table_format(spark, path, "csv")
    # no schema passed: everything comes back as strings
    assert all(t == "string" for _, t in raw.dtypes)
