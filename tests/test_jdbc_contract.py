"""END-TO-END JDBC contract for the S6/S10 seams (SURVEY §2.1): the
container ships no MySQL/ClickHouse server, but PySpark bundles the
embedded Derby JDBC driver (it backs the Hive metastore), so the REAL
spark JDBC data source — connection, DDL, batched insert, partitioned
parallel scan, predicate pushdown — is exercisable end to end. Only
the vendor URL differs in production.

Parity targets:
- S10 ClickHouse batch sink (ClickHouseUtil.getJdbcSink,
  RT/utils/ClickHouseUtil.java:41-86): write_jdbc_batch with the
  @TransientSink-style column drop.
- S6 MySQL config scan (MySQLUtil.queryList, RT/utils/MySQLUtil.java:
  33-103): read_jdbc_table, including the PARTITIONED form a
  1000-executor ingest requires (disjoint key ranges per task).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io_jdbc import read_jdbc_table, write_jdbc_batch


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/contractdb;create=true"


def test_jdbc_roundtrip_with_transient_drop_and_partitioned_scan(spark, tmp_path):
    url = _derby_url(tmp_path)
    rows = spark.range(0, 100).select(
        F.col("id").alias("stat_id"),
        (F.col("id") % 7).cast("long").alias("ct"),
        F.concat(F.lit("u"), F.col("id")).alias("who"),
        # the @TransientSink-style helper column that must NOT land
        F.lit("scratch").alias("tmp_state"),
    )
    # S10: batched append through the real JDBC sink, transient dropped
    write_jdbc_batch(
        rows, transient_cols=["tmp_state"], url=url, table="product_stats",
        batch_size=25,
    )

    # S6 single scan: schema comes back WITHOUT the transient column
    back = read_jdbc_table(spark, url=url, table="product_stats")
    assert sorted(c.lower() for c in back.columns) == ["ct", "stat_id", "who"]
    assert back.count() == 100
    got = {r["STAT_ID"] if "STAT_ID" in r else r["stat_id"]: r for r in
           (row.asDict() for row in back.collect())}
    assert len(got) == 100

    # S6 partitioned scan: 4 tasks over disjoint stat_id ranges — same
    # rows, real parallel plan (one partition per range)
    part = read_jdbc_table(
        spark, url=url, table="product_stats",
        partition_column="stat_id", lower_bound=0, upper_bound=100,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 100
    assert sorted(
        map(tuple, part.select("stat_id", "ct", "who").collect())
    ) == sorted(map(tuple, back.select("stat_id", "ct", "who").collect()))

    # append is append (the reference's sink is an append store): a
    # second batch doubles the rows
    write_jdbc_batch(
        rows.filter(F.col("stat_id") < 10), transient_cols=["tmp_state"],
        url=url, table="product_stats", batch_size=25,
    )
    assert read_jdbc_table(spark, url=url, table="product_stats").count() == 110


def test_jdbc_pushdown_query_form(spark, tmp_path):
    """S11's JDBC pushdown flavor: the dbtable slot takes a derived
    table, so the WHERE runs IN the database — the reference's mapper
    SQL shape over a store reached through JDBC."""
    url = _derby_url(tmp_path)
    spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.format("jdbc").option("url", url).option("dbtable", "kv").save()
    # Spark's JDBC writer creates case-preserving quoted columns, so the
    # pushed-down SQL quotes them (vendor-dialect detail, same as prod)
    filtered = read_jdbc_table(
        spark, url=url, table='(SELECT "k", "v" FROM kv WHERE "k" >= 40) pushed'
    )
    assert filtered.count() == 10
    assert min(r[0] for r in filtered.collect()) == 40


def test_partitioned_read_requires_bounds():
    from gmallbiguan_parent_spark.io_jdbc import jdbc_read_options

    with pytest.raises(ValueError, match="bounds|bound"):
        jdbc_read_options("jdbc:derby:x", "t", partition_column="id")
