"""JDBC IO builders — the concrete S6/S10/S11 mapping (SURVEY.md §2.1).

No database server exists in the test container, so the connection
itself is not exercised by the driver gate; the builders are the
production seam, and the option assembly (what a 1000-executor cluster
actually tunes) is factored into pure functions the tests assert.

Reference parity:
- S6 MySQL config scan:  MySQLUtil.queryList (RT/utils/MySQLUtil.java:33-103)
  — the ORM/camel-casing disappears: spark.read.jdbc returns typed rows.
  The reference polls this 70-line helper every 5 s; here the config
  read is one builder call per batch (see pipelines/cdc.config_df for
  the in-memory stand-in the tests use).
- S10 ClickHouse batch sink: ClickHouseUtil.getJdbcSink
  (RT/utils/ClickHouseUtil.java:41-86) — the reflective positional-`?`
  fill becomes df.write.jdbc; the @TransientSink column skip
  (RT/bean/TransientSink.java:16-19) becomes an explicit drop of the
  helper columns before the write.
- S11 serving reads (PUB/mapper/*.java) run as spark.sql over gold
  tables; a JDBC pushdown read of the same store uses read_jdbc_table
  with a `query` predicate.

Scale: a naive spark.read.jdbc is ONE task hammering the database.
read_jdbc_table requires the partitioned form (partition column +
bounds + parallelism) so ingest fans out across executors, each
fetching a disjoint key range; write batching bounds round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000
DEFAULT_BATCH_SIZE = 5_000


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """Option dict for a (possibly partitioned) JDBC scan. Partitioned
    form requires column + both bounds; each of the num_partitions
    tasks then reads a disjoint range — the difference between a
    single-connection trickle and a parallel ingest."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_write_options(
    url: str,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    isolation_level: str = "NONE",
) -> dict[str, str]:
    """Option dict for a batched JDBC sink. The reference flushes every
    5 rows (ClickHouseUtil.java:78) — far too chatty at scale; default
    here is 5000 with isolation NONE (ClickHouse-style append store)."""
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": isolation_level,
    }


def read_jdbc_table(spark: SparkSession, **kwargs) -> DataFrame:
    """S6: partitioned JDBC scan (kwargs as jdbc_read_options)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_batch(df: DataFrame, transient_cols: list[str] | None = None, **kwargs) -> None:
    """S10: drop @TransientSink-style helper columns, then batched
    append (kwargs as jdbc_write_options)."""
    out = df.drop(*transient_cols) if transient_cols else df
    writer = out.write.format("jdbc").mode("append")
    for k, v in jdbc_write_options(**kwargs).items():
        writer = writer.option(k, v)
    writer.save()
