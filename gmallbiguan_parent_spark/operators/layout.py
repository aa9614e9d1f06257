"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB, single-column sort layouts prune scans on ONE predicate
column only; interleaving the bits of two (or more) columns into a
Morton code and range-partitioning files by that code gives every file
a narrow min/max span on EVERY interleaved dimension — the Delta/
Iceberg `OPTIMIZE ZORDER BY` recipe. The operator here computes the
Morton bucket assignment and the per-bucket min/max spans a file-level
statistics index would hold, which is exactly the evidence that scan
pruning works on both dimensions at once. The write path at scale is
`df.repartitionByRange(n_files, z).sortWithinPartitions(z).write...`
on the same z expression.

Both engines compute the identical unrolled 16-bit interleave
(shift/and/or arithmetic), so the oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

Z_BITS = 16          # bits kept per dimension
Z_BUCKETS = 64       # "files" — range-partitions of the z ordering
Z_EPOCH = "1992-01-01"


def _z_spark(x: str, y: str):
    """Morton interleave of the low Z_BITS of two bigint columns —
    x on even bit positions, y on odd. Pure shift/and arithmetic
    inside whole-stage codegen."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return F.expr(" + ".join(terms))


def _z_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every order to its Z-order bucket over (o_custkey,
    order-day) and emit the per-bucket file statistics (row count,
    min/max of both dimensions) that prove two-dimensional pruning:
    each bucket's span is a small fraction of the global range on BOTH
    columns, so a predicate on either dimension skips most buckets.
    Buckets are RANGE partitions of the z ordering (ntile — exactly
    what repartitionByRange(n, z) computes at write time via sampled
    range bounds; here exact so the oracle replays it). Tiebreak on
    o_orderkey makes the ordering total and both engines agree."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast("bigint")
    raw = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ck"),
        day.alias("dy"),
    )
    # Normalize both dimensions to the full 2^Z_BITS-1 scale (exact
    # integer arithmetic) — unequal bit-widths would let the wider
    # dimension dominate the interleave and destroy clustering on the
    # narrower one. The min/max row is a 1-row broadcast, the Morton
    # analog of repartitionByRange's bounds sampling.
    stats = raw.agg(
        F.min("ck").alias("ck_mn"), F.max("ck").alias("ck_mx"),
        F.min("dy").alias("dy_mn"), F.max("dy").alias("dy_mx"),
    )
    scale = (1 << Z_BITS) - 1
    base = raw.crossJoin(F.broadcast(stats)).select(
        "okey", "ck", "dy",
        F.expr(f"(ck - ck_mn) * {scale} div greatest(ck_mx - ck_mn, 1)").alias("ckq"),
        F.expr(f"(dy - dy_mn) * {scale} div greatest(dy_mx - dy_mn, 1)").alias("dyq"),
    ).withColumn("z", _z_spark("ckq", "dyq"))
    # Exact ntile WITHOUT the single-partition global window (the one
    # plan shape that cannot survive 100x): range-partition + sort on
    # the total order (z, okey) — exactly the shuffle the z-order WRITE
    # performs — then make row numbers global by adding per-partition
    # offsets (partition counts collect driver-side, bounded by the
    # partition count, the IVF-trainer pattern). The SQL-standard ntile
    # formula (first n%k buckets get ceil(n/k) rows) applied to the
    # exact global row number reproduces the window ntile bit-for-bit,
    # so the DuckDB oracle keeps its native NTILE.
    n_parts = max(spark.sparkContext.defaultParallelism, 32)
    rp = (
        base.repartitionByRange(n_parts, F.col("z"), F.col("okey"))
        .sortWithinPartitions("z", "okey")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["ct"]
        for r in rp.groupBy("pid").agg(F.count("*").alias("ct")).collect()
    }
    n_total = sum(counts.values())
    max_pid = max(counts) if counts else 0
    offsets, acc = [], 0
    for p in range(max_pid + 1):
        offsets.append(acc)
        acc += counts.get(p, 0)
    off = F.element_at(F.lit(offsets), F.col("pid") + 1)
    rn = (
        F.row_number().over(Window.partitionBy("pid").orderBy("z", "okey")).cast("long")
        + off
    )
    q, r = divmod(n_total, Z_BUCKETS)
    head = (q + 1) * r  # rows covered by the r buckets of size q+1
    bucket = (
        F.when(rn <= F.lit(head), F.floor((rn - 1) / F.lit(q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((rn - 1 - F.lit(head)) / F.lit(max(q, 1))) + 1)
        .cast("int")
    )
    return (
        rp.select(bucket.alias("zbucket"), "ck", "dy")
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ck").alias("cust_lo"),
            F.max("ck").alias("cust_hi"),
            F.min("dy").alias("day_lo"),
            F.max("dy").alias("day_hi"),
        )
        .orderBy("zbucket")
    )


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int = 16
) -> None:
    """The WRITE path `zorder_layout_stats` models: normalize the two
    cluster columns to the Morton scale (bounds from one tiny agg),
    range-partition by the interleaved code (sampled bounds — the
    distributed analog of the stats query's exact ntile), sort within
    partitions, and write — every output file then carries narrow
    parquet min/max footers on BOTH columns, which is what makes
    two-predicate scan pruning real (asserted file-by-file in
    tests/test_zorder_write.py)."""
    row = df.agg(
        F.min(x).alias("x_mn"), F.max(x).alias("x_mx"),
        F.min(y).alias("y_mn"), F.max(y).alias("y_mx"),
    ).collect()[0]
    if row.x_mn is None or row.y_mn is None:
        # empty (or all-NULL) input: write the empty table as-is rather
        # than crash on NULL bounds arithmetic
        df.write.mode("overwrite").parquet(path)
        return
    scale = (1 << Z_BITS) - 1
    xs = max(int(row.x_mx - row.x_mn), 1)
    ys = max(int(row.y_mx - row.y_mn), 1)
    zd = df.withColumn(
        "__zx", ((F.col(x) - F.lit(int(row.x_mn))) * scale / xs).cast("bigint")
    ).withColumn(
        "__zy", ((F.col(y) - F.lit(int(row.y_mn))) * scale / ys).cast("bigint")
    ).withColumn("__z", _z_spark("__zx", "__zy"))
    (
        zd.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__zx", "__zy", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


QUERIES = {
    "zorder_layout_stats": zorder_layout_stats,
}

ORACLES = {
    "zorder_layout_stats": f"""
    WITH base AS (
        SELECT o_orderkey AS okey, o_custkey AS ck,
               CAST(date_diff('day', DATE '{Z_EPOCH}', o_orderdate) AS BIGINT) AS dy
        FROM orders
    ), stats AS (
        SELECT MIN(ck) AS ck_mn, MAX(ck) AS ck_mx,
               MIN(dy) AS dy_mn, MAX(dy) AS dy_mx
        FROM base
    ), q AS (
        SELECT okey, ck, dy,
               ((ck - ck_mn) * {(1 << Z_BITS) - 1}) // GREATEST(ck_mx - ck_mn, 1) AS ckq,
               ((dy - dy_mn) * {(1 << Z_BITS) - 1}) // GREATEST(dy_mx - dy_mn, 1) AS dyq
        FROM base, stats
    ), z AS (
        SELECT okey, ck, dy, {_z_sql('ckq', 'dyq')} AS z FROM q
    ), tiled AS (
        SELECT ck, dy, CAST(NTILE({Z_BUCKETS}) OVER (ORDER BY z, okey) AS INTEGER) AS zbucket
        FROM z
    )
    SELECT zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(ck) AS cust_lo, MAX(ck) AS cust_hi,
           MIN(dy) AS day_lo, MAX(dy) AS day_hi
    FROM tiled
    GROUP BY 1
    ORDER BY 1
    """,
}
