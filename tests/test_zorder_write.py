"""Z-order write path: every output file must carry a narrow span on
BOTH cluster columns (the parquet-footer min/max evidence that a
predicate on either dimension prunes files)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_zordered_files_are_narrow_on_both_dims(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.layout import write_zordered

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("day"),
    )
    path = str(tmp_path / "zordered")
    write_zordered(orders, path, "o_custkey", "day", n_files=8)

    back = spark.read.parquet(path).withColumn("file", F.input_file_name())
    per_file = back.groupBy("file").agg(
        F.count("*").alias("n"),
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
        (F.max("day") - F.min("day")).alias("dy_span"),
    ).collect()
    assert back.count() == orders.count()
    assert len(per_file) >= 4, "range partitioning should spread files"

    glob = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("day") - F.min("day")).alias("dy"),
    ).collect()[0]
    ck_frac = sum(r.ck_span / glob.ck for r in per_file) / len(per_file)
    dy_frac = sum(r.dy_span / glob.dy for r in per_file) / len(per_file)
    # a single-column sort would put ~100% span on the secondary dim;
    # z-order keeps BOTH well below
    assert ck_frac < 0.7, f"custkey mean file-span fraction {ck_frac}"
    assert dy_frac < 0.7, f"day mean file-span fraction {dy_frac}"


def test_distributed_ntile_matches_native_window_ntile(spark):
    """zorder_layout_stats' range-partition + offset row-number bucket
    assignment must reproduce the native window NTILE bit-for-bit (the
    DuckDB oracle uses native NTILE; this pins the Spark side too)."""
    from pyspark.sql import Window

    from gmallbiguan_parent_spark.operators.layout import (
        Z_BUCKETS, zorder_layout_stats,
    )

    got = {r.zbucket: (r.n_rows, r.cust_lo, r.cust_hi, r.day_lo, r.day_hi)
           for r in zorder_layout_stats(spark, SF_DIR).collect()}

    # independent reference: same z computation, native ntile window
    from gmallbiguan_parent_spark.operators.layout import Z_BITS, Z_EPOCH, _z_spark

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    day = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast("bigint")
    raw = orders.select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("ck"), day.alias("dy")
    )
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
    bucket = F.ntile(Z_BUCKETS).over(Window.orderBy("z", "okey"))
    ref = {
        r.zbucket: (r.n_rows, r.cust_lo, r.cust_hi, r.day_lo, r.day_hi)
        for r in base.select(bucket.alias("zbucket"), "ck", "dy")
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ck").alias("cust_lo"), F.max("ck").alias("cust_hi"),
            F.min("dy").alias("day_lo"), F.max("dy").alias("day_hi"),
        ).collect()
    }
    assert got == ref
