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
