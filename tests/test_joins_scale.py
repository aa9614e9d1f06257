"""Join strategy utilities: salted join equivalence, bucketed
shuffle-free joins (plan-asserted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.operators.joins import salted_join, write_bucketed

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    plain = li.join(part, li.l_partkey == part.p_partkey, "inner")
    salted = salted_join(li, part, "l_partkey", "p_partkey", n_salt=4)
    assert salted.count() == plain.count()
    a = plain.groupBy("p_brand").count().collect()
    b = salted.groupBy("p_brand").count().collect()
    assert {(r.p_brand, r["count"]) for r in a} == {(r.p_brand, r["count"]) for r in b}


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 4)
    write_bucketed(li.withColumnRenamed("l_orderkey", "lo_key"), "b_lineitem", "lo_key", 4)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.lo_key, "inner")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located bucketed join: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    # sanity: result matches the plain join
    plain_ct = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == plain_ct
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
