"""Bloom runtime-filter join: pruning effectiveness + exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bloom_prunes_but_never_drops_matches(spark):
    from gmallbiguan_parent_spark.io import load_table
    from gmallbiguan_parent_spark.operators.joins import (
        BLOOM_PRICE_MIN, bloom_bits_for, bloom_mask_words, bloom_probe_predicate,
    )

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    sel = orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN).select("o_orderkey")
    n_bits = bloom_bits_for(sel.count())
    words = bloom_mask_words(sel, "o_orderkey", n_bits)

    total = li.count()
    probed = li.select("l_orderkey")
    survived = probed.filter(bloom_probe_predicate("l_orderkey", n_bits, words))
    n_surv = survived.count()
    # really prunes: the predicate is selective, most lines drop pre-join
    assert n_surv < total * 0.2, f"bloom kept {n_surv}/{total}"
    # zero false negatives: every truly-matching line survives the mask
    truly = li.join(sel, li.l_orderkey == sel.o_orderkey).count()
    confirmed = survived.join(sel, survived.l_orderkey == sel.o_orderkey).count()
    assert confirmed == truly


def test_bloom_filtered_revenue_equals_plain_join(spark):
    from gmallbiguan_parent_spark.functions import dec
    from gmallbiguan_parent_spark.io import load_table
    from gmallbiguan_parent_spark.operators.joins import (
        BLOOM_PRICE_MIN, bloom_filtered_revenue,
    )

    got = {r.o_orderpriority: (float(r.revenue), r.line_ct, r.order_ct)
           for r in bloom_filtered_revenue(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    disc = (dec("l_extendedprice") * (1 - dec("l_discount"))).cast("decimal(18,6)")
    plain = (
        li.join(orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum(disc).alias("revenue"), F.count("*").alias("line_ct"),
             F.countDistinct("o_orderkey").alias("order_ct"))
    )
    want = {r.o_orderpriority: (float(r.revenue), r.line_ct, r.order_ct)
            for r in plain.collect()}
    assert got == want
