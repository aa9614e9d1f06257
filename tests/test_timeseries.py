"""Timeseries operators: the bin-bucketed keyless range join must equal
the naive theta join, the hypertable cascade must equal direct
aggregation at every grain, and the DSIR weights must separate the
target slice."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_interval_bin_join_equals_theta_join(spark):
    """Generic bin join vs crossJoin+filter on intervals whose widths
    straddle the bin size (narrower, equal, wider, zero-width)."""
    from gmallbiguan_parent_spark.operators.timeseries import interval_bin_join

    t0 = datetime.datetime(2024, 3, 1)
    pts = spark.createDataFrame(
        [(i, t0 + datetime.timedelta(minutes=7 * i)) for i in range(200)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (1, t0 + datetime.timedelta(minutes=10), t0 + datetime.timedelta(minutes=25)),
            (2, t0 + datetime.timedelta(minutes=30), t0 + datetime.timedelta(minutes=150)),
            (3, t0, t0 + datetime.timedelta(hours=20)),
            (4, t0 + datetime.timedelta(minutes=41), t0 + datetime.timedelta(minutes=41)),
            (5, t0 + datetime.timedelta(hours=1), t0 + datetime.timedelta(hours=2)),
        ],
        "wid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.pid, r.wid)
        for r in interval_bin_join(pts, ivs, "ts", "w_start", "w_end", bin_seconds=3600)
        .select("pid", "wid").collect()
    }
    ref = {
        (r.pid, r.wid)
        for r in pts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("pid", "wid").collect()
    }
    assert got == ref and len(ref) > 0


def test_interval_bin_join_pre_1970_negative_epoch(spark):
    """Negative-epoch timestamps: bin ids floor (uniform bins across
    the epoch) rather than truncate toward zero; the join must still
    equal the theta join for intervals that straddle, precede, and
    follow the epoch boundary."""
    from gmallbiguan_parent_spark.operators.timeseries import interval_bin_join

    t0 = datetime.datetime(1969, 12, 31, 22, 0)  # 2h before the epoch
    pts = spark.createDataFrame(
        [(i, t0 + datetime.timedelta(minutes=13 * i)) for i in range(40)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            # straddles the epoch boundary
            (1, t0 + datetime.timedelta(minutes=90), t0 + datetime.timedelta(minutes=150)),
            # entirely pre-epoch
            (2, t0 + datetime.timedelta(minutes=5), t0 + datetime.timedelta(minutes=65)),
            # entirely post-epoch
            (3, t0 + datetime.timedelta(minutes=130), t0 + datetime.timedelta(minutes=300)),
        ],
        "wid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.pid, r.wid)
        for r in interval_bin_join(pts, ivs, "ts", "w_start", "w_end", bin_seconds=3600)
        .select("pid", "wid").collect()
    }
    ref = {
        (r.pid, r.wid)
        for r in pts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("pid", "wid").collect()
    }
    assert got == ref and len(ref) > 0


def test_spike_window_impact_matches_theta_join(spark):
    from gmallbiguan_parent_spark.operators.timeseries import (
        SPIKE_FACTOR, WINDOW_AFTER_MIN, WINDOW_BEFORE_MIN, spike_window_impact,
    )

    got = {
        (r.spike_hour, r.n_events, r.n_users, float(r.sum_value))
        for r in spike_window_impact(spark, SF_DIR).collect()
    }

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(F.count("*").alias("c"))
    wins = (
        hourly.crossJoin(F.broadcast(hourly.agg(F.avg("c").alias("a"))))
        .filter(F.col("c") > SPIKE_FACTOR * F.col("a"))
        .select(
            F.col("h").alias("spike_hour"),
            (F.col("h") - F.expr(f"INTERVAL {WINDOW_BEFORE_MIN} MINUTES")).alias("ws"),
            (F.col("h") + F.expr(f"INTERVAL {WINDOW_AFTER_MIN} MINUTES")).alias("we"),
        )
    )
    ref = {
        (r.spike_hour, r.n_events, r.n_users, float(r.sum_value))
        for r in ev.crossJoin(wins)
        .filter((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
        .groupBy("spike_hour")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(28,4)").alias("sum_value"),
        )
        .collect()
    }
    assert got == ref and len(got) > 0


def test_hypertable_cascade_equals_direct_aggregation(spark):
    from gmallbiguan_parent_spark.operators.timeseries import hypertable_rollup

    out = hypertable_rollup(spark, SF_DIR)
    got = {
        (r.grain, r.bucket_start, r.n_events, float(r.sum_value))
        for r in out.collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ref = set()
    for grain in ("hour", "day", "month"):
        ref |= {
            (grain, r.bucket_start, r.n_events, float(r.sum_value))
            for r in ev.groupBy(F.date_trunc(grain, "ts").alias("bucket_start"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(28,4)").alias("sum_value"),
            )
            .collect()
        }
    assert got == ref
    # every grain's totals reconcile to the same corpus total
    totals = {
        g: sum(n for gr, _, n, _ in got if gr == g) for g in ("hour", "day", "month")
    }
    assert totals["hour"] == totals["day"] == totals["month"] == ev.count()


def test_dsir_weights_separate_target_slice(spark):
    from gmallbiguan_parent_spark.operators.curation import (
        DSIR_TARGET_LANG, dsir_importance_weights,
    )

    out = dsir_importance_weights(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    j = out.join(docs, "doc_id").collect()
    assert len(j) > 0
    tgt = [r.dsir_weight for r in j if r.lang == DSIR_TARGET_LANG]
    raw = [r.dsir_weight for r in j if r.lang != DSIR_TARGET_LANG]
    # target-slice docs must score higher on average, and the selected
    # flag must be exactly the positive-weight predicate
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
    for r in j:
        assert r.selected == (1 if r.dsir_weight > 0 else 0)
