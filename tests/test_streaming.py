"""Streaming-vs-batch parity (SURVEY.md §2.8): a bounded replay through
the Structured Streaming plans must reproduce the batch answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import load_table
from gmallbiguan_parent_spark.streaming.pipelines import (
    run_stream_to_df,
    stream_jump_detect,
    stream_uv_dedup,
    stream_visitor_stats,
)

SF = "/root/testdata/sf0.001"


def test_stream_visitor_stats_matches_batch(spark, tmp_path):
    from gmallbiguan_parent_spark.pipelines.dws import visitor_stats_window

    got = run_stream_to_df(spark, SF, stream_visitor_stats, str(tmp_path / "vs"))
    batch = visitor_stats_window(spark, SF)
    # Append mode only emits windows the final watermark (max_ts - delay)
    # has passed — trailing unfinalized windows are legitimately absent.
    ev = load_table(spark, SF, "events")
    import datetime
    max_ts = ev.select(F.max("ts").alias("m")).collect()[0].m
    cutoff = max_ts - datetime.timedelta(seconds=3)
    g = {(r.stt, r.event_type): (r.pv_ct, str(r.value_sum)) for r in got.collect()}
    b = {
        (r.stt, r.event_type): (r.pv_ct, str(r.value_sum))
        for r in batch.collect()
        if r.edt <= cutoff
    }
    assert b.items() <= g.items()
    extra = set(g) - set(b)
    assert all(stt > cutoff - datetime.timedelta(minutes=10) for stt, _ in extra)


def test_stream_uv_dedup_matches_batch(spark, tmp_path):
    got = run_stream_to_df(spark, SF, stream_uv_dedup, str(tmp_path / "uv"))
    # batch twin: one first event per (user, day)
    ev = load_table(spark, SF, "events")
    n_expected = (
        ev.select("user_id", F.to_date("ts").alias("dt"))
        .distinct()
        .count()
    )
    assert got.count() == n_expected
    assert got.select("user_id", "dt").distinct().count() == n_expected


def test_stream_is_new_repair_matches_batch(spark, tmp_path):
    from pyspark.sql import Window

    from gmallbiguan_parent_spark.streaming.pipelines import stream_is_new_repair

    got = run_stream_to_df(spark, SF, stream_is_new_repair, str(tmp_path / "inr"))
    stream_flags = {r.event_id: r.is_new for r in got.collect()}

    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id")
    batch = (
        ev.select("user_id", "event_id", F.to_date("ts").alias("dt"))
        .withColumn("first_dt", F.min("dt").over(w))
        .withColumn("is_new", F.when(F.col("dt") == F.col("first_dt"), "1").otherwise("0"))
    )
    batch_flags = {r.event_id: r.is_new for r in batch.collect()}
    assert stream_flags == batch_flags


def test_stream_payment_wide_matches_batch_join(spark, tmp_path):
    from gmallbiguan_parent_spark.streaming.pipelines import stream_payment_wide

    got = run_stream_to_df(spark, SF, stream_payment_wide, str(tmp_path / "pw"))
    stream_pairs = {(r.pay_id, r.act_id) for r in got.collect()}

    ev = load_table(spark, SF, "events")
    pay = ev.filter(ev.event_type == "purchase").select(
        F.col("event_id").alias("pay_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    act = ev.filter(ev.event_type.isin("view", "click")).select(
        F.col("event_id").alias("act_id"), F.col("user_id").alias("au"), F.col("ts").alias("ats")
    )
    batch = pay.join(
        act,
        (F.col("pu") == F.col("au"))
        & (F.col("ats") <= F.col("pts"))
        & (F.unix_micros("ats") > F.unix_micros("pts") - 1800 * 1_000_000),
    )
    batch_pairs = {(r.pay_id, r.act_id) for r in batch.collect()}
    assert stream_pairs == batch_pairs


def test_stream_jump_detect_equals_batch(spark, tmp_path):
    """The sentinel flush (per-user event past max_ts + timeout) decides
    every event, so the replayed stream's per-event jump flags equal the
    batch lead()-based answer EXACTLY — including each user's final
    event, which the reference emits via CEP timeout."""
    from pyspark.sql import Window

    from gmallbiguan_parent_spark.pipelines.dwm import JUMP_TIMEOUT_S

    got = run_stream_to_df(spark, SF, stream_jump_detect, str(tmp_path / "jd"))
    assert got.filter(F.col("event_id") < 0).count() == 0  # no sentinel leaks
    stream_flags = {(r.user_id, r.event_id): r.is_jump for r in got.collect()}

    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        ev.select("user_id", "event_id", "ts")
        .withColumn("next_ts", F.lead("ts").over(w))
        .withColumn(
            "is_jump",
            F.col("next_ts").isNull()
            | (F.unix_micros("next_ts") - F.unix_micros("ts") > JUMP_TIMEOUT_S * 1_000_000),
        )
    )
    batch_flags = {(r.user_id, r.event_id): r.is_jump for r in marked.collect()}
    assert stream_flags == batch_flags


def test_stream_jump_detect_q_equals_batch_user_jump(spark):
    from gmallbiguan_parent_spark.pipelines.dwm import user_jump
    from gmallbiguan_parent_spark.streaming.queries import stream_jump_detect_q

    got = {(r.dt, r.uj_ct, r.ev_ct) for r in stream_jump_detect_q(spark, SF).collect()}
    want = {(r.dt, r.uj_ct, r.ev_ct) for r in user_jump(spark, SF).collect()}
    assert got == want


def test_stream_user_sessions_matches_batch(spark):
    """session_window streaming == lag/cumsum batch sessionization,
    session for session (the >= gap merge rule is aligned on both)."""
    from gmallbiguan_parent_spark.pipelines.dwm import user_sessions
    from gmallbiguan_parent_spark.streaming.queries import stream_user_sessions_q

    key = lambda r: (r.user_id, r.session_start, r.session_end, r.ev_ct, r.duration_us)
    got = sorted(key(r) for r in stream_user_sessions_q(spark, SF).collect())
    want = sorted(key(r) for r in user_sessions(spark, SF).collect())
    assert got == want
