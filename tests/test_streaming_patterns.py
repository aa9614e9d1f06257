"""Streaming patterns beyond the per-query parity tests: session
windows, and the canonical foreachBatch idempotent-gold + per-batch
config re-read pattern (the reference's 5 s config poll, SURVEY §7.5.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmallbiguan_parent_spark.io import write_partition_overwrite
from gmallbiguan_parent_spark.streaming.pipelines import _events_stream

SF = "/root/testdata/sf0.001"


def test_session_window_streaming_matches_batch_sessionize(spark, tmp_path):
    """F.session_window (30-min gap) on a bounded replay must produce
    the same per-user session count as the batch lag/running-sum
    formulation (analytics.sessionize)."""
    from gmallbiguan_parent_spark.pipelines.analytics import sessionize

    ev = _events_stream(spark, SF)
    agg = (
        ev.withWatermark("ts", "3 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("ev_ct"))
    )
    out = str(tmp_path / "sessions")
    (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out}/_chk")
        .start(f"{out}/data")
        .awaitTermination()
    )
    got = spark.read.parquet(f"{out}/data")
    stream_counts = {
        r.user_id: r.sessions
        for r in got.groupBy("user_id").agg(F.count("*").alias("sessions")).collect()
    }
    batch = {r.user_id: r.session_ct for r in sessionize(spark, SF).collect()}
    # append mode withholds each user's final (never-closed) session
    for user, ct in batch.items():
        assert stream_counts.get(user, 0) in (ct, ct - 1), (user, ct, stream_counts.get(user))
    emitted = sum(stream_counts.values())
    total = sum(batch.values())
    assert emitted >= total - len(batch)


def test_foreachbatch_idempotent_gold_with_config_reread(spark, tmp_path):
    """foreachBatch = the streaming home for (a) idempotent partition
    overwrite and (b) per-microbatch config re-read. Run the same
    bounded replay twice with a config change between runs: the gold
    table must show no duplicates and must follow the new config."""
    gold = str(tmp_path / "gold")
    config = {"included_types": ["view", "click"]}

    def make_batch_fn(cfg):
        def fn(batch_df, batch_id):
            # per-batch config read (the 5 s poll equivalent)
            included = cfg["included_types"]
            daily = (
                batch_df.filter(F.col("event_type").isin(*included))
                .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
                .agg(F.count("*").alias("pv_ct"))
            )
            write_partition_overwrite(daily, gold, ["dt"])
        return fn

    def run_once():
        ev = _events_stream(spark, SF)
        (
            ev.writeStream.foreachBatch(make_batch_fn(config))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"chk_{config['included_types'][0]}_{len(config['included_types'])}"))
            .start()
            .awaitTermination()
        )

    run_once()
    first = {r.dt: r.pv_ct for r in spark.read.parquet(gold).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    expected = ev.filter(F.col("event_type").isin("view", "click")).count()
    assert sum(first.values()) == expected

    # config changes; replay overwrites the same day partitions idempotently
    config["included_types"] = ["purchase"]
    run_once()
    second = {r.dt: r.pv_ct for r in spark.read.parquet(gold).collect()}
    expected2 = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(second.values()) == expected2


def test_stream_stream_left_outer_join_emits_null_after_watermark(spark, tmp_path):
    """Stream-stream LEFT OUTER join: matched pairs emit immediately;
    an unmatched left row is withheld until the watermark passes its
    join bound, then emits with nulls (state eviction). A far-future
    event on both streams pushes the watermark so the old unmatched
    row must flush during the bounded replay."""
    import datetime

    t0 = datetime.datetime(2021, 1, 1, 0, 0, 0)

    def mk(rows, name):
        df = spark.createDataFrame(rows, "id long, tag string, ts timestamp")
        p = str(tmp_path / name)
        df.write.parquet(p)
        return spark.readStream.schema("id long, tag string, ts timestamp").parquet(p)

    left = mk(
        [(1, "L1", t0), (2, "L2", t0 + datetime.timedelta(minutes=10)),
         (99, "PUSH_L", t0 + datetime.timedelta(hours=2))],
        "left",
    ).withWatermark("ts", "3 seconds")
    right = mk(
        [(1, "R1", t0 + datetime.timedelta(minutes=1)),
         (99, "PUSH_R", t0 + datetime.timedelta(hours=2))],
        "right",
    ).withWatermark("ts", "3 seconds").select(
        F.col("id").alias("rid"), F.col("tag").alias("rtag"), F.col("ts").alias("rts")
    )

    joined = left.join(
        right,
        (F.col("id") == F.col("rid"))
        & (F.col("rts") >= F.col("ts") - F.expr("interval 5 minutes"))
        & (F.col("rts") <= F.col("ts") + F.expr("interval 5 minutes")),
        "leftOuter",
    )
    out = str(tmp_path / "joined")
    (
        joined.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out}/_chk")
        .start(f"{out}/data")
        .awaitTermination()
    )
    got = {r.id: r.rtag for r in spark.read.parquet(f"{out}/data").collect()}
    assert got[1] == "R1"        # matched within the interval
    assert got[2] is None        # evicted unmatched -> null-filled
    assert got[99] == "PUSH_R"   # watermark pusher matches itself


def test_watermark_drops_late_rows_in_append_aggregation(spark, tmp_path):
    """ST8 semantics: with watermark delay W, a row arriving after the
    watermark has passed its window's end is DROPPED from an append-mode
    aggregation. Two micro-batches: batch 1 advances the watermark far
    ahead; batch 2 delivers a too-late event for an old window — the old
    window's count must not include it."""
    import datetime

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2021, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "id long, ts timestamp"

    def write_flat(path, rows):
        pq.write_table(
            pa.table(
                {"id": pa.array([r[0] for r in rows], pa.int64()),
                 "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}
            ),
            path,
        )

    # batch 1: one event in the old window + one far-future event that
    # pushes the watermark beyond the old window's end
    write_flat(f"{src}/b1.parquet", [(1, t0), (2, t0 + datetime.timedelta(hours=3))])

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("ct"))
        .select(F.col("w.start").alias("stt"), "ct")
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out}/_chk")
        .start(f"{out}/data")
    )
    q.awaitTermination()

    # batch 2: a LATE event for the t0 window (watermark is already ~3h past)
    write_flat(f"{src}/b2.parquet", [(3, t0 + datetime.timedelta(minutes=1))])
    q2 = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out}/_chk")
        .start(f"{out}/data")
    )
    q2.awaitTermination()

    got = {r.stt: r.ct for r in spark.read.parquet(f"{out}/data").collect()}
    # the t0 window closed with ONLY the on-time event; the late row was dropped
    assert got[t0] == 1


def test_stream_keyword_stats_matches_batch(spark):
    """The streaming keyword pipeline's bounded complete-mode replay
    must equal the batch keyword aggregation exactly."""
    from conftest import SF_DIR
    from gmallbiguan_parent_spark.pipelines.dws import keyword_stats
    from gmallbiguan_parent_spark.streaming.queries import stream_keyword_stats_q

    batch = {(r.keyword, r.source): r.ct for r in keyword_stats(spark, SF_DIR).collect()}
    stream = {(r.keyword, r.source): r.ct for r in stream_keyword_stats_q(spark, SF_DIR).collect()}
    assert stream == batch and batch


def test_stream_rate_limit_matches_batch_per_event(spark):
    """Stronger than the per-hour oracle: every individual admission
    decision must agree with the batch row_number rule."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import load_table
    from gmallbiguan_parent_spark.operators.quality import RATE_CAP
    from gmallbiguan_parent_spark.streaming.pipelines import (
        run_stream_to_df, stream_rate_limit_keyed,
    )
    from tests.conftest import SF_DIR

    got = {
        (r.user_id, r.event_id): r.kept
        for r in run_stream_to_df(spark, SF_DIR, stream_rate_limit_keyed).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_id): r.rn <= RATE_CAP
        for r in ev.select("user_id", "event_id", "ts")
        .withColumn("rn", F.row_number().over(w))
        .collect()
    }
    assert got == want


def test_stream_transition_pairs_match_batch_lag(spark):
    """Every emitted (prev, cur) pair must match the batch lag()
    window exactly — multiset equality per user."""
    from collections import Counter

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import load_table
    from gmallbiguan_parent_spark.streaming.pipelines import (
        run_stream_to_df, stream_transition_matrix,
    )
    from tests.conftest import SF_DIR

    got = Counter(
        (r.user_id, r.prev_type, r.cur_type)
        for r in run_stream_to_df(spark, SF_DIR, stream_transition_matrix).collect()
    )
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = Counter(
        (r.user_id, r.prev_type, r.event_type)
        for r in ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .collect()
    )
    assert got == want


def _read_sorted(spark, path, cols):
    return sorted(tuple(r) for r in spark.read.parquet(path).select(*cols).collect())


def test_rate_limit_ledger_retry_replays_identical_decisions(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the ledger write but
    before the checkpoint commit replays the batch. The admit pass must
    recompute IDENTICAL decisions on retry — before the own-partition
    exclusion in _ledger_prior, the retried batch counted its own prior
    ledger write as 'seen' and double-counted the batch (over-rejecting
    rows that were admitted the first time)."""
    import datetime

    from gmallbiguan_parent_spark.operators.quality import RATE_CAP
    from gmallbiguan_parent_spark.streaming.pipelines import _rate_limit_admit_batch

    out = str(tmp_path / "rl")
    hr = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def batch(ids):
        return spark.createDataFrame(
            [(i, hr + datetime.timedelta(seconds=i), 7) for i in ids],
            "event_id int, ts timestamp, user_id int",
        )

    # batch 0 admits RATE_CAP - 2 events; batch 1 spills past the cap
    _rate_limit_admit_batch(batch(range(RATE_CAP - 2)), 0, out)
    _rate_limit_admit_batch(batch(range(100, 100 + RATE_CAP)), 1, out)
    first = _read_sorted(spark, f"{out}/data/batch_id=1", ["event_id", "kept"])
    kept_ct = sum(1 for _, k in first if k)
    assert kept_ct == 2, f"batch 1 should admit exactly 2 (cap spill), got {kept_ct}"
    # retry of batch 1: ledger already holds batch_id=1 from the first attempt
    _rate_limit_admit_batch(batch(range(100, 100 + RATE_CAP)), 1, out)
    retry = _read_sorted(spark, f"{out}/data/batch_id=1", ["event_id", "kept"])
    assert retry == first, "retried batch must recompute identical admissions"


def test_dedup_gate_retry_replays_identical_decisions(spark, tmp_path):
    """Retry of the dedup gate's micro-batch: without the own-partition
    exclusion, the retried batch's fingerprints appear already-ingested
    (its own prior ledger write), every row is rejected, and the
    overwrite durably LOSES the fingerprint's keeper."""
    from gmallbiguan_parent_spark.streaming.pipelines import _dedup_gate_admit_batch

    out = str(tmp_path / "dg")

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    _dedup_gate_admit_batch(batch([(1, "en", "alpha"), (2, "en", "beta")]), 0, out)
    # batch 1: new fingerprint 'gamma' + cross-batch duplicate of 'alpha'
    _dedup_gate_admit_batch(batch([(3, "en", "gamma"), (4, "en", "alpha")]), 1, out)
    first = _read_sorted(spark, f"{out}/data/batch_id=1", ["doc_id", "admitted"])
    assert first == [(3, True), (4, False)]
    _dedup_gate_admit_batch(batch([(3, "en", "gamma"), (4, "en", "alpha")]), 1, out)
    retry = _read_sorted(spark, f"{out}/data/batch_id=1", ["doc_id", "admitted"])
    assert retry == first, "retried batch must re-admit its own keeper"


def test_ledger_prior_fails_on_corrupt_partition(spark, tmp_path):
    """A corrupt committed ledger partition must FAIL the batch (the
    checkpoint retries it later) — the old bare except-Exception treated
    ANY read failure as 'no ledger yet' and durably wrote decisions
    computed against empty history."""
    import pytest

    from gmallbiguan_parent_spark.streaming.pipelines import _ledger_prior

    ledger = tmp_path / "led"
    bad = ledger / "batch_id=0"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    # the failure must come from the READ (at DataFrame creation or
    # collect), never be swallowed into the 'no ledger yet' None — the
    # old bare-except regression; AssertionError is re-raised so a
    # silent None can't masquerade as the expected read error
    raised = False
    try:
        df = _ledger_prior(spark, str(ledger), 1)
        assert df is not None, "corrupt partition must not be treated as 'no ledger'"
        df.collect()
    except AssertionError:
        raise
    except Exception:
        raised = True
    assert raised, "corrupt ledger partition must raise, not pass silently"
    # a genuinely-missing ledger is still an explicit first batch
    assert _ledger_prior(spark, str(tmp_path / "nope"), 1) is None
    # and an interrupted compaction fails loudly instead of serving
    # truncated history
    (ledger / "_COMPACT_MANIFEST.json").write_text('{"upto": 0, "fold": []}')
    with pytest.raises(RuntimeError, match="incomplete compaction"):
        _ledger_prior(spark, str(ledger), 1)

