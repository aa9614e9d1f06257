"""Decompose streaming-query wall time for the r12 optimization round:
phase timers (staging, stream run, sink read) plus the per-micro-batch
durationMs breakdown Spark reports in StreamingQueryProgress
(addBatch / getBatch / commitOffsets / stateOperators metrics).

Usage: python tools/stream_decompose_r12.py <sf_dir> funnel|widesig|hyper
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _drain_progress(sq) -> list[dict]:
    out = []
    for p in sq.recentProgress:
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "commitTimeMs",
                            "numStateStoreInstances",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
        )
    return out


def probe_funnel(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from gmallbiguan_parent_spark.pipelines.analytics import (
        FUNNEL_STEPS,
    )
    from gmallbiguan_parent_spark.streaming.pipelines import (
        WATERMARK,
        _events_stream,
        _funnel_state_fn,
        _stage_events_with_sentinels,
    )
    from gmallbiguan_parent_spark.streaming.queries import _scratch

    res: dict = {}
    t0 = time.time()
    stage = _stage_events_with_sentinels(spark, sf_dir)
    res["stage_cold_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    _stage_events_with_sentinels(spark, sf_dir)
    res["stage_warm_s"] = round(time.time() - t0, 3)

    def run_once(tag: str) -> None:
        out_dir = _scratch("funnel_probe_")
        ev = _events_stream(spark, stage, glob="*.parquet")
        step_idx = F.when(F.col("event_type") == FUNNEL_STEPS[0], 1)
        for i, s in enumerate(FUNNEL_STEPS[1:], start=2):
            step_idx = step_idx.when(F.col("event_type") == s, i)
        rows = (
            ev.filter(
                F.col("event_type").isin(*FUNNEL_STEPS)
                | (F.col("event_id") == -1)
            )
            .select(
                "user_id",
                "ts",
                F.unix_micros("ts").alias("ts_us"),
                F.coalesce(step_idx, F.lit(0)).cast("int").alias("step"),
                "event_id",
            )
            .withWatermark("ts", WATERMARK)
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_state_fn,
                outputStructType="user_id long, level int",
                stateStructType="d1 long, d2 long, d3 long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        t0 = time.time()
        sq = (
            rows.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{out_dir}/_chk")
            .start(f"{out_dir}/data")
        )
        sq.awaitTermination()
        res[f"stream_{tag}_s"] = round(time.time() - t0, 3)
        res[f"progress_{tag}"] = _drain_progress(sq)
        t0 = time.time()
        n = spark.read.parquet(f"{out_dir}/data").count()
        res[f"sink_read_{tag}_s"] = round(time.time() - t0, 3)
        res[f"rows_{tag}"] = n

    run_once("cold")
    run_once("warm")
    return res


def probe_widesig(spark, sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.operators.similarity import (
        NEARDUP_COSINE,
        SRP_WIDE_RADIUS,
        _multiprobe_pairs_from,
        _srp_probe_masks,
    )
    from gmallbiguan_parent_spark.streaming.queries import (
        _scratch,
        _wide_sig_ingest,
    )

    res: dict = {}

    def run_once(tag: str) -> None:
        stage = _scratch("swide_probe_src_")
        store = _scratch("swide_probe_store_")
        t0 = time.time()
        bits = _wide_sig_ingest(spark, sf_dir, stage, store)
        res[f"ingest_{tag}_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        sigs = spark.read.parquet(f"{store}/srp_sigs_wide").select(
            "vec_id", "v", "table_id", "sig"
        )
        pairs = _multiprobe_pairs_from(
            sigs, _srp_probe_masks(bits, SRP_WIDE_RADIUS), NEARDUP_COSINE
        )
        pairs.write.format("noop").mode("overwrite").save()
        res[f"pairs_{tag}_s"] = round(time.time() - t0, 3)

    run_once("cold")
    run_once("warm")
    return res


def probe_hyper(spark, sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.streaming import queries as sq_mod

    res: dict = {}
    for tag in ("cold", "warm"):
        t0 = time.time()
        df = sq_mod.STREAM_QUERIES["stream_hypertable_hour_append"](
            spark, sf_dir
        )
        df.write.format("noop").mode("overwrite").save()
        res[f"total_{tag}_s"] = round(time.time() - t0, 3)
    return res


def main() -> None:
    sf_dir = sys.argv[1]
    which = sys.argv[2]
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark(f"stream_decompose_{which}")
    t0 = time.time()
    spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()
    calib = round(time.time() - t0, 3)
    fn = {"funnel": probe_funnel, "widesig": probe_widesig, "hyper": probe_hyper}[
        which
    ]
    res = fn(spark, sf_dir)
    res["_calib_jvm_s"] = calib
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
