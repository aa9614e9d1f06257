"""Round-6 streaming production twins: the checkpointed append-mode
forms of the round-5 ingest screens (VERDICT r5 item 3) — restart
recovery for the stateless decontamination sink, batch parity for the
sentinel-closed append-mode hypertable hour grain."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def _write_docs(spark, path: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_decontaminate_sink_restart_scores_only_new_files(spark, tmp_path):
    """ST7 for the ingest screen: resuming with the same checkpoint
    scores ONLY newly-arrived files (no re-scores, no duplicates), and
    decisions match the stateless screen's semantics."""
    import os

    from gmallbiguan_parent_spark.streaming.pipelines import stream_decontaminate_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)

    contaminated = "alpha bravo charlie delta echo foxtrot golf hotel"
    clean = "one two three four five six seven eight nine ten"
    bench = spark.createDataFrame([(contaminated,)], "gram string").withColumn(
        "hit", F.lit(1)
    )

    _write_docs(spark, src, [(1, contaminated + " extra tail tokens here padd pad2 pad3"),
                             (2, clean)])
    stream_decontaminate_sink(spark, src, out, bench=bench, glob="*.parquet")
    first = {r.doc_id: r.decision for r in spark.read.parquet(f"{out}/data").collect()}
    assert set(first) == {1, 2}
    assert first[2] == "keep" and first[1] in ("drop", "review")

    # a new file lands; the RESUMED query (same checkpoint) scores only it
    _write_docs(spark, src, [(3, clean + " more words land here now")])
    stream_decontaminate_sink(spark, src, out, bench=bench, glob="*.parquet")
    rows = spark.read.parquet(f"{out}/data").collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3]  # no duplicates

    # a third resume with nothing new appends nothing
    stream_decontaminate_sink(spark, src, out, bench=bench, glob="*.parquet")
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/data").collect()
    ) == [1, 2, 3]


def test_stream_decontaminate_sink_default_bench_matches_batch(spark, tmp_path):
    """With the harness pseudo-benchmark (bench=None), the sink's rows
    equal batch ngram_decontaminate exactly."""
    from gmallbiguan_parent_spark.operators.dedup import ngram_decontaminate
    from gmallbiguan_parent_spark.streaming.pipelines import stream_decontaminate_sink

    out = str(tmp_path / "out")
    stream_decontaminate_sink(spark, SF_DIR, out)
    got = {
        (r.doc_id, r.gram_ct, r.hit_ct, str(r.contam_frac), r.decision)
        for r in spark.read.parquet(f"{out}/data").collect()
    }
    want = {
        (r.doc_id, r.gram_ct, r.hit_ct, str(r.contam_frac), r.decision)
        for r in ngram_decontaminate(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_stream_hypertable_hour_append_matches_batch_hour_grain(spark, tmp_path):
    """The append-mode production twin (watermark-closed windows, no
    complete-mode re-emission) must equal the batch hour grain — every
    real hour window closes via the sentinel, lands exactly once, and
    carries the identical decimal sum."""
    from gmallbiguan_parent_spark.operators.timeseries import hypertable_rollup
    from gmallbiguan_parent_spark.streaming.pipelines import (
        stream_hypertable_hour_sink,
    )

    out = str(tmp_path / "out")
    stream_hypertable_hour_sink(spark, SF_DIR, out)
    got = {
        (r.bucket_start, r.n_events, str(r.sum_value))
        for r in spark.read.parquet(f"{out}/data").collect()
    }
    want = {
        (r.bucket_start, r.n_events, str(r.sum_value))
        for r in hypertable_rollup(spark, SF_DIR).filter(
            F.col("grain") == "hour"
        ).collect()
    }
    assert got == want and got


def test_stream_gmv_cusum_equals_batch(spark):
    """The streaming CUSUM alert (per-batch daily ledger + shared
    decimal fold) must equal batch gmv_cusum exactly — decimal
    partials sum associatively, so the batch split cannot matter."""
    from gmallbiguan_parent_spark.pipelines.analytics import gmv_cusum
    from gmallbiguan_parent_spark.streaming.queries import stream_gmv_cusum_q

    got = {
        (r.dt, r.gmv, r.s_pos, r.s_neg, r.shift_flag)
        for r in stream_gmv_cusum_q(spark, SF_DIR).collect()
    }
    want = {
        (r.dt, r.gmv, r.s_pos, r.s_neg, r.shift_flag)
        for r in gmv_cusum(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_stream_window_funnel_equals_batch(spark):
    """The keyed-state dp is the batch fold's accumulator, so the
    replayed level histogram must equal batch window_funnel exactly."""
    from gmallbiguan_parent_spark.pipelines.analytics import window_funnel
    from gmallbiguan_parent_spark.streaming.queries import stream_window_funnel_q

    got = {(r.level, r.user_ct) for r in stream_window_funnel_q(spark, SF_DIR).collect()}
    want = {(r.level, r.user_ct) for r in window_funnel(spark, SF_DIR).collect()}
    assert got == want and got


def test_stream_dedup_gate_cross_batch_ledger(spark, tmp_path):
    """A fingerprint admitted in an earlier batch must be rejected on
    resume (the ledger carries the seen-set across restarts); new
    fingerprints still admit; within-batch dups keep min doc_id."""
    import os

    from gmallbiguan_parent_spark.streaming.pipelines import stream_dedup_gate

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    docs_dir = f"{src}/documents.parquet"

    a = "alpha beta gamma delta"
    b = "one two three four"
    c = "five six seven eight"
    spark.createDataFrame(
        [(2, a, "en"), (5, a, "en"), (3, b, "en")], "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    stream_dedup_gate(spark, src, out)
    d1 = {r.doc_id: r.admitted for r in spark.read.parquet(f"{out}/data").collect()}
    assert d1 == {2: True, 5: False, 3: True}  # min doc_id wins in-batch

    # batch 2: a's fingerprint re-arrives (doc 1, smaller id!) + new c
    spark.createDataFrame(
        [(1, a, "en"), (7, c, "en")], "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    stream_dedup_gate(spark, src, out)
    d2 = {r.doc_id: r.admitted for r in spark.read.parquet(f"{out}/data").collect()}
    # admission is arrival-ordered: doc 1 arrived AFTER doc 2's admit,
    # so the ledger rejects it even though its id is smaller
    assert d2 == {2: True, 5: False, 3: True, 1: False, 7: True}


def test_stream_ann_topk_equals_batch(spark):
    """Online serving must answer exactly like the batch IVF probe:
    same quantizer, same cells, same tie-break — full row agreement."""
    from gmallbiguan_parent_spark.operators.similarity import ann_ivf_topk
    from gmallbiguan_parent_spark.streaming.queries import stream_ann_topk_q

    got = {
        (r.query_id, r.probe_cell, r.rank, r.corpus_id, r.cosine)
        for r in stream_ann_topk_q(spark, SF_DIR).collect()
    }
    want = {
        (r.query_id, r.probe_cell, r.rank, r.corpus_id, r.cosine)
        for r in ann_ivf_topk(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_stream_semantic_decontaminate_equals_batch(spark):
    """The in-stream semantic screen must flag exactly the batch
    screen's rows: same SRP width, buckets, cosine, and tie-break."""
    from gmallbiguan_parent_spark.operators.similarity import semantic_decontaminate
    from gmallbiguan_parent_spark.streaming.queries import (
        stream_semantic_decontaminate_q,
    )

    cols = ("vec_id", "hit_ct", "max_cosine", "nearest_bench", "decision")
    got = {
        tuple(getattr(r, c) for c in cols)
        for r in stream_semantic_decontaminate_q(spark, SF_DIR).collect()
    }
    want = {
        tuple(getattr(r, c) for c in cols)
        for r in semantic_decontaminate(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_stream_cms_cross_batch_additivity(spark, tmp_path):
    """Counters maintained across two micro-batches must sum to the
    single-scan sketch: re-running the fold after new files arrive
    adds ONLY the new tokens' counts, and the merged ledger equals a
    batch recount of everything seen."""
    import os

    from gmallbiguan_parent_spark.streaming.pipelines import stream_cms_sketch

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    docs_dir = f"{src}/documents.parquet"
    _write_docs(spark, docs_dir, [(1, "spark spark flink"), (2, "flink duck")])
    stream_cms_sketch(spark, src, out)
    _write_docs(spark, docs_dir, [(3, "spark duck duck")])
    stream_cms_sketch(spark, src, out)

    merged = {
        (r.r, r.bucket): r.total
        for r in spark.read.parquet(f"{out}/data")
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    from gmallbiguan_parent_spark.functions import tokenize
    from gmallbiguan_parent_spark.operators.sketches import cms_bucket_entries

    expect = {
        (r.r, r.bucket): r.total
        for r in spark.read.parquet(docs_dir)
        .select(F.explode(tokenize("text")).alias("token"))
        .select(F.explode(cms_bucket_entries(F.col("token"))).alias("h"))
        .groupBy(F.col("h.r").alias("r"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").alias("total"))
        .collect()
    }
    assert merged == expect


def test_stream_psi_drift_equals_batch(spark):
    """The replayed drift report must equal the batch PSI table
    byte-for-byte (bucket counting is additive over micro-batches)."""
    from gmallbiguan_parent_spark.operators.quality import psi_drift
    from gmallbiguan_parent_spark.streaming.queries import stream_psi_drift_q

    got = sorted(map(tuple, stream_psi_drift_q(spark, SF_DIR).collect()))
    want = sorted(map(tuple, psi_drift(spark, SF_DIR).collect()))
    assert got == want


def test_stream_psi_fold_restart_adds_only_new_batches(spark, tmp_path):
    """Resuming the drift fold with the same checkpoint processes ONLY
    newly-arrived files; the summed ledger equals a batch recount of
    the full current window."""
    import datetime
    import os

    from gmallbiguan_parent_spark.operators.quality import (
        PSI_SPLIT_DATE, _psi_bucket_counts, _psi_cuts,
    )
    from gmallbiguan_parent_spark.streaming.pipelines import stream_psi_fold

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    orders_dir = f"{src}/orders.parquet"

    def d(s):
        return datetime.date.fromisoformat(s)

    schema = "o_orderkey long, o_orderdate date, o_totalprice double"
    ref = [(i, d("1995-06-01"), 100.0 * (i + 1)) for i in range(10)]
    cur1 = [(100 + i, d("1996-06-01"), 150.0 * (i + 1)) for i in range(5)]
    spark.createDataFrame(ref + cur1, schema).coalesce(1).write.mode("append").parquet(orders_dir)
    stream_psi_fold(spark, src, out)
    n1 = spark.read.parquet(f"{out}/data").agg(F.sum("ct")).collect()[0][0]
    assert n1 == 5  # only the current window is folded

    cur2 = [(200 + i, d("1997-01-01"), 90.0 * (i + 1)) for i in range(3)]
    spark.createDataFrame(cur2, schema).coalesce(1).write.mode("append").parquet(orders_dir)
    stream_psi_fold(spark, src, out)
    merged = {
        r.bucket: r.total
        for r in spark.read.parquet(f"{out}/data")
        .groupBy("bucket").agg(F.sum("ct").alias("total")).collect()
    }
    assert sum(merged.values()) == 8
    all_orders = spark.read.parquet(orders_dir)
    ref_df = all_orders.filter(F.col("o_orderdate") < PSI_SPLIT_DATE)
    cur_df = all_orders.filter(F.col("o_orderdate") >= PSI_SPLIT_DATE)
    expect = {
        r.bucket: r.ct
        for r in _psi_bucket_counts(cur_df, _psi_cuts(ref_df)).collect()
    }
    assert merged == expect
