"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints a detail JSON line (warm + extended per-query metrics) followed by
the compact headline record as the FINAL line — the one the driver parses:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count of the materialized result)
after a warm-up of the session; per-query wall time is recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # analytical core
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "order_wide",
    "product_stats",
    "province_stats",
    "region_rollup",
    "topn_orders_per_priority",
    "running_gmv",
    # behavior-log / streaming-shaped
    "visitor_stats_window",
    "uv_daily",
    "user_jump",
    "payment_wide",
    "cdc_route",
    "keyword_stats",
    "keyword_score",
    "asof_purchase_context",
    "visitor_stats_full",
    # training-data operators
    "minhash_lsh_pairs",
    "simhash_neardup_pairs",
    "dedup_exact",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality",
    "token_count",
    "media_features",
]

# Cold-timed separately (queries_extended) — NOT part of the headline
# total, which must stay comparable across rounds.
EXTENDED = [
    "bm25_rank",
    "tfidf_top_terms",
    "media_phash_neardup",
    "supplier_pagerank",
    "copurchase_lift",
    "cms_heavy_hitters",
    "corpus_shards",
    "waiting_suppliers",
    "returned_item_report",
    # round-4 continuation additions
    "bpe_train_merges",
    "copurchase_triangles",
    "text_normalize",
    "ann_sq8_rerank",
    "ann_pq_adc",
    "bloom_filtered_revenue",
    "zorder_layout_stats",
    "bpe_doc_tokens",
    "source_kl_divergence",
    "doc_perplexity",
    "source_shingle_overlap",
    "priority_sample",
    "embedding_dim_stats",
    "k_anonymity_audit",
    "psi_drift",
    "rate_limited_events",
    "chi2_independence",
    "rfm_segments",
    "gmv_ewma",
    "event_transition_matrix",
    "copurchase_reach",
    "embedding_principal_component",
    "gmv_holt",
    "gmv_cusum",
    "last_touch_attribution",
    "frequent_triples",
    "prefix_jaccard_pairs",
    # round-4 additions
    "semantic_dedup",
    "quality_classifier",
    "incremental_neardup",
    "ann_ivfpq_topk",
    "ann_recall_report",
    "corpus_manifest",
    "leakage_safe_split",
    "embedding_cluster_profile",
    "hard_negative_mining",
    "dataset_card",
    "stream_incremental_neardup",
    "dedup_threshold_curve",
    "stream_quality_gate",
    # round-5 additions: filtered vector search, containment dedup,
    # keyless range join, hypertable cascade, DSIR selection
    "ann_filtered_topk",
    "containment_pairs",
    "spike_window_impact",
    "hypertable_rollup",
    "dsir_importance_weights",
    "ngram_decontaminate",
    "stream_hypertable_rollup",
    "assemble_training_mix",
    "remove_duplicated_spans",
    "stream_ngram_decontaminate",
    # round-6 additions: rule filtering, perplexity buckets, near-dup
    # rewrite, multi-epoch shuffle, streaming CUSUM, append hour grain
    "gopher_quality_flags",
    "ccnet_perplexity_buckets",
    "neardup_dedup_rewrite",
    "epoch_shuffle_shards",
    "stream_gmv_cusum",
    "stream_hypertable_hour_append",
    "large_volume_customers",
    "dormant_rich_customers",
    "sq8_quantization_error",
    "decontamination_gram_report",
    "window_funnel",
    "stream_window_funnel",
    "stream_rate_limit",
    "stream_dedup_gate",
    # round-7: persisted index artifacts — read-back query twins
    "minhash_lsh_pairs_from_index",
    "ann_ivf_topk_from_index",
    "embedding_neardup_multiprobe",
    # round-9: the tables-for-radius governor — same recall contract,
    # ~3x fewer probe keys (SCALE_100X.md) — and the wide-routed k-NN
    # graph + decontamination screens (the last home-bucket consumers)
    "embedding_neardup_multiprobe_wide",
    "knn_graph_wide",
    "semantic_decontaminate_wide",
    "bpe_doc_tokens_from_index",
    "stream_index_build",
    "stream_wide_sig_ingest",
    # round-6 continuation: semantic decontamination (batch + stream),
    # corpus diversity, online ANN serving, diversified retrieval
    "semantic_decontaminate",
    "stream_semantic_decontaminate",
    "ngram_diversity",
    "stream_ann_topk",
    "ann_mmr_topk",
    "tokenizer_fertility",
    # round-6 continuation: bloom admission QA, stochastic quality
    # sampling, lossless radius search, mergeable-sketch stream twins
    "bloom_dedup_report",
    "quality_rejection_sample",
    "ann_range_search",
    "stream_cms_heavy_hitters",
    "stream_psi_drift",
    "neardup_keep_best",
    "curation_funnel",
    "length_batch_pad_stats",
    "dedup_method_agreement",
    "user_sequence_similarity",
    # round-10: the design-band decontamination screen, the
    # sketch-ranked capped k-NN graph + its overflow report, and the
    # posting-capped prefix/containment twins + overflow reports
    "semantic_decontaminate_band",
    "knn_graph_wide_capped",
    "knn_graph_candidate_overflow",
    "knn_graph_capped_from_index",
    "semantic_decontaminate_band_from_index",
    "embedding_neardup_wide_band",
    "prefix_jaccard_pairs_capped",
    "prefix_posting_overflow",
    "containment_pairs_capped",
    "containment_posting_overflow",
    # round-12: the PRODUCTION forms enter the per-round snapshot
    # (VERDICT r11 #2 — until now they existed only as SCALE rows, so a
    # regression in any of them was invisible to the round record):
    # the quantile-derived posting caps and the published-graph read
    # (cold = publish when stale + read; warm = no-op publish + read).
    "prefix_jaccard_pairs_capped_p99",
    "containment_pairs_capped_p99",
    "knn_graph_capped_published",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()

    # Session bring-up + machine calibration. The two timed jobs are
    # FIXED workloads (identical every round), so their times measure
    # the VM, not the engine: same-code cold totals have varied >2x
    # across rounds with warm times flat — divide cross-round cold
    # totals by calib drift before reading them as regressions. They
    # double as warm-up: JVM/codegen/shuffle paths and the Python/Arrow
    # worker pool are session infrastructure, not query cost.
    t0 = time.time()
    (
        spark.range(2_000_000)
        .selectExpr("id % 1000 AS k", "id * 2654435761 % 2147483647 AS h")
        .groupBy("k").count().count()
    )
    calib_jvm = round(time.time() - t0, 3)
    t0 = time.time()
    df = spark.range(10_000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df.mapInPandas(lambda it: it, "id long").count()
    calib_py = round(time.time() - t0, 3)

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    # Second pass: warm times. Cold times above include whole-stage
    # codegen compilation (the dominant cost at this SF — see MEMORY);
    # warm times isolate actual execution so codegen-compile noise can't
    # masquerade as a regression when rounds are compared. The gate
    # metric stays the COLD total for continuity with BENCH_r01.
    warm: dict[str, float] = {}
    warm_total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        warm[name] = dt
        warm_total += dt
        print(f"# warm {name}: {dt}s", file=sys.stderr)

    # Min-of-3 warm (ADDITION, r13 — VERDICT r12 #2): the single warm
    # reading still carries one-shot VM noise comparable to the
    # per-query fixed cost at this SF, which is why the driver's
    # 8-vs-32-core ratio on COLD times read as noise (18/26 ratios <=
    # 1.05 — the scaling probe measured the codegen/VM floor, not the
    # engine). min over three warm runs is the noise-robust engine
    # time: compare queries_warm_min across the driver's two core
    # counts for a scaling signal. queries/queries_warm keep their
    # exact prior semantics; this is a new key.
    warm_min: dict[str, float] = dict(warm)
    for _rep in range(2):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            if dt < warm_min[name]:
                warm_min[name] = dt
    print(f"# warm_min: {json.dumps(warm_min)}", file=sys.stderr)

    # Extended set: round-4 additions, reported under their own key so
    # the headline total stays comparable with BENCH_r01..r03.
    # Warm pass included: it strips codegen compile and scan-cache
    # effects (NOT driver-side training loops — e.g. the BPE trainer
    # re-runs its per-step collects every call by design).
    extended: dict[str, float] = {}
    extended_warm: dict[str, float] = {}
    for name in EXTENDED:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        extended[name] = dt
        t0 = time.time()
        fn(spark, sf_dir).count()
        extended_warm[name] = round(time.time() - t0, 3)
        print(f"# ext {name}: {n} rows in {dt}s (warm {extended_warm[name]}s)", file=sys.stderr)

    # Detail record on its OWN stdout line first: the driver captures
    # only the tail of stdout and parses the LAST line, so the bulky
    # per-query extended metrics must not share a line with (or follow)
    # the headline object — round 4's headline number was lost to
    # exactly that truncation (BENCH_r04.json parsed: null).
    print(json.dumps({
        "metric": "headline_queries_detail",
        "queries_warm": warm,
        "queries_extended": extended,
        "queries_extended_warm": extended_warm,
    }))
    # Compact headline object as the FINAL line — this is the record
    # the driver must be able to tail-capture and parse. Per-query WARM
    # times and the calib pair ride inside it (VERDICT r9 #1) so any
    # snapshot is self-normalizing: cold/warm divergence on a query =
    # codegen/scan-cache cost, uniform cold drift at elevated calib =
    # VM band, neither needs out-of-band prose to interpret.
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "queries_warm": warm,
        "queries_warm_min": warm_min,
        "value_warm": round(warm_total, 3),
        "value_warm_min": round(sum(warm_min.values()), 3),
        "calib_jvm_sec": calib_jvm,
        "calib_python_worker_sec": calib_py,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
