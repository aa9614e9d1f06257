"""Plan audit: dump the executed-plan skeleton of every declared query
and check scale invariants.

Writes PLANS.md (per-query shuffle/join/codegen inventory) and exits
non-zero if an invariant breaks:

1. no row-at-a-time Python eval (BatchEvalPython) anywhere — Python is
   allowed only through Arrow (ArrowEvalPython / mapInPandas /
   applyInPandasWithState);
2. every *dim* join in the core pipelines is a broadcast join (no
   SortMergeJoin against region/nation/customer/part/supplier dims in
   the queries that declare broadcast enrichment);
3. scan-side filters reach the parquet scan (PushedFilters non-empty
   for the queries that filter on scan columns);
4. no unpartitioned window sort over per-row data (a Window fed by an
   Exchange SinglePartition funnels the whole input through one task —
   the round-1 quality_buckets ntile bug). Windows over already
   -aggregated tiny inputs (daily GMV series etc.) are allowlisted.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# queries whose plans legitimately contain Arrow Python stages
# (media_phash_neardup's Arrow stage runs eagerly inside its
# localCheckpoint during construction, so the audited downstream plan
# shows Scan ExistingRDD, not MapInPandas — no allowlist entry needed.)
ARROW_OK = {"media_features", "media_frame_stats", "media_decode_features",
            "stream_jump_detect", "user_gap_stats", "keyword_stats_cjk",
            "ann_cosine_topk_arrow",
            "text_normalize"}  # NFC normalization has no Spark built-in
# queries that must show BroadcastHashJoin and no SortMergeJoin on dims
BROADCAST_REQUIRED = {"order_wide", "province_stats", "product_stats", "top_trademarks",
                      # round-5: benchmark gram set / spike window set are the
                      # tiny sides and must broadcast — an SMJ here means the
                      # corpus started shuffling for a MB-sized right side
                      "ngram_decontaminate", "spike_window_impact",
                      # r9 routing: the bench-side probe explosion is the tiny
                      # side and must broadcast — the corpus side never
                      # shuffles at candidate time
                      "semantic_decontaminate_wide"}
# queries where any SortMergeJoin is a regression (every join side is a
# class-cardinality aggregate that must broadcast)
SMJ_FORBIDDEN = {"assemble_training_mix"}
# queries whose scans must carry pushed filters
PUSHDOWN_REQUIRED = {"order_wide", "gmv_daily", "pricing_summary", "shipping_priority"}
# queries allowed a single-partition window: their window input is a
# small post-aggregation series (days/provinces/priorities — cardinality
# bounded by the dimension, not the corpus), so one task is correct.
GLOBAL_WINDOW_OK: set[str] = {
    "running_gmv",        # window over the daily GMV series (≤ days rows)
    "gmv_7d_moving_avg",  # same daily series
    "gmv_gapfill",        # gap-filled daily series
    "priority_share",     # window over 5 order-priority rows
    "event_spike_days",   # trailing window over the daily event series
    "priority_sample",      # rank window runs AFTER a TakeOrdered limit —
                            # its input is PRIO_K rows, not the corpus
    "copurchase_triangles_p99",  # cumulative sum over the DEGREE
                            # HISTOGRAM (<= max-degree distinct values,
                            # bounded by basket overlap not the corpus)
    # r11 derived posting caps: cumulative sum over the POSTING-LENGTH
    # HISTOGRAM (<= max-posting-length distinct values — the same
    # bounded-table argument as the triangle p99 cap, see
    # _posting_cap_quantile's docstring)
    "prefix_jaccard_pairs_capped_p99",
    "prefix_posting_overflow_p99",
    "containment_pairs_capped_p99",
    "containment_posting_overflow_p99",
}


def _tree_indent(line: str) -> int:
    """Depth of a physical-plan tree line = offset of the first char
    that isn't tree-drawing decoration (spaces, ':', '+', '-')."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _global_window_sorts(plan: str) -> int:
    """Count Window nodes whose OWN subtree's first exchange is
    SinglePartition — i.e. windows that funnel every row through one
    task. The scan is indentation-bounded so an Exchange in an
    unrelated later subtree is never attributed to this window."""
    hits = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window " not in line and "RunningWindowFunction" not in line:
            continue
        w_indent = _tree_indent(line)
        subq_indent = None  # inside a scalar-subquery block when set
        for up in lines[i + 1:]:
            if not up.strip():
                break
            ind = _tree_indent(up)
            if ind <= w_indent:
                break  # left the window's subtree
            # Scalar subqueries (runtime bloom filters injected by
            # InjectRuntimeFilter, scalar aggregates) render INLINE
            # under whatever operator references them, and their final
            # bloom_filter_agg/aggregate legitimately runs through an
            # Exchange SinglePartition over SKETCH bytes — that is not
            # this window's data path. Skip the subquery block
            # (r11: the sketch-in-join graph plan triggered exactly
            # this false positive).
            if subq_indent is not None:
                if ind <= subq_indent:
                    subq_indent = None
                else:
                    continue
            if "Subquery" in up:
                subq_indent = ind
                continue
            if "Exchange" in up:
                if "SinglePartition" in up:
                    hits += 1
                break
    return hits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("explain_audit")
    failures: list[str] = []
    lines = [
        "# PLANS — physical plan audit",
        "",
        f"Generated by tools/explain_audit.py over sf_dir={sf_dir}. Counts from",
        "the optimized physical plan: shuffle exchanges, join strategies,",
        "Python eval nodes, and scan pushdown.",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | python eval | pushed filters |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in sorted(e.queries().items()):
        if name.startswith("stream_"):
            lines.append(f"| {name} | (streaming — audited via tests) | | | | |")
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_py = plan.count("BatchEvalPython")
        n_arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        lines.append(
            f"| {name} | {n_ex} | {n_bhj} | {n_smj} | "
            f"{'ARROW' if n_arrow else ('ROW!' if n_py else '-')} | {pushed} |"
        )
        if n_py > 0:
            failures.append(f"{name}: row-at-a-time BatchEvalPython in plan")
        if n_arrow > 0 and name not in ARROW_OK:
            failures.append(f"{name}: unexpected Python stage")
        if name in BROADCAST_REQUIRED and n_bhj == 0:
            failures.append(f"{name}: expected broadcast joins, found none")
        if name in SMJ_FORBIDDEN and n_smj > 0:
            failures.append(f"{name}: SortMergeJoin where every side is tiny")
        if name in PUSHDOWN_REQUIRED and pushed == 0:
            failures.append(f"{name}: no pushed filters reached the scan")
        if name not in GLOBAL_WINDOW_OK and _global_window_sorts(plan) > 0:
            failures.append(f"{name}: Window over Exchange SinglePartition (global sort)")
    lines += ["", f"Invariant failures: {len(failures)}"]
    for f in failures:
        lines.append(f"- FAIL {f}")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[-(len(failures) + 2):]))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
