"""Dump plans for named queries to plans/r13/<q>_<tag>.txt — BOTH the
static .explain('formatted') and, after a noop-sink execution, the
FINAL AdaptiveSparkPlan (VERDICT r12 #7: static dumps print lazy-
checkpoint subtrees once per consumer branch, so their Exchange counts
diverge from executed reality; every dump now carries the executed
count beside the static one so plan claims have one number per query).

Usage: python tools/dump_plans_r13.py <tag> [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # r13 touched set
    "embedding_neardup_multiprobe", "embedding_neardup_multiprobe_wide",
    "embedding_neardup_wide_band", "embedding_neardup_band_planted",
    "knn_graph_wide", "knn_graph_wide_capped", "knn_graph_candidate_overflow",
    "knn_graph_capped_from_index", "knn_graph_capped_published",
    "embedding_neardup_wide_from_index", "knn_graph_wide_from_index",
    "semantic_decontaminate_band_planted",
    # headline set (round record continuity)
    "pricing_summary", "shipping_priority", "local_supplier_volume",
    "order_wide", "product_stats", "province_stats", "region_rollup",
    "topn_orders_per_priority", "running_gmv", "visitor_stats_window",
    "uv_daily", "user_jump", "payment_wide", "cdc_route", "keyword_stats",
    "keyword_score", "asof_purchase_context", "visitor_stats_full",
    "minhash_lsh_pairs", "simhash_neardup_pairs", "dedup_exact",
    "ann_cosine_topk", "ann_ivf_topk", "text_quality", "token_count",
    "media_features",
]


def _counts(plan: str) -> str:
    return (
        f"Exchange={len(re.findall(r'Exchange', plan))} "
        f"SMJ={plan.count('SortMergeJoin')} "
        f"BHJ={plan.count('BroadcastHashJoin')} "
        f"PyEval={plan.count('BatchEvalPython')}"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("dump_plans_r13")
    qs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        static = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        # execute through the noop sink, then read the FINAL adaptive plan
        spark.sparkContext.setJobDescription(f"dump_plans_r13 {name}")
        df.write.format("noop").mode("overwrite").save()
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== r13 plan dump: {name} ({tag}) ==\n")
            f.write(f"static:   {_counts(static)}\n")
            f.write(f"executed: {_counts(executed)}  (final AdaptiveSparkPlan)\n\n")
            f.write("---- static .explain(formatted) ----\n")
            f.write(static)
            f.write("\n---- executed plan (after noop run) ----\n")
            f.write(executed)
        print(f"{name}: static[{_counts(static)}] executed[{_counts(executed)}]")


if __name__ == "__main__":
    main()
