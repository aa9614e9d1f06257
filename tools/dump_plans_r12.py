"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt.

Usage: python tools/dump_plans_r12.py <tag> [query ...]
With no query names: dumps the full headline set plus the expensive
extended entries under optimization this round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # headline
    "pricing_summary", "shipping_priority", "local_supplier_volume",
    "order_wide", "product_stats", "province_stats", "region_rollup",
    "topn_orders_per_priority", "running_gmv", "visitor_stats_window",
    "uv_daily", "user_jump", "payment_wide", "cdc_route", "keyword_stats",
    "keyword_score", "asof_purchase_context", "visitor_stats_full",
    "minhash_lsh_pairs", "simhash_neardup_pairs", "dedup_exact",
    "ann_cosine_topk", "ann_ivf_topk", "text_quality", "token_count",
    "media_features",
    # expensive extended entries under the r12 microscope
    "leakage_safe_split", "minhash_lsh_pairs_from_index",
    "knn_graph_wide_capped", "knn_graph_capped_from_index",
    "embedding_neardup_wide_band", "semantic_decontaminate_band",
    "prefix_jaccard_pairs_capped_p99", "containment_pairs_capped_p99",
    "knn_graph_capped_published", "dedup_method_agreement",
    "knn_graph_candidate_overflow", "embedding_neardup_multiprobe_wide",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("dump_plans_r12")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_smj = plan.count("SortMergeJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        print(f"{name}: Exchange={n_ex} SMJ={n_smj} BHJ={n_bhj} -> {path}")


if __name__ == "__main__":
    main()
