"""ABBA subset A/B for the r13 close: run the touched queries
cold+warm in THIS tree (invoke from the repo root or a worktree of the
r12 close) and print one JSON line. Alternating fresh processes over
old/new trees give a matched-VM per-query comparison that single
bench sessions cannot (the VM drifts faster than a full bench runs).

Usage: python tools/ab_subset_r13.py <tag> [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "embedding_neardup_multiprobe",
    "embedding_neardup_multiprobe_wide",
    "embedding_neardup_wide_band",
    "knn_graph_wide",
    "knn_graph_candidate_overflow",
    "embedding_principal_component",
    "psi_drift",
    "chi2_independence",
    "copurchase_triangles_p99",
    "copurchase_triangles_capped",
    "stream_gmv_incremental",
    "stream_uv_dedup",
    "stream_window_funnel",
    "stream_jump_detect",
    "stream_payment_pairs",
]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark(f"ab_subset_{tag}")
    # same fixed calibration workload as bench.py
    t0 = time.time()
    (
        spark.range(2_000_000)
        .selectExpr("id % 1000 AS k", "id * 2654435761 % 2147483647 AS h")
        .groupBy("k").count().count()
    )
    calib = round(time.time() - t0, 3)
    qs = all_queries()
    cold, warm, rows = {}, {}, {}
    for name in SUBSET:
        if name not in qs:
            continue
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        rows[name] = n
        t0 = time.time()
        fn(spark, sf_dir).count()
        warm[name] = round(time.time() - t0, 3)
    print(json.dumps({
        "tag": tag, "calib": calib,
        "cold_total": round(sum(cold.values()), 3),
        "warm_total": round(sum(warm.values()), 3),
        "cold": cold, "warm": warm, "rows": rows,
    }))


if __name__ == "__main__":
    main()
