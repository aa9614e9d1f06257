"""Isolated A/B harness for the _dot/_norm expression shape (r12).

Times the SRP/ANN queries that evaluate cosine folds, with the noop sink
(guide §1.4) so the computation is measured, not the sink or count
pruning. Fresh session per invocation; run once before and once after
the expression change.

Usage: python tools/microbench_dot.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("microbench_dot")
    qs = all_queries()
    # session warm-up (same spirit as bench.py calib)
    spark.range(1_000_000).selectExpr("id % 97 AS k").groupBy("k").count().count()

    names = [
        "ann_cosine_topk",
        "ann_truncated_rerank",
        "ann_sq8_rerank",
        "ann_range_search",
        "embedding_neardup_multiprobe",
        "embedding_neardup_multiprobe_wide",
        "embedding_neardup_wide_band",
        "knn_graph_wide_capped",
        "semantic_decontaminate_wide",
        "minhash_lsh_pairs",
    ]
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"microbench_dot: {name} cold")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(f"microbench_dot: {name} warm")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": cold, "warm": warm}
        print(f"# {name}: cold {cold}s warm {warm}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
