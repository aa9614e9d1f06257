"""r13: isolate the late-session degradation of plan-heavy queries.

Fresh session → measure stream_semantic_decontaminate warm; churn N
heavy-plan executions (the SRP signature screen re-planned per call,
the way the bench session ages); re-measure. Run with and without
spark.sql.ui.retainedExecutions lowered to see whether the SQL status
store's retained plan descriptions are the accumulant.

Usage: python tools/session_degradation_probe_r13.py <sf_dir> <churn_n> [retained]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    churn_n = int(sys.argv[2])
    retained = sys.argv[3] if len(sys.argv) > 3 else None
    if retained:
        # static conf — must land before the JVM session exists
        from pyspark.sql import SparkSession

        SparkSession.builder.config("spark.sql.ui.retainedExecutions", retained)

    from gmallbiguan_parent_spark.session import get_spark

    if retained:
        os.environ["SPARK_GRAFT_RETAINED_EXECUTIONS"] = retained
    spark = get_spark("degradation_probe")
    if retained:
        print("retainedExecutions conf:",
              spark.sparkContext.getConf().get("spark.sql.ui.retainedExecutions", "unset"))

    from gmallbiguan_parent_spark.streaming.queries import QUERIES

    fn = QUERIES["stream_semantic_decontaminate"]
    fn(spark, sf_dir).count()  # cold
    t0 = time.time(); fn(spark, sf_dir).count()
    print(f"warm_before: {time.time()-t0:.2f}s", flush=True)

    # churn: replay the same screen N times (each call replans + runs)
    t0 = time.time()
    for i in range(churn_n):
        fn(spark, sf_dir).count()
        if (i + 1) % 5 == 0:
            print(f"churn {i+1}: cum {time.time()-t0:.1f}s", flush=True)

    t0 = time.time(); fn(spark, sf_dir).count()
    print(f"warm_after: {time.time()-t0:.2f}s", flush=True)
    # driver heap telemetry
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / 1e9
    print(f"driver_heap_used_gb: {used:.2f}", flush=True)


if __name__ == "__main__":
    main()
