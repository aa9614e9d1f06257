"""Isolated fresh-session timing for a named query list (r12 anomaly
triage): calib + cold/warm noop-sink timings, one JSON line out.

Usage: python tools/isolated_probe_r12.py <sf_dir> name [name...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("isolated_probe_r12")
    qs = all_queries()
    t0 = time.time()
    spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()
    calib = round(time.time() - t0, 3)
    print(f"# calib_jvm {calib}s", file=sys.stderr)

    out: dict[str, dict[str, float]] = {"_calib": {"jvm": calib}}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe: {name} cold")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(f"probe: {name} warm")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": cold, "warm": warm}
        print(f"# {name}: cold {cold}s warm {warm}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
