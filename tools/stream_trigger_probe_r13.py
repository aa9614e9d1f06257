"""r13 streaming measurement (VERDICT r12 #1): per-query micro-batch
counts and durationMs breakdown for every registered stream query, via
a global StreamingQueryListener — the evidence for deriving trigger
counts from the certified state semantics instead of a fixed file
fan-out.

Usage: python tools/stream_trigger_probe_r13.py <sf_dir> [query ...]
Prints one JSON line per query: cold/warm wall seconds plus the
batches each replay ran ({batchId, rows, addBatch, triggerExecution}).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql.streaming import StreamingQueryListener


class _Collector(StreamingQueryListener):
    def __init__(self):
        self.progress = []  # (runId, batchId, rows, durationMs)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(
            {
                "runId": str(p.runId),
                "batchId": p.batchId,
                "rows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from gmallbiguan_parent_spark.session import get_spark
    from gmallbiguan_parent_spark.streaming.queries import QUERIES

    spark = get_spark("stream_trigger_probe_r13")
    col = _Collector()
    spark.streams.addListener(col)

    names = [n for n in QUERIES if not only or n in only]
    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe cold {name}")
        col.progress.clear()
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = round(time.time() - t0, 3)
        cold_batches = list(col.progress)
        col.progress.clear()
        spark.sparkContext.setJobDescription(f"probe warm {name}")
        t0 = time.time()
        fn(spark, sf_dir).count()
        warm = round(time.time() - t0, 3)
        warm_batches = list(col.progress)
        rec = {
            "query": name,
            "cold_s": cold,
            "warm_s": warm,
            "cold_n_batches": len(cold_batches),
            "warm_n_batches": len(warm_batches),
            "warm_batches": [
                {
                    "batchId": b["batchId"],
                    "rows": b["rows"],
                    "addBatch": b["durationMs"].get("addBatch"),
                    "trigger": b["durationMs"].get("triggerExecution"),
                }
                for b in warm_batches
            ],
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
    wt = round(sum(r["warm_s"] for r in out.values()), 2)
    print(json.dumps({"total_warm_s": wt, "n": len(out)}), flush=True)


if __name__ == "__main__":
    main()
