"""Merge bench.py's two stdout JSON lines (detail + headline) into
BENCH_LOCAL.json — the committed at-HEAD benchmark snapshot.

Usage: python bench.py | python tools/merge_bench_local.py
   or: python tools/merge_bench_local.py < bench_output.txt
"""

import json
import sys


def main() -> None:
    detail, headline = None, None
    for line in sys.stdin:
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("metric") == "headline_queries_detail":
            detail = d
        elif d.get("metric") == "headline_queries_total":
            headline = d
    if headline is None or detail is None:
        raise SystemExit("missing bench output lines")
    merged = dict(headline)
    for k in ("queries_warm", "queries_extended", "queries_extended_warm"):
        if k in detail:
            merged[k] = detail[k]
    with open("/root/repo/BENCH_LOCAL.json", "w") as fh:
        json.dump(merged, fh, indent=1)
    print("wrote BENCH_LOCAL.json:", merged["value"], "cold /",
          merged["value_warm"], "warm, calib", merged["calib_jvm_sec"])


if __name__ == "__main__":
    main()
