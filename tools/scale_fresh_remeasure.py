"""Re-emit SCALE.md's 10x table under ONE protocol (VERDICT r10 #4).

The r10 outlier resolution proved in-session rows (measured late in one
shared ~200-query probe session) can overstate by 15-20x vs a fresh
session. This tool:

1. FRESH-remeasures (one python process per measurement, idle machine)
   every main-table row whose in-session factor was >= 5x and not
   already fresh-measured in r10,
2. rewrites the main table with a `protocol` column — rows carry either
   their new fresh numbers (`fresh r11`), the r10 fresh numbers
   (`fresh r10`, same corpus: /root/testdata regenerated 01:41 today,
   before every r10 fresh measurement), or their original in-session
   values marked `in-session r9`,
3. measures the quantile-derived posting cap's 10x recall accounting
   (VERDICT r10 #2) and appends it to the round-10 posting-cap section.

Corpora: sf0.1 (SRC) vs the identical-copy 10x replication
(/tmp/scale_sf1, built today by tools/scale_probe.py from the current
testdata).

Usage: python tools/scale_fresh_remeasure.py          (~20 min)
       python tools/scale_fresh_remeasure.py one <query> <sf_dir>
       python tools/scale_fresh_remeasure.py p99 <sf_dir>
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"

# in-session factor >= 5x, no prior fresh measurement
FRESH_QUERIES = [
    "copurchase_triangles",
    "gopher_quality_flags",
    "window_funnel",
    "neardup_dedup_rewrite",
    "stream_gmv_cusum",
    "stream_hypertable_hour_append",
    "stream_window_funnel",
    "epoch_shuffle_shards",
    "sq8_quantization_error",
    "dedup_method_agreement",
    "user_sequence_similarity",
    "embedding_neardup_multiprobe",
]

# r10 fresh-session measurements already in the record (same corpus):
# the outlier-resolution table + the posting-capped-twins table
FRESH_R10 = {
    "ccnet_perplexity_buckets": (10.09, 15.20),
    "decontamination_gram_report": (20.29, 21.15),
    "prefix_jaccard_pairs": (2.04, 398.46),
    "containment_pairs": (2.26, 193.25),
}


def step_one(query: str, sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.pipelines import all_queries
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("fresh_remeasure")
    spark.range(1000).count()
    t0 = time.time()
    n = all_queries()[query](spark, sf_dir).count()
    return {"query": query, "sf_dir": sf_dir,
            "sec": round(time.time() - t0, 2), "rows": n}


def step_p99(sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.operators.dedup import (
        prefix_jaccard_pairs_capped_p99,
        prefix_posting_overflow_p99,
    )
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("fresh_p99")
    spark.range(1000).count()
    t0 = time.time()
    rows = prefix_jaccard_pairs_capped_p99(spark, sf_dir).count()
    pairs_s = round(time.time() - t0, 2)
    over = prefix_posting_overflow_p99(spark, sf_dir).collect()[0]
    return {
        "sf_dir": sf_dir, "pairs": rows, "pairs_sec": pairs_s,
        "cap": int(over.cap), "over_tokens": int(over.over_tokens),
        "max_posting": int(over.max_posting),
        "dropped_pair_slots": int(over.dropped_pair_slots),
    }


def _run_fresh(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, cwd="/root/repo",
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"step {args} failed")
    r = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    print(f"# {args}: {r}", file=sys.stderr)
    return r


def main() -> None:
    fresh: dict[str, tuple[float, float]] = {}
    for q in FRESH_QUERIES:
        a = _run_fresh(["one", q, SRC])
        b = _run_fresh(["one", q, DST])
        fresh[q] = (a["sec"], b["sec"])

    p99_1x = _run_fresh(["p99", SRC])
    p99_10x = _run_fresh(["p99", DST])

    with open("/root/repo/SCALE.md") as f:
        md = f.read()

    def row_sub(m: re.Match) -> str:
        # idempotent (ADVICE r11): rows match with OR without a trailing
        # protocol column, so a rerun re-measures and updates in place
        # instead of silently leaving 5-column rows untouched
        name = m.group(1)
        if name in fresh:
            s, b = fresh[name]
            proto = "fresh r11"
        elif name in FRESH_R10:
            s, b = FRESH_R10[name]
            proto = "fresh r10"
        else:
            s, b = float(m.group(2)), float(m.group(3))
            proto = m.group(4) or "in-session r9"
        f_ = round(b / s, 1) if s > 0 else float("nan")
        return f"| {name} | {s} | {b} | {f_}x | {proto} |"

    md = re.sub(
        r"^\| (\w+) \| ([\d.]+) \| ([\d.]+) \| [\d.]+x \|(?: ([^|]+) \|)?$",
        row_sub, md, flags=re.M,
    )
    md = md.replace(
        "| query | sf0.1 s | 10x s | factor |\n|---|---|---|---|",
        "| query | sf0.1 s | 10x s | factor | protocol |\n|---|---|---|---|---|",
    )
    _PROTO_MARKER = "**Protocol (r11, VERDICT r10 #4):**"
    if _PROTO_MARKER in md:
        narrative = ""
    else:
        narrative = (
        "\n"
        "**Protocol (r11, VERDICT r10 #4):** every row is labeled. `fresh r10` /\n"
        "`fresh r11` rows were measured ONE PROCESS PER MEASUREMENT on an idle\n"
        "machine (the protocol the r10 outlier resolution established after\n"
        "showing in-session rows can overstate 15-20x); `in-session r9` rows\n"
        "retain the shared-probe-session values — factors remain comparable\n"
        "WITHIN that protocol (both sides shared the session), but absolute\n"
        "seconds overstate late-session rows. Every in-session row with a\n"
        "factor >= 5x has been re-measured fresh; the remaining in-session\n"
        "rows all sat <= 4.8x, inside the band the r10/r11 fresh re-measures\n"
        "showed to be protocol-safe.\n"
        )
    md = md.replace(
        "10 reflect the single-row-group source file serializing the small run.\n",
        "10 reflect the single-row-group source file serializing the small run.\n"
        + narrative,
    )
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(md)

    if "## Round-11 derived posting cap at 10x" in md:
        # rerun: the section exists — don't append a duplicate
        # (ADVICE r11; the p99 re-measure still printed above)
        print("# p99 section already present; skipping append", file=sys.stderr)
        return

    lines = [
        "",
        "## Round-11 derived posting cap at 10x (VERDICT r10 #2)",
        "",
        "The quantile-derived cap (prefix_jaccard_pairs_capped_p99: cap = p99",
        "of the corpus's own posting-length distribution, floored at 2)",
        "measured fresh-session on the same identical-copy 10x corpus as the",
        "pinned-cap table above:",
        "",
        "| corpus | derived cap | pairs kept | s | over-cap tokens | max posting | dropped pair slots |",
        "|---|---|---|---|---|---|---|",
        f"| sf0.1 (1x) | {p99_1x['cap']} | {p99_1x['pairs']:,} | {p99_1x['pairs_sec']} | {p99_1x['over_tokens']:,} | {p99_1x['max_posting']} | {p99_1x['dropped_pair_slots']:,} |",
        f"| 10x | {p99_10x['cap']} | {p99_10x['pairs']:,} | {p99_10x['pairs_sec']} | {p99_10x['over_tokens']:,} | {p99_10x['max_posting']} | {p99_10x['dropped_pair_slots']:,} |",
        "",
        "Identical-copy replication multiplies every posting length 10x, so",
        "the derived cap rises with the distribution instead of staying",
        "pinned: the budget adapts (the copurchase_triangles_p99 discipline)",
        "— compare the pinned POSTING_CAP=2 row above, which keeps 1,082 of",
        "250,600 true pairs at 10x. The overflow report ships the derived cap",
        "alongside the dropped-slot count, so a production operator reads the",
        "recall accounting and the budget it was taken against in one row.",
    ]
    with open("/root/repo/SCALE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        print(json.dumps(step_one(sys.argv[2], sys.argv[3])))
    elif len(sys.argv) > 1 and sys.argv[1] == "p99":
        print(json.dumps(step_p99(sys.argv[2])))
    else:
        main()
