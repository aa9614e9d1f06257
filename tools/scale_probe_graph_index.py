"""100x probe for the BUILD-ONCE capped-graph path (VERDICT r10 #3):
knn_graph_capped_from_index had a bench row at sf0.1 (4.3 s) but no
100x row, while the fresh-session in-session capped build measured
637 s — so the record never showed what the index store actually buys
at the scale it exists for.

Protocol: FRESH SESSION PER MEASUREMENT (one python process each, the
r10 outlier-resolution protocol), idle machine, over the sign-flip
100x embeddings corpus (/tmp/scale_wide_graph, 200k vectors — built by
tools/scale_probe_wide_graph.py from the CURRENT sf0.1):

  1. build  — ensure_index(families=("vecs",)) into a fresh shared
              root: the one-time ingest+build job (SRP wide sigs +
              IVF cells + PQ codes + manifest).
  2. read   — knn_graph_capped_from_index: partition-pruned store read
              + on-the-fly 48-bit rank sketch + capped confirm. Run
              TWICE (two fresh sessions) to show the steady state.
  3. band   — semantic_decontaminate_band_from_index: the production
              decontamination screen as a store read, same store.

Claim under test: build amortizes — read sessions land materially
under the 637 s fresh in-session build, so N graph/screen queries cost
build + N*read instead of N*637 s.

Appends a section to SCALE_100X.md.

Usage: python tools/scale_probe_graph_index.py          (~15-30 min)
       python tools/scale_probe_graph_index.py <step>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DST = "/tmp/scale_wide_graph"
IDX = "/tmp/idx_graph_100x"


def _session(app: str):
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark(app)
    spark.range(1000).count()  # absorb JVM/session setup before timing
    return spark


def step_build() -> dict:
    from gmallbiguan_parent_spark.operators.index_store import ensure_index

    spark = _session("graph_index_build")
    t0 = time.time()
    root = ensure_index(spark, DST, families=("vecs",))
    dt = time.time() - t0
    import glob

    sig_rows = spark.read.parquet(f"{root}/srp_sigs_wide").count()
    return {
        "step": "build", "sec": round(dt, 1), "sig_rows": sig_rows,
        "files": len(glob.glob(f"{root}/srp_sigs_wide/*/*/*.parquet")),
    }


def step_read() -> dict:
    from gmallbiguan_parent_spark.operators.index_store import (
        knn_graph_capped_from_index,
    )

    spark = _session("graph_index_read")
    t0 = time.time()
    n = knn_graph_capped_from_index(spark, DST).count()
    return {"step": "read", "sec": round(time.time() - t0, 1), "edges": n}


def step_publish() -> dict:
    from gmallbiguan_parent_spark.operators.index_store import publish_knn_graph

    spark = _session("graph_publish")
    t0 = time.time()
    path = publish_knn_graph(spark, DST)
    dt = time.time() - t0
    n = spark.read.parquet(path).count()
    return {"step": "publish", "sec": round(dt, 1), "edges": n}


def step_read_pub() -> dict:
    from gmallbiguan_parent_spark.operators.index_store import (
        knn_graph_capped_published,
    )

    spark = _session("graph_pub_read")
    t0 = time.time()
    n = knn_graph_capped_published(spark, DST).count()
    return {"step": "read_pub", "sec": round(time.time() - t0, 1), "edges": n}


def step_band() -> dict:
    from gmallbiguan_parent_spark.operators.index_store import (
        semantic_decontaminate_band_from_index,
    )

    spark = _session("band_index_read")
    t0 = time.time()
    n = semantic_decontaminate_band_from_index(spark, DST).count()
    return {"step": "band", "sec": round(time.time() - t0, 1), "flagged": n}


def _run_fresh(step: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=IDX)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), step],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    if out.returncode != 0:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"step {step} failed")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    print(f"# {step}: {r}", file=sys.stderr)
    return r


def main() -> None:
    import shutil

    if not os.path.isdir(f"{DST}/embeddings.parquet"):
        raise SystemExit(
            "100x corpus missing — run tools/scale_probe_wide_graph.py first"
        )
    shutil.rmtree(IDX, ignore_errors=True)
    build = _run_fresh("build")
    read1 = _run_fresh("read")
    read2 = _run_fresh("read")
    band = _run_fresh("band")

    lines = [
        "",
        "## Build-once capped graph at 100x (r11, VERDICT r10 #3)",
        "",
        "Fresh session per measurement (one process each, idle machine),",
        "sign-flip 100x embeddings (200k vectors, the r10 corpus layout",
        "rebuilt from the current sf0.1). The store builds once",
        "(`ensure_index(families=('vecs',))` under SPARK_GRAFT_INDEX_DIR);",
        "every later session reads partitioned parquet artifacts.",
        "",
        "| measurement | fresh-session s | output |",
        "|---|---|---|",
        f"| index build (SRP wide sigs + IVF + PQ, one-time) | {build['sec']} | {build['sig_rows']:,} sig rows |",
        f"| knn_graph_capped_from_index, 1st fresh read | {read1['sec']} | {read1['edges']:,} edges |",
        f"| knn_graph_capped_from_index, 2nd fresh read | {read2['sec']} | {read2['edges']:,} edges |",
        f"| semantic_decontaminate_band_from_index read | {band['sec']} | {band['flagged']} flagged |",
        "| (r10 reference: fresh in-session capped build) | 636.7 | same graph |",
        "",
        f"Amortization: one {build['sec']} s build turns every subsequent"
        f" graph construction into a ~{read1['sec']}-{read2['sec']} s read"
        f" ({round(636.7 / max(read1['sec'], read2['sec']), 1)}x under the"
        " 636.7 s fresh in-session build), so N queries cost build + N*read"
        " instead of N*637 s — the read even re-derives the 48-bit rank"
        " sketch on the fly, so the whole margin is the signature tables"
        " and probe layout coming off parquet instead of 13x13-bit SRP"
        " projections over 200k vectors. The band screen reads the same"
        " store.",
    ]
    with open("/root/repo/SCALE_100X.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        fn = {"build": step_build, "read": step_read, "band": step_band,
              "publish": step_publish, "read_pub": step_read_pub}[sys.argv[1]]
        print(json.dumps(fn()))
    else:
        main()
