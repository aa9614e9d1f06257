"""100x probe for the r9 wide-layout ROUTING (knn_graph_wide,
semantic_decontaminate_wide) — the scale where srp_bits_for widens the
signatures to 13 bits and the home-bucket layout's per-table agreement
(p^bits) collapses, which is exactly the regime the routing exists for.

Replicates ONLY embeddings (100x, the sign-flip orthogonal diagonal of
tools/scale_probe_100x.py — within-copy cosines preserved exactly,
cross-copy cosines decorrelate), reusing /tmp/scale_100x/embeddings if
the full probe already built it.

Measures, at 1x (sf0.1) and 100x:
- knn_graph (home-bucket) vs knn_graph_wide: wall time, edge count, and
  WITHIN-COPY RANK-1 RECOVERY — the fraction of the 1x graph's rank-1
  edges that each form re-finds inside every copy (copies preserve
  within-copy cosines, so the 1x rank-1 edge set is the per-copy ground
  truth up to rare cross-copy displacements). This is the direct
  measurement of home-bucket recall collapse at width 13 vs the
  governed layout. NOTE the 1x rank-1 edges sit at background cosine
  (~0.5), far below SRP_DESIGN_COSINE — ABSOLUTE recovery is expected
  to be low for both forms (the recall contract is for design-point
  pairs, pinned by the planted-twin tests); the RATIO wide/home is the
  signal here.
- semantic_decontaminate (home) vs semantic_decontaminate_wide: wall
  time + flagged counts (bench membership is id-derived so it permutes
  across copies; counts are descriptive, the contract is the oracle +
  planted-leak test).

Appends a section to SCALE_100X.md.

Usage: python tools/scale_probe_wide_graph.py   (~15-25 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_wide_graph"
VEC_COPIES = 100
COPY_STRIDE = 1_000_000


def build(spark) -> None:
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import load_table
    from tools.scale_probe_100x import _sign_pattern

    full = "/tmp/scale_100x/embeddings.parquet"
    os.makedirs(DST, exist_ok=True)
    if os.path.isdir(full):
        import shutil

        shutil.copytree(full, f"{DST}/embeddings.parquet", dirs_exist_ok=True)
    else:
        emb = load_table(spark, SRC, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        copies = []
        for i in range(VEC_COPIES):
            pat = F.array(*[F.lit(s) for s in _sign_pattern(i, dim)])
            copies.append(
                emb.select(
                    (F.col("vec_id") + i * COPY_STRIDE).alias("vec_id"),
                    *[c for c in emb.columns if c not in ("vec_id", "embedding")],
                    F.zip_with(
                        F.col("embedding").cast("array<double>"), pat, lambda x, s: x * s
                    ).alias("embedding"),
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{DST}/embeddings.parquet"
        )
    # the probed queries read ONLY embeddings — no other table copies


def main() -> None:
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.operators.similarity import (
        knn_graph, knn_graph_wide, semantic_decontaminate,
        semantic_decontaminate_wide, srp_bits_for, srp_probe_radius_for,
        srp_tables_for,
    )
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("scale_probe_wide_graph")
    spark.range(1000).count()
    t0 = time.time()
    if not os.path.isdir(f"{DST}/embeddings.parquet"):
        build(spark)
    print(f"# build: {round(time.time() - t0, 1)}s", file=sys.stderr)
    n_big = spark.read.parquet(f"{DST}/embeddings.parquet").count()
    bits_big = srp_bits_for(n_big)

    results: dict[tuple[str, str], tuple[float, int]] = {}
    frames: dict[tuple[str, str], object] = {}
    for fn in (knn_graph, knn_graph_wide, semantic_decontaminate,
               semantic_decontaminate_wide):
        for tag, d in (("1x", SRC), ("100x", DST)):
            t0 = time.time()
            df = fn(spark, d)
            if fn in (knn_graph, knn_graph_wide):
                # rank-1 edges kept for the recovery measure
                df = df.filter(F.col("rank") == 1).select("src", "dst")
                df = df.localCheckpoint()
                n = df.count()
                frames[(fn.__name__, tag)] = df
            else:
                n = df.count()
            results[(fn.__name__, tag)] = (round(time.time() - t0, 2), n)
            print(f"# {tag} {fn.__name__}: {n} rows in "
                  f"{results[(fn.__name__, tag)][0]}s", file=sys.stderr)

    # within-copy rank-1 recovery: map big edges to copy-local ids and
    # intersect with the 1x rank-1 edge set (both endpoints same copy)
    recov = {}
    for form in ("knn_graph", "knn_graph_wide"):
        small = frames[(form, "1x")]
        big = frames[(form, "100x")]
        local = big.filter(
            (F.col("src") / COPY_STRIDE).cast("long")
            == (F.col("dst") / COPY_STRIDE).cast("long")
        ).select(
            (F.col("src") % COPY_STRIDE).alias("src"),
            (F.col("dst") % COPY_STRIDE).alias("dst"),
        )
        hit = local.join(small, ["src", "dst"]).count()
        total = VEC_COPIES * results[(form, "1x")][1]
        recov[form] = (hit, total, hit / total if total else float("nan"))
        print(f"# {form} within-copy rank-1 recovery: {hit}/{total} "
              f"= {recov[form][2]:.3f}", file=sys.stderr)

    r = results
    ratio = (recov["knn_graph_wide"][2] / recov["knn_graph"][2]
             if recov["knn_graph"][2] else float("inf"))
    lines = [
        "",
        "## k-NN graph & decontamination on the wide layout (r9 routing)",
        "",
        f"Embeddings-only 100x replication ({n_big:,} vecs, SRP width "
        f"{bits_big} bits; home-bucket layout = 4 tables radius 0, wide = "
        f"{srp_tables_for(bits_big)} tables radius 1; the radius governor "
        f"at this width would probe hamming<={srp_probe_radius_for(bits_big)}).",
        "",
        "| query | 1x s | 1x rows | 100x s | 100x rows | time factor |",
        "|---|---|---|---|---|---|",
    ]
    for form in ("knn_graph", "knn_graph_wide",
                 "semantic_decontaminate", "semantic_decontaminate_wide"):
        s_t, s_n = r[(form, "1x")]
        b_t, b_n = r[(form, "100x")]
        f_ = round(b_t / s_t, 1) if s_t else float("nan")
        lines.append(f"| {form} | {s_t} | {s_n:,} | {b_t} | {b_n:,} | {f_}x |")
    lines += [
        "",
        "(knn_graph rows above are RANK-1 edges — the recovery measure's",
        "denominator — not the full top-K output.)",
        "",
        "Within-copy rank-1 recovery (1x rank-1 edge set re-found per copy;",
        "these edges sit at BACKGROUND cosine ~0.5, far below the 0.9 design",
        "point, so absolute recovery is expectedly low for both forms — the",
        "design-point contract is pinned by the planted-twin tests; the",
        "wide/home RATIO is the routing's measured payoff):",
        "",
        f"- home-bucket knn_graph: {recov['knn_graph'][0]:,}/"
        f"{recov['knn_graph'][1]:,} = {recov['knn_graph'][2]:.3f}",
        f"- knn_graph_wide: {recov['knn_graph_wide'][0]:,}/"
        f"{recov['knn_graph_wide'][1]:,} = {recov['knn_graph_wide'][2]:.3f}"
        f" ({ratio:.1f}x the home-bucket recovery)",
    ]
    with open("SCALE_100X.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
