"""100x scale probe for the BANDED families (minhash / simhash / SRP /
containment) and the ledger ingest screens — the scales where the
collision terms (n^2 / 2^bits per band) and the corpus-adaptive layouts
actually engage:

- documents replicate 200x -> 1,000,000 docs: past SIMHASH_WIDE_MIN_DOCS,
  so simhash_neardup_pairs flips to the wide 20xC(6,3) block-triple
  layout for real (the 10x probe never reached it).
- embeddings replicate 100x -> 200,000 vectors: srp_bits_for adapts the
  signature width to 13 bits (the sf0.1 run uses 6), exercising the
  constant-bucket-population design.
- events replicate 100x -> 10,000,000 rows for the ledger screens
  (stream_rate_limit, stream_dedup_gate must stay ~linear).

Replication construction (deliberately different from the 10x probe's
identical-text copies): each copy is transformed by a STRUCTURE-
PRESERVING bijection so the probe measures COMPUTE scaling, not an
identical-copy output explosion —

- documents: a per-copy token bijection (append a copy-unique alnum
  suffix to every token). Tokens map bijectively, so shingle sets map
  bijectively and every within-copy Jaccard/hamming relationship is
  preserved EXACTLY; across copies the token spaces are fully
  disjoint, so cross-copy near-dup pairs vanish and the true pair set
  grows linearly (copies x per-copy pairs) — the realistic 100 TB
  shape, where the corpus is not 99% verbatim clones.
- embeddings: a per-copy diagonal +-1 sign-flip — an ORTHOGONAL
  transform, so within-copy inner products (and cosines) are preserved
  exactly while cross-copy cosines decorrelate toward N(0, 1/sqrt(dim)).
- events: key shifts (event/user ids), as in the 10x probe — state
  cardinality scales with rows.

Usage: python tools/scale_probe_100x.py        (~15-30 min)
Writes SCALE_100X.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_100x"
DOC_COPIES = 200
VEC_COPIES = 100
EV_COPIES = 100

PROBE_QUERIES = [
    # (name, data-ratio for the factor column)
    ("minhash_lsh_pairs", DOC_COPIES),
    ("simhash_neardup_pairs", DOC_COPIES),
    ("simhash_pairs_capped", DOC_COPIES),      # r8: bucket budget engaged
    ("simhash_bucket_overflow", DOC_COPIES),   # r8: count-only overflow report
    ("containment_pairs", DOC_COPIES),
    ("prefix_jaccard_pairs", DOC_COPIES),
    ("embedding_neardup_pairs", VEC_COPIES),
    ("embedding_neardup_multiprobe", VEC_COPIES),  # r8: radius governor
    ("embedding_neardup_multiprobe_band", VEC_COPIES),  # r9: production cut
    ("embedding_neardup_multiprobe_wide", VEC_COPIES),  # r9: tables-for-radius
    ("dedup_exact", DOC_COPIES),
    ("stream_rate_limit", EV_COPIES),
    ("stream_dedup_gate", DOC_COPIES),
]


def _tag_tokens(col, i: int):
    """Per-copy TOKEN bijection: append an alnum copy-suffix to every
    token (lowercased first, so the suffix glues inside the [a-z0-9]+
    token). token -> token + 'q<i>z' is injective per copy and the
    suffix differs per copy, so cross-copy token sets are fully
    DISJOINT — zero cross-copy shingle/posting sharing — while every
    within-copy relationship (shingle sets, Jaccard, containment,
    token counts, positions) maps bijectively. Copy 0 is untagged (the
    1x run compares against the same untransformed corpus). Two
    earlier character-rotation designs failed subtly: ranges the
    vocabulary never used (verbatim clones), then range-AVOIDING
    tokens still shared across copies — shared posting lists inflated
    the candidate joins quadratically. Token tagging has no such
    leakage by construction."""
    from pyspark.sql import functions as F

    if i == 0:
        return F.lower(col)
    return F.regexp_replace(F.lower(col), "([a-z0-9]+)", f"$1q{i}z")


def _sign_pattern(i: int, dim: int) -> list[float]:
    """Deterministic +-1 diagonal for copy i (identity for copy 0)."""
    if i == 0:
        return [1.0] * dim
    import hashlib

    h = hashlib.md5(f"flip:{i}".encode()).digest() * ((dim // 16) + 1)
    return [1.0 if (h[d // 8] >> (d % 8)) & 1 else -1.0 for d in range(dim)]


def build(spark) -> None:
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import TABLES, load_table

    shutil.rmtree(DST, ignore_errors=True)

    docs = load_table(spark, SRC, "documents")
    doc_copies = [
        docs.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            _tag_tokens(F.col("text"), i).alias("text"),
        )
        for i in range(DOC_COPIES)
    ]
    out = doc_copies[0]
    for c in doc_copies[1:]:
        out = out.unionByName(c)
    out.repartition(64).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    vec_copies = []
    for i in range(VEC_COPIES):
        pat = F.array(*[F.lit(s) for s in _sign_pattern(i, dim)])
        vec_copies.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
                F.zip_with(
                    F.col("embedding").cast("array<double>"), pat, lambda x, s: x * s
                ).alias("embedding"),
            )
        )
    out = vec_copies[0]
    for c in vec_copies[1:]:
        out = out.unionByName(c)
    out.repartition(64).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    ev = load_table(spark, SRC, "events")
    ev_copies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        .withColumn("user_id", F.col("user_id") + F.lit(i * 10_000))
        for i in range(EV_COPIES)
    ]
    out = ev_copies[0]
    for c in ev_copies[1:]:
        out = out.unionByName(c)
    out.repartition(64).write.mode("overwrite").parquet(f"{DST}/events.parquet")

    for name in TABLES:
        if name in ("documents", "embeddings", "events"):
            continue
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    from gmallbiguan_parent_spark.pipelines import all_queries

    qs = all_queries()
    out = {}
    for name, _ in PROBE_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = (round(time.time() - t0, 2), n)
        print(f"# {sf_dir} {name}: {n} rows in {out[name][0]}s", file=sys.stderr)
    return out


def main() -> None:
    from gmallbiguan_parent_spark.operators.dedup import SIMHASH_WIDE_MIN_DOCS
    from gmallbiguan_parent_spark.operators.similarity import srp_bits_for
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("scale_probe_100x")
    spark.range(1000).count()
    t0 = time.time()
    from gmallbiguan_parent_spark.io import TABLES as _TABLES

    if "--reuse" in sys.argv and all(
        os.path.isdir(f"{DST}/{t}.parquet") for t in _TABLES
    ):
        print("# reusing existing replicated dataset", file=sys.stderr)
    else:
        build(spark)
    build_s = round(time.time() - t0, 1)
    print(f"# build: {build_s}s", file=sys.stderr)

    n_docs_big = spark.read.parquet(f"{DST}/documents.parquet").count()
    n_vecs_big = spark.read.parquet(f"{DST}/embeddings.parquet").count()
    wide_engaged = n_docs_big >= SIMHASH_WIDE_MIN_DOCS
    bits_small = srp_bits_for(
        spark.read.parquet(f"{SRC}/embeddings.parquet").count()
    )
    bits_big = srp_bits_for(n_vecs_big)

    small = run(spark, SRC)
    big = run(spark, DST)

    lines = [
        "# SCALE_100X — banded families + ledger screens at 100-200x",
        "",
        f"Built in {build_s}s: documents x{DOC_COPIES} -> {n_docs_big:,} docs "
        f"(simhash wide layout engaged: {wide_engaged}), embeddings "
        f"x{VEC_COPIES} -> {n_vecs_big:,} vecs (SRP width {bits_small} -> "
        f"{bits_big} bits), events x{EV_COPIES} -> 10M rows. Copies are",
        "structure-preserving bijections (copy-unique token suffix for text,",
        "sign-flip orthogonal diagonal for vectors) — each copy keeps the",
        "original's internal near-dup structure exactly, copies cannot share",
        "tokens, so the exact-measure pair set grows LINEARLY and factors",
        "below measure compute, not an identical-copy output explosion",
        "(see the tool docstring; SCALE_100X.md carries the per-row analysis",
        "including the simhash hash-realization variance and the SRP",
        "width/recall tradeoff — re-derive those notes after a re-run).",
        "",
        "| query | 1x s | 1x rows | big s | big rows | data x | time factor |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, ratio in PROBE_QUERIES:
        s_t, s_n = small[name]
        b_t, b_n = big[name]
        f = round(b_t / s_t, 1) if s_t > 0 else float("nan")
        lines.append(
            f"| {name} | {s_t} | {s_n:,} | {b_t} | {b_n:,} | {ratio}x | {f}x |"
        )

    # r8 recall-governor evidence: copies are pair-structure-preserving
    # bijections, so the big corpus's TRUE pair set is copies x the 1x
    # pair set — within-copy recall is big_rows / (copies * 1x_rows).
    from gmallbiguan_parent_spark.operators.similarity import (
        SRP_TARGET_RECALL, srp_probe_radius_for,
    )
    mp_small, mp_big = small["embedding_neardup_multiprobe"], big["embedding_neardup_multiprobe"]
    sp_small, sp_big = small["embedding_neardup_pairs"], big["embedding_neardup_pairs"]
    mp_recall = mp_big[1] / (VEC_COPIES * mp_small[1]) if mp_small[1] else float("nan")
    sp_recall = sp_big[1] / (VEC_COPIES * sp_small[1]) if sp_small[1] else float("nan")
    lines += [
        "",
        "## SRP recall governor (r8)",
        "",
        f"True big-corpus pair count = copies x 1x pairs (bijective copies).",
        f"- single-probe recovery: {sp_big[1]:,} / {VEC_COPIES * sp_small[1]:,} "
        f"= {sp_recall:.3f} of the 1x-recoverable set",
        f"- radius-governed multiprobe (radius "
        f"{srp_probe_radius_for(srp_bits_for(n_vecs_big))} at {bits_big} bits): "
        f"{mp_big[1]:,} / {VEC_COPIES * mp_small[1]:,} = {mp_recall:.3f} "
        f"(target {SRP_TARGET_RECALL} for pairs at the design cosine; the "
        "ratio also counts sub-design-cosine pairs, so it is a LOWER bound "
        "on design-point recall)",
        "",
        "## SimHash pair budget (r8)",
        "",
        f"- complete pairs: {big['simhash_neardup_pairs'][1]:,} rows in "
        f"{big['simhash_neardup_pairs'][0]}s (output-bound)",
        f"- capped pairs: {big['simhash_pairs_capped'][1]:,} rows in "
        f"{big['simhash_pairs_capped'][0]}s; overflow report "
        f"{big['simhash_bucket_overflow'][1]} row in "
        f"{big['simhash_bucket_overflow'][0]}s — a pathological corpus "
        "degrades to a bounded write + counts instead of an unbounded "
        "pair set.",
        "",
        "## Multiprobe production band (r9)",
        "",
        f"- floor (>= 0.35) emit: {big['embedding_neardup_multiprobe'][1]:,} "
        f"rows in {big['embedding_neardup_multiprobe'][0]}s",
        f"- band (>= NEARDUP_BAND_COSINE) emit: "
        f"{big['embedding_neardup_multiprobe_band'][1]:,} rows in "
        f"{big['embedding_neardup_multiprobe_band'][0]}s — the same governed",
        "  radius and candidate set (recall at the design point unchanged by",
        "  construction: the threshold only gates EMISSION after the cosine",
        "  confirm, and every design-point pair clears it — the planted-twin",
        "  tables above and tests/test_round9_ops.py pin that), with the",
        "  low-cosine tail cut at the source instead of in prose.",
        "",
        "## Multiprobe wide governor (r9): tables-for-radius",
        "",
        f"- radius governor (4 tables, hamming<=2, 368 probe keys/vec at 13",
        f"  bits): {big['embedding_neardup_multiprobe'][0]}s",
        f"- wide governor (srp_tables_for -> 9 tables, hamming<=1, 126 probe",
        f"  keys/vec): {big['embedding_neardup_multiprobe_wide'][1]:,} rows in "
        f"{big['embedding_neardup_multiprobe_wide'][0]}s — same recall target",
        "  at the design point by the identical closed form (planted-twin",
        "  test in tests/test_round9_ops.py), ~2.9x less probe+candidate",
        "  work for 2.25x more integer-sized signature rows: the",
        "  storage-for-compute exchange that is the production default at",
        "  100 TB (signatures are noise next to the vectors). The candidate",
        "  set legitimately differs from the radius form below the design",
        "  band, so row counts are not comparable pairwise; the contract",
        "  band is what both governors hold.",
    ]
    with open("/root/repo/SCALE_100X.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({name: {"small": small[name], "big": big[name]} for name, _ in PROBE_QUERIES}))


if __name__ == "__main__":
    main()
