"""Round-12 scale probes (VERDICT r11 #4, #5, #7).

Every measurement is FRESH-SESSION (one python process per measurement,
the protocol the r10 outlier resolution established); this orchestrator
only subprocess-launches steps and prints their JSON. SCALE.md /
SCALE_100X.md rows are written by hand from the printed records so doc
edits stay reviewable.

1. Derived posting cap at 100x (VERDICT r11 #4), two corpora:
   - `build100 <base_sf_dir> <dst>`: identical-copy 100x replication of
     the base documents (doc_id shifted 1,000,000 per copy, text
     identical — every posting length multiplies by exactly 100; other
     tables copied as-is so loaders resolve).
   - sf0.1 base: the full pair join under the derived cap is
     ~3.65e9 candidate slots (measured from the posting histogram:
     sum C(min(100*s, 900), 2)) — a cluster-scale job, so the probe
     records the OVERFLOW REPORT (cap derivation + shed accounting,
     linear cost) and prices the join it declines to run. That is the
     report's production purpose.
   - sf0.01 base: the same 100x densification at a tractable join size,
     so pairs-kept is MEASURED against the complete form.
   Steps: `p99over <sf_dir>`, `p99pairs <sf_dir>`, `complete <sf_dir>`.

2. Sketch-in-join A/B (VERDICT r11 #5): `graphAB <sf_dir> <first>`
   runs BOTH capped-graph shapes in one fresh session in the given
   order (`r10` = attach-sketches-after-distinct, reconstructed below
   from the pre-c479122 code; `r11` = sketch rides into the bucket
   join). Run twice with the order swapped: warm-session advantage
   cancels across the pair.

3. `leak <sf_dir>`: leakage_safe_split fresh-session measurement
   (VERDICT r11 #7 — the 29.2 s close-snapshot number had no calm-VM
   comparison).

Usage:
  python tools/scale_probe_r12.py build100 /root/testdata/sf0.1 /tmp/docs100_sf01
  python tools/scale_probe_r12.py p99over /tmp/docs100_sf01
  python tools/scale_probe_r12.py p99pairs /tmp/docs100_sf001
  python tools/scale_probe_r12.py complete /tmp/docs100_sf001
  python tools/scale_probe_r12.py graphAB /tmp/scale_100x r10
  python tools/scale_probe_r12.py leak /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DOC_COPIES = 100


def _spark(app: str):
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark(app)
    spark.range(1000).count()
    return spark


def build100(base: str, dst: str) -> dict:
    import shutil

    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import TABLES, load_table

    spark = _spark("build100")
    shutil.rmtree(dst, ignore_errors=True)
    docs = load_table(spark, base, "documents")
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(DOC_COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(64).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    for name in TABLES:
        if name == "documents":
            continue
        load_table(spark, base, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    return {"step": "build100", "base": base, "dst": dst, "docs": n}


VEC_COPIES = 100


def buildvec(base: str, dst: str) -> dict:
    """Vectors-only 100x corpus for the graph A/B (the scale_probe_100x
    sign-flip bijection — copies preserve internal cosine structure
    exactly and cannot near-dup across copies); docs/events copied 1x
    so loaders resolve without paying the x200 doc build graphAB never
    reads."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import TABLES, load_table

    spark = _spark("buildvec")
    shutil.rmtree(dst, ignore_errors=True)
    emb = load_table(spark, base, "embeddings")
    dim = len(emb.select("embedding").first()[0])

    def _sign_pattern(i: int) -> list[float]:
        if i == 0:
            return [1.0] * dim
        h = hashlib.md5(f"flip:{i}".encode()).digest() * ((dim // 16) + 1)
        return [1.0 if (h[d // 8] >> (d % 8)) & 1 else -1.0 for d in range(dim)]

    copies = []
    for i in range(VEC_COPIES):
        pat = F.array(*[F.lit(s) for s in _sign_pattern(i)])
        copies.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
                F.zip_with(
                    F.col("embedding").cast("array<double>"), pat, lambda x, s: x * s
                ).alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(64).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    for name in TABLES:
        if name == "embeddings":
            continue
        load_table(spark, base, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    return {"step": "buildvec", "base": base, "dst": dst, "vecs": n}


def p99over(sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.operators.dedup import prefix_posting_overflow_p99

    spark = _spark("p99over")
    t0 = time.time()
    r = prefix_posting_overflow_p99(spark, sf_dir).collect()[0]
    return {
        "step": "p99over", "sf_dir": sf_dir, "sec": round(time.time() - t0, 2),
        "cap": int(r.cap), "over_tokens": int(r.over_tokens),
        "max_posting": int(r.max_posting),
        "dropped_pair_slots": int(r.dropped_pair_slots),
    }


def p99pairs(sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.operators.dedup import prefix_jaccard_pairs_capped_p99

    spark = _spark("p99pairs")
    t0 = time.time()
    n = prefix_jaccard_pairs_capped_p99(spark, sf_dir).count()
    return {"step": "p99pairs", "sf_dir": sf_dir,
            "sec": round(time.time() - t0, 2), "pairs": n}


def complete(sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.operators.dedup import prefix_jaccard_pairs

    spark = _spark("complete")
    t0 = time.time()
    n = prefix_jaccard_pairs(spark, sf_dir).count()
    return {"step": "complete", "sf_dir": sf_dir,
            "sec": round(time.time() - t0, 2), "pairs": n}


def _graph_r10_shape(sigs, masks, cap):
    """The pre-c479122 capped-graph shape, reconstructed VERBATIM for
    the A/B (attach ranking sketches to the distinct candidate relation
    with two post-distinct joins, then cap): the engine's current shape
    computes hamming inside the bucket join instead. Kept here, not in
    the engine — the tombstone at similarity.py explains why the old
    shape dies at 1e9 vectors."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.operators.similarity import (
        KNN_GRAPH_K,
        _dot,
        _knn_wide_candidates,
        _norm,
        _rank_sketch,
    )

    cand = _knn_wide_candidates(sigs, masks)
    rsk = (
        sigs.filter(F.col("table_id") == 0)
        .select("vec_id", _rank_sketch(F.col("v")).alias("rs"))
        .localCheckpoint(eager=False)
    )
    ra, rb = rsk.alias("ra"), rsk.alias("rb")
    hamming = F.bit_count(F.col("ra.rs").bitwiseXOR(F.col("rb.rs")))
    capw = Window.partitionBy("src").orderBy(F.asc("hamming"), F.asc("dst"))
    capped = (
        cand.join(ra, cand.src == F.col("ra.vec_id"))
        .join(rb, cand.dst == F.col("rb.vec_id"))
        .select("src", "dst", hamming.alias("hamming"))
        .withColumn("crk", F.row_number().over(capw))
        .filter(F.col("crk") <= cap)
        .select("src", "dst")
    )
    vecs = sigs.filter(F.col("table_id") == 0).select("vec_id", "v")
    va, vb = vecs.alias("va"), vecs.alias("vb")
    cosine = F.round(
        _dot(F.col("va.v"), F.col("vb.v")) / (_norm(F.col("va.v")) * _norm(F.col("vb.v"))), 6
    )
    scored = (
        capped.join(va, capped.src == F.col("va.vec_id"))
        .join(vb, capped.dst == F.col("vb.vec_id"))
        .select("src", "dst", cosine.alias("cosine"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
        .select("src", "rank", "dst", "cosine")
    )


def graphAB(sf_dir: str, first: str) -> dict:
    from gmallbiguan_parent_spark.operators.similarity import (
        KNN_CAND_CAP,
        _knn_graph_capped_from_sigs,
        _srp_wide_sigs,
    )

    spark = _spark("graphAB")

    def run_r10():
        sigs, masks = _srp_wide_sigs(spark, sf_dir)
        t0 = time.time()
        n = _graph_r10_shape(sigs, masks, KNN_CAND_CAP).count()
        return round(time.time() - t0, 2), n

    def run_r11():
        sigs, masks = _srp_wide_sigs(spark, sf_dir)
        t0 = time.time()
        n = _knn_graph_capped_from_sigs(sigs, masks, KNN_CAND_CAP).count()
        return round(time.time() - t0, 2), n

    order = [first, "r11" if first == "r10" else "r10"]
    out: dict = {"step": "graphAB", "sf_dir": sf_dir, "order": order}
    for shape in order:
        sec, n = run_r10() if shape == "r10" else run_r11()
        out[f"{shape}_sec"], out[f"{shape}_rows"] = sec, n
    return out


def leak(sf_dir: str) -> dict:
    from gmallbiguan_parent_spark.pipelines import all_queries

    spark = _spark("leak")
    t0 = time.time()
    n = all_queries()["leakage_safe_split"](spark, sf_dir).count()
    return {"step": "leak", "sf_dir": sf_dir,
            "sec": round(time.time() - t0, 2), "rows": n}


STEPS = {
    "build100": lambda a: build100(a[0], a[1]),
    "buildvec": lambda a: buildvec(a[0], a[1]),
    "p99over": lambda a: p99over(a[0]),
    "p99pairs": lambda a: p99pairs(a[0]),
    "complete": lambda a: complete(a[0]),
    "graphAB": lambda a: graphAB(a[0], a[1]),
    "leak": lambda a: leak(a[0]),
}


if __name__ == "__main__":
    print(json.dumps(STEPS[sys.argv[1]](sys.argv[2:])))
