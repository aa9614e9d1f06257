"""Deduplication operators over the documents table.

Training-data pipeline staples, each built shuffle-aware:

- exact dedup: hash-groupBy on a normalized fingerprint — one shuffle,
  the canonical keeper is min(doc_id) (deterministic).
- MinHash + LSH near-dup: shingle → per-permutation min-hash → band →
  candidate pairs via band self-join → exact Jaccard confirm. The LSH
  band join bounds the candidate set so the pairwise verify never goes
  quadratic; at 100 TB the band join is THE shuffle and bands are
  high-cardinality keys, so it partitions evenly.

Portability: all hashing is md5-based (identical in Spark and DuckDB)
so the DuckDB oracle replays the exact same algorithm. Spark's native
xxhash64 would be ~2× faster; at cluster scale swap PORTABLE_HASH=False
to use it (oracle then checks rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# MinHash configuration: 9 permutations in 3 bands of 3 rows.
# P(candidate | jaccard=j) = 1-(1-j^3)^3 — ~0.06 at j=0.3, ~0.58 at j=0.7.
N_PERM = 9
BAND_ROWS = 3
N_BANDS = N_PERM // BAND_ROWS
SHINGLE_K = 3          # 3-token shingles
JACCARD_THRESHOLD = 0.5


def _norm_text(col):
    """Normalize: lowercase, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint: md5 group → keeper =
    min(doc_id), group size. One hash-partition shuffle on the
    fingerprint; at 100 TB the fingerprint is computed in the scan
    projection and the shuffle carries only (fingerprint, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(_norm_text(F.col("text"))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("dup_ct"),
        )
    )


def _shingles(col):
    """Array of k-token shingles (space-joined token k-grams), distinct.

    Built-ins only: tokenize via split on non-alnum runs after
    normalization, then transform over an index sequence."""
    toks = F.filter(F.split(_norm_text(col), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    n = F.greatest(F.size(toks) - (SHINGLE_K - 1), F.lit(0))
    idx = F.sequence(F.lit(0), n - 1)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_K)))
    return F.array_distinct(
        F.when(F.size(toks) >= SHINGLE_K, sh).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _minhash_sig(shingle_col, perm: int):
    """One minhash value: min over shingles of md5(perm || shingle),
    compared as hex strings (md5 is uniform; string-min ≡ numeric-min
    on the fixed-width hex)."""
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"p{perm}:"), s)))
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact Jaccard confirm.

    Plan: one pass computes shingles + N_PERM minhashes per doc (no
    shuffle — all expressions), explode into N_BANDS band keys, self-join
    on band key (the only shuffle, on high-cardinality md5 band keys),
    dedupe candidate pairs, then confirm with exact Jaccard on the
    shingle arrays. Output: (doc_a, doc_b, jaccard) with a < b and
    jaccard >= 0.5. A 100 TB run would salt any mega-band and cap band
    bucket sizes; bands here are md5-derived so skew is structural only
    (true duplicate clusters), which is exactly what AQE skew-join splits.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id",
        _shingles(F.col("text")).alias("shingles"),
    )
    for p in range(N_PERM):
        sig = sig.withColumn(f"mh{p}", _minhash_sig(F.col("shingles"), p))
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * BAND_ROWS + r}") for r in range(BAND_ROWS)])).alias("band_key"),
        )
        for b in range(N_BANDS)
    ]
    banded = sig.select(
        "doc_id", "shingles", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "shingles", "band.band_id", "band.band_key")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter.cast("decimal(18,6)") / union).cast("decimal(9,6)")
    return (
        cand.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def ngram_jaccard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle stats (the n-gram Jaccard building block):
    distinct shingle count and a stable sample shingle. Verifies the
    shingling transform itself against the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("shingles"))
    return sh.select(
        "doc_id",
        F.size("shingles").alias("shingle_ct"),
        F.array_min("shingles").alias("min_shingle"),
        F.array_max("shingles").alias("max_shingle"),
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "ngram_jaccard_stats": ngram_jaccard_stats,
}

# DuckDB replicas of the same algorithms (same md5 hashing, same
# shingling), so the driver's hash-compare validates the full pipeline.
_DUCK_SHINGLES = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                   list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)])
               ELSE [array_to_string(toks, ' ')] END AS shingles
        FROM toks
    )
"""

ORACLES = {
    "dedup_exact": """
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
               CAST(COUNT(*) AS BIGINT) AS dup_ct
        FROM documents
        GROUP BY 1
    """,
    "minhash_lsh_pairs": _DUCK_SHINGLES + """
    , sig AS (
        SELECT doc_id, shingles,
               [list_min([md5('p' || p || ':' || s) for s in shingles]) for p in range(0, 9)] AS mh
        FROM sh
    ), banded AS (
        SELECT doc_id, shingles, b AS band_id,
               md5(mh[b*3+1] || '|' || mh[b*3+2] || '|' || mh[b*3+3]) AS band_key
        FROM sig, (SELECT unnest(range(0, 3)) AS b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), pairs AS (
        SELECT c.doc_a, c.doc_b, sa.shingles AS sh_a, sb.shingles AS sh_b
        FROM cand c
        JOIN sh sa ON c.doc_a = sa.doc_id
        JOIN sh sb ON c.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(CAST(len(list_intersect(sh_a, sh_b)) AS DECIMAL(18,6))
                / len(list_distinct(list_concat(sh_a, sh_b))) AS DECIMAL(9,6)) AS jaccard
    FROM pairs
    WHERE CAST(CAST(len(list_intersect(sh_a, sh_b)) AS DECIMAL(18,6))
               / len(list_distinct(list_concat(sh_a, sh_b))) AS DECIMAL(9,6)) >= 0.5
    """,
    "ngram_jaccard_stats": _DUCK_SHINGLES + """
    SELECT doc_id,
           CAST(len(shingles) AS INTEGER) AS shingle_ct,
           list_min(shingles) AS min_shingle,
           list_max(shingles) AS max_shingle
    FROM sh
    """,
}
