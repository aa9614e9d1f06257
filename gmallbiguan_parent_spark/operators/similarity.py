"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, score every corpus vector with built-in higher-order
functions (zip_with + aggregate — JVM-side, no Python), rank per query.
The scale path (IVF-style coarse quantization) lives in
`ivf_topk`: corpus vectors are bucketed by nearest centroid
at write time, queries probe only their centroid's bucket — at 100 TB
this turns a full scan into a partition-pruned read of ~1/nlist of the
data. Scores are computed in float64 and rounded to 6 dp so the DuckDB
oracle (same arithmetic, same order) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, load_table_spread

N_QUERIES = 8     # vec_id < 8 are the query vectors
TOP_K = 5


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: queries (vec_id < N_QUERIES)
    crossJoin-broadcast against the corpus; rank by rounded score with
    vec_id tiebreak (deterministic top-k). The corpus scan is a single
    pass; ranking is a per-query window over TOP_K candidates.

    At scale: score+rank pushes into one shuffle-free stage per corpus
    partition followed by a tiny shuffle of TOP_K rows per (query,
    partition) — Spark's TakeOrderedAndProject pattern per group."""
    emb = load_table_spread(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
        F.col("label").alias("corpus_label"),
    ).filter(F.col("corpus_id") >= N_QUERIES)
    queries = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    ).filter(F.col("query_id") < N_QUERIES)

    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "corpus_id",
        "corpus_label",
        F.round(
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "corpus_id", "corpus_label", "cosine")
    )


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification readout on top of the exact top-k: majority
    label among the TOP_K neighbours per query (ties broken by smaller
    label id — deterministic)."""
    topk = ann_cosine_topk(spark, sf_dir)
    votes = topk.groupBy("query_id", "corpus_label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("corpus_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("corpus_label").alias("predicted_label"), "votes")
    )


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "knn_label_vote": knn_label_vote,
}

_DUCK_SCORED = f"""
    WITH corpus AS (
        SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS c_emb, label AS corpus_label
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), queries AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT query_id, corpus_id, corpus_label,
               ROUND(list_dot_product(q_emb, c_emb)
                     / (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(c_emb, c_emb))), 6) AS cosine
        FROM corpus, queries
    ), ranked AS (
        SELECT query_id, corpus_id, corpus_label, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
        FROM scored
    )
"""

ORACLES = {
    "ann_cosine_topk": _DUCK_SCORED + f"""
    SELECT query_id, CAST(rank AS INTEGER) AS rank, corpus_id, corpus_label, cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
    "knn_label_vote": _DUCK_SCORED + f"""
    , votes AS (
        SELECT query_id, corpus_label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM ranked WHERE rank <= {TOP_K}
        GROUP BY 1, 2
    ), best AS (
        SELECT query_id, corpus_label AS predicted_label, votes,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, corpus_label ASC) AS rn
        FROM votes
    )
    SELECT query_id, predicted_label, votes FROM best WHERE rn = 1
    """,
}
