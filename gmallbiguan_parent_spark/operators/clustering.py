"""Embedding clustering — distributed Lloyd's k-means as a library
operator (the corpus-mixing / IVF-training primitive: cluster document
embeddings, then sample or route per cluster).

This is the second iterative algorithm in the engine (with
dedup.neardup_clusters): each iteration is ONE shuffle — assign every
vector to its nearest centroid (a broadcast of k small arrays, so
assignment is scan-stage work), then recompute centroids as per-cluster
means (hash aggregate on the assignment key). localCheckpoint truncates
lineage between rounds. Convergence = inertia (sum of squared
distances) stops improving.

NOT exposed through the driver oracle gate: float summation order makes
the means run-order-dependent in the last ulp, so exact hash parity is
the wrong contract — tests assert the real invariants instead
(monotone non-increasing inertia, planted clusters recovered,
determinism of the assignment under a fixed seed init).

Init is deterministic: the k lowest vec_ids seed the centroids, so
re-runs produce the same trajectory on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table_spread


def _sq_dist(vec_col, centroid_lit):
    """Squared L2 distance between an array column and a literal list."""
    return F.aggregate(
        F.zip_with(vec_col, centroid_lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Add (cluster, sq_dist) for the nearest of the given centroids.
    Centroids enter the plan as literals (they are k*dim floats — tiny),
    so assignment is pure scan-stage expression work: no shuffle, no
    Python."""
    dists = F.array(
        *[_sq_dist(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])) for c in centroids]
    )
    best = F.array_position(dists, F.array_min(dists)).cast("int") - 1
    return df.withColumn("cluster", best).withColumn(
        "sq_dist", F.array_min(dists)
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 4,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], float]:
    """Lloyd's iterations over the embeddings table. Returns (centroids,
    inertia). Each round: broadcast-assign (no shuffle) + one hash
    aggregate for the new means + one scalar action for inertia."""
    emb = load_table_spread(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.localCheckpoint()
    dim = len(emb.first()["embedding"])

    seeds = emb.orderBy("vec_id").limit(k).collect()
    centroids = [list(map(float, r.embedding)) for r in seeds]

    prev_inertia = float("inf")
    inertia = prev_inertia
    for _ in range(max_iters):
        assigned = kmeans_assign(emb, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                *[F.sum(F.element_at("embedding", i + 1)).alias(f"s{i}") for i in range(dim)],
                F.count("*").alias("n"),
                F.sum("sq_dist").alias("inertia"),
            )
            .collect()
        )
        inertia = sum(r["inertia"] for r in stats)
        by_cluster = {r["cluster"]: r for r in stats}
        centroids = [
            [by_cluster[c][f"s{i}"] / by_cluster[c]["n"] for i in range(dim)]
            if c in by_cluster else centroids[c]  # empty cluster keeps its seed
            for c in range(k)
        ]
        if prev_inertia - inertia <= tol * max(prev_inertia, 1.0):
            break
        prev_inertia = inertia
    return centroids, inertia


def cluster_profile(spark: SparkSession, sf_dir: str, k: int = 4) -> DataFrame:
    """Fit + final assignment profile: per-cluster size, label purity
    numerator (majority-label count), and mean squared distance."""
    centroids, _ = kmeans_fit(spark, sf_dir, k=k)
    emb = load_table_spread(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, centroids)
    per_label = assigned.groupBy("cluster", "label").agg(F.count("*").alias("ct"))
    top_label = per_label.groupBy("cluster").agg(F.max("ct").alias("majority_ct"))
    sizes = assigned.groupBy("cluster").agg(
        F.count("*").alias("n"), F.avg("sq_dist").alias("mean_sq_dist")
    )
    return sizes.join(top_label, "cluster")


def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry for the k-means capstone. Centroid means
    are float-sum order-dependent in the last ulp, so per-cluster hash
    parity is the wrong contract; instead the gate emits a one-row
    invariant audit the oracle CAN check exactly — every vector
    accounted for (n_total = count(embeddings), data-derived in SQL),
    all k clusters non-empty, majority-label count within [1, n] per
    cluster, mean squared distance non-negative. A trainer that loses
    rows, collapses clusters, or emits negative distances now fails the
    hash gate; trajectory invariants (monotone inertia, planted-cluster
    recovery, deterministic seeding) stay in tests/test_clustering.py.
    Per-cluster numbers remain available via cluster_profile()."""
    prof = cluster_profile(spark, sf_dir, k=4)
    return prof.agg(
        F.countDistinct("cluster").alias("n_clusters"),
        F.sum("n").alias("n_total"),
        F.min(
            (F.col("majority_ct") >= 1) & (F.col("majority_ct") <= F.col("n"))
        ).alias("majority_within_size"),
        F.min(F.col("mean_sq_dist") >= 0.0).alias("mean_sq_dist_nonneg"),
    )


QUERIES = {
    "embedding_clusters": embedding_clusters,
}

ORACLES: dict[str, str] = {
    # invariant-audit oracle: n_total is genuinely data-derived; the
    # boolean verdicts assert the Spark-side invariants held
    "embedding_clusters": """
        SELECT CAST(4 AS BIGINT) AS n_clusters,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS majority_within_size,
               TRUE AS mean_sq_dist_nonneg
        FROM embeddings
    """,
}
