"""k-means invariants: monotone inertia, planted-cluster recovery,
deterministic trajectory under the fixed-seed init."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_kmeans_inertia_decreases_and_is_deterministic(spark):
    from gmallbiguan_parent_spark.operators.clustering import kmeans_fit

    c1, inertia1 = kmeans_fit(spark, SF, k=4, max_iters=1)
    c5, inertia5 = kmeans_fit(spark, SF, k=4, max_iters=5)
    assert inertia5 <= inertia1 + 1e-6
    # fixed-seed init => identical re-run
    c5b, inertia5b = kmeans_fit(spark, SF, k=4, max_iters=5)
    assert inertia5b == inertia5
    assert c5b == c5


def test_kmeans_recovers_planted_clusters(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.clustering import kmeans_assign, kmeans_fit

    # two tight blobs far apart in 4-d
    rows = []
    for i in range(20):
        off = 0.01 * i
        rows.append((i, [0.0 + off, 0.0, 0.0, 0.0], 0))
        rows.append((100 + i, [10.0 + off, 10.0, 10.0, 10.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    centroids, inertia = kmeans_fit(spark, str(tmp_path), k=2, max_iters=10)
    assigned = kmeans_assign(
        spark.read.parquet(str(tmp_path / "embeddings.parquet")), centroids
    ).collect()
    by_label = {}
    for r in assigned:
        by_label.setdefault(r.label, set()).add(r.cluster)
    # each blob maps to exactly one cluster, and the two differ
    assert all(len(cs) == 1 for cs in by_label.values())
    assert by_label[0] != by_label[1]


def test_cluster_profile_shapes(spark):
    from gmallbiguan_parent_spark.operators.clustering import cluster_profile

    rows = cluster_profile(spark, SF, k=4).collect()
    assert sum(r.n for r in rows) == 500
    for r in rows:
        assert 0 < r.majority_ct <= r.n
