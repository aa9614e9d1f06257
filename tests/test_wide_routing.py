"""Wide-layout routing tests (ADVICE r9 open item): the last two
home-bucket-only SRP consumers — the k-NN graph and the semantic
decontamination screen — re-based on the recall-governed
srp_tables_for layout. Both must recover planted design-point twins,
which is exactly what the home-bucket form cannot guarantee as
srp_bits_for widens."""

from __future__ import annotations

from tests.test_round9_ops import _planted_dir

SF_DIR = "/root/testdata/sf0.001"


def test_knn_graph_wide_ranks_design_point_twin_first(spark, tmp_path):
    """Every planted twin pair (cosine at SRP_DESIGN_COSINE = 0.9, far
    above the corpus's ~0.51 background max) must surface as each
    other's rank-1 neighbor — the governed layout's recall contract
    applied to graph construction. Plus the structural invariants: at
    most K neighbors per source, ranks contiguous from 1."""
    from gmallbiguan_parent_spark.operators.similarity import (
        KNN_GRAPH_K,
        SRP_DESIGN_COSINE,
        knn_graph_wide,
    )

    sf, planted = _planted_dir(spark, tmp_path, SRP_DESIGN_COSINE)
    rows = knn_graph_wide(spark, sf).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(int(r.src), []).append(r)
    for src, rs in by_src.items():
        ranks = sorted(int(r.rank) for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= KNN_GRAPH_K
    rank1 = {int(r.src): int(r.dst) for r in rows if int(r.rank) == 1}
    # each planted pair is mutual-rank-1 (tolerate one LSH miss per
    # direction across 40 twins at the 0.99 recall target)
    hits = sum(
        (rank1.get(a) == b) and (rank1.get(b) == a) for a, b in planted
    )
    assert hits >= len(planted) - 1, (
        f"only {hits}/{len(planted)} planted twins mutual-rank-1"
    )


def test_semantic_decontaminate_wide_flags_planted_leakage(spark, tmp_path):
    """Paraphrase-leakage recall: plant twins (at the design cosine) of
    BENCHMARK vectors (vec_id % 17 == 0) under non-benchmark ids — the
    wide screen must flag each twin as 'drop' with its benchmark
    original as the nearest hit. This is the failure mode the
    home-bucket form risks at production width."""
    import numpy as np

    from gmallbiguan_parent_spark.operators.similarity import (
        SEM_DECON_DROP,
        SRP_DESIGN_COSINE,
        semantic_decontaminate_wide,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    out = [(int(r.vec_id), [float(x) for x in r.embedding], int(r.label)) for r in rows]
    bench = sorted((r for r in rows if int(r.vec_id) % 17 == 0), key=lambda r: r.vec_id)
    next_id = max(int(r.vec_id) for r in rows) + 1
    planted = {}  # twin_id -> bench original id
    for r in bench[:20]:
        v = np.array([float(x) for x in r.embedding])
        u = v / np.linalg.norm(v)
        rng = np.random.RandomState(int(r.vec_id) % (2**31))
        g = rng.standard_normal(u.shape)
        g -= (g @ u) * u
        g /= np.linalg.norm(g)
        w = (SRP_DESIGN_COSINE * u + (1 - SRP_DESIGN_COSINE**2) ** 0.5 * g) * np.linalg.norm(v)
        while next_id % 17 == 0:  # the twin must land on the CORPUS side
            next_id += 1
        out.append((next_id, [float(x) for x in w], int(r.label)))
        planted[next_id] = int(r.vec_id)
        next_id += 1
    df = spark.createDataFrame(out, "vec_id bigint, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    flagged = {
        int(r.vec_id): r for r in semantic_decontaminate_wide(spark, str(tmp_path)).collect()
    }
    hits = 0
    for twin_id, bench_id in planted.items():
        r = flagged.get(twin_id)
        # an LSH miss can still leave the twin flagged by a DIFFERENT
        # bench vector at background cosine — that is the tolerated
        # miss, not a failure, so count a hit only on the full contract
        if (
            r is not None
            and r.decision == "drop"
            and float(r.max_cosine) >= SEM_DECON_DROP
            and int(r.nearest_bench) == bench_id
        ):
            hits += 1
    assert hits >= len(planted) - 1, (
        f"only {hits}/{len(planted)} planted leaks flagged with the right witness"
    )


def test_knn_graph_wide_capped_keeps_design_point_recall(spark, tmp_path):
    """VERDICT r9 #3: the confirm-budget form must hold the SAME
    planted-twin mutual-rank-1 contract as the uncapped graph — the
    48-bit RANKING-SKETCH hamming (a design-point pair sits at ~7/48
    differing bits vs ~19/48 for background, at every corpus width)
    must sort every twin into its source's capped candidate list even
    though the sf0.001 corpus overflows KNN_CAND_CAP for real.
    (Collision-count ranking was measured FAILING this test at 37/40 —
    see knn_graph_wide_capped's docstring — so do not 'simplify' the
    ranking back to collision statistics.)"""
    from gmallbiguan_parent_spark.operators.similarity import (
        KNN_CAND_CAP,
        KNN_GRAPH_K,
        SRP_DESIGN_COSINE,
        knn_graph_candidate_overflow,
        knn_graph_wide_capped,
    )

    sf, planted = _planted_dir(spark, tmp_path, SRP_DESIGN_COSINE)
    over = knn_graph_candidate_overflow(spark, sf).collect()[0]
    assert int(over.over_sources) > 0, (
        f"cap {KNN_CAND_CAP} never engaged — the test corpus must "
        "overflow it for the recall claim to mean anything"
    )
    rows = knn_graph_wide_capped(spark, sf).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(int(r.src), []).append(r)
    for src, rs in by_src.items():
        ranks = sorted(int(r.rank) for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= KNN_GRAPH_K
    rank1 = {int(r.src): int(r.dst) for r in rows if int(r.rank) == 1}
    hits = sum(
        (rank1.get(a) == b) and (rank1.get(b) == a) for a, b in planted
    )
    assert hits >= len(planted) - 1, (
        f"only {hits}/{len(planted)} planted twins mutual-rank-1 under the cap"
    )


def test_semantic_decontaminate_band_flags_only_planted_leakage(spark, tmp_path):
    """VERDICT r9 #2: the design-band form must flag a DISCRIMINATING
    subset — every planted design-point leak (with its true benchmark
    witness), and nothing from the background corpus (max background
    cosine ~0.51, far under SEM_DECON_BAND_REVIEW) — where the
    exploration-floor form saturates on a dense corpus."""
    import numpy as np

    from gmallbiguan_parent_spark.operators.similarity import (
        SEM_DECON_BAND_REVIEW,
        SRP_DESIGN_COSINE,
        semantic_decontaminate_band,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    out = [(int(r.vec_id), [float(x) for x in r.embedding], int(r.label)) for r in rows]
    bench = sorted((r for r in rows if int(r.vec_id) % 17 == 0), key=lambda r: r.vec_id)
    next_id = max(int(r.vec_id) for r in rows) + 1
    planted = {}
    for r in bench[:20]:
        v = np.array([float(x) for x in r.embedding])
        u = v / np.linalg.norm(v)
        rng = np.random.RandomState(int(r.vec_id) % (2**31))
        g = rng.standard_normal(u.shape)
        g -= (g @ u) * u
        g /= np.linalg.norm(g)
        w = (SRP_DESIGN_COSINE * u + (1 - SRP_DESIGN_COSINE**2) ** 0.5 * g) * np.linalg.norm(v)
        while next_id % 17 == 0:
            next_id += 1
        out.append((next_id, [float(x) for x in w], int(r.label)))
        planted[next_id] = int(r.vec_id)
        next_id += 1
    df = spark.createDataFrame(out, "vec_id bigint, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    flagged = {
        int(r.vec_id): r for r in semantic_decontaminate_band(spark, str(tmp_path)).collect()
    }
    hits = sum(
        1
        for twin_id, bench_id in planted.items()
        if (r := flagged.get(twin_id)) is not None
        and float(r.max_cosine) >= SEM_DECON_BAND_REVIEW
        and int(r.nearest_bench) == bench_id
    )
    assert hits >= len(planted) - 1, (
        f"only {hits}/{len(planted)} planted leaks flagged at the band"
    )
    background = set(flagged) - set(planted)
    assert not background, (
        f"band screen flagged {len(background)} background vectors — "
        "it must discriminate, not saturate"
    )
