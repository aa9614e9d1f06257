"""Unit tests for operator semantics on tiny in-memory DataFrames —
the reference-documented behaviors (SURVEY.md §5, §7.5) asserted
exactly: UV dedup picks the first event per (user, day); jump detection
treats end-of-data as timeout; dim-join misses keep the row; minhash
finds a planted near-duplicate; exact dedup groups normalized text."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from conftest import SF_DIR


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_uv_dedup_first_event_per_day(spark):
    from pyspark.sql import Window

    rows = [
        (1, 10, _ts("2024-01-01T00:00:00")),
        (1, 11, _ts("2024-01-01T05:00:00")),  # same day revisit — dropped
        (1, 12, _ts("2024-01-02T00:00:00")),  # next day — kept
        (2, 13, _ts("2024-01-01T01:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    kept = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assert sorted(r.event_id for r in kept.collect()) == [10, 12, 13]


def test_jump_detection_timeout_and_eod(spark):
    from gmallbiguan_parent_spark.pipelines.dwm import JUMP_TIMEOUT_S
    from pyspark.sql import Window

    rows = [
        (1, 1, _ts("2024-01-01T00:00:00")),  # followed within timeout → not jump
        (1, 2, _ts("2024-01-01T00:05:00")),  # next is > timeout later → jump
        (1, 3, _ts("2024-01-01T01:00:00")),  # last event (end-of-data) → jump
        (2, 4, _ts("2024-01-01T00:00:00")),  # only event → jump
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = (
        df.withColumn("next_ts", F.lead("ts").over(w))
        .withColumn(
            "is_jump",
            F.col("next_ts").isNull()
            | (F.unix_micros("next_ts") - F.unix_micros("ts") > JUMP_TIMEOUT_S * 1_000_000),
        )
    )
    jumps = {r.event_id for r in out.collect() if r.is_jump}
    assert jumps == {2, 3, 4}


def test_dim_join_miss_keeps_row(spark):
    fact = spark.createDataFrame([(1, 100), (2, 999)], "id long, dim_id long")
    dim = spark.createDataFrame([(100, "known")], "id long, name string")
    out = fact.join(F.broadcast(dim), fact.dim_id == dim.id, "left").select(
        fact.id, dim.name
    )
    got = {r.id: r.name for r in out.collect()}
    assert got == {1: "known", 2: None}  # RT/app/func/DimAsyncFunction.java:75-78


def test_is_new_repair_rewrites_returning_visitor(spark):
    from pyspark.sql import Window

    rows = [(1, _ts("2024-01-01T00:00:00")), (1, _ts("2024-01-02T00:00:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    w = Window.partitionBy("user_id")
    out = (
        df.select("user_id", F.to_date("ts").alias("dt"))
        .withColumn("first_dt", F.min("dt").over(w))
        .withColumn("is_new", F.when(F.col("dt") == F.col("first_dt"), "1").otherwise("0"))
    )
    got = sorted((str(r.dt), r.is_new) for r in out.collect())
    assert got == [("2024-01-01", "1"), ("2024-01-02", "0")]


def test_minhash_finds_planted_near_duplicate(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.dedup import minhash_lsh_pairs

    base = "spark query engine shuffles data across the cluster for joins and aggregations every day"
    near = base + " indeed"
    far = "completely different words about cooking pasta with tomatoes basil and olive oil tonight"
    docs = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, near, "en", "s", len(near)), (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "documents.parquet")
    docs.write.parquet(d)
    # minimal sf_dir layout: only documents is read by this operator
    pairs = minhash_lsh_pairs(spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]


def test_dedup_exact_normalizes_whitespace_and_case(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame(
        [(1, "Hello  World", "en", "s", 12), (2, "hello world", "en", "s", 11), (3, "other", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = dedup_exact(spark, str(tmp_path)).collect()
    by_keeper = {r.keeper_doc_id: r.dup_ct for r in out}
    assert by_keeper == {1: 2, 3: 1}


def test_tokenize_builtin(spark):
    from gmallbiguan_parent_spark.functions import tokenize

    df = spark.createDataFrame([("Hello, World 42!",)], "text string")
    toks = df.select(tokenize("text").alias("t")).collect()[0].t
    assert toks == ["hello", "world", "42"]


def test_neardup_clusters_transitive_chain(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.dedup import neardup_clusters

    base = "spark query engine shuffles data across the cluster for joins and aggregations every day"
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", 1),
            (2, base + " indeed", "en", "s", 1),
            (3, base + " indeed truly", "en", "s", 1),
            (9, "completely different words about cooking pasta with tomatoes basil and olive oil", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    labels = {r.doc_id: r.cluster_id for r in neardup_clusters(spark, str(tmp_path)).collect()}
    # 1-2 and 2-3 are near-dups; 1-3 may only be connected through 2 —
    # the component must still collapse to one cluster labeled min id
    assert labels == {1: 1, 2: 1, 3: 1}


def test_neardup_clusters_labels_consistent_with_pairs(spark):
    from gmallbiguan_parent_spark.operators.dedup import minhash_lsh_pairs, neardup_clusters

    pairs = minhash_lsh_pairs(spark, SF_DIR).select("doc_a", "doc_b").collect()
    labels = {r.doc_id: r.cluster_id for r in neardup_clusters(spark, SF_DIR).collect()}
    for r in pairs:
        assert labels[r.doc_a] == labels[r.doc_b]
    # every cluster id is itself a member of the cluster (min-id labeling)
    for doc, cl in labels.items():
        assert labels[cl] == cl and cl <= doc


def test_scd2_history_versions_and_delete_closure(spark, tmp_path):
    from gmallbiguan_parent_spark.pipelines.cdc import scd2_history

    t = datetime.datetime(2021, 1, 1)
    # event_id % 10: 4,3 -> insert, 11 -> update, 12 -> delete
    ev = spark.createDataFrame(
        [
            (4, t, 1, "signup", 10.0, "{}"),     # v1: opens
            (11, t, 1, "signup", 20.0, "{}"),    # v2: closes v1
            (12, t, 1, "signup", 0.0, "{}"),     # delete: closes v2, no version
            (14, t, 1, "signup", 30.0, "{}"),    # v3: current
            (3, t, 2, "signup", 5.0, "{}"),      # other key, single current version
            (5, t, 3, "view", 1.0, "{}"),        # other table: ignored
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    rows = {
        (r.user_id, r.valid_from_event): (r.valid_to_event, r.is_current)
        for r in scd2_history(spark, str(tmp_path)).collect()
    }
    assert rows == {
        (1, 4): (11, 0),
        (1, 11): (12, 0),
        (1, 14): (None, 1),
        (2, 3): (None, 1),
    }


def test_simhash_banding_finds_complete_hamming_set(spark):
    """The 4x16-bit band self-join must return EXACTLY the brute-force
    hamming<=3 pair set (pigeonhole: <=3 differing bits leave at least
    one of 4 disjoint bands identical)."""
    from gmallbiguan_parent_spark.operators.dedup import (
        SIMHASH_HAMMING_MAX,
        simhash_fingerprint,
        simhash_neardup_pairs,
    )

    sim = simhash_fingerprint(spark, SF_DIR)
    a, b = sim.alias("a"), sim.alias("b")
    hamming = F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi"))) + F.bit_count(
        F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))
    )
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .collect()
    }
    banded = {(r.doc_a, r.doc_b, r.hamming) for r in simhash_neardup_pairs(spark, SF_DIR).collect()}
    assert banded == brute
    assert brute, "fixture corpus should contain at least one hamming<=3 pair"
    # the wide C(6,3) block-triple layout (the >SIMHASH_WIDE_MIN_DOCS
    # path) must return the identical complete set — pigeonhole: <=3
    # differing bits touch <=3 of 6 blocks, so >=1 keyed triple agrees
    wide = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(spark, SF_DIR, wide=True).collect()
    }
    assert wide == brute


def test_simhash_blocks_reconstruct_fingerprint(spark):
    """The 6-block split is a partition of the 64 fingerprint bits:
    re-shifting every block back to its offset reproduces (hi, lo)."""
    from gmallbiguan_parent_spark.operators.dedup import (
        _SIMHASH_BLOCKS,
        _simhash_block,
        simhash_fingerprint,
    )

    sim = simhash_fingerprint(spark, SF_DIR)
    recon_lo, recon_hi = F.lit(0), F.lit(0)
    for s, e in _SIMHASH_BLOCKS:
        blk = _simhash_block(s, e)
        if e <= 31:
            recon_lo = recon_lo + blk * F.lit(1 << s)
        elif s >= 32:
            recon_hi = recon_hi + blk * F.lit(1 << (s - 32))
        else:  # straddle: low part back into lo, high part into hi
            lo_bits = 32 - s
            recon_lo = recon_lo + blk.bitwiseAND(F.lit((1 << lo_bits) - 1)) * F.lit(1 << s)
            recon_hi = recon_hi + F.shiftright(blk, lo_bits)
    bad = sim.filter(
        (recon_lo != F.col("sim_lo")) | (recon_hi != F.col("sim_hi"))
    ).count()
    assert bad == 0


def test_srp_neardup_pairs_subset_of_bruteforce(spark):
    """Every SRP-LSH pair must be a true cosine>=threshold pair (the
    bucketing only prunes, never invents), signatures are deterministic,
    and at least one same-bucket pair survives on the fixture data."""
    from gmallbiguan_parent_spark.operators.similarity import (
        NEARDUP_COSINE,
        _dot,
        _norm,
        embedding_neardup_pairs,
    )
    from gmallbiguan_parent_spark.io import load_table

    got = {(r.vec_a, r.vec_b): r.cosine for r in embedding_neardup_pairs(spark, SF_DIR).collect()}
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    cosine = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v"))), 6
    )
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), cosine.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_COSINE)
        .collect()
    }
    assert got, "fixture embeddings should produce at least one same-bucket pair"
    assert set(got) <= set(brute)
    assert all(brute[k] == v for k, v in got.items())


def test_connected_components_star_on_adversarial_graph(spark):
    """Alternating large-star/small-star must resolve a long chain
    (worst case for label propagation), a separate clique, and isolated
    pairs — labels = component minimum."""
    from gmallbiguan_parent_spark.operators.dedup import connected_components

    # chain 100-101-...-131 with scrambled endpoint order, clique on
    # {7,8,9}, isolated pair (500, 501)
    chain = [(i + 1, i) if i % 2 else (i, i + 1) for i in range(100, 131)]
    clique = [(7, 8), (8, 9), (9, 7)]
    edges = spark.createDataFrame(chain + clique + [(501, 500)], "src long, dst long")
    got = {r.node: r.label for r in connected_components(edges).collect()}
    assert {n: got[n] for n in range(100, 132)} == {n: 100 for n in range(100, 132)}
    assert got[7] == got[8] == got[9] == 7
    assert got[500] == got[501] == 500
    assert set(got) == set(range(100, 132)) | {7, 8, 9, 500, 501}


def test_multiprobe_ivf_recall_dominates_single_probe(spark):
    """Probing 2 cells scans a superset of single-probe's candidates, so
    its top-k intersection with the exact top-k can only grow."""
    from gmallbiguan_parent_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_multiprobe,
        ann_ivf_topk,
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.corpus_id)
        return out

    exact = topk_sets(ann_cosine_topk(spark, SF_DIR))
    single = topk_sets(ann_ivf_topk(spark, SF_DIR))
    multi = topk_sets(ann_ivf_multiprobe(spark, SF_DIR))
    for q, truth in exact.items():
        r1 = len(single.get(q, set()) & truth)
        r2 = len(multi.get(q, set()) & truth)
        assert r2 >= r1, f"query {q}: multiprobe recall {r2} < single {r1}"


def test_ann_arrow_topk_ids_match_expression_path(spark):
    """The numpy/Arrow scorer returns the same ranked neighbor IDs as
    the fold-expression path (scores may differ in the last ulp, which
    is why the Arrow variant registers rows-only)."""
    from gmallbiguan_parent_spark.operators.similarity import (
        ann_cosine_topk, ann_cosine_topk_arrow,
    )

    sf = "/root/testdata/sf0.001"
    expr = {(r.query_id, r.rank): r.corpus_id for r in ann_cosine_topk(spark, sf).collect()}
    arrow = {(r.query_id, r.rank): r.corpus_id for r in ann_cosine_topk_arrow(spark, sf).collect()}
    assert expr == arrow


def test_sq8_rerank_recall_and_code_bounds(spark):
    """SQ8 quantization noise is tiny relative to cosine gaps, so the
    reranked top-k should recover most of the exact top-k; and the
    approximate score must stay within quantization error of the exact
    one for every surviving candidate."""
    from gmallbiguan_parent_spark.operators.similarity import (
        ann_cosine_topk, ann_sq8_rerank,
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.corpus_id)
        return out

    rows = ann_sq8_rerank(spark, SF_DIR).collect()
    exact = topk_sets(ann_cosine_topk(spark, SF_DIR))
    got = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.corpus_id)
        assert abs(float(r.cosine) - float(r.approx_cosine)) < 0.05
    hits = sum(len(got[q] & truth) for q, truth in exact.items())
    total = sum(len(t) for t in exact.values())
    assert hits / total >= 0.8, f"SQ8 recall {hits}/{total} too low"


def test_pq_adc_recall_and_codebook_shape(spark):
    """PQ codebooks: <= PQ_K entries per subspace, each PQ_SUB wide,
    training deterministic (memo aside); ADC top-k must recover a
    majority of the exact top-k at sf0.001."""
    from gmallbiguan_parent_spark.operators.similarity import (
        PQ_K, PQ_M, PQ_SUB, _ivf_corpus_queries, _pq_codebooks_spec,
        ann_cosine_topk, ann_pq_adc,
    )

    corpus, _ = _ivf_corpus_queries(spark, SF_DIR)
    rows = sorted((int(r.corpus_id), [float(x) for x in r.c_emb])
                  for r in corpus.collect())
    books = _pq_codebooks_spec(rows)
    assert len(books) == PQ_M
    for cent in books:
        assert 1 <= len(cent) <= PQ_K
        assert all(len(cv) == PQ_SUB for _, cv in cent)
    assert books == _pq_codebooks_spec(rows)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.corpus_id)
        return out

    exact = topk_sets(ann_cosine_topk(spark, SF_DIR))
    got = topk_sets(ann_pq_adc(spark, SF_DIR))
    hits = sum(len(got.get(q, set()) & truth) for q, truth in exact.items())
    total = sum(len(t) for t in exact.values())
    assert hits / total >= 0.5, f"PQ-ADC recall {hits}/{total} too low"


def test_principal_component_quality(spark):
    """Unit norm, positive eigenvalue estimate, and the returned
    direction must capture a large share of the true dominant variance
    (numpy eigendecomposition as the reference — 3 power-iteration
    rounds need not fully converge, so the bound is a quality floor,
    not exact equality)."""
    import numpy as np

    from gmallbiguan_parent_spark.operators.similarity import (
        embedding_principal_component,
    )

    rows = embedding_principal_component(spark, SF_DIR).collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    lam = float(rows[0].lambda_est)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    assert lam > 0

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    X = np.array([list(map(float, r.embedding)) for r in emb])
    C = np.cov(X, rowvar=False, bias=True)
    w, _ = np.linalg.eigh(C)
    lam_true = float(w[-1])
    rq = float(v @ C @ v)
    assert rq >= 0.6 * lam_true, f"Rayleigh {rq} vs true max {lam_true}"
    assert lam <= lam_true * 1.05 + 1e-6  # ||Cv|| can't exceed lambda_max (up to rounding)
