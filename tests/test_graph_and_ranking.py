"""Structural invariants for the graph/ranking/sharding operators —
properties the oracle hash can't see (mass conservation, permutation
completeness, bound relationships), mirroring the reference's
invariant-style tests (SURVEY §5)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_pagerank_mass_and_bounds(spark):
    from gmallbiguan_parent_spark.operators.graph import _co_edges, supplier_pagerank

    rows = supplier_pagerank(spark, SF_DIR).collect()
    assert rows, "graph must be non-empty at sf0.001"
    # ranks positive, sorted desc with id tiebreak
    ranks = [float(r.pagerank) for r in rows]
    assert all(x > 0 for x in ranks)
    assert ranks == sorted(ranks, reverse=True)
    # symmetric edge set: (a,b) present iff (b,a) present
    edges = {(r.src, r.dst) for r in _co_edges(spark, SF_DIR).collect()}
    assert edges == {(b, a) for a, b in edges}
    # mass conservation over ALL nodes: a symmetric graph has no
    # dangling nodes, so each iterate preserves total mass exactly
    # ((1-d) teleport + d * 1); only the 9dp per-step rounding drifts,
    # bounded by ~n * 5e-10 per iteration.
    from gmallbiguan_parent_spark.operators.graph import PR_ITERS, _pagerank_ranks

    full = _pagerank_ranks(spark, SF_DIR).collect()
    n = len(full)
    total = sum(float(r.rank) for r in full)
    tol = max(1e-6, 3 * (PR_ITERS + 1) * n * 5e-10)
    assert abs(total - 1.0) <= tol, f"rank mass {total} drifted past {tol}"


def test_corpus_shards_is_a_complete_permutation(spark):
    from gmallbiguan_parent_spark.operators.sampling import N_SHARDS, corpus_shards

    df = corpus_shards(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    rows = df.collect()
    # every doc exactly once
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # shards in range; positions contiguous 1..k per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), f"shard {shard} gaps"
    # deterministic across runs
    again = {(r.doc_id, r.shard, r.pos) for r in corpus_shards(spark, SF_DIR).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_bm25_scores_are_positive_and_bounded(spark):
    from gmallbiguan_parent_spark.operators.text import BM25_TERMS, BM25_TOP, bm25_rank

    rows = bm25_rank(spark, SF_DIR).collect()
    assert 0 < len(rows) <= BM25_TOP
    for r in rows:
        assert 1 <= r.matched_terms <= len(BM25_TERMS)
        assert float(r.bm25_score) > 0
    scores = [float(r.bm25_score) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_copurchase_lift_count_bounds(spark):
    from gmallbiguan_parent_spark.operators.graph import copurchase_lift

    for r in copurchase_lift(spark, SF_DIR).collect():
        assert r.part_a < r.part_b
        assert r.pair_ct <= min(r.ct_a, r.ct_b)
        assert float(r.lift) > 0


def test_tfidf_ranks_are_dense_per_doc(spark):
    from gmallbiguan_parent_spark.operators.text import TFIDF_TOP, tfidf_top_terms

    rows = tfidf_top_terms(spark, SF_DIR).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    assert by_doc, "subset must be non-empty"
    for doc, rr in by_doc.items():
        assert sorted(rr) == list(range(1, len(rr) + 1))
        assert len(rr) <= TFIDF_TOP


def test_cms_estimates_never_undercount(spark):
    from gmallbiguan_parent_spark.operators.sketches import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the Count-Min guarantee: point estimates only over-count
        assert r.est_ct >= r.true_ct


def test_bpe_train_matches_pure_python_reference(spark):
    """Spec check independent of the DuckDB oracle: replay the full
    training loop in plain Python (same vocab collapse, same argmax
    tiebreak, same two-pass str.replace merge — Python's str.replace
    has the identical non-overlapping leftmost scan) and demand the
    identical merge table."""
    from gmallbiguan_parent_spark.operators.text import (
        BPE_TRAIN_MERGES, _bpe_vocab, bpe_train_merges,
    )

    vocab = {r.tok: (r.wct, r.syms) for r in _bpe_vocab(spark, SF_DIR).collect()}
    syms = {t: s for t, (w, s) in vocab.items()}
    expected = []
    for step in range(1, BPE_TRAIN_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for t, s in syms.items():
            parts = s.strip().split(" ")
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[t][0]
        if not counts:
            break
        (lhs, rhs), ct = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, lhs, rhs, lhs + rhs, ct))
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        syms = {t: s.replace(pat, rep).replace(pat, rep) for t, s in syms.items()}

    got = [tuple(r) for r in bpe_train_merges(spark, SF_DIR).collect()]
    assert got == expected
    # merges compound: at least one rule must fuse a multi-char symbol
    assert len(got) == BPE_TRAIN_MERGES


def test_triangle_counts_invariants(spark):
    """Handshake identity and coefficient bounds the oracle hash can't
    see: the per-node counts must sum to 3x the distinct-triangle
    total, and every local clustering coefficient lies in (0, 1]."""
    from gmallbiguan_parent_spark.operators.graph import copurchase_triangles

    rows = copurchase_triangles(spark, SF_DIR).collect()
    assert rows, "co-purchase graph must contain triangles at sf0.001"
    for r in rows:
        assert 0 < float(r.clust_coef) <= 1.0
        assert r.tri_ct <= r.degree * (r.degree - 1) // 2
    assert [(-r.tri_ct, r.part_id) for r in rows] == sorted(
        (-r.tri_ct, r.part_id) for r in rows
    )


def test_text_normalize_nfc_cross_engine_on_non_ascii(spark):
    """The sf corpus is ASCII, so the oracle gate can't prove the NFC
    stage: feed combining sequences / HTML / ragged whitespace through
    BOTH engines' full pipelines and demand identical md5s."""
    import duckdb
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.operators.text import _nfc_col

    samples = [
        "Café  <b>MENU</b>\tdu  jour",   # combining acute -> é
        "Ångström <i>unit</i>",     # Å and ö composed
        "  plain   ascii  text  ",
        "Å LOVE ﬁsh",                  # Angstrom sign, fi-ligature (NFC keeps both)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, text string")
    stripped = F.regexp_replace(F.col("text"), "<[^>]*>", " ")
    norm = F.trim(F.regexp_replace(F.lower(_nfc_col(stripped)), r"\s+", " "))
    got = {r.i: r.h for r in df.select("i", F.md5(norm).alias("h")).collect()}

    con = duckdb.connect()
    for i, s in enumerate(samples):
        (h,) = con.execute(
            r"SELECT md5(trim(regexp_replace(lower(nfc_normalize("
            r"regexp_replace(?, '<[^>]*>', ' ', 'g'))), '\s+', ' ', 'g')))",
            [s],
        ).fetchone()
        assert got[i] == h, f"sample {i} diverged"


def test_zorder_buckets_partition_and_cluster_both_dims(spark):
    """Buckets must partition the table exactly, and the mean
    per-bucket span must be well under the global span on BOTH
    interleaved dimensions — the two-dimensional pruning property a
    single-column sort cannot deliver (its secondary dim spans ~100%)."""
    from gmallbiguan_parent_spark.operators.layout import zorder_layout_stats

    rows = zorder_layout_stats(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_rows for r in rows) == orders.count()

    ck_glob = max(r.cust_hi for r in rows) - min(r.cust_lo for r in rows)
    dy_glob = max(r.day_hi for r in rows) - min(r.day_lo for r in rows)
    ck_frac = sum((r.cust_hi - r.cust_lo) / ck_glob for r in rows) / len(rows)
    dy_frac = sum((r.day_hi - r.day_lo) / dy_glob for r in rows) / len(rows)
    assert ck_frac < 0.6, f"custkey mean span fraction {ck_frac}"
    assert dy_frac < 0.6, f"day mean span fraction {dy_frac}"


def test_source_kl_nonnegative_and_totals(spark):
    """Gibbs' inequality: every per-source KL is >= 0 (up to the 1e-12
    term rounding); token totals across sources must sum to the corpus
    token count."""
    from gmallbiguan_parent_spark.operators.text import source_kl_divergence, token_count

    rows = source_kl_divergence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert float(r.kl) >= -1e-9, f"{r.source}: negative KL {r.kl}"
        assert r.n_distinct <= r.n_tokens
    n_tok = sum(r.n_tokens for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F
    from gmallbiguan_parent_spark.functions import tokenize
    want = docs.select(F.explode(tokenize("text")).alias("t")).count()
    assert n_tok == want


def test_priority_sample_is_length_biased(spark):
    """Weight-proportional draws must overrepresent long documents:
    the sample's mean char count exceeds the corpus mean, sample size
    is exactly PRIO_K, and ids are distinct (without replacement)."""
    from gmallbiguan_parent_spark.operators.sampling import PRIO_K, priority_sample

    rows = priority_sample(spark, SF_DIR).collect()
    assert len(rows) == PRIO_K
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == PRIO_K
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_doc_perplexity_bounds(spark):
    """Perplexity under any LM is >= 1; an interpolated bigram model
    trained on the corpus itself must stay far below the unigram
    vocabulary size; every scored doc has doc_id % PPL_DOC_MOD == 0."""
    from gmallbiguan_parent_spark.operators.text import PPL_DOC_MOD, doc_perplexity

    rows = doc_perplexity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_id % PPL_DOC_MOD == 0
        assert float(r.ppl) >= 1.0
        assert r.n_bigrams >= 1


def test_reach_hops_monotone_and_seeded(spark):
    """Hop 0 is exactly the seed; every hop's node sets are disjoint by
    construction (min-hop), and reach can only grow with hops."""
    from gmallbiguan_parent_spark.operators.graph import REACH_HOPS, copurchase_reach

    rows = {r.hop: r for r in copurchase_reach(spark, SF_DIR).collect()}
    assert 0 in rows and rows[0].n_nodes == 1
    assert set(rows) <= set(range(REACH_HOPS + 1))
    assert rows[0].min_part == rows[0].max_part
    # hops are contiguous from 0 (an empty frontier can't repopulate)
    assert set(rows) == set(range(max(rows) + 1))
    # min-hop assignment: every hop's nodes are new (counts positive),
    # and id ranges are consistent
    for r in rows.values():
        assert r.n_nodes >= 1
        assert r.min_part <= r.max_part


def test_rfm_segments_cover_all_customers(spark):
    from gmallbiguan_parent_spark.pipelines.analytics import rfm_segments

    rows = rfm_segments(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.cust_ct for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_transition_matrix_rows_are_distributions(spark):
    from gmallbiguan_parent_spark.pipelines.analytics import event_transition_matrix

    rows = event_transition_matrix(spark, SF_DIR).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0 < float(r.p) <= 1
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + float(r.p)
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-4, f"{prev} row sums to {tot}"


def test_smoothing_and_attribution_invariants(spark):
    import pyspark.sql.functions as F

    from gmallbiguan_parent_spark.pipelines.analytics import (
        gmv_cusum, gmv_holt, last_touch_attribution,
    )

    holt = gmv_holt(spark, SF_DIR).collect()
    assert holt
    for r in holt:
        assert abs(float(r.forecast_next) - round(float(r.level) + float(r.trend), 6)) < 1e-9

    for r in gmv_cusum(spark, SF_DIR).collect():
        assert float(r.s_pos) >= 0 and float(r.s_neg) >= 0

    att = last_touch_attribution(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.purchase_ct for r in att) == n_purch
    assert all(float(r.revenue) > 0 for r in att)


def test_frequent_triples_support_consistency(spark):
    """A triple's support can never exceed any of its pairs' supports
    (Apriori monotonicity), and triples are canonically ordered."""
    from gmallbiguan_parent_spark.operators.graph import frequent_triples

    rows = frequent_triples(spark, SF_DIR).collect()
    assert rows
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    import pyspark.sql.functions as F
    bridge = li.select("l_orderkey", "l_partkey").distinct()
    a, b = bridge.alias("a"), bridge.alias("b")
    pair_support = {
        (r.pa, r.pb): r.ct
        for r in a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("ct")).collect()
    }
    for r in rows:
        assert r.part_a < r.part_b < r.part_c
        for pair in [(r.part_a, r.part_b), (r.part_a, r.part_c), (r.part_b, r.part_c)]:
            assert pair_support.get(pair, 0) >= r.support


def test_prefix_filter_prunes_candidate_space(spark):
    """The whole point of prefix filtering: far fewer candidate pairs
    than the all-pairs quadratic, with zero recall loss (the oracle
    gate proves completeness against brute force)."""
    import pyspark.sql.functions as F

    from gmallbiguan_parent_spark.operators.dedup import (
        PREFIX_JACCARD_T, _shingles, prefix_jaccard_pairs,
    )

    from gmallbiguan_parent_spark.operators.dedup import _prefix_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    sets = docs.select("doc_id", _shingles(F.col("text")).alias("s"))
    n_cand = _prefix_candidates(sets).count()
    all_pairs = n * (n - 1) // 2
    # prefix + PPJoin length + positional filters together: the
    # candidate set must be a sub-1% sliver of the quadratic (round-4's
    # prefix-only join passed a lax 50% bound and went 19.7x superlinear
    # on the 10x probe; the added filters are the fix)
    assert n_cand < all_pairs * 0.01, f"prefix filter kept {n_cand}/{all_pairs}"
    # and results themselves respect the threshold
    for r in prefix_jaccard_pairs(spark, SF_DIR).collect():
        assert float(r.jaccard) >= PREFIX_JACCARD_T


def test_bpe_batched_matches_pure_python_reference_and_job_budget(spark):
    """The batched trainer (VERDICT r7 fix for the driver-sequential
    merge loop): (a) replay the batched semantics in plain Python —
    per round, top-K candidates by (count DESC, lhs, rhs), rank-window
    conflict-free subset, fuse in rank order — and demand the identical
    rule table; (b) assert the job economics: 64 merges must cost a
    bounded number of Spark jobs (one top-K collect + one checkpoint
    per ROUND, not per merge — sequential training would burn >= 64)."""
    from gmallbiguan_parent_spark.operators.text import (
        BPE_BATCH_K, BPE_BATCH_MERGES, BPE_BATCH_ROUNDS,
        _bpe_train_batched_on, _bpe_vocab,
    )

    vocab = {r.tok: (r.wct, r.syms) for r in _bpe_vocab(spark, SF_DIR).collect()}
    syms = {t: s for t, (w, s) in vocab.items()}
    expected = []
    for rnd in range(1, BPE_BATCH_ROUNDS + 1):
        if len(expected) >= BPE_BATCH_MERGES:
            break
        counts: dict[tuple[str, str], int] = {}
        for t, s in syms.items():
            parts = s.strip().split(" ")
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[t][0]
        if not counts:
            break
        cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_BATCH_K]
        kept = []
        for i, ((lhs, rhs), ct) in enumerate(cands):
            if all(e[0] not in (lhs, rhs) and e[1] not in (lhs, rhs)
                   and (e[0] + e[1]) not in (lhs, rhs)
                   for (e, _) in cands[:i]):
                kept.append((lhs, rhs, ct))
        kept = kept[: BPE_BATCH_MERGES - len(expected)]
        for lhs, rhs, ct in kept:
            expected.append((len(expected) + 1, rnd, lhs, rhs, lhs + rhs, ct))
            pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
            syms = {t: s.replace(pat, rep).replace(pat, rep) for t, s in syms.items()}

    sc = spark.sparkContext
    sc.setJobGroup("bpe-batch-budget", "batched BPE training job count")
    try:
        rules, _ = _bpe_train_batched_on(_bpe_vocab(spark, SF_DIR))
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-batch-budget")

    assert rules == expected
    assert len(rules) == BPE_BATCH_MERGES
    # >1 merge per round on average, i.e. the batch actually batches
    assert max(r[1] for r in rules) < BPE_BATCH_MERGES // 2
    # job budget: (collect + checkpoint) per round plus the initial
    # vocab-collapse checkpoint — and strictly below one job per merge,
    # the sequential trainer's floor (measured: 43 jobs for 64 merges)
    assert len(jobs) <= 3 * BPE_BATCH_ROUNDS + 2
    assert len(jobs) < BPE_BATCH_MERGES
