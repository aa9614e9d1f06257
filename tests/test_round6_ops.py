"""Round-6 operators: Gopher rule flags, CCNet perplexity buckets, and
the near-dup cluster rewrite."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_gopher_flags_vs_pure_python(spark):
    """Independent pure-Python replay of the five rules on the raw
    corpus — flags and keep must agree exactly."""
    import decimal
    import re

    from gmallbiguan_parent_spark.operators.text import (
        GOPHER_MAX_WORDS, GOPHER_MIN_WORDS, STOPWORDS, gopher_quality_flags,
    )

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def dec4(num, den):
        return (decimal.Decimal(num) / max(den, 1)).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )

    ref = {}
    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        n = len(toks)
        mtl = dec4(sum(len(t) for t in toks), n)
        alpha = dec4(sum(1 for t in toks if re.search("[a-z]", t)), n)
        sym = dec4(len(re.findall(r"#|\.\.\.", r.text)), n)
        stop = len(set(toks) & set(STOPWORDS))
        f = (
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS,
            decimal.Decimal(3) <= mtl <= decimal.Decimal(10),
            alpha >= decimal.Decimal("0.8"),
            sym <= decimal.Decimal("0.1"),
            stop >= 2,
        )
        ref[r.doc_id] = f + (all(f),)

    got = {
        r.doc_id: (r.f_words, r.f_mtl, r.f_alpha, r.f_symbol, r.f_stop, r.keep)
        for r in gopher_quality_flags(spark, SF_DIR).collect()
    }
    assert got == ref and len(got) == len(rows)
    # the rule set must actually discriminate on this corpus
    assert any(v[-1] for v in got.values()) and not all(v[-1] for v in got.values())


def test_ccnet_buckets_partition_and_order(spark):
    """Buckets must partition the scored corpus per language, doc
    counts must be near-terciles, and score ranges must be ordered
    head <= middle <= tail (lower unigram surprise = head)."""
    from gmallbiguan_parent_spark.operators.text import (
        ccnet_perplexity_buckets, unigram_logprob,
    )

    rows = ccnet_perplexity_buckets(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    n_scored = unigram_logprob(spark, SF_DIR).count()
    assert sum(r.doc_ct for r in rows) == n_scored
    for lang, bks in by_lang.items():
        assert set(bks) == {"head", "middle", "tail"}
        assert bks["head"].max_score <= bks["middle"].min_score
        assert bks["middle"].max_score <= bks["tail"].min_score
        total = sum(b.doc_ct for b in bks.values())
        # disc cut points keep each bucket within one tie-run of n/3
        assert bks["head"].doc_ct >= total // 3 - 1


def test_neardup_dedup_rewrite_keeps_representatives(spark):
    """Survivors = corpus minus non-representative cluster members;
    every cluster keeps exactly its min doc_id."""
    from gmallbiguan_parent_spark.operators.dedup import (
        neardup_clusters, neardup_dedup_rewrite,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    clusters = neardup_clusters(spark, SF_DIR).collect()
    losers = {r.doc_id for r in clusters if r.doc_id != r.cluster_id}
    stats = neardup_dedup_rewrite(spark, SF_DIR).collect()
    assert sum(r.doc_ct for r in stats) == n_docs - len(losers)
    assert losers, "no near-dup losers at this SF - fixture drift"
    # per-lang char sums must equal a direct survivor aggregate
    want = {
        (r.lang, r.doc_ct, r.char_sum)
        for r in docs.filter(~F.col("doc_id").isin(losers))
        .groupBy("lang")
        .agg(F.count("*").alias("doc_ct"), F.sum("n_chars").alias("char_sum"))
        .collect()
    }
    got = {(r.lang, r.doc_ct, r.char_sum) for r in stats}
    assert got == want


def test_window_funnel_greedy_equals_bruteforce():
    """The latest-chain-start greedy the Spark fold implements must
    equal the exists-a-chain definition on arbitrary event sequences
    (hypothesis; pure Python — the oracle hash proves the Spark fold
    matches the declarative exists-join on real data, this proves the
    greedy itself on adversarial ones)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from itertools import combinations

    W = 10

    def greedy(evs):
        dp = [-1, -1, -1]
        for t, s in sorted(evs):
            if s == 1:
                dp[0] = max(dp[0], t)
            elif s == 2 and dp[0] >= 0 and t - dp[0] <= W:
                dp[1] = max(dp[1], dp[0])
            elif s == 3 and dp[1] >= 0 and t - dp[1] <= W:
                dp[2] = max(dp[2], dp[1])
        return 3 if dp[2] >= 0 else 2 if dp[1] >= 0 else 1 if dp[0] >= 0 else 0

    def brute(evs):
        evs = sorted(evs)
        best = 0
        for k in (3, 2, 1):
            for combo in combinations(range(len(evs)), k):
                ts = [evs[i][0] for i in combo]
                ss = [evs[i][1] for i in combo]
                if ss == list(range(1, k + 1)) and ts == sorted(ts) and ts[-1] - ts[0] <= W:
                    best = k
                    break
            if best:
                break
        return best

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=1, max_value=3)),
            max_size=8,
        )
    )
    def check(evs):
        assert greedy(evs) == brute(evs)

    check()


def test_semantic_decontaminate_pure_python(spark):
    """Independent pure-Python replay of the whole screen at sf0.001:
    same md5 SRP planes, same width rule, same 6-dp HALF_UP cosine,
    same (cosine DESC, bench ASC) tie-break — flagged set, hit counts,
    nearest bench, and decisions must all agree exactly. (The oracle
    hash proves Spark==DuckDB; this proves both against a third,
    loop-level implementation.)"""
    import decimal
    import math

    from gmallbiguan_parent_spark.operators.similarity import (
        SEM_DECON_DROP, SEM_DECON_REVIEW, SRP_TABLES, _srp_plane,
        semantic_decontaminate, srp_bits_for,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    bits = srp_bits_for(len(vecs))

    def r6(x):
        # Spark F.round = BigDecimal(double) HALF_UP; Decimal(float) is
        # the same exact binary value, so this replays it bit-for-bit.
        return float(
            decimal.Decimal(x).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def sig(v, t):
        s = 0
        for p in range(bits):
            plane = _srp_plane(t, p)
            if r6(sum(a * b for a, b in zip(v, plane))) > 0:
                s |= 1 << p
        return s

    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, v in vecs.items():
        for t in range(SRP_TABLES):
            buckets.setdefault((t, sig(v, t)), []).append(vid)

    def cos(a, b):
        return r6(
            sum(x * y for x, y in zip(a, b))
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            )
        )

    cand = set()
    for ids in buckets.values():
        bench = [i for i in ids if i % 17 == 0]
        corp = [i for i in ids if i % 17 != 0]
        cand.update((c, b) for c in corp for b in bench)

    hits_by_vec: dict[int, list[tuple[float, int]]] = {}
    for c, b in cand:
        cs = cos(vecs[c], vecs[b])
        if cs >= SEM_DECON_REVIEW:
            hits_by_vec.setdefault(c, []).append((cs, b))

    ref = {}
    for c, hits in hits_by_vec.items():
        hits.sort(key=lambda h: (-h[0], h[1]))
        best_cos, best_b = hits[0]
        ref[c] = (
            len(hits),
            best_cos,
            best_b,
            "drop" if best_cos >= SEM_DECON_DROP else "review",
        )

    got = {
        r.vec_id: (r.hit_ct, r.max_cosine, r.nearest_bench, r.decision)
        for r in semantic_decontaminate(spark, SF_DIR).collect()
    }
    assert got == ref


def test_ngram_diversity_pure_python(spark):
    """Loop-level replay at sf0.001: same normalization, same window
    rule, same decimal HALF_UP ratio — all (source, n) rows agree."""
    import decimal
    import re

    from gmallbiguan_parent_spark.operators.text import (
        DIVERSITY_NS, ngram_diversity,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    totals: dict[tuple[str, int], int] = {}
    distincts: dict[tuple[str, int], set] = {}
    for r in rows:
        norm = re.sub(r"\s+", " ", r.text.lower()).strip()
        toks = [t for t in re.split(r"[^a-z0-9]+", norm) if t]
        for n in DIVERSITY_NS:
            grams = (
                [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                if len(toks) >= n
                else []
            )
            key = (r.source, n)
            totals[key] = totals.get(key, 0) + len(grams)
            distincts.setdefault(key, set()).update(grams)

    ref = {}
    for key, tot in totals.items():
        if tot == 0:
            continue
        d = len(distincts[key])
        ratio = (decimal.Decimal(d) / decimal.Decimal(tot)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
        ref[key] = (tot, d, ratio)

    got = {
        (r.source, r.n): (r.total_ct, r.distinct_ct, r.distinct_ratio)
        for r in ngram_diversity(spark, SF_DIR).collect()
    }
    assert got == ref


def test_ann_mmr_topk_pure_python(spark):
    """Loop-level greedy replay at sf0.001: same round-6 cosines, same
    exact-decimal score, same tie-breaks — full row agreement. Also
    pins the MMR contract: rank 1 is always the plain-relevance top-1."""
    import decimal
    import math

    from gmallbiguan_parent_spark.operators.similarity import (
        MMR_CAND, MMR_LAMBDA, MMR_OM, N_QUERIES, TOP_K, ann_mmr_topk,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def r6(x):
        return float(
            decimal.Decimal(x).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def cos(a, b):
        return r6(
            sum(x * y for x, y in zip(a, b))
            / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
        )

    lam, om = decimal.Decimal(MMR_LAMBDA), decimal.Decimal(MMR_OM)

    def dscore(rel, maxsim):
        raw = lam * decimal.Decimal(repr(rel)) - om * decimal.Decimal(repr(maxsim))
        return raw.quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )

    ref = set()
    for q in range(N_QUERIES):
        rels = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in vecs if c >= N_QUERIES),
            key=lambda t: (-t[0], t[1]),
        )[:MMR_CAND]
        selected: list[int] = []
        for rank in range(1, TOP_K + 1):
            best = None
            for rel, c in rels:
                if c in selected:
                    continue
                maxsim = max(
                    (cos(vecs[c], vecs[s]) for s in selected), default=0.0
                )
                sc = dscore(rel, maxsim)
                key = (sc, rel, -c)
                if best is None or key > best[0]:
                    best = (key, c, rel, sc)
            selected.append(best[1])
            ref.add((q, rank, best[1], best[2], best[3]))

    got = {
        (r.query_id, r.rank, r.corpus_id, r.cosine, r.mmr_score)
        for r in ann_mmr_topk(spark, SF_DIR).collect()
    }
    assert got == ref
    # rank 1 must be the plain top-1 (empty selected set -> pure relevance)
    top1 = {q: c for q, rank, c, _, _ in ref if rank == 1}
    for q in range(N_QUERIES):
        rel1 = max(
            ((cos(vecs[q], vecs[c]), -c) for c in vecs if c >= N_QUERIES),
        )
        assert top1[q] == -rel1[1]


def test_tokenizer_fertility_invariants(spark):
    """Every lang's fertility is >= 1 (a word is at least one piece),
    and the lang-weighted piece totals must reconcile with a direct
    corpus-wide count through the same vocab lookup."""
    from gmallbiguan_parent_spark.operators.text import (
        _bpe_train, tokenizer_fertility,
    )
    from gmallbiguan_parent_spark.functions import tokenize

    rows = tokenizer_fertility(spark, SF_DIR).collect()
    assert rows and all(r.pieces_per_word >= 1.0 for r in rows)
    assert all(r.piece_ct >= r.word_ct >= r.distinct_word_ct for r in rows)

    _, vocab = _bpe_train(spark, SF_DIR)
    pieces = vocab.select(
        "tok", F.size(F.split(F.trim(F.col("syms")), " ")).alias("n_pieces")
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .join(pieces, "tok")
        .agg(F.count("*").alias("w"), F.sum("n_pieces").alias("p"))
        .collect()[0]
    )
    assert sum(r.word_ct for r in rows) == total.w
    assert sum(r.piece_ct for r in rows) == total.p


def test_bloom_no_false_negatives(spark):
    """The Bloom guarantee: every incoming doc whose fingerprint IS in
    the ingested set must be flagged — per source, flagged_ct covers
    true_dup_ct and false_pos_ct is exactly flagged - true_dup."""
    from gmallbiguan_parent_spark.operators.dedup import bloom_dedup_report

    rows = bloom_dedup_report(spark, SF_DIR).collect()
    assert rows, "report must not be empty"
    for r in rows:
        assert r.flagged_ct >= r.true_dup_ct, r
        assert r.false_pos_ct == r.flagged_ct - r.true_dup_ct, r
        assert 0 <= r.false_pos_ct <= r.incoming_ct - r.true_dup_ct, r


def test_bloom_flag_matches_exact_membership_replay(spark):
    """Pure-Python replay of the filter on the raw corpus: build the
    bit set from even doc_ids, probe odd ones, and compare aggregate
    counts with the Spark report."""
    import hashlib
    import re

    from gmallbiguan_parent_spark.operators.dedup import (
        BLOOM_BITS, BLOOM_HASHES, bloom_dedup_report,
    )
    from gmallbiguan_parent_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text").collect()

    def fp(text):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        return hashlib.md5(norm.encode()).hexdigest()

    def bits(f):
        return [
            int(hashlib.md5(f"bf{i}:{f}".encode()).hexdigest()[:15], 16) % BLOOM_BITS
            for i in range(BLOOM_HASHES)
        ]

    ingested_bits: set[int] = set()
    ingested_fps: set[str] = set()
    for r in docs:
        if r.doc_id % 2 == 0:
            f = fp(r.text)
            ingested_fps.add(f)
            ingested_bits.update(bits(f))
    expect: dict[str, list[int]] = {}
    for r in docs:
        if r.doc_id % 2 == 0:
            continue
        f = fp(r.text)
        flagged = all(b in ingested_bits for b in bits(f))
        dup = f in ingested_fps
        e = expect.setdefault(r.source, [0, 0, 0])
        e[0] += 1
        e[1] += int(dup)
        e[2] += int(flagged)
    got = {r.source: r for r in bloom_dedup_report(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for src, (inc, dup, flag) in expect.items():
        g = got[src]
        assert (g.incoming_ct, g.true_dup_ct, g.flagged_ct) == (inc, dup, flag), src


def test_rejection_sample_probability_replay(spark):
    """The admit decision is a deterministic function of (doc_id,
    quality logit): replay it doc-by-doc in pure Python off the
    quality_classifier output and match the per-lang counts."""
    import hashlib

    from gmallbiguan_parent_spark.operators.text import (
        REJ_DEN, REJ_P_FLOOR, quality_classifier, quality_rejection_sample,
    )
    from gmallbiguan_parent_spark.io import load_table

    import decimal

    logits = {r.doc_id: r.quality_logit for r in quality_classifier(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang").collect()
    floor = decimal.Decimal(REJ_P_FLOOR)
    expect: dict[str, list[int]] = {}
    for r in docs:
        p = min(max(logits[r.doc_id], floor), decimal.Decimal(1))
        u = int(hashlib.md5(f"rej:{r.doc_id}".encode()).hexdigest()[:15], 16) % REJ_DEN
        admitted = u < int(p * REJ_DEN)
        e = expect.setdefault(r.lang, [0, 0])
        e[0] += 1
        e[1] += int(admitted)
    got = {r.lang: r for r in quality_rejection_sample(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for lang, (ct, adm) in expect.items():
        assert (got[lang].doc_ct, got[lang].admitted_ct) == (ct, adm), lang
        # the floor keeps the admit rate strictly positive in expectation;
        # sanity-bound it
        assert 0 <= got[lang].admitted_ct <= got[lang].doc_ct


def test_range_search_equals_brute_force(spark):
    """The SQ8 screen is lossless: the pruned range search must return
    exactly the brute-force threshold set (same pairs, same cosines)."""
    import pyspark.sql.functions as FN

    from gmallbiguan_parent_spark.operators.similarity import (
        N_QUERIES, RANGE_TAU, _dot, _norm, ann_range_search,
    )
    from gmallbiguan_parent_spark.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.select(
        FN.col("vec_id").alias("corpus_id"),
        FN.col("embedding").cast("array<double>").alias("c_emb"),
    ).filter(FN.col("corpus_id") >= N_QUERIES)
    queries = emb.select(
        FN.col("vec_id").alias("query_id"),
        FN.col("embedding").cast("array<double>").alias("q_emb"),
    ).filter(FN.col("query_id") < N_QUERIES)
    brute = (
        corpus.crossJoin(FN.broadcast(queries))
        .select(
            "query_id", "corpus_id",
            FN.round(
                _dot(FN.col("q_emb"), FN.col("c_emb"))
                / (_norm(FN.col("q_emb")) * _norm(FN.col("c_emb"))), 6,
            ).alias("cosine"),
        )
        .filter(FN.col("cosine") >= RANGE_TAU)
    )
    got = sorted((r.query_id, r.corpus_id, r.cosine) for r in ann_range_search(spark, SF_DIR).collect())
    want = sorted((r.query_id, r.corpus_id, r.cosine) for r in brute.collect())
    assert got == want
    assert got, "threshold must produce a non-empty result at test sf"


def test_range_search_screen_prunes(spark):
    """The quantization-error bound must do real work: the candidate
    set the exact confirm touches is a small fraction of all pairs."""
    from gmallbiguan_parent_spark.operators.similarity import (
        N_QUERIES, _range_search_candidates,
    )
    from gmallbiguan_parent_spark.io import load_table

    n = load_table(spark, SF_DIR, "embeddings").count()
    total_pairs = (n - N_QUERIES) * N_QUERIES
    cand = _range_search_candidates(spark, SF_DIR).count()
    assert cand < total_pairs * 0.25, (cand, total_pairs)


def test_neardup_keep_best_picks_longest_member(spark):
    """The keeper must be each cluster's (n_chars desc, doc_id asc)
    argmax, and chars_dropped the sum of the losers' sizes."""
    from gmallbiguan_parent_spark.operators.dedup import (
        neardup_clusters, neardup_keep_best,
    )
    from gmallbiguan_parent_spark.io import load_table

    sizes = {r.doc_id: r.n_chars for r in load_table(spark, SF_DIR, "documents").collect()}
    members: dict[int, list[int]] = {}
    for r in neardup_clusters(spark, SF_DIR).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    got = {r.cluster_id: r for r in neardup_keep_best(spark, SF_DIR).collect()}
    assert set(got) == set(members)
    for cid, docs in members.items():
        best = min(docs, key=lambda d: (-sizes[d], d))
        assert got[cid].keeper_doc_id == best, cid
        assert got[cid].member_ct == len(docs), cid
        assert got[cid].chars_dropped == sum(sizes[d] for d in docs) - sizes[best], cid


def test_curation_funnel_cross_checks_stage_owners(spark):
    """Each funnel stage must agree with the standalone operator that
    owns its semantics: monotone attrition, rules == gopher keep count
    on the pool, decontaminate drop == ngram_decontaminate's 'drop'
    rows that survived the earlier stages."""
    from gmallbiguan_parent_spark.operators.curation import curation_funnel
    from gmallbiguan_parent_spark.operators.dedup import ngram_decontaminate
    from gmallbiguan_parent_spark.operators.text import gopher_quality_flags
    from gmallbiguan_parent_spark.io import load_table

    rows = {r.stage: r for r in curation_funnel(spark, SF_DIR).collect()}
    assert [rows[s].stage_no for s in ("pool", "rules", "exact_dedup", "neardup", "decontaminate")] == [1, 2, 3, 4, 5]
    cts = [rows[s].doc_ct for s in ("pool", "rules", "exact_dedup", "neardup", "decontaminate")]
    assert cts == sorted(cts, reverse=True), cts
    chars = [rows[s].char_sum for s in ("pool", "rules", "exact_dedup", "neardup", "decontaminate")]
    assert chars == sorted(chars, reverse=True), chars

    pool_ids = {
        r.doc_id for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 17 != 0).select("doc_id").collect()
    }
    assert rows["pool"].doc_ct == len(pool_ids)
    gop = {r.doc_id for r in gopher_quality_flags(spark, SF_DIR).filter("keep").collect()}
    assert rows["rules"].doc_ct == len(gop & pool_ids)
    # decontamination attrition == drop decisions among stage-4 survivors
    drops = {r.doc_id for r in ngram_decontaminate(spark, SF_DIR).filter("decision = 'drop'").collect()}
    attrition = rows["neardup"].doc_ct - rows["decontaminate"].doc_ct
    assert attrition <= len(drops)


def test_length_batch_pad_stats_replay(spark):
    """Pure-Python replay of both batching policies; the length-sorted
    policy must also never pad MORE than arrival order in aggregate on
    this corpus (the measured justification the op exists to show)."""
    import hashlib
    import re as _re

    from gmallbiguan_parent_spark.operators.curation import (
        BATCH_DOCS, N_SHARDS, length_batch_pad_stats,
    )
    from gmallbiguan_parent_spark.operators.text import BPE_RE
    from gmallbiguan_parent_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    rows = []
    for r in docs:
        shard = (
            int(hashlib.md5(f"sample:{r.doc_id}".encode()).hexdigest()[:15], 16) % 10000
        ) % N_SHARDS
        rows.append((r.doc_id, shard, len(_re.findall(BPE_RE, r.text.lower()))))

    def replay(order_key):
        pad = tok = batches = 0
        for s in range(N_SHARDS):
            member = sorted([x for x in rows if x[1] == s], key=order_key)
            for i in range(0, len(member), BATCH_DOCS):
                chunk = [m[2] for m in member[i:i + BATCH_DOCS]]
                pad += len(chunk) * max(chunk) - sum(chunk)
                tok += sum(chunk)
                batches += 1
        return batches, pad, tok

    got = {r.policy: r for r in length_batch_pad_stats(spark, SF_DIR).collect()}
    for policy, key in (("arrival", lambda m: m[0]), ("length_sorted", lambda m: (m[2], m[0]))):
        b, p, t = replay(key)
        g = got[policy]
        assert (g.batch_ct, g.pad_tokens, g.token_sum) == (b, p, t), policy
    assert got["length_sorted"].pad_tokens <= got["arrival"].pad_tokens


def test_dedup_method_agreement_consistency(spark):
    """The matrix must be internally consistent and match the drop sets
    recomputed from the standalone screens."""
    from gmallbiguan_parent_spark.operators.dedup import (
        containment_pairs, dedup_method_agreement,
        minhash_lsh_pairs, simhash_neardup_pairs,
    )

    sets = {
        "exact": set(),
        "minhash": {r.doc_b for r in minhash_lsh_pairs(spark, SF_DIR).collect()},
        "simhash": {r.doc_b for r in simhash_neardup_pairs(spark, SF_DIR).collect()},
        "containment": {r.doc_a for r in containment_pairs(spark, SF_DIR).collect()},
    }
    # exact non-keepers: every doc sharing a fingerprint except the min
    from gmallbiguan_parent_spark.operators.dedup import _norm_text
    from gmallbiguan_parent_spark.io import load_table
    import pyspark.sql.functions as FN

    fps = load_table(spark, SF_DIR, "documents").select(
        "doc_id", FN.md5(_norm_text(FN.col("text"))).alias("fp")
    ).collect()
    by_fp: dict[str, list[int]] = {}
    for r in fps:
        by_fp.setdefault(r.fp, []).append(r.doc_id)
    for ids in by_fp.values():
        sets["exact"].update(set(ids) - {min(ids)})

    got = {(r.method_a, r.method_b): r for r in dedup_method_agreement(spark, SF_DIR).collect()}
    names = sorted(k for k, v in sets.items() if v)
    import itertools

    expect_keys = {(a, b) for a, b in itertools.combinations(names, 2)}
    assert set(got) == expect_keys
    for (a, b), r in got.items():
        assert r.a_ct == len(sets[a]) and r.b_ct == len(sets[b]), (a, b)
        assert r.both_ct == len(sets[a] & sets[b]), (a, b)


def test_user_sequence_similarity_replay(spark):
    """Pure-Python replay: per-user chronological trigram sets, exact
    Jaccard, same (desc jaccard, asc user) top-k."""
    from decimal import Decimal, ROUND_HALF_UP

    from gmallbiguan_parent_spark.pipelines.analytics import (
        SEQSIM_GRAM, SEQSIM_QUERY_MOD, SEQSIM_TOP_K, user_sequence_similarity,
    )
    from gmallbiguan_parent_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    seqs: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type)

    def grams(s):
        k = SEQSIM_GRAM
        if len(s) >= k:
            return {">".join(s[i:i + k]) for i in range(len(s) - k + 1)}
        return {">".join(s)}

    gs = {u: grams(s) for u, s in seqs.items()}
    expect = {}
    for qu in (u for u in gs if u % SEQSIM_QUERY_MOD == 0):
        scored = []
        for cu, cg in gs.items():
            if cu == qu:
                continue
            inter = len(gs[qu] & cg)
            if inter == 0:
                continue
            jac = (Decimal(inter).quantize(Decimal("1e-6")) /
                   Decimal(len(gs[qu]) + len(cg) - inter)).quantize(
                       Decimal("1e-6"), ROUND_HALF_UP)
            scored.append((-jac, cu, inter, jac))
        scored.sort()
        expect[qu] = [(cu, i, j) for _, cu, i, j in scored[:SEQSIM_TOP_K]]

    got: dict[int, list] = {}
    for r in user_sequence_similarity(spark, SF_DIR).orderBy("q_user", "rank").collect():
        got.setdefault(r.q_user, []).append((r.c_user, r.inter_ct, r.jaccard))
    assert set(got) == {u for u, v in expect.items() if v}
    for qu, rows in got.items():
        assert rows == expect[qu], qu
