"""Round-5 operators: containment dedup and filtered vector search."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_containment_complete_vs_bruteforce(spark):
    """The prefix/length/positional candidate filters must lose NOTHING:
    the operator's pair set equals the brute-force containment join
    (the same completeness proof the Jaccard screen carries)."""
    from gmallbiguan_parent_spark.operators.dedup import (
        CONTAINMENT_T, _shingles, containment_pairs,
    )

    got = {
        (r.doc_a, r.doc_b): float(r.containment)
        for r in containment_pairs(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sets = docs.select("doc_id", _shingles(F.col("text")).alias("s"))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("s_a", "s_b")).cast("double")
                / F.size("s_a").cast("double"),
                6,
            ).alias("c"),
        )
        .filter(F.col("c") >= CONTAINMENT_T)
        .collect()
    )
    want = {(r.doc_a, r.doc_b): float(r.c) for r in brute}
    assert got == want
    # asymmetry is real on this corpus: at least one pair where a is
    # contained in b but not vice versa would be missed by a Jaccard
    # screen — assert the direction column means what it claims
    assert want, "no containment pairs at this SF - fixture drift"


def test_containment_candidates_pruned(spark):
    """The CANDIDATE set (before the exact verify) must be a sliver of
    the quadratic — counting the verified output would let the pruning
    filters regress to all-pairs candidate generation unnoticed."""
    from gmallbiguan_parent_spark.operators.dedup import (
        _containment_candidates, _ordered_token_arrays,
    )

    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    cand = _containment_candidates(_ordered_token_arrays(spark, SF_DIR)).count()
    assert cand < n * (n - 1) * 0.05


def test_ann_filtered_topk_respects_predicate_and_rank(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        N_QUERIES, TOP_K, ann_filtered_topk,
    )

    rows = ann_filtered_topk(spark, SF_DIR).collect()
    emb = {
        r.vec_id: (r.label, list(map(float, r.embedding)))
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert rows
    by_q = {}
    for r in rows:
        # every hit satisfies the metadata predicate (same label)
        assert emb[r.corpus_id][0] == r.query_label
        assert emb[r.query_id][0] == r.query_label
        assert r.corpus_id >= N_QUERIES
        by_q.setdefault(r.query_id, []).append(r)
    for q, hits in by_q.items():
        assert len(hits) <= TOP_K
        ranks = sorted(h.rank for h in hits)
        assert ranks == list(range(1, len(hits) + 1))
        # scores are non-increasing in rank order
        ordered = sorted(hits, key=lambda h: h.rank)
        for x, y in zip(ordered, ordered[1:]):
            assert float(x.cosine) >= float(y.cosine)


def test_ngram_decontaminate_vs_pure_python(spark):
    """Independent brute-force replay of the n-gram contamination screen
    in pure Python (no Spark, no SQL) — decisions, counts, and rounded
    fractions must agree exactly."""
    import decimal
    import re

    from gmallbiguan_parent_spark.operators.dedup import (
        CONTAM_DROP_FRAC, SPAN_TOKENS, ngram_decontaminate,
    )

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def windows(text):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = [t for t in re.split(r"[^a-z0-9]+", norm) if t]
        return [
            " ".join(toks[i : i + SPAN_TOKENS])
            for i in range(len(toks) - SPAN_TOKENS + 1)
        ]

    bench = set()
    for r in rows:
        if r.doc_id % 17 == 0:
            bench.update(windows(r.text))
    ref = {}
    for r in rows:
        if r.doc_id % 17 == 0:
            continue
        ws = windows(r.text)
        if not ws:
            continue
        hit = sum(1 for w in ws if w in bench)
        frac = (decimal.Decimal(hit) / decimal.Decimal(len(ws))).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
        dec_label = (
            "drop" if frac >= decimal.Decimal(str(CONTAM_DROP_FRAC))
            else "review" if hit > 0 else "keep"
        )
        ref[r.doc_id] = (len(ws), hit, frac, dec_label)

    got = {
        r.doc_id: (r.gram_ct, r.hit_ct, r.contam_frac, r.decision)
        for r in ngram_decontaminate(spark, SF_DIR).collect()
    }
    assert got == ref and len(got) > 0
    assert {d for *_, d in got.values()} <= {"keep", "review", "drop"}
    # the synthetic corpus carries duplicated content, so the screen
    # must actually fire somewhere — not return all-keep
    assert any(d != "keep" for *_, d in got.values())


def test_stream_hypertable_equals_batch_cascade(spark):
    """The streamed hour grain + derived day/month cascade must equal
    the batch hypertable_rollup bit-for-bit."""
    from gmallbiguan_parent_spark.operators.timeseries import hypertable_rollup
    from gmallbiguan_parent_spark.streaming.queries import stream_hypertable_rollup_q

    got = {
        (r.grain, r.bucket_start, r.n_events, float(r.sum_value))
        for r in stream_hypertable_rollup_q(spark, SF_DIR).collect()
    }
    ref = {
        (r.grain, r.bucket_start, r.n_events, float(r.sum_value))
        for r in hypertable_rollup(spark, SF_DIR).collect()
    }
    assert got == ref and len(got) > 0


def test_assemble_training_mix_vs_pure_python(spark):
    """Independent pure-Python replay of the budget-quota admission:
    per-lang kept docs/tokens and utilization must agree exactly, and
    the admission must be greedy-maximal (the next doc in hash order
    would cross the quota)."""
    import hashlib
    import re
    from decimal import Decimal, ROUND_HALF_UP

    from gmallbiguan_parent_spark.operators.sampling import (
        MIX_ALPHA, MIX_BUDGET_DEN, MIX_BUDGET_NUM, assemble_training_mix,
    )

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()

    def tok_ct(text):
        return len(re.findall(r"[a-z0-9]+", text.lower()))

    def key(doc_id):
        return int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:15], 16)

    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((key(r.doc_id), r.doc_id, tok_ct(r.text)))
    total_tokens = sum(t for docs in by_lang.values() for *_, t in docs)
    tot_w = sum(len(d) ** MIX_ALPHA for d in by_lang.values())
    ref = {}
    for lang, docs in by_lang.items():
        mw = Decimal(str(len(docs) ** MIX_ALPHA / tot_w)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        quota_num = mw * total_tokens * MIX_BUDGET_NUM
        docs.sort()
        cum = kept_docs = kept_tokens = 0
        for _, _, t in docs:
            cum += t
            if Decimal(cum * MIX_BUDGET_DEN) > quota_num:
                break
            kept_docs += 1
            kept_tokens += t
        ref[lang] = (len(docs), kept_docs, kept_tokens)

    out = {
        r.lang: (r.doc_ct, r.kept_docs, r.kept_tokens, r.budget_utilization)
        for r in assemble_training_mix(spark, SF_DIR).collect()
    }
    assert set(out) == set(ref)
    for lang, (doc_ct, kd, kt) in ref.items():
        o = out[lang]
        assert o[:3] == (doc_ct, kd, kt), (lang, o, ref[lang])
        assert 0.0 <= o[3] <= 1.0


def test_remove_duplicated_spans_vs_pure_python(spark):
    """Independent pure-Python replay of the ExactSubstr removal:
    per-doc token/removed/kept counts and the cleaned-text fingerprint
    must agree exactly, and a doc that shares a span must actually
    lose tokens."""
    import hashlib
    import re

    from gmallbiguan_parent_spark.operators.dedup import (
        SPAN_TOKENS, remove_duplicated_spans,
    )

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def toks(text):
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        return [t for t in re.split(r"[^a-z0-9]+", norm) if t]

    spans = {}  # span -> total occurrence count (intra-doc repeats too)
    tokd = {}
    for r in rows:
        ts = toks(r.text)
        tokd[r.doc_id] = ts
        for i in range(len(ts) - SPAN_TOKENS + 1):
            key = " ".join(ts[i : i + SPAN_TOKENS])
            spans[key] = spans.get(key, 0) + 1
    dup = {s for s, c in spans.items() if c >= 2}
    ref = {}
    for doc_id, ts in tokd.items():
        covered = set()
        for i in range(len(ts) - SPAN_TOKENS + 1):
            if " ".join(ts[i : i + SPAN_TOKENS]) in dup:
                covered.update(range(i, i + SPAN_TOKENS))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        ref[doc_id] = (
            len(ts), len(ts) - len(kept), len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    got = {
        r.doc_id: (r.token_ct, r.removed_ct, r.kept_ct, r.kept_md5)
        for r in remove_duplicated_spans(spark, SF_DIR).collect()
    }
    assert got == ref and len(got) == len(rows)
    assert any(rm > 0 for _, rm, *_ in got.values())


def test_stream_ngram_decontaminate_equals_batch(spark):
    """The in-stream contamination screen must emit exactly the batch
    screen's per-doc tallies and decisions."""
    from gmallbiguan_parent_spark.operators.dedup import ngram_decontaminate
    from gmallbiguan_parent_spark.streaming.queries import (
        stream_ngram_decontaminate_q,
    )

    got = {
        r.doc_id: (r.gram_ct, r.hit_ct, r.contam_frac, r.decision)
        for r in stream_ngram_decontaminate_q(spark, SF_DIR).collect()
    }
    ref = {
        r.doc_id: (r.gram_ct, r.hit_ct, r.contam_frac, r.decision)
        for r in ngram_decontaminate(spark, SF_DIR).collect()
    }
    assert got == ref and len(got) > 0


def test_multiprobe_is_superset_of_single_probe(spark):
    """Hamming-1 multiprobe must recover every single-probe pair (same
    confirm threshold) plus the pairs whose signatures disagree on
    exactly one hyperplane in every table — the recall lever's
    contract."""
    from tests.conftest import SF_DIR

    from gmallbiguan_parent_spark.operators.similarity import (
        embedding_neardup_multiprobe, embedding_neardup_pairs,
    )

    single = {(r.vec_a, r.vec_b) for r in embedding_neardup_pairs(spark, SF_DIR).collect()}
    multi = {(r.vec_a, r.vec_b) for r in embedding_neardup_multiprobe(spark, SF_DIR).collect()}
    assert single <= multi
    assert len(multi) > len(single), "multiprobe should add hamming-1 recoveries"
