"""Semantic invariants for the round-4 session operators that a value
hash can't express (each is ALSO oracle-hash-checked by verify_local /
test_oracle_parity; these assertions pin the relationships between
operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_manifest_checksum_is_order_free_and_content_sensitive(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.quality import corpus_manifest

    rows = [
        (0, "alpha beta gamma", "en", "s0", 16),
        (1, "delta epsilon zeta", "en", "s0", 18),
        (2, "eta theta iota", "en", "s1", 14),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "a" / "documents.parquet"))
    # same content, reversed row order and different partitioning
    spark.createDataFrame(list(reversed(rows)), schema).repartition(3).write.parquet(
        str(tmp_path / "b" / "documents.parquet")
    )
    # one character changed in one doc (case/whitespace edits would be
    # erased by _norm_text — the checksum is over NORMALIZED content)
    rows2 = [rows[0], (1, "delta epsilon zetb", "en", "s0", 18), rows[2]]
    spark.createDataFrame(rows2, schema).write.parquet(str(tmp_path / "c" / "documents.parquet"))

    def sums(d):
        return {
            r.source: r.content_checksum
            for r in corpus_manifest(spark, str(tmp_path / d)).collect()
        }

    a, b, c = sums("a"), sums("b"), sums("c")
    assert a == b                       # order/partitioning free
    assert a["s1"] == c["s1"]           # untouched source unchanged
    assert a["s0"] != c["s0"]           # 1-char edit flips the checksum


def test_dataset_card_counts_are_consistent(spark):
    from gmallbiguan_parent_spark.operators.curation import dataset_card

    card = {r.metric: r.value for r in dataset_card(spark, SF).collect()}
    total = card["total_docs"]
    assert total > 0
    assert card["unique_texts"] + card["exact_dup_docs"] == total
    # independent anchor: unique_texts must equal the fingerprint-group
    # count dedup_exact reports (the card derives it from the SAME
    # normalized-md5 rule but through a different aggregate)
    from gmallbiguan_parent_spark.operators.dedup import dedup_exact

    assert card["unique_texts"] == dedup_exact(spark, SF).count()
    assert sum(v for k, v in card.items() if k.startswith("lang:")) == total
    assert sum(v for k, v in card.items() if k.startswith("decision:")) == total


def test_dedup_threshold_curve_is_monotone(spark):
    from gmallbiguan_parent_spark.operators.dedup import dedup_threshold_curve

    rows = sorted(dedup_threshold_curve(spark, SF).collect(), key=lambda r: r.threshold)
    assert rows, "curve is empty"
    for lo, hi in zip(rows, rows[1:]):
        assert hi.pair_ct <= lo.pair_ct
        assert hi.doc_ct <= lo.doc_ct
    # the lowest threshold equals the LSH operating point: counts must
    # match the confirmed pair set exactly
    from gmallbiguan_parent_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, SF).collect()
    assert rows[0].pair_ct == len(pairs)
    assert rows[0].doc_ct == len({d for p in pairs for d in (p.doc_a, p.doc_b)})


def test_hard_negatives_are_wrong_label_and_bounded_by_exact_top1(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        ann_cosine_topk,
        hard_negative_mining,
    )

    hn = hard_negative_mining(spark, SF).collect()
    assert hn, "no hard negatives returned"
    for r in hn:
        assert r.corpus_label != r.query_label
    best_exact = {
        r.query_id: r.cosine for r in ann_cosine_topk(spark, SF).collect() if r.rank == 1
    }
    best_hn = {r.query_id: r.cosine for r in hn if r.rank == 1}
    for q, c in best_hn.items():
        assert c <= best_exact[q]


def test_cluster_profile_partitions_the_corpus(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        N_QUERIES,
        embedding_cluster_profile,
    )
    from gmallbiguan_parent_spark.io import load_table

    prof = embedding_cluster_profile(spark, SF).collect()
    n_corpus = (
        load_table(spark, SF, "embeddings").filter(F.col("vec_id") >= N_QUERIES).count()
    )
    assert sum(r.n for r in prof) == n_corpus
    for r in prof:
        assert 0 < r.majority_ct <= r.n


def test_streaming_incremental_matches_batch_verdicts(spark):
    from gmallbiguan_parent_spark.operators.dedup import incremental_neardup
    from gmallbiguan_parent_spark.streaming.queries import (
        stream_incremental_neardup_q,
    )

    batch = {r.doc_id: r for r in incremental_neardup(spark, SF).collect()}
    stream_pairs = stream_incremental_neardup_q(spark, SF).collect()
    stream_by_doc: dict[int, list] = {}
    for p in stream_pairs:
        stream_by_doc.setdefault(p.batch_id, []).append(p)
    # every stream-matched doc is non-novel in batch, and vice versa;
    # the batch witness (min ref) appears among the stream's pairs with
    # the identical jaccard
    assert set(stream_by_doc) == {d for d, r in batch.items() if not r.novel}
    for d, plist in stream_by_doc.items():
        wit = batch[d]
        hits = {(p.ref_id, p.jaccard) for p in plist}
        assert (wit.dup_of, wit.jaccard) in hits
