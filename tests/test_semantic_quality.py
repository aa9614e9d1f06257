"""Invariants for the SemDeDup semantic dedup and the linear quality
classifier (both oracle-hash-checked separately by verify_local; these
tests assert the semantic properties a hash can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_partitions_corpus(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        N_QUERIES,
        semantic_dedup,
    )
    from gmallbiguan_parent_spark.io import load_table

    out = semantic_dedup(spark, SF)
    rows = out.collect()
    n_corpus = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") >= N_QUERIES
    ).count()
    # every corpus vector gets exactly one verdict
    assert len(rows) == n_corpus
    assert len({r.vec_id for r in rows}) == n_corpus
    for r in rows:
        # kept <=> no witness; a witness is always a smaller id
        assert r.kept == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id


def test_semantic_dedup_witness_is_in_same_cell_and_similar(spark):
    from gmallbiguan_parent_spark.operators.similarity import (
        SEMDEDUP_TAU,
        _py_cos6,
        _py_norm,
        semantic_dedup,
    )
    from gmallbiguan_parent_spark.io import load_table

    out = {r.vec_id: r for r in semantic_dedup(spark, SF).collect()}
    emb = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    dropped = [r for r in out.values() if not r.kept]
    for r in dropped:
        w = out[r.dup_of]
        assert w.cell == r.cell
        a, b = emb[r.dup_of], emb[r.vec_id]
        assert _py_cos6(a, b, _py_norm(a), _py_norm(b)) >= SEMDEDUP_TAU


def test_quality_classifier_thresholds_are_consistent(spark):
    from gmallbiguan_parent_spark.operators.text import (
        QC_KEEP,
        QC_REVIEW,
        quality_classifier,
    )

    rows = quality_classifier(spark, SF).collect()
    assert rows, "classifier returned no rows"
    for r in rows:
        if r.quality_logit >= QC_KEEP:
            assert r.decision == "keep"
        elif r.quality_logit >= QC_REVIEW:
            assert r.decision == "review"
        else:
            assert r.decision == "drop"


def test_quality_classifier_rewards_stopword_rich_prose(spark, tmp_path):
    from gmallbiguan_parent_spark.operators.text import quality_classifier

    rows = [
        (0, "the cat is on the mat and it is warm for a nap in the sun", "en", "s", 10),
        (1, "xqzt 9912 @@## qq zz 0x1f 0x2e ~~ || ``", "en", "s", 10),
        (2, "!!! ??? ~~~", "en", "s", 10),  # ZERO [a-z0-9] tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in quality_classifier(spark, str(tmp_path)).collect()}
    assert out[0].quality_logit > out[1].quality_logit
    # zero-token doc: every feature is 0, logit = bias exactly, never
    # NULL — and the DuckDB oracle agrees (list_sum NULL is COALESCEd)
    import duckdb

    from gmallbiguan_parent_spark.operators.text import ORACLES, QC_BIAS

    assert out[2].quality_logit is not None
    assert float(out[2].quality_logit) == QC_BIAS
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.sql(ORACLES["quality_classifier"]).fetchall()
    }
    assert float(oracle[2][0]) == QC_BIAS
    assert oracle[2][1] == out[2].decision


def test_leakage_safe_split_keeps_neardups_together(spark):
    from gmallbiguan_parent_spark.operators.dedup import (
        leakage_safe_split,
        minhash_lsh_pairs,
    )

    split = {r.doc_id: r.split for r in leakage_safe_split(spark, SF).collect()}
    pairs = minhash_lsh_pairs(spark, SF).collect()
    assert split, "split returned no rows"
    assert set(split.values()) <= {"train", "val", "test"}
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b], (p.doc_a, p.doc_b)
