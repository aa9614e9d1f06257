"""Corpus curation capstone — the composed training-data pipeline:
quality gate → exact-dedup keeper → benchmark decontamination →
deterministic sample, in ONE declarative plan.

Each stage reuses the exact expressions its standalone operator uses
(text.text_quality, dedup.dedup_exact, dedup.decontaminate_corpus,
sampling.sample_bucket), so this is a composition proof: the stages
fuse into a single Catalyst plan — the quality gate runs inside the
scan projection, the dedup keeper is one window over the fingerprint,
the decontamination is a broadcast anti-join, and the sample filter is
a pure expression — no stage materializes an intermediate table.

Scale: one shuffle for the fingerprint window, one broadcast for the
benchmark set, everything else stays in the scan stage. At 100 TB the
fingerprint window would be replaced by a groupBy-min + self-join only
if fingerprint skew demanded it; AQE handles moderate skew as is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokenize
from ..io import load_table_spread
from .dedup import _norm_text
from .sampling import MOD, sample_bucket

MIN_TOKENS = 30
MIN_ALPHA_RATIO = 0.55
SAMPLE_RATE = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final curated-corpus stats per language after the full pipeline:
    (1) quality gate: >= 30 tokens and rounded alpha ratio >= 0.55;
    (2) exact dedup: keep the min doc_id per normalized fingerprint;
    (3) decontamination: drop docs whose fingerprint matches the
        benchmark set (doc_id % 17 == 0 over the FULL corpus — a
        contaminated doc is dropped even if its benchmark twin failed
        the quality gate);
    (4) 50% deterministic md5-bucket sample."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = tokenize("text")
    alpha_ct = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    alpha_ratio = F.round(
        alpha_ct.cast("decimal(18,6)") / F.greatest(F.length("text"), F.lit(1)), 4
    ).cast("decimal(9,4)")
    fp = F.md5(_norm_text(F.col("text")))

    base = docs.select("doc_id", "lang", "n_chars", fp.alias("fingerprint"),
                       F.size(toks).alias("token_ct"), alpha_ratio.alias("alpha_ratio"))
    quality = base.filter(
        (F.col("token_ct") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
    )
    w = Window.partitionBy("fingerprint")
    kept = (
        quality.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
    )
    benchmark = base.filter(F.col("doc_id") % 17 == 0).select("fingerprint").distinct()
    clean = kept.join(F.broadcast(benchmark), "fingerprint", "left_anti")
    sampled = clean.filter(sample_bucket(F.col("doc_id")) < int(SAMPLE_RATE * MOD))
    return sampled.groupBy("lang").agg(
        F.count("*").alias("doc_ct"),
        F.sum("n_chars").alias("char_sum"),
        F.min("doc_id").alias("min_doc_id"),
    )


QUERIES = {
    "curate_corpus": curate_corpus,
}

_BUCKET = "(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"

ORACLES = {
    "curate_corpus": f"""
        WITH t AS (
            SELECT doc_id, lang, n_chars,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token_ct,
                   CAST(ROUND(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DECIMAL(18,6))
                        / GREATEST(length(text), 1), 4) AS DECIMAL(9,4)) AS alpha_ratio,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        ), quality AS (
            SELECT * FROM t WHERE token_ct >= 30 AND alpha_ratio >= 0.55
        ), kept AS (
            SELECT * FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS keeper FROM quality
            ) WHERE doc_id = keeper
        ), bench AS (
            SELECT DISTINCT fingerprint FROM t WHERE doc_id % 17 = 0
        ), clean AS (
            SELECT * FROM kept k
            WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE b.fingerprint = k.fingerprint)
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n_chars) AS BIGINT) AS char_sum,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM clean
        WHERE {_BUCKET} < 5000
        GROUP BY lang
    """,
}
