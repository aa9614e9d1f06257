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


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation ATTRITION REPORT — per-stage survivor counts for
    the full training-data funnel, the first table every dataset card
    shows (how much did each screen cost?):

      1 pool          the training pool (doc_id % 17 != 0; the held-out
                      1/17 is the benchmark suite, never trainable)
      2 rules         Gopher rule gate (the gopher_quality_flags keep)
      3 exact_dedup   min-doc_id keeper per normalized fingerprint
                      among rule survivors
      4 neardup       drop docs that near-duplicate ANY earlier-id
                      corpus doc (the confirmed LSH pair set's doc_b
                      side — the greedy pair policy production MinHash
                      dedup applies; corpus-level, so a doc dropped by
                      rules can still eliminate its later twin)
      5 decontaminate drop ngram_decontaminate's 'drop' decisions
                      ('review' survives for human triage)

    Plan: ONE corpus scan computes flags + fingerprint (codegen
    projection), one fingerprint-keyed window finds keepers, the two
    drop sets come from the SAME corpus-level artifacts their owning
    operators checkpoint (the LSH pair set, the benchmark gram
    collisions) and left-join as id lists, then a single-row aggregate
    unpivots to the 5-stage table — the funnel adds no new shuffle
    shape at any corpus size."""
    from .dedup import _lsh_pairs_ck, ngram_decontaminate
    from .text import _gopher_flags

    docs = load_table_spread(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") % 17 != 0)
    flagged = _gopher_flags(pool).select("doc_id", "keep")
    base = pool.select(
        "doc_id", "n_chars", F.md5(_norm_text(F.col("text"))).alias("fp")
    )
    j = base.join(flagged, "doc_id").withColumn(
        "keeper",
        F.min(F.when(F.col("keep"), F.col("doc_id"))).over(Window.partitionBy("fp")),
    )
    ndrop = (
        _lsh_pairs_ck(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("nd", F.lit(True))
    )
    cdrop = (
        ngram_decontaminate(spark, sf_dir)
        .filter(F.col("decision") == "drop")
        .select("doc_id")
        .withColumn("cd", F.lit(True))
    )
    s2 = F.col("keep")
    s3 = s2 & (F.col("doc_id") == F.col("keeper"))
    s4 = s3 & F.col("nd").isNull()
    s5 = s4 & F.col("cd").isNull()
    st = (
        j.join(ndrop, "doc_id", "left")
        .join(cdrop, "doc_id", "left")
        .select(
            "n_chars", s2.alias("s2"), s3.alias("s3"), s4.alias("s4"), s5.alias("s5")
        )
    )

    def cnt(c):
        return F.sum(F.when(F.col(c), 1).otherwise(0))

    def chs(c):
        return F.sum(F.when(F.col(c), F.col("n_chars")).otherwise(0))

    agg = st.agg(
        F.count("*").alias("c1"), F.sum("n_chars").alias("h1"),
        cnt("s2").alias("c2"), chs("s2").alias("h2"),
        cnt("s3").alias("c3"), chs("s3").alias("h3"),
        cnt("s4").alias("c4"), chs("s4").alias("h4"),
        cnt("s5").alias("c5"), chs("s5").alias("h5"),
    )
    return agg.select(
        F.expr(
            "stack(5, 1, 'pool', c1, h1, 2, 'rules', c2, h2,"
            " 3, 'exact_dedup', c3, h3, 4, 'neardup', c4, h4,"
            " 5, 'decontaminate', c5, h5) AS (stage_no, stage, doc_ct, char_sum)"
        )
    ).orderBy("stage_no")


BATCH_DOCS = 32        # documents per training micro-batch


def length_batch_pad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for length-grouped batching — the
    training-efficiency question every fine-tuning pipeline asks: if
    documents batch BATCH_DOCS at a time and each batch pads to its
    longest member, how many pad tokens does ARRIVAL-ORDER batching
    burn vs LENGTH-SORTED batching (the bucketing trick)? Reports both
    policies' batch count, pad tokens, real tokens, and pad ratio —
    the measured justification for sorting before batching.

    Scale: the only wide ops are TWO row_number windows PARTITIONED BY
    the md5 shard (pack_sequences' sharding — thousands of independent
    partitions at cluster scale, never a global sort) and two
    shard+batch aggregates that combine map-side; the final rollup is
    2 rows."""
    from .text import BPE_RE

    docs = load_table_spread(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
    base = docs.select(
        "doc_id",
        (sample_bucket(F.col("doc_id")) % N_SHARDS).alias("shard"),
        toks.alias("token_ct"),
    )

    def policy(name: str, order_cols) -> DataFrame:
        w = Window.partitionBy("shard").orderBy(*order_cols)
        batch = F.floor((F.row_number().over(w) - 1) / BATCH_DOCS)
        g = (
            base.withColumn("batch", batch)
            .groupBy("shard", "batch")
            .agg(
                F.count("*").alias("n"),
                F.max("token_ct").alias("mx"),
                F.sum("token_ct").alias("s"),
            )
        )
        return g.agg(
            F.count("*").alias("batch_ct"),
            F.sum(F.col("n") * F.col("mx") - F.col("s")).alias("pad_tokens"),
            F.sum("s").alias("token_sum"),
        ).select(F.lit(name).alias("policy"), "batch_ct", "pad_tokens", "token_sum")

    both = policy("arrival", [F.col("doc_id")]).unionAll(
        policy("length_sorted", [F.col("token_ct"), F.col("doc_id")])
    )
    ratio = (
        F.col("pad_tokens").cast("decimal(18,6)")
        / (F.col("pad_tokens") + F.col("token_sum"))
    ).cast("decimal(9,6)")
    return both.select(
        "policy", "batch_ct", "pad_tokens", "token_sum", ratio.alias("pad_ratio")
    ).orderBy("policy")


PACK_BUDGET = 2048     # tokens per packed context bin
N_SHARDS = 8           # independent packing streams; 1000s at cluster scale


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the LLM-pretraining step that concatenates
    documents into fixed-token-budget context windows. Documents hash
    into N_SHARDS independent shards (same md5 bucket the sampler
    uses) and pack contiguously in doc_id order within each shard:
    a document's bin is floor(tokens_before_it / PACK_BUDGET) —
    concat-then-chunk semantics, deterministic and rerun-stable.

    Scale: token counts are scan-stage expressions; the ONLY wide op is
    a cumulative-sum window PARTITIONED BY shard — shard count scales
    with the cluster (thousands of shards → thousands of independent
    window partitions), never a global sort. Output: one row per doc
    with its shard, start offset, and bin assignment."""
    from .text import BPE_RE

    docs = load_table_spread(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0))
    base = docs.select(
        "doc_id",
        (sample_bucket(F.col("doc_id")) % N_SHARDS).alias("shard"),
        toks.alias("token_ct"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("token_ct").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id", "shard", "token_ct",
        before.alias("offset_tokens"),
        F.floor(before / PACK_BUDGET).cast("long").alias("bin_id"),
    )


CHUNK_TOKENS = 32      # window width
CHUNK_STRIDE = 24      # stride (8-token overlap between consecutive chunks)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the step that splits documents into
    overlapping fixed-token windows before embedding/indexing (RAG and
    embedding-generation pipelines; the overlap keeps boundary context
    retrievable). Each doc yields ceil(max(n-W,0)/S)+1 chunks of W
    tokens at stride S. Pure scan-stage expressions: tokenization,
    chunk arithmetic, and the explode all happen in the projection —
    zero shuffles, output is the (doc_id, chunk_id, span, text) sidecar
    an embedding job consumes partition-parallel."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - CHUNK_TOKENS, F.lit(0)) / CHUNK_STRIDE).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * CHUNK_STRIDE).alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, i * CHUNK_STRIDE + 1, CHUNK_TOKENS)).alias("chunk_text"),
        ),
    )
    return (
        docs.select("doc_id", n.alias("doc_tokens"), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            "doc_id", "doc_tokens", "chunk_id",
            F.col("c.start_tok").alias("start_tok"),
            F.size(F.split(F.col("c.chunk_text"), " ")).alias("chunk_tokens"),
            F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
        )
    )


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet: the one-table corpus summary a curation run
    publishes next to its output (Datasheets for Datasets / model-card
    data sections) — size, content uniqueness, language mix, source
    count, quality-filter decision mix, and token volume, as
    (metric, value) rows. Every line is a count aggregate; the
    quality-decision rows reuse the quality_classifier expressions
    verbatim so the card can never drift from the filter it reports on.
    Scale: a handful of independent one-pass aggregates unioned — each
    is map-side-combined, none exceeds a single shuffle."""
    from .text import quality_classifier

    docs = load_table_spread(spark, sf_dir, "documents")
    norm_fp = F.md5(_norm_text(F.col("text")))
    ws_tokens = F.size(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != F.lit(""))
    )
    totals = docs.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct(norm_fp).alias("unique_texts"),
        F.countDistinct("source").alias("sources"),
        F.sum(ws_tokens).alias("ws_tokens_total"),
    )
    metric = lambda name, col: F.struct(F.lit(name).alias("metric"), col.cast("long").alias("value"))
    wide = totals.select(
        F.explode(
            F.array(
                metric("total_docs", F.col("total_docs")),
                metric("unique_texts", F.col("unique_texts")),
                metric("exact_dup_docs", F.col("total_docs") - F.col("unique_texts")),
                metric("sources", F.col("sources")),
                metric("ws_tokens_total", F.col("ws_tokens_total")),
            )
        ).alias("m")
    ).select("m.metric", "m.value")
    langs = docs.groupBy("lang").agg(F.count("*").alias("value")).select(
        F.concat(F.lit("lang:"), F.col("lang")).alias("metric"), F.col("value").cast("long")
    )
    decisions = (
        quality_classifier(spark, sf_dir)
        .groupBy("decision")
        .agg(F.count("*").alias("value"))
        .select(
            F.concat(F.lit("decision:"), F.col("decision")).alias("metric"),
            F.col("value").cast("long"),
        )
    )
    return wide.unionByName(langs).unionByName(decisions)


DSIR_TARGET_LANG = "en"


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023) reduced to its exactly-replayable unigram case: the
    target distribution is the high-resource slice (lang='en'), the raw
    distribution is everything else; each document's importance weight
    is the mean per-token log-likelihood ratio
    ln p_tgt(tok) - ln p_raw(tok) with add-1 smoothing over the shared
    vocabulary. Positive weight => the doc "looks like" the target and
    is selected. The published method hashes n-grams into 2^20 buckets;
    exact unigrams keep the oracle bit-replayable here, and the hashed
    variant is a drop-in (bucket id instead of token as the group key —
    same plan shape, bounded-width frequency table).

    Plan: ONE token-keyed aggregate builds both frequency columns
    (conditional counts, partial map-side); the exploded tokens probe it
    on the same key (shuffle reuse, AQE splits stopword hot keys); the
    totals/vocab-size row is a 1-row broadcast. Per-token log ratios
    round to 9 dp and sum as exact decimal, so per-doc means are
    order-independent and the oracle hash-matches — the
    unigram_logprob determinism recipe."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_tgt"),
        F.explode(tokenize("text")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.when(F.col("is_tgt"), 1)).alias("ct_t"),
        F.count(F.when(~F.col("is_tgt"), 1)).alias("ct_r"),
    )
    stats = freq.agg(
        F.sum("ct_t").alias("tot_t"),
        F.sum("ct_r").alias("tot_r"),
        F.count("*").alias("v"),
    )
    p_t = (F.col("ct_t") + 1).cast("double") / (F.col("tot_t") + F.col("v")).cast("double")
    p_r = (F.col("ct_r") + 1).cast("double") / (F.col("tot_r") + F.col("v")).cast("double")
    lr = F.round(F.log(p_t) - F.log(p_r), 9).cast("decimal(18,9)")
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", lr.alias("lr"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("tok_ct"),
            F.round(F.sum("lr").cast("double") / F.count("*"), 6).alias("dsir_weight"),
        )
        .withColumn("selected", (F.col("dsir_weight") > 0).cast("int"))
    )


QUERIES = {
    "curate_corpus": curate_corpus,
    "curation_funnel": curation_funnel,
    "length_batch_pad_stats": length_batch_pad_stats,
    "pack_sequences": pack_sequences,
    "chunk_documents": chunk_documents,
    "dataset_card": dataset_card,
    "dsir_importance_weights": dsir_importance_weights,
}

_BUCKET = "(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"

from . import text as _text  # noqa: E402  (oracle composition, no cycle)

_CARD_TOT = """
    SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
           CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS BIGINT) AS unique_texts,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS sources,
           CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> ''))) AS BIGINT) AS ws_tokens_total
    FROM documents
"""

from .dedup import (  # noqa: E402  (oracle composition, no cycle)
    _DUCK_MINHASH_PAIRS, _DUCK_SHINGLES, CONTAM_DROP_FRAC, SPAN_TOKENS,
)
from .text import (  # noqa: E402
    _STOP_LIST, GOPHER_MAX_WORDS, GOPHER_MIN_WORDS,
)

# The funnel oracle composes the EXACT fragments its stage owners use:
# the shingle/minhash `good` pair chain (near-dup drops), the window
# collision score (decontamination drops), and the Gopher flag math —
# all over the shared `toks` token array the shingle fragment defines.
_FUNNEL_ORACLE = _DUCK_SHINGLES + _DUCK_MINHASH_PAIRS + f"""
    , wins AS (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) >= {SPAN_TOKENS} THEN
                   [array_to_string(toks[i:i+{SPAN_TOKENS} - 1], ' ')
                    for i in range(1, len(toks) - {SPAN_TOKENS} + 2)]
               ELSE [] END) AS gram
        FROM toks
    ), wbench AS (
        SELECT DISTINCT gram FROM wins WHERE doc_id % 17 = 0
    ), cdrop AS (
        SELECT doc_id FROM (
            SELECT w.doc_id,
                   CAST(ROUND(CAST(COUNT(b.gram) AS DECIMAL(18,6)) / COUNT(*), 4)
                        AS DECIMAL(9,4)) AS frac
            FROM wins w LEFT JOIN wbench b ON w.gram = b.gram
            WHERE w.doc_id % 17 <> 0
            GROUP BY w.doc_id
        ) WHERE frac >= CAST('{CONTAM_DROP_FRAC}' AS DECIMAL(9,4))
    ), ndrop AS (
        SELECT DISTINCT doc_b AS doc_id FROM good
    ), gf AS (
        SELECT d.doc_id, d.n_chars,
               md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fp,
               ((len(t.toks) >= {GOPHER_MIN_WORDS} AND len(t.toks) <= {GOPHER_MAX_WORDS})
                AND (CAST(ROUND(CAST(COALESCE(list_sum(list_transform(t.toks, x -> length(x))), 0) AS DECIMAL(18,6))
                     / GREATEST(len(t.toks), 1), 4) AS DECIMAL(9,4)) >= 3)
                AND (CAST(ROUND(CAST(COALESCE(list_sum(list_transform(t.toks, x -> length(x))), 0) AS DECIMAL(18,6))
                     / GREATEST(len(t.toks), 1), 4) AS DECIMAL(9,4)) <= 10)
                AND (CAST(ROUND(CAST(len(list_filter(t.toks, x -> regexp_matches(x, '[a-z]'))) AS DECIMAL(18,6))
                     / GREATEST(len(t.toks), 1), 4) AS DECIMAL(9,4)) >= CAST('0.8' AS DECIMAL(9,4)))
                AND (CAST(ROUND(CAST(len(regexp_extract_all(d.text, '#|\\.\\.\\.')) AS DECIMAL(18,6))
                     / GREATEST(len(t.toks), 1), 4) AS DECIMAL(9,4)) <= CAST('0.1' AS DECIMAL(9,4)))
                AND (len(list_intersect(list_distinct(t.toks), {_STOP_LIST})) >= 2)) AS keep
        FROM documents d JOIN toks t ON d.doc_id = t.doc_id
        WHERE d.doc_id % 17 <> 0
    ), fl AS (
        SELECT gf.*,
               gf.keep AND gf.doc_id = MIN(CASE WHEN gf.keep THEN gf.doc_id END)
                   OVER (PARTITION BY gf.fp) AS s3
        FROM gf
    ), stg AS (
        SELECT f.n_chars, f.keep AS s2, f.s3,
               f.s3 AND n.doc_id IS NULL AS s4,
               f.s3 AND n.doc_id IS NULL AND c.doc_id IS NULL AS s5
        FROM fl f
        LEFT JOIN ndrop n ON f.doc_id = n.doc_id
        LEFT JOIN cdrop c ON f.doc_id = c.doc_id
    ), agg AS (
        SELECT COUNT(*) AS c1, SUM(n_chars) AS h1,
               SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS c2, SUM(CASE WHEN s2 THEN n_chars ELSE 0 END) AS h2,
               SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS c3, SUM(CASE WHEN s3 THEN n_chars ELSE 0 END) AS h3,
               SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS c4, SUM(CASE WHEN s4 THEN n_chars ELSE 0 END) AS h4,
               SUM(CASE WHEN s5 THEN 1 ELSE 0 END) AS c5, SUM(CASE WHEN s5 THEN n_chars ELSE 0 END) AS h5
        FROM stg
    )
    SELECT CAST(1 AS INTEGER) AS stage_no, 'pool' AS stage,
           CAST(c1 AS BIGINT) AS doc_ct, CAST(h1 AS BIGINT) AS char_sum FROM agg
    UNION ALL SELECT 2, 'rules', CAST(c2 AS BIGINT), CAST(h2 AS BIGINT) FROM agg
    UNION ALL SELECT 3, 'exact_dedup', CAST(c3 AS BIGINT), CAST(h3 AS BIGINT) FROM agg
    UNION ALL SELECT 4, 'neardup', CAST(c4 AS BIGINT), CAST(h4 AS BIGINT) FROM agg
    UNION ALL SELECT 5, 'decontaminate', CAST(c5 AS BIGINT), CAST(h5 AS BIGINT) FROM agg
    ORDER BY stage_no
"""

ORACLES = {
    "curation_funnel": _FUNNEL_ORACLE,
    "length_batch_pad_stats": f"""
    WITH t AS (
        SELECT doc_id, ({_BUCKET} % 8) AS shard,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS token_ct
        FROM documents
    ), ra AS (
        SELECT shard, token_ct,
               ((ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) - 1) // {BATCH_DOCS}) AS batch
        FROM t
    ), ga AS (
        SELECT shard, batch, COUNT(*) AS n, MAX(token_ct) AS mx, SUM(token_ct) AS s
        FROM ra GROUP BY shard, batch
    ), pa AS (
        SELECT 'arrival' AS policy, COUNT(*) AS batch_ct,
               SUM(n * mx - s) AS pad_tokens, SUM(s) AS token_sum
        FROM ga
    ), rb AS (
        SELECT shard, token_ct,
               ((ROW_NUMBER() OVER (PARTITION BY shard ORDER BY token_ct, doc_id) - 1) // {BATCH_DOCS}) AS batch
        FROM t
    ), gb AS (
        SELECT shard, batch, COUNT(*) AS n, MAX(token_ct) AS mx, SUM(token_ct) AS s
        FROM rb GROUP BY shard, batch
    ), pb AS (
        SELECT 'length_sorted' AS policy, COUNT(*) AS batch_ct,
               SUM(n * mx - s) AS pad_tokens, SUM(s) AS token_sum
        FROM gb
    ), u AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
    SELECT policy, CAST(batch_ct AS BIGINT) AS batch_ct,
           CAST(pad_tokens AS BIGINT) AS pad_tokens,
           CAST(token_sum AS BIGINT) AS token_sum,
           CAST(CAST(pad_tokens AS DECIMAL(18,6)) / (pad_tokens + token_sum) AS DECIMAL(9,6)) AS pad_ratio
    FROM u ORDER BY policy
    """,
    "dsir_importance_weights": f"""
    WITH toks AS (
        SELECT doc_id, (lang = '{DSIR_TARGET_LANG}') AS is_tgt,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), freq AS (
        SELECT tok,
               COUNT(*) FILTER (is_tgt) AS ct_t,
               COUNT(*) FILTER (NOT is_tgt) AS ct_r
        FROM toks GROUP BY tok
    ), st AS (
        SELECT SUM(ct_t) AS tot_t, SUM(ct_r) AS tot_r, COUNT(*) AS v FROM freq
    ), scored AS (
        SELECT t.doc_id,
               CAST(ROUND(
                   ln(CAST(f.ct_t + 1 AS DOUBLE) / CAST(st.tot_t + st.v AS DOUBLE))
                 - ln(CAST(f.ct_r + 1 AS DOUBLE) / CAST(st.tot_r + st.v AS DOUBLE)), 9)
               AS DECIMAL(18,9)) AS lr
        FROM toks t JOIN freq f USING (tok), st
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tok_ct,
               ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) AS dsir_weight
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, tok_ct, dsir_weight,
           CAST(dsir_weight > 0 AS INT) AS selected
    FROM agg
    """,
    "dataset_card": f"""
    WITH tot AS ({_CARD_TOT})
    SELECT 'total_docs' AS metric, total_docs AS value FROM tot
    UNION ALL SELECT 'unique_texts', unique_texts FROM tot
    UNION ALL SELECT 'exact_dup_docs', total_docs - unique_texts FROM tot
    UNION ALL SELECT 'sources', sources FROM tot
    UNION ALL SELECT 'ws_tokens_total', ws_tokens_total FROM tot
    UNION ALL SELECT 'lang:' || lang, CAST(COUNT(*) AS BIGINT) FROM documents GROUP BY lang
    UNION ALL SELECT 'decision:' || decision, CAST(COUNT(*) AS BIGINT)
              FROM ({_text.ORACLES["quality_classifier"]}) GROUP BY decision
    """,
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
    "chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), b AS (
            SELECT doc_id, len(toks) AS doc_tokens, toks,
                   CAST(CEIL(GREATEST(len(toks) - {CHUNK_TOKENS}, 0) / {CHUNK_STRIDE}.0) AS INT) + 1 AS n_chunks
            FROM t
        ), c AS (
            SELECT doc_id, doc_tokens,
                   unnest(range(n_chunks)) AS chunk_id,
                   unnest([array_to_string(toks[i*{CHUNK_STRIDE}+1:i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
                           for i in range(0, n_chunks)]) AS chunk_text
            FROM b
        )
        SELECT doc_id,
               CAST(doc_tokens AS INTEGER) AS doc_tokens,
               CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(chunk_id * {CHUNK_STRIDE} AS INTEGER) AS start_tok,
               CAST(len(string_split(chunk_text, ' ')) AS INTEGER) AS chunk_tokens,
               md5(chunk_text) AS chunk_md5
        FROM c
    """,
    "pack_sequences": f"""
        WITH t AS (
            SELECT doc_id,
                   ({_BUCKET} % 8) AS shard,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS token_ct
            FROM documents
        )
        SELECT doc_id, shard, token_ct,
               CAST(COALESCE(SUM(token_ct) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_tokens,
               CAST(COALESCE(SUM(token_ct) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS bin_id
        FROM t
    """,
}
