"""Deterministic sampling — the reproducibility primitive of a
training-data pipeline.

`rand()`-based sampling is non-reproducible across runs/partitionings;
hash-based sampling (keep iff hash(id) mod M < rate*M) is stable,
partition-independent, joinable (the same doc always lands in the same
split), and portable to the oracle. Used for train/test splits,
decontamination holdouts, and per-source mixing weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_bigint, tokenize
from ..io import load_table, load_table_spread

MOD = 10_000


def sample_bucket(col: Column) -> Column:
    """Stable bucket in [0, MOD): md5-derived so Spark and the oracle
    agree; xxhash64 would be faster but engine-specific."""
    return md5_bigint(col.cast("string"), salt="sample:") % MOD


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample of documents + its summary stats. The
    filter is a pure expression on doc_id — at 100 TB it evaluates in
    the scan stage, no shuffle, and re-runs pick identical rows."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = docs.filter(sample_bucket(F.col("doc_id")) < MOD // 10)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("doc_ct"),
        F.sum("n_chars").alias("char_sum"),
        F.min("doc_id").alias("min_doc_id"),
    )


STRATA_RATES = {"en": 0.5, "zh": 1.0, "de": 0.25, "fr": 0.25, "es": 0.25}


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class rates (the data-mixing primitive): each language keeps
    a different deterministic fraction — upsampling scarce classes
    relative to the dominant one. The rate map compiles to a
    when/otherwise threshold on the same stable bucket."""
    docs = load_table(spark, sf_dir, "documents")
    expr = None
    for lang, rate in STRATA_RATES.items():
        threshold = F.lit(int(rate * MOD))
        expr = (
            F.when(F.col("lang") == lang, threshold)
            if expr is None
            else expr.when(F.col("lang") == lang, threshold)
        )
    thr = expr.otherwise(F.lit(0))
    sampled = docs.filter(sample_bucket(F.col("doc_id")) < thr)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("doc_ct"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-proportional sampling (importance sampling for data
    mixing): each document's keep-probability is its quality proxy
    (alpha ratio), so high-quality docs are kept at ~their score and
    junk is mostly dropped — deterministic via the same stable bucket,
    so re-runs keep identical rows. The threshold is a pure per-row
    expression: no shuffle before the final stats aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    alpha_ratio = F.round(
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")).cast("decimal(18,6)")
        / F.greatest(F.length("text"), F.lit(1)), 4,
    ).cast("decimal(9,4)")
    thr = F.floor(alpha_ratio * MOD).cast("long")
    sampled = docs.filter(sample_bucket(F.col("doc_id")) < thr)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("doc_ct"),
        F.sum("n_chars").alias("char_sum"),
        F.min("doc_id").alias("min_doc_id"),
    )


PRIO_K = 20


def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement (Efraimidis-
    Spiridakis priority sampling): each doc draws a deterministic
    uniform u from its id hash and gets key = -ln(u)/w with w = its
    char count; the PRIO_K smallest keys ARE a weighted sample without
    replacement — the exact-size, budget-aware variant the Bernoulli
    weighted_sample can't give (its sample size is random). Used for
    token-budget-proportional corpus draws that must be reproducible.

    Plan: key is a pure scan-stage expression; the global top-k is a
    TakeOrderedAndProject (distributed per-partition top-k + driver
    merge — NOT a single-partition sort), and only the PRIO_K
    surviving rows see the rank window. Keys are rounded to 9 dp
    before ranking so both engines order identically; md5-derived u
    keeps the draw portable and partition-independent."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = md5_bigint(F.col("doc_id").cast("string"), salt="prio:")
    u = (h + 1).cast("double") / float(1 << 60)
    key = F.round(-F.log(u) / F.col("n_chars").cast("double"), 9)
    cand = (
        # weight 0 means "never sampled" — and guards the NULL key a
        # zero division would produce (Spark sorts NULLs first ASC,
        # DuckDB last: a silent cross-engine order flip)
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.asc("key"), F.asc("doc_id"))
        .limit(PRIO_K)
    )
    w = Window.orderBy(F.asc("key"), F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "source", "n_chars", "key")
    )


MIX_ALPHA = 0.5


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha) sampling weights — the multilingual
    pretraining rebalancing rule p_l = c_l^alpha / sum(c^alpha): alpha<1
    flattens the language distribution so low-resource classes are
    upsampled relative to their raw share. Emits each class's mixture
    weight and the upsampling factor relative to proportional sampling
    (the number STRATA_RATES-style maps are derived from).

    Plan: one tiny groupBy(lang) aggregate, a 1-row total broadcast back
    — nothing scales with the corpus except the first count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("doc_ct"))
    counts = counts.withColumn("w", F.pow(F.col("doc_ct").cast("double"), F.lit(MIX_ALPHA)))
    tot = counts.agg(F.sum("w").alias("tot"), F.sum("doc_ct").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang", "doc_ct",
        F.round(F.col("w") / F.col("tot"), 6).alias("mix_weight"),
        F.round(F.col("w") / F.col("tot") * F.col("n") / F.col("doc_ct"), 6).alias("upsample_factor"),
    )


MIX_BUDGET_NUM = 1  # global budget = 1/2 of corpus tokens
MIX_BUDGET_DEN = 2


def assemble_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mix-assembly capstone: fill a global token budget (half the
    corpus) according to temperature-sampled per-language quotas — the
    step that turns mixture_weights' ratios into an actual document
    selection. Each language's quota is mix_weight x budget tokens;
    docs are admitted in deterministic hash order (swap in any quality
    or curriculum score — the mechanics don't change) until the next
    doc would cross the quota (document granularity, no truncation).
    Emits the per-language audit row: quota utilization near 1.0 for
    big languages, and upsampled small languages capped by their corpus
    size.

    Determinism: quotas are exact decimal (rounded weight x integer
    token total; the budget fraction enters as an integer cross-
    multiplication, never a float), cumulative sums are integer, and
    the admission predicate compares exact values — both engines admit
    the identical doc set.

    Plan: one scan computes (tok_ct, hash key); one tiny groupBy(lang)
    + 1-row broadcast derives quotas; ONE window (partitionBy lang,
    running integer sum) admits docs — at 100 TB this is the same
    shape as corpus_shards: per-class independent sorts, no global
    order, one shuffle."""
    from pyspark.sql import Window

    docs = load_table_spread(spark, sf_dir, "documents")
    # checkpoint the 4-scalar-per-doc projection: it feeds BOTH the
    # quota aggregate and the admission window, whose subtrees share no
    # exchange — without it the dominant cost (tokenizing every doc)
    # runs twice (the dedup-signature-table convention: materialize
    # exactly when the projection is smaller than its source)
    base = docs.select(
        "doc_id",
        "lang",
        F.size(tokenize("text")).cast("long").alias("tok_ct"),
        md5_bigint(F.col("doc_id").cast("string"), salt="mix:").alias("key"),
    ).localCheckpoint()
    counts = base.groupBy("lang").agg(
        F.count("*").alias("doc_ct"), F.sum("tok_ct").alias("lang_tokens")
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("doc_ct").cast("double"), F.lit(MIX_ALPHA))).alias("tot_w"),
        F.sum("lang_tokens").alias("total_tokens"),
    )
    wtd = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "doc_ct",
        F.round(
            F.pow(F.col("doc_ct").cast("double"), F.lit(MIX_ALPHA)) / F.col("tot_w"), 6
        ).cast("decimal(18,6)").alias("mix_weight"),
        "total_tokens",
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.select(
        "lang", "tok_ct", F.sum("tok_ct").over(w).alias("cum_tokens")
    )
    # admit while cum <= weight * total * NUM/DEN, cross-multiplied to
    # keep the comparison exact: DEN*cum <= NUM * weight * total
    kept = (
        cum.join(F.broadcast(wtd.select("lang", "mix_weight", "total_tokens")), "lang")
        .filter(
            (F.col("cum_tokens") * MIX_BUDGET_DEN).cast("decimal(38,6)")
            <= F.col("mix_weight") * F.col("total_tokens") * MIX_BUDGET_NUM
        )
        .groupBy("lang")
        .agg(F.count("*").alias("kept_docs"), F.sum("tok_ct").alias("kept_tokens"))
    )
    return wtd.join(F.broadcast(kept), "lang", "left").select(
        "lang",
        "doc_ct",
        "mix_weight",
        F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        F.round(
            (F.coalesce("kept_tokens", F.lit(0)) * MIX_BUDGET_DEN).cast("double")
            / (F.col("mix_weight") * F.col("total_tokens") * MIX_BUDGET_NUM).cast("double"),
            4,
        ).alias("budget_utilization"),
    )


N_SHARDS = 16


def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards — the
    epoch-order primitive of a training-data pipeline: every document
    gets a (shard, position) such that reading shards 0..N-1 in
    position order is a reproducible random permutation of the corpus.

    Scale: this is the shuffle WITHOUT a global sort — shard assignment
    is a pure md5 expression in the scan stage, and the position is a
    row_number partitioned BY SHARD (each shard sorts independently,
    the in-partition sort a partitionBy(shard) write does anyway).
    N_SHARDS scales with the corpus (shard ≈ one output file); no
    single-reducer total order anywhere. Re-runs and both engines
    produce the identical permutation because the sort key is
    md5-derived from doc_id, not RNG state."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    shard = md5_bigint(F.col("doc_id").cast("string"), salt="shard:") % N_SHARDS
    w = Window.partitionBy("shard").orderBy(F.asc("sort_key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", shard.alias("shard"), key.alias("sort_key"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


N_EPOCHS = 3


def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training shuffle — corpus_shards extended with the
    property a training loader actually needs: every EPOCH is a
    DIFFERENT reproducible permutation (epoch-salted md5 key), so
    multi-epoch training never replays the same document order while
    any run, any engine, and any restart reproduce the schedule
    bit-for-bit (the key is a deterministic function of (doc, epoch),
    never RNG state).

    Scale: identical to corpus_shards — shard assignment is a pure
    expression in the scan stage, position is a row_number partitioned
    by (epoch, shard) (each shard sorts independently; no global
    order); epochs explode from a 3-element literal array, so the one
    corpus scan serves all epochs."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ep = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in range(N_EPOCHS)])).alias("epoch"),
    )
    key = F.md5(F.concat_ws(":", F.lit("epoch"), F.col("epoch"), F.col("doc_id")))
    shard = (F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % N_SHARDS).alias(
        "shard"
    )
    w = Window.partitionBy("epoch", "shard").orderBy(F.asc("sort_key"), F.asc("doc_id"))
    return (
        ep.select("doc_id", "epoch", shard, key.alias("sort_key"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "epoch", "shard", "pos")
    )


QUERIES = {
    "corpus_sample": corpus_sample,
    "corpus_shards": corpus_shards,
    "epoch_shuffle_shards": epoch_shuffle_shards,
    "stratified_sample": stratified_sample,
    "weighted_sample": weighted_sample,
    "priority_sample": priority_sample,
    "mixture_weights": mixture_weights,
    "assemble_training_mix": assemble_training_mix,
}

_BUCKET = "(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)"

ORACLES = {
    "priority_sample": """
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ROUND(-ln(CAST((('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1) AS DOUBLE)
                         / 1152921504606846976.0)
                     / CAST(n_chars AS DOUBLE), 9) AS key
        FROM documents WHERE n_chars > 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY key ASC, doc_id ASC) AS INTEGER) AS rank,
           doc_id, source, n_chars, key
    FROM keyed
    ORDER BY key ASC, doc_id ASC
    LIMIT {PRIO_K}
    """.replace("{PRIO_K}", str(PRIO_K)),
    "epoch_shuffle_shards": f"""
        WITH ep AS (
            SELECT doc_id, unnest(range(0, {N_EPOCHS})) AS epoch FROM documents
        ), keyed AS (
            SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
                   ('0x' || substr(md5('epoch:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {N_SHARDS} AS shard,
                   md5('epoch:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS sort_key
            FROM ep
        )
        SELECT doc_id, epoch, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY sort_key ASC, doc_id ASC) AS INTEGER) AS pos
        FROM keyed
    """,
    "corpus_shards": """
        WITH keyed AS (
            SELECT doc_id,
                   ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard,
                   md5('shard:' || CAST(doc_id AS VARCHAR)) AS sort_key
            FROM documents
        )
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sort_key ASC, doc_id ASC) AS INTEGER) AS pos
        FROM keyed
    """,
    "weighted_sample": f"""
        WITH t AS (
            SELECT doc_id, lang, n_chars,
                   CAST(FLOOR(CAST(ROUND(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DECIMAL(18,6))
                        / GREATEST(length(text), 1), 4) AS DECIMAL(9,4)) * 10000) AS BIGINT) AS thr
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n_chars) AS BIGINT) AS char_sum,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM t
        WHERE {_BUCKET} < thr
        GROUP BY lang
    """,
    "corpus_sample": f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n_chars) AS BIGINT) AS char_sum,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM documents
        WHERE {_BUCKET} < 1000
        GROUP BY lang
    """,
    "stratified_sample": f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
        FROM documents
        WHERE {_BUCKET} < CASE lang
            WHEN 'en' THEN 5000 WHEN 'zh' THEN 10000
            WHEN 'de' THEN 2500 WHEN 'fr' THEN 2500 WHEN 'es' THEN 2500
            ELSE 0 END
        GROUP BY lang
    """,
    "mixture_weights": f"""
        WITH c AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS doc_ct FROM documents GROUP BY lang
        ), t AS (
            SELECT SUM(POWER(doc_ct, {MIX_ALPHA})) AS tot,
                   CAST(SUM(doc_ct) AS BIGINT) AS n
            FROM c
        )
        SELECT lang, doc_ct,
               ROUND(POWER(doc_ct, {MIX_ALPHA}) / tot, 6) AS mix_weight,
               ROUND(POWER(doc_ct, {MIX_ALPHA}) / tot * n / doc_ct, 6) AS upsample_factor
        FROM c, t
    """,
    "assemble_training_mix": f"""
    WITH base AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS tok_ct,
               ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS key
        FROM documents
    ), c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(tok_ct) AS BIGINT) AS lang_tokens
        FROM base GROUP BY lang
    ), t AS (
        SELECT SUM(POWER(doc_ct, {MIX_ALPHA})) AS tot_w,
               CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens
        FROM c
    ), wtd AS (
        SELECT lang, doc_ct,
               CAST(ROUND(POWER(doc_ct, {MIX_ALPHA}) / tot_w, 6) AS DECIMAL(18,6)) AS mix_weight,
               total_tokens
        FROM c, t
    ), cum AS (
        SELECT lang, tok_ct,
               SUM(tok_ct) OVER (PARTITION BY lang ORDER BY key, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM base
    ), k AS (
        SELECT cm.lang, CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(cm.tok_ct) AS BIGINT) AS kept_tokens
        FROM cum cm JOIN wtd w ON cm.lang = w.lang
        WHERE CAST(cm.cum_tokens * {MIX_BUDGET_DEN} AS DECIMAL(38,6))
              <= w.mix_weight * w.total_tokens * {MIX_BUDGET_NUM}
        GROUP BY cm.lang
    )
    SELECT w.lang, w.doc_ct, w.mix_weight,
           COALESCE(k.kept_docs, 0) AS kept_docs,
           COALESCE(k.kept_tokens, 0) AS kept_tokens,
           ROUND(CAST(COALESCE(k.kept_tokens, 0) * {MIX_BUDGET_DEN} AS DOUBLE)
                 / CAST(w.mix_weight * w.total_tokens * {MIX_BUDGET_NUM} AS DOUBLE), 4)
                 AS budget_utilization
    FROM wtd w LEFT JOIN k ON w.lang = k.lang
    """,
}
