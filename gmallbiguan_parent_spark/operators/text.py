"""Text analysis operators over the documents table.

Training-data curation staples, all expressed with built-in (codegen'd)
expressions — no Python in the hot path:

- token counting (whitespace + BPE-ish regex classes)
- quality scoring (length / punctuation / stopword ratios)
- language-ID (character-range + stopword-vote heuristic)
- document fingerprinting (normalized md5 + polynomial rolling hash)

Each has a DuckDB oracle replaying the identical arithmetic. Ratios are
computed in decimal and rounded to fixed scale so hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokenize
from ..io import load_table, load_table_spread

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# BPE-ish pre-tokenization classes: letter runs, digit runs, single
# non-alnum-non-space marks. Kept to constructs Java regex and RE2
# interpret identically.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens vs BPE-ish tokens per document, plus corpus
    token totals — the cheap token-budget estimator."""
    docs = load_table_spread(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    ws_tokens = F.size(F.filter(F.split(F.trim(low), r"\s+"), lambda t: t != F.lit("")))
    bpe_tokens = F.size(F.regexp_extract_all(low, F.lit(BPE_RE), 0))
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_token_ct"),
        bpe_tokens.alias("bpe_token_ct"),
        F.length("text").alias("char_ct"),
    )


def _quality_features() -> dict:
    """The three 4-dp decimal quality features over `text` — SINGLE
    SOURCE shared by text_quality and quality_classifier (and, through
    the latter, dataset_card), so a feature redefinition can never be
    applied to one consumer and missed in another. The SQL twin is
    _DUCK_QUALITY_F below."""
    toks = tokenize("text")
    n_toks = F.size(toks)
    stop_ct = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alpha_ct = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    char_ct = F.length("text")

    def dec4(x):
        return F.round(x, 4).cast("decimal(9,4)")

    return {
        "token_ct": n_toks,
        "stop_r": dec4(stop_ct.cast("decimal(18,6)") / F.greatest(n_toks, F.lit(1))),
        "alpha_r": dec4(alpha_ct.cast("decimal(18,6)") / F.greatest(char_ct, F.lit(1))),
        "mtl": dec4(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("decimal(18,6)")
            / F.greatest(n_toks, F.lit(1))
        ),
    }


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean token length, alpha ratio —
    combined into a 0-100 score. All ratios decimal-rounded (scale 4)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    f = _quality_features()
    return docs.select(
        "doc_id",
        f["token_ct"].alias("token_ct"),
        f["stop_r"].alias("stopword_ratio"),
        f["alpha_r"].alias("alpha_ratio"),
        f["mtl"].alias("mean_token_len"),
    )


# quality_classifier: a fixed-weight linear quality model (the shape of
# a fastText/logistic quality filter, with hand-set interpretable
# weights so both engines replay it exactly — a learned model would
# ship its coefficients the same way). Weights calibrated on the
# synthetic corpus so all three decisions occur at every sf.
QC_BIAS = -0.66
QC_W_STOP = 6.0      # stopword ratio: natural prose signal
QC_W_ALPHA = 2.0     # alphabetic ratio: penalizes markup/symbol soup
QC_W_LEN = 1.5       # saturating length credit (tokens/256 capped at 1)
QC_W_MTL = -0.25     # very long mean tokens suggest code/identifiers
QC_KEEP = 0.75
QC_REVIEW = 0.35


def _qc_logit():
    """The quality model's logit as a Column — EXACT decimal arithmetic
    end-to-end: 4-dp features × 2-dp weights sum with no float step and
    no ROUND at all, so there is no half-way-boundary divergence between
    engines (a double ROUND here failed at sf0.1 on .xxxx5 logits).
    Features shared with text_quality via _quality_features."""
    feats = _quality_features()
    stop_r, alpha_r, mtl, n_toks = feats["stop_r"], feats["alpha_r"], feats["mtl"], feats["token_ct"]
    len_norm = F.round(
        F.least(n_toks, F.lit(256)).cast("decimal(18,6)") / F.lit(256), 4
    ).cast("decimal(9,4)")

    def w(x):
        return F.lit(str(x)).cast("decimal(4,2)")

    return (
        w(QC_BIAS)
        + w(QC_W_STOP) * stop_r
        + w(QC_W_ALPHA) * alpha_r
        + w(QC_W_LEN) * len_norm
        + w(QC_W_MTL) * mtl
    ).cast("decimal(12,6)")


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: score = w·x + b over four document
    features, thresholded into keep/review/drop. The model is linear so
    the whole classifier is ONE codegen projection over the scan — the
    pattern a learned quality model (fastText, logistic regression)
    deploys as: broadcast coefficients, vectorized score, no shuffle at
    all. Feature ratios round at 4 dp (decimal) before the double dot
    product; the logit rounds at 4 dp so threshold comparisons are
    boundary-exact in both engines."""
    docs = load_table_spread(spark, sf_dir, "documents")
    logit = _qc_logit()

    def w(x):
        return F.lit(str(x)).cast("decimal(4,2)")

    return docs.select(
        "doc_id",
        logit.alias("quality_logit"),
        F.when(logit >= w(QC_KEEP), "keep")
        .when(logit >= w(QC_REVIEW), "review")
        .otherwise("drop")
        .alias("decision"),
    )


# Rejection sampling: acceptance probability = logit clamped into
# [REJ_P_FLOOR, 1]; the floor keeps a thin stochastic tail of low-quality
# text in the mix (the CCNet/FineWeb practice — hard-dropping everything
# below a threshold skews the distribution a learned filter was
# calibrated on). REJ_DEN makes the u < p comparison pure integers.
REJ_P_FLOOR = "0.05"
REJ_DEN = 1_000_000


def quality_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic quality filtering — keep each document with
    probability proportional to its model quality score (rejection
    sampling), the filter FineWeb/CCNet-style pipelines run instead of
    a hard threshold so the kept corpus preserves distributional
    diversity. The coin is deterministic (salted md5 of doc_id →
    uniform in [0, REJ_DEN)), so reruns and the oracle reproduce the
    exact sample; the accept test u < p*REJ_DEN is integer-vs-integer
    (the logit is decimal(12,6), so p*1e6 is integer-valued — no float
    ever decides a boundary). Plan shape: the whole decision is ONE
    codegen projection over the scan (score, clamp, hash, compare),
    then a per-lang aggregate — no shuffle before the final rollup, the
    same deploy shape as quality_classifier. Reports per language: docs
    seen, docs admitted, exact admit rate, chars admitted."""
    from ..functions import md5_bigint

    docs = load_table_spread(spark, sf_dir, "documents")
    p = F.least(
        F.greatest(_qc_logit(), F.lit(REJ_P_FLOOR).cast("decimal(12,6)")),
        F.lit("1").cast("decimal(12,6)"),
    )
    u = md5_bigint(F.col("doc_id").cast("string"), salt="rej:") % REJ_DEN
    admit_expr = u < (p * REJ_DEN).cast("long")
    adm_ct = F.sum(F.when(F.col("admitted"), 1).otherwise(0))
    return (
        docs.select("lang", "n_chars", admit_expr.alias("admitted"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_ct"),
            adm_ct.alias("admitted_ct"),
            (adm_ct.cast("decimal(18,6)") / F.count("*")).cast("decimal(9,6)").alias("admit_rate"),
            F.sum(F.when(F.col("admitted"), F.col("n_chars")).otherwise(0)).alias("chars_admitted"),
        )
        .orderBy("lang")
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: CJK character presence → zh, else the
    stopword-vote winner among {en, de, fr, es}; ties/no-votes → en.
    Deterministic, fully SQL-expressible — a learned identifier would
    slot in as a pandas_udf with this as fallback."""
    docs = load_table_spread(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    votes = {
        "en": ("the", "and", "of", "is"),
        "de": ("der", "und", "die", "ist"),
        "fr": ("le", "et", "les", "est"),
        "es": ("el", "y", "los", "es"),
    }
    toks = tokenize("text")

    def vote(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    has_cjk = F.regexp_count(F.col("text"), F.lit("[\\x{4e00}-\\x{9fff}]")) > 0
    en, de, fr, es = (vote(w) for w in votes.values())
    best = (
        F.when(has_cjk, "zh")
        .when((de > en) & (de >= fr) & (de >= es), "de")
        .when((fr > en) & (fr >= es), "fr")
        .when(es > en, "es")
        .otherwise("en")
    )
    return docs.select("doc_id", F.col("lang").alias("declared_lang"), best.alias("predicted_lang"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text plus a 32-bit
    polynomial rolling hash (base 31, mod 2^31-1) over the token stream —
    the building block for shift-resistant near-dup candidates."""
    docs = load_table_spread(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = tokenize("text")
    MOD = 2147483647
    poly = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.length(t) * 7 + F.ascii(t)) % MOD,
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_fp"),
        poly.alias("poly_fp"),
    )


def quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation readout: documents bucketed into quality deciles by VALUE
    RANGE with per-bucket corpus stats — the 'keep the top-N% of the
    corpus' primitive of a training-data pipeline.

    Scale design (replaces the round-1 global ntile, which forced every
    row through one task in an unpartitioned Window.orderBy sort): the
    nine decile cut points are exact percentile_disc aggregates — in
    Spark that is a map-side counts-map aggregation, bounded memory
    because the 4-dp-rounded score has ≤10^4 distinct values — and the
    1-row cut table broadcasts back onto the scan, so bucketing is a
    shuffle-free when-chain followed by a 10-group hash aggregate. Two
    passes over the corpus, zero global sorts. percentile_disc returns an
    actual data value (no interpolation arithmetic), so DuckDB's
    quantile_disc yields the bit-identical decimal cut and bucket
    boundaries compare exactly. Equal scores always share a bucket
    (range semantics), so deciles are only approximately equal-sized
    under heavy ties — the property a distributed curation filter wants
    anyway (no tie-split nondeterminism)."""
    scored = text_quality(spark, sf_dir)
    cuts = scored.agg(*[
        F.expr(f"percentile_disc({p / 10}) WITHIN GROUP (ORDER BY stopword_ratio)").alias(f"c{p}")
        for p in range(1, 10)
    ])
    decile = F.lit(1)
    for p in range(1, 10):
        decile = decile + F.when(F.col("stopword_ratio") > F.col(f"c{p}"), 1).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("doc_id", "token_ct", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("doc_ct"),
            F.sum("token_ct").alias("token_sum"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode) — the indexed-array surface the
    reference walks imperatively (display arrays iterated with their
    index, BaseLogApp2.java:140-151). Every token of a 1%-of-corpus
    subset with its 0-based position; the subset filter is pushed to
    the scan so the explode fan-out touches only selected rows."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select("doc_id", F.posexplode(tokenize("text")).alias("pos", "token"))
    )


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: the 20 most frequent tokens with doc
    frequency. The explode fans out in the scan stage and partial
    aggregation collapses each task's counts before the single
    (token)-keyed exchange; the top-20 plans as TakeOrderedAndProject
    (no global sort). Tiebreak on the token keeps ranks total."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(20)
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → sorted posting list of
    doc_ids — the search/retrieval primitive. Bounded here to the 10
    rarest tokens (smallest posting lists, token tiebreak) so posting
    arrays stay small in the result; at scale the posting lists would
    be written bucketed by token so lookups are partition-pruned. One
    shuffle (token), lists built with collect_set + array_sort for
    deterministic order."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("token")).dropDuplicates()
    return (
        toks.groupBy("token")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("postings"))
        .orderBy(F.size("postings").asc(), F.asc("token"))
        .limit(10)
    )


# PII patterns kept to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: ASCII classes, bounded repeats, \b, \d.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\d{10,}"


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass every training-data pipeline
    runs before a corpus ships: count and redact emails, IPv4s, and
    long digit runs (account/card-shaped numbers). The testdata corpus
    is synthetic and PII-free, so each document gets a deterministic
    doc_id-derived contact suffix appended first — the regexes are then
    exercised on every row and the redaction is verifiable end-to-end.

    Replacement order matters and is part of the contract: emails first
    (their local parts contain digits), then IPs, then bare digit runs.
    All scan-stage expressions — zero shuffles, redacted text never
    leaves the projection."""
    docs = load_table_spread(spark, sf_dir, "documents")
    suffixed = F.concat(
        F.lower("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ref 4111111111111111"),
    )
    base = docs.select("doc_id", suffixed.alias("txt"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>",
        ),
        LONGNUM_RE, "<NUM>",
    )
    return base.select(
        "doc_id",
        F.regexp_count(F.col("txt"), F.lit(EMAIL_RE)).alias("email_ct"),
        F.regexp_count(F.col("txt"), F.lit(IPV4_RE)).alias("ip_ct"),
        F.regexp_count(F.col("txt"), F.lit(LONGNUM_RE)).alias("longnum_ct"),
        F.length(redacted).alias("redacted_chars"),
        F.right(redacted, F.lit(40)).alias("redacted_tail"),
    )


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filtering (Rae et al. 2021,
    App. A — the rule set Dolma/RefinedWeb descend from), adapted to
    this corpus' token model: per document, the five applicable rules
    and the combined keep decision —

      f_words : 50 <= word count <= 100,000
      f_mtl   : 3 <= mean word length <= 10
      f_alpha : >= 80% of words contain an alphabetic character
      f_symbol: symbol-to-word ratio ('#' / '...') <= 0.1
      f_stop  : >= 2 distinct stop words present

    (the bullet-line / ellipsis-line rules need line structure the
    synthetic corpus lacks; on real data they join this projection as
    two more flags — same plan.) All ratios are 4-dp decimals compared
    against exact decimal literals, so the boundary decision is
    engine-identical. ONE codegen projection over the scan: no
    shuffle, no state, no Python."""
    return _gopher_flags(load_table_spread(spark, sf_dir, "documents"))


def _gopher_flags(docs: DataFrame) -> DataFrame:
    """The Gopher rule projection over any documents DataFrame — shared
    by gopher_quality_flags and the curation_funnel capstone."""
    toks = tokenize("text")
    word_ct = F.size(toks)

    def dec4(x):
        return F.round(x, 4).cast("decimal(9,4)")

    mtl = dec4(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("decimal(18,6)")
        / F.greatest(word_ct, F.lit(1))
    )
    alpha_word_r = dec4(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("decimal(18,6)")
        / F.greatest(word_ct, F.lit(1))
    )
    symbol_r = dec4(
        F.regexp_count(F.col("text"), F.lit(r"#|\.\.\.")).cast("decimal(18,6)")
        / F.greatest(word_ct, F.lit(1))
    )
    stop_distinct = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS]))
    )

    def d(x: str):
        return F.lit(x).cast("decimal(9,4)")

    out = docs.select(
        "doc_id",
        word_ct.alias("word_ct"),
        mtl.alias("mean_tok_len"),
        alpha_word_r.alias("alpha_word_r"),
        symbol_r.alias("symbol_r"),
        stop_distinct.alias("stop_distinct"),
    )
    f_words = (F.col("word_ct") >= GOPHER_MIN_WORDS) & (F.col("word_ct") <= GOPHER_MAX_WORDS)
    f_mtl = (F.col("mean_tok_len") >= d("3")) & (F.col("mean_tok_len") <= d("10"))
    f_alpha = F.col("alpha_word_r") >= d("0.8")
    f_symbol = F.col("symbol_r") <= d("0.1")
    f_stop = F.col("stop_distinct") >= 2
    return out.select(
        "*",
        f_words.alias("f_words"),
        f_mtl.alias("f_mtl"),
        f_alpha.alias("f_alpha"),
        f_symbol.alias("f_symbol"),
        f_stop.alias("f_stop"),
        (f_words & f_mtl & f_alpha & f_symbol & f_stop).alias("keep"),
    )


CCNET_Q1 = 1 / 3
CCNET_Q2 = 2 / 3


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): per-language
    LM-score terciles split the corpus into head / middle / tail — the
    partition CCNet feeds downstream so a pipeline can train on head,
    sample middle, drop tail. The LM signal is unigram_logprob's
    exactly-replayable score (lower = more typical text -> head).

    Plan: per-doc scores are one token-keyed aggregate + shuffle-
    reusing probe join (unigram_logprob's plan); the tercile cut
    points are exact percentile_disc aggregates PER LANGUAGE — a
    lang-count-sized table broadcast back over the scored docs (the
    quality_buckets recipe: no global sort, no ntile window; at 100 TB
    the only corpus-scale work is the scoring pass). Cut points are
    data values (disc, not interpolated), so the boundary docs compare
    exact-equal in both engines."""
    docs = load_table_spread(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = unigram_logprob(spark, sf_dir).join(docs, "doc_id")
    cuts = scored.groupBy("lang").agg(
        F.expr(
            f"percentile_disc({CCNET_Q1!r}) WITHIN GROUP (ORDER BY logprob_score)"
        ).alias("c1"),
        F.expr(
            f"percentile_disc({CCNET_Q2!r}) WITHIN GROUP (ORDER BY logprob_score)"
        ).alias("c2"),
    )
    bucket = (
        F.when(F.col("logprob_score") <= F.col("c1"), "head")
        .when(F.col("logprob_score") <= F.col("c2"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select("lang", bucket.alias("bucket"), "logprob_score", "tok_ct")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("doc_ct"),
            F.min("logprob_score").alias("min_score"),
            F.max("logprob_score").alias("max_score"),
            F.sum("tok_ct").alias("tok_sum"),
        )
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher/FineWeb-style filters that
    catch boilerplate and degenerate generations): per document, the
    fraction of tokens covered by the single most-repeated 3-gram and
    the distinct-token ratio. High top-3-gram fraction or a low distinct
    ratio flags template/spam pages a perplexity filter misses.

    Plan: 3-grams explode in the scan stage, one (doc_id, gram) hash
    aggregate with map-side partial counts, then a per-doc max — all
    count arithmetic in integers, ratios decimal-rounded at the edge."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = tokenize("text")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("token_ct"),
        F.size(F.array_distinct(toks)).alias("distinct_ct"),
        toks.alias("toks"),
    )
    grams = base.select(
        "doc_id", "token_ct", "distinct_ct",
        F.explode(
            F.when(
                F.size("toks") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 3)),
                ),
            ).otherwise(F.array(F.lit("")))
        ).alias("gram"),
    )
    top = (
        grams.groupBy("doc_id", "token_ct", "distinct_ct", "gram")
        .agg(F.count("*").alias("ct"))
        .groupBy("doc_id", "token_ct", "distinct_ct")
        .agg(F.max(F.when(F.col("gram") != "", F.col("ct")).otherwise(0)).alias("top_gram_ct"))
    )
    denom = F.greatest(F.col("token_ct"), F.lit(1))
    return top.select(
        "doc_id", "token_ct",
        F.round(F.col("distinct_ct").cast("decimal(18,6)") / denom, 4)
        .cast("decimal(9,4)").alias("distinct_ratio"),
        F.round((F.col("top_gram_ct") * 3).cast("decimal(18,6)") / denom, 4)
        .cast("decimal(9,4)").alias("top_trigram_frac"),
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the CCNet/KenLM perplexity
    filter reduced to its exactly-replayable unigram case: corpus token
    frequencies give p(tok) = ct/total, each document scores the mean of
    -ln p(token) over its tokens (lower = more typical text; rare-token
    gibberish scores high). Used as a curation signal the same way a
    real LM perplexity is, with the advantage that the oracle can replay
    it to the last bit.

    Plan: ONE token-keyed aggregate builds the frequency table (partial
    agg map-side); the exploded tokens join it ON THE SAME KEY, so the
    join reuses the aggregate's shuffle partitioning (no extra
    exchange on the freq side), with AQE skew-join splitting stopword
    hot keys; the corpus total is a 1-row broadcast. Per-token logs are
    rounded to 9 dp and summed as exact decimal, so per-doc means are
    order-independent and the DuckDB oracle hash-matches.

    The tokenize+explode subtree is deliberately evaluated twice (freq
    build + probe side) rather than materialized: at warehouse scale
    the exploded token table is LARGER than the source text, so
    re-scanning the column-pruned parquet beats persisting the
    explosion — the opposite trade from the dedup signature tables
    (3 longs/doc), which are smaller than their source and do get
    checkpointed."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("ct"))
    total = freq.agg(F.sum("ct").alias("total"))
    lp = F.round(
        -F.log(F.col("ct").cast("double") / F.col("total").cast("double")), 9
    ).cast("decimal(18,9)")
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("tok_ct"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias("logprob_score"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("hash", "vector", "stream")
BM25_TOP = 15


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus for a fixed term query —
    the classic lexical search scorer (idf × saturated tf, normalized
    by doc length vs the corpus average).

    Plan: the exploded token stream filters to the query terms BEFORE
    aggregating, so the tf table carries only matching docs (at 100 TB,
    a posting-list-sized fraction); doc lengths come from the same scan
    with no explode (size of the token array in the scan stage). One
    shuffle builds tf, the df/idf table is 3 rows (broadcast), the
    corpus stats are a 1-row broadcast, and the dl join keys on doc_id
    with the tf side small enough to broadcast. Top-15 plans as
    TakeOrderedAndProject.

    Determinism: the idf log is computed in ONE identical expression
    tree on both engines, the per-term contribution rounds to 9 dp and
    sums as exact decimal (the unigram_logprob recipe), so ranking and
    hashes match to the last bit."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    dl = docs.select("doc_id", F.size(tokenize("text")).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("tok_total")
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    avgdl = F.col("tok_total").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    contrib = F.round(
        idf
        * (F.col("tf").cast("double") * (BM25_K1 + 1.0))
        / (
            F.col("tf").cast("double")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * (F.col("dl").cast("double") / avgdl))
        ),
        9,
    ).cast("decimal(18,9)")
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", contrib.alias("contrib"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("matched_terms"),
            F.round(F.sum("contrib").cast("double"), 6).alias("bm25_score"),
        )
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


TFIDF_TOP = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the keyword-extraction /
    document-representation primitive. Document frequencies aggregate
    over the FULL corpus (tf is already unique per (doc, tok), so df is
    a plain count); the per-doc ranking window then runs only on a 2%
    doc subset to bound output. At scale both aggregates are
    partial/final hash aggs on token-derived keys (even partitioning),
    and the ranking window partitions by doc_id — many small
    partitions, no global sort. Scores round to 9 dp before ranking so
    both engines rank identical values; token tiebreak keeps the
    window total."""
    from pyspark.sql import Window

    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        9,
    ).cast("decimal(18,9)")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        tf.filter(F.col("doc_id") % 50 == 0)
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", F.col("tok").alias("token"), score.alias("tfidf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "rank", "token", "tfidf")
    )


BPE_TOP_MERGES = 20


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer training: corpus-weighted
    adjacent-symbol-pair frequencies over the word vocabulary, ranked —
    the argmax IS the first merge rule. (Full BPE training is a
    sequential merge loop — each iteration re-pairs the vocabulary with
    the previous winner fused, a driver loop over this same aggregate;
    one step is the oracle-checkable unit.)

    Plan: the vocabulary aggregate (token → count) collapses the corpus
    to unique words FIRST — pair explosion then runs over the vocab
    (bounded by distinct words, not corpus tokens), weighted by word
    count. Pure codegen expressions: chars via split, adjacent pairs
    via arrays_zip of two slices, one (pair)-keyed weighted sum."""
    docs = load_table_spread(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("wct"))
    )
    chars = F.split(F.col("tok"), "")
    n = F.size(chars)
    pairs = F.arrays_zip(
        F.slice(chars, 1, n - 1).alias("a"),
        F.slice(chars, 2, n - 1).alias("b"),
    )
    return (
        vocab.filter(n >= 2)
        .select("wct", F.explode(pairs).alias("p"))
        .select(F.concat(F.col("p.a"), F.col("p.b")).alias("pair"), "wct")
        .groupBy("pair")
        .agg(F.sum("wct").alias("pair_ct"))
        .orderBy(F.desc("pair_ct"), F.asc("pair"))
        .limit(BPE_TOP_MERGES)
    )


PPL_LAMBDA = 0.7     # bigram weight; 0.3 backs off to unigram
PPL_DOC_MOD = 25     # score every 25th doc (bounded gate output)


def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM trained
    on the corpus itself — the classic fluency/quality filter signal
    (spam and boilerplate sit at the distribution tails). p(t|prev) =
    l*bigram_mle + (1-l)*unigram_mle; ppl = exp(-mean log p).

    Plan: the token arrays build bigrams ARRAY-SIDE (two slices +
    arrays_zip, the BPE pairing trick) so the only corpus-scale
    shuffles are the two count aggregates (bigram + unigram vocab,
    both vocabulary-sized with map-side combine) and the scoring join,
    keyed on the bigram. Log terms round at 12 dp into DECIMAL sums —
    order-independent, so both engines hash-match."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = tokenize("text")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"),
    )
    big = (
        docs.filter(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )
    bigram_ct = big.groupBy("prev", "cur").agg(F.count("*").alias("bc"))
    unigram_ct = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("uc"))
    )
    prev_ct = unigram_ct.select(F.col("tok").alias("prev"), F.col("uc").alias("pc"))
    n_tot = unigram_ct.agg(F.sum("uc").alias("n_c"))
    p = (
        F.lit(PPL_LAMBDA) * (F.col("bc").cast("double") / F.col("pc").cast("double"))
        + F.lit(1.0 - PPL_LAMBDA) * (F.col("uc").cast("double") / F.col("n_c").cast("double"))
    )
    term = F.round(F.log(p), 12).cast("decimal(28,12)")
    return (
        big.filter(F.col("doc_id") % PPL_DOC_MOD == 0)
        .join(bigram_ct, ["prev", "cur"])
        .join(prev_ct, "prev")
        .join(unigram_ct.withColumnRenamed("tok", "cur"), "cur")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum(term).alias("logp_sum"))
        .select(
            "doc_id", "n_bigrams",
            F.round(
                F.exp(-(F.col("logp_sum").cast("double") / F.col("n_bigrams").cast("double"))),
                6,
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-distribution KL divergence against the whole
    corpus — the drift/diversity diagnostic a mixture-weight planner
    reads (a source with high KL is lexically unlike the corpus; near
    zero means redundant). KL(p_source || p_corpus) over the shared
    vocabulary (every source token also appears in the corpus
    distribution by construction, so no zero-denominator terms).

    Plan: one tokenize/explode scan feeding two aggregates (per-source
    per-token and corpus per-token) joined on token — the join keys on
    the token, so at 100 TB it shuffles vocab-sized data, not corpus-
    sized. Each KL term is rounded and summed in DECIMAL so the
    per-source sum is order-independent and the oracle hash-matches."""
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokenize("text")).alias("tok"))
    per_src = toks.groupBy("source", "tok").agg(F.count("*").alias("ct_s"))
    src_tot = per_src.groupBy("source").agg(F.sum("ct_s").alias("n_s"))
    corpus = toks.groupBy("tok").agg(F.count("*").alias("ct_c"))
    n_tot = corpus.agg(F.sum("ct_c").alias("n_c"))
    p_s = F.col("ct_s").cast("double") / F.col("n_s").cast("double")
    p_c = F.col("ct_c").cast("double") / F.col("n_c").cast("double")
    term = F.round(p_s * F.log(p_s / p_c), 12).cast("decimal(28,12)")
    return (
        per_src.join(F.broadcast(src_tot), "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sum(term).cast("double").alias("kl"),
        )
        .orderBy("source")
    )


DIVERSITY_NS = (1, 2, 3)


def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n corpus diversity per source — the distinct-1/2/3
    metric of Li et al. 2016 ("A Diversity-Promoting Objective
    Function for Neural Conversation Models") lifted from generations
    to corpus QA: for each source and n in {1,2,3}, the count of
    n-gram occurrences, the count of DISTINCT n-grams, and their ratio
    (a low distinct-3 ratio means templated/boilerplate text — the
    signal that complements repetition_stats' within-doc view with a
    cross-doc one). Same normalized tokenization as the span family
    (dedup._token_windows — one source of truth).

    Plan: ONE corpus scan; the three window arrays concat inline INSIDE
    the generator input (a Project between explode and its consumer
    kills whole-stage generator fusion — the 5x lesson), so the scan
    feeds explode -> partial hash agg on (source, n, gram) -> one
    shuffle. countDistinct expands to a two-phase distinct agg on the
    same key family; nothing corpus-sized crosses the exchange except
    the gram groups themselves, and at 100 TB the group key would be
    md5(gram) 16 bytes exactly like the span family."""
    docs = load_table_spread(spark, sf_dir, "documents")
    from .dedup import _token_windows

    def _tag(n):
        # single-parameter lambda on purpose: a 2-arg lambda would make
        # F.transform pass the ARRAY INDEX as the second argument.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    grams = docs.select(
        "source",
        F.explode(
            F.concat(*[
                F.transform(_token_windows(F.col("text"), n), _tag(n))
                for n in DIVERSITY_NS
            ])
        ).alias("w"),
    ).select("source", "w.n", "w.gram")
    ratio = F.round(
        F.col("distinct_ct").cast("decimal(18,6)") / F.col("total_ct"), 6
    ).cast("decimal(9,6)")
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count("*").alias("total_ct"),
            F.countDistinct("gram").alias("distinct_ct"),
        )
        .select("source", "n", "total_ct", "distinct_ct", ratio.alias("distinct_ratio"))
        .orderBy("source", "n")
    )


def _nfc_col(col):
    """Unicode NFC normalization — genuinely Python (Spark has no NFC
    built-in), so an Arrow-batched pandas_udf like the CJK segmenter
    (functions/cjk.py); unicodedata.normalize is vectorized per batch
    and blobs of text cross once, already column-pruned."""
    def _nfc(s):
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

    return F.pandas_udf(_nfc, "string")(col)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pre-dedup text cleanup: strip HTML-ish tags, NFC
    normalize, lowercase, collapse whitespace runs, trim. Emits per-doc
    before/after lengths and the md5 of the normalized text — the
    normalized fingerprint exact dedup keys on downstream.

    Every step except NFC is codegen (regexp_replace / lower / trim);
    NFC is the one honest Python stage (Arrow-batched). The DuckDB
    oracle replays the identical pipeline with its native
    nfc_normalize; cross-engine NFC agreement on non-ASCII is asserted
    in tests/test_graph_and_ranking.py against unicodedata directly."""
    docs = load_table_spread(spark, sf_dir, "documents")
    stripped = F.regexp_replace(F.col("text"), "<[^>]*>", " ")
    norm = F.trim(F.regexp_replace(F.lower(_nfc_col(stripped)), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


BPE_TRAIN_MERGES = 8


def _bpe_vocab_from_docs(docs: DataFrame) -> DataFrame:
    """Word vocabulary with symbol strings over an explicit docs table —
    the docs-parameterized base the index_store's subset builds and
    refresh segmentation share with the full-corpus path."""
    return (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("wct"))
        .select(
            "tok", "wct",
            F.concat(F.lit(" "), F.regexp_replace("tok", "(.)", "$1 ")).alias("syms"),
        )
    )


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word vocabulary with symbol strings: (tok, wct, syms) where syms
    is the space-delimited symbol sequence ' c1 c2 ... cn ' (leading and
    trailing space so merge patterns match at word edges)."""
    return _bpe_vocab_from_docs(load_table_spread(spark, sf_dir, "documents"))


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-symbol-pair counts over the vocabulary's
    current symbol sequences. Pure codegen: split on single spaces,
    adjacent pairs via arrays_zip of two slices, one weighted sum."""
    s = F.split(F.trim(F.col("syms")), " ")
    n = F.size(s)
    pairs = F.arrays_zip(
        F.slice(s, 1, n - 1).alias("lhs"),
        F.slice(s, 2, n - 1).alias("rhs"),
    )
    return (
        vocab.filter(n >= 2)
        .select("wct", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("wct").alias("pair_ct"))
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE tokenizer training loop (BPE_TRAIN_MERGES sequential
    merges), the way production trainers run it: collapse the corpus to
    word counts ONCE (the only corpus-scale shuffle — HuggingFace /
    SentencePiece trainers do exactly this collapse), then iterate over
    the vocabulary: count adjacent-symbol pairs weighted by word count,
    pick the argmax (count DESC, then lexicographic lhs/rhs — fully
    deterministic), fuse it everywhere, repeat. Returns the learned
    merge table (step, lhs, rhs, merged, pair_ct) — the trained
    artifact a tokenizer ships.

    The per-iteration argmax is a 1-row collect (like k-means
    centroids, clustering.py); each iteration's pair count runs over
    the vocab (distinct words, not corpus tokens), so at 100 TB the
    loop cost is independent of corpus size after the first aggregate.

    Merge semantics are defined as TWO sequential non-overlapping
    leftmost string replaces of ' lhs rhs ' -> ' lhsrhs ' — Spark's
    replace() and DuckDB's replace() scan identically (verified:
    ' a b a b a b ' -> ' ab a b ab ' on both), so the unrolled oracle
    replays the loop exactly. Two fixed passes (not replace-to-
    fixpoint) keep the operator a finite expression; the pass-2 catch
    re-merges occurrences whose leading space pass 1 consumed."""
    rules, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, pair_ct bigint"
    ).orderBy("step")


def _bpe_train_on(vocab: DataFrame):
    """The core training loop over an explicit (tok, wct, syms) vocab:
    returns (merge rules, final vocab DF with merged symbol
    sequences)."""
    vocab = vocab.localCheckpoint()
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, BPE_TRAIN_MERGES + 1):
        best = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("pair_ct"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, ct = best[0].lhs, best[0].rhs, int(best[0].pair_ct)
        rules.append((step, lhs, rhs, lhs + rhs, ct))
        vocab = vocab.select(
            "tok", "wct", _bpe_fuse(F.col("syms"), lhs, rhs).alias("syms")
        )
    return rules, vocab


# Batched trainer constants: up to BPE_BATCH_MERGES merges learned in at
# most BPE_BATCH_ROUNDS corpus-vocabulary scans, selecting from the top
# BPE_BATCH_K candidates per scan. The round budget is part of the
# operator's definition (not a tuning knob) so the unrolled oracle and
# the Spark loop terminate identically on ANY corpus.
BPE_BATCH_MERGES = 64
BPE_BATCH_K = 32
BPE_BATCH_ROUNDS = 14


def _bpe_select_batch(cands):
    """Rank-window conflict-free subset of one scan's top-K candidates:
    the candidate at rank r survives iff NO candidate at rank q<r in the
    same window shares a symbol with it — where "shares" covers the
    earlier candidate's lhs, rhs, AND its MERGED symbol lhs+rhs (an
    earlier fuse of ('a','b') creates new 'ab' tokens, so a later
    ('ab','x') in the same window would see adjacencies the scan never
    counted — excluding the merged symbol keeps every kept merge's
    scan-time pair count exact). Comparing against ALL earlier-ranked
    candidates — not just the kept ones — is deliberately conservative:
    it drops slightly more merges per round than greedy-against-kept,
    but it is expressible as a single NOT EXISTS anti-join in the
    DuckDB oracle (greedy needs recursion). Disjoint symbol sets make
    the kept merges' pair counts and fuse rewrites independent of each
    other, so applying them in rank order equals applying each against
    the scan-time vocabulary."""
    kept = []
    for i, c in enumerate(cands):
        if all(
            e.lhs not in (c.lhs, c.rhs)
            and e.rhs not in (c.lhs, c.rhs)
            and (e.lhs + e.rhs) not in (c.lhs, c.rhs)
            for e in cands[:i]
        ):
            kept.append(c)
    return kept


def _bpe_train_batched_on(
    vocab: DataFrame,
    n_merges: int = BPE_BATCH_MERGES,
    batch_k: int = BPE_BATCH_K,
    rounds: int = BPE_BATCH_ROUNDS,
):
    """Batched BPE training: ONE top-K collect per vocabulary scan
    instead of one argmax collect per merge — training N merges costs
    O(N / kept-per-round) Spark jobs, the fix for the sequential
    trainer's driver-side bottleneck (VERDICT r7: 30k merges must not
    mean 30k sequential jobs). Per round: scan pair counts once, take
    the deterministic top-K (count DESC, lhs, rhs), keep the
    rank-window conflict-free subset (_bpe_select_batch), fuse the kept
    merges in rank order, checkpoint the vocab so next round's scan
    doesn't replay the replace chain. Returns
    (rules [(step, round, lhs, rhs, merged, pair_ct)], final vocab)."""
    vocab = vocab.localCheckpoint()
    rules: list[tuple[int, int, str, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        if len(rules) >= n_merges:
            break
        cands = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("pair_ct"), F.asc("lhs"), F.asc("rhs"))
            .limit(batch_k)
            .collect()
        )
        if not cands:
            break
        kept = _bpe_select_batch(cands)[: n_merges - len(rules)]
        col = F.col("syms")
        for c in kept:
            rules.append((len(rules) + 1, rnd, c.lhs, c.rhs, c.lhs + c.rhs, int(c.pair_ct)))
            col = _bpe_fuse(col, c.lhs, c.rhs)
        vocab = vocab.select("tok", "wct", col.alias("syms")).localCheckpoint()
    return rules, vocab


def bpe_train_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for BPE training (sequential twin:
    bpe_train_merges): learn up to BPE_BATCH_MERGES merges in at most
    BPE_BATCH_ROUNDS scans, one top-BPE_BATCH_K collect per scan. The
    reported pair_ct of every kept merge is its count at the START of
    its round — exact, because kept merges within a round have disjoint
    symbol sets. tests/test_text_ops.py asserts the job economics: the
    64-merge run stays under a job budget far below 64 jobs."""
    rules, _ = _bpe_train_batched(spark, sf_dir)
    return spark.createDataFrame(
        rules,
        "step int, round int, lhs string, rhs string, merged string, pair_ct bigint",
    ).orderBy("step")


_BPE_BATCH_CACHE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _bpe_train_batched(spark: SparkSession, sf_dir: str):
    """Memoized batched training over the corpus vocabulary (same
    session-memo pattern as _bpe_train)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_BATCH_CACHE:
        for k in [k for k in _BPE_BATCH_CACHE if k[0] != key[0]]:
            del _BPE_BATCH_CACHE[k]
        rules, vocab = _bpe_train_batched_on(_bpe_vocab(spark, sf_dir))
        _BPE_BATCH_CACHE[key] = (rules, vocab)
    return _BPE_BATCH_CACHE[key]


def _bpe_fuse(col, lhs: str, rhs: str):
    """One merge rule as an expression: two sequential non-overlapping
    leftmost replaces of ' lhs rhs ' -> ' lhsrhs ' — shared by the
    training fuse and the frozen-rule replay (_bpe_apply_rules), so the
    two can never drift."""
    pat, rep = F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}{rhs} ")
    return F.replace(F.replace(col, pat, rep), pat, rep)


def _bpe_apply_rules(vocab: DataFrame, rules) -> DataFrame:
    """Apply a FROZEN merge-rule chain to a (.., syms) table — the
    read/refresh side of a trained tokenizer: new words segment through
    the stored rules in training order, no retraining (exactly how a
    shipped tokenizer treats out-of-vocabulary words)."""
    col = F.col("syms")
    for _step, lhs, rhs, _merged, _ct in rules:
        col = _bpe_fuse(col, lhs, rhs)
    return vocab.withColumn("syms", col)


# Session memo: three consumers (bpe_train_merges, bpe_doc_tokens,
# tokenizer_fertility) previously each re-ran the full training loop —
# BPE_TRAIN_MERGES sequential 1-row collects per call.
_BPE_TRAIN_CACHE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _bpe_train(spark: SparkSession, sf_dir: str):
    """The shared training loop: returns (merge rules, final vocab DF
    with the merged symbol sequences), memoized per (application,
    corpus) — the trained tokenizer is a build-once artifact like the
    IVF quantizer (and the index_store persists it)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_TRAIN_CACHE:
        for k in [k for k in _BPE_TRAIN_CACHE if k[0] != key[0]]:
            del _BPE_TRAIN_CACHE[k]
        rules, vocab = _bpe_train_on(_bpe_vocab(spark, sf_dir))
        _BPE_TRAIN_CACHE[key] = (rules, vocab.localCheckpoint())
    return _BPE_TRAIN_CACHE[key]


BPE_DOC_MOD = 10


def bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level tokenizer application: per doc, word count vs
    BPE-piece count and the compression ratio — the token-budget
    numbers an epoch planner needs AFTER training a tokenizer (char
    count over-estimates, whitespace words under-estimate).

    The trick that scales: documents join the MERGED VOCABULARY (token
    -> n_pieces), so the merge chain never re-runs per corpus token —
    one explode, one vocab-keyed join (vocab is small: broadcast), one
    doc-keyed aggregate. This is how a trained tokenizer is applied in
    production: segment the vocab once, look up."""
    _, vocab = _bpe_train(spark, sf_dir)
    pieces = vocab.select(
        "tok", F.size(F.split(F.trim(F.col("syms")), " ")).alias("n_pieces")
    )
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("doc_id") % BPE_DOC_MOD == 0)
        .select("doc_id", F.explode(tokenize("text")).alias("tok"))
    )
    ratio = F.round(
        F.col("piece_ct").cast("double") / F.col("word_ct").cast("double"), 6
    )
    return (
        toks.join(F.broadcast(pieces), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("word_ct"),
            F.sum("n_pieces").alias("piece_ct"),
        )
        .select("doc_id", "word_ct", "piece_ct", ratio.alias("pieces_per_word"))
        .orderBy("doc_id")
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — pieces-per-word of the trained
    BPE tokenizer per lang slice (the standard multilingual-tokenizer
    QA metric: a vocabulary trained on skewed data over-segments the
    low-resource languages, inflating their token cost; see e.g. the
    fertility tables of Rust et al. 2021, "How Good is Your
    Tokenizer?"). High fertility for a language means its documents
    burn budget — the number an assemble_training_mix planner corrects
    with.

    Plan: same apply-by-lookup shape as bpe_doc_tokens — the merge
    chain runs once over the VOCAB (distinct words), documents explode
    once and broadcast-join the token->pieces table, then ONE
    lang-keyed aggregate (map-side partial; ~languages rows out). The
    corpus-scale work is a single explode+join pass regardless of merge
    count."""
    _, vocab = _bpe_train(spark, sf_dir)
    pieces = vocab.select(
        "tok", F.size(F.split(F.trim(F.col("syms")), " ")).alias("n_pieces")
    )
    docs = load_table_spread(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokenize("text")).alias("tok"))
    fert = F.round(
        F.col("piece_ct").cast("double") / F.col("word_ct").cast("double"), 6
    )
    return (
        toks.join(F.broadcast(pieces), "tok")
        .groupBy("lang")
        .agg(
            F.count("*").alias("word_ct"),
            F.sum("n_pieces").alias("piece_ct"),
            F.countDistinct("tok").alias("distinct_word_ct"),
        )
        .select(
            "lang", "word_ct", "piece_ct", "distinct_word_ct",
            fert.alias("pieces_per_word"),
        )
        .orderBy("lang")
    )


BPE_VOCAB_TOP = 50


def bpe_segmented_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of the trained tokenizer: the BPE_VOCAB_TOP most
    frequent words with their post-training symbol segmentation and
    piece count — i.e. how the learned merges actually tokenize the
    corpus (the compression a token-budget planner reads). Distributed
    exactly like training: the merge chain is a nested codegen
    expression over the vocab, no Python in the path."""
    _, vocab = _bpe_train(spark, sf_dir)
    return (
        vocab.select(
            "tok", "wct",
            F.trim(F.col("syms")).alias("pieces"),
            F.size(F.split(F.trim(F.col("syms")), " ")).alias("n_pieces"),
        )
        .orderBy(F.desc("wct"), F.asc("tok"))
        .limit(BPE_VOCAB_TOP)
    )


def _bpe_train_oracle(n_merges: int, tail: str | None = None) -> str:
    """Unrolled-CTE replay of the BPE training loop (the supplier_
    pagerank / IVF-quantizer pattern): per iteration, pair counts from
    the split symbol strings, a deterministic argmax, and the same
    two-pass replace fuse."""
    parts = ["""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), vocab0 AS (
        SELECT tok, COUNT(*) AS wct,
               ' ' || regexp_replace(tok, '(.)', '\\1 ', 'g') AS syms
        FROM toks GROUP BY tok
    )"""]
    for i in range(1, n_merges + 1):
        parts.append(f""", split{i} AS (
        SELECT wct, string_split(trim(syms), ' ') AS s FROM vocab{i - 1}
    ), pairs{i} AS (
        SELECT s[CAST(g.i AS INTEGER)] AS lhs, s[CAST(g.i AS INTEGER) + 1] AS rhs, wct
        FROM split{i}, unnest(range(1, len(s))) AS g(i)
    ), best{i} AS (
        SELECT lhs, rhs, CAST(SUM(wct) AS BIGINT) AS pair_ct
        FROM pairs{i} GROUP BY lhs, rhs
        ORDER BY pair_ct DESC, lhs ASC, rhs ASC LIMIT 1
    ), vocab{i} AS (
        -- LEFT JOIN pass-through: if a step finds no pairs (vocab fully
        -- merged), best{i} is empty and the vocabulary must flow on
        -- unchanged, matching the Python loop's break.
        SELECT v.tok, v.wct,
               CASE WHEN b.lhs IS NULL THEN v.syms
                    ELSE replace(replace(v.syms, ' ' || b.lhs || ' ' || b.rhs || ' ',
                                                 ' ' || b.lhs || b.rhs || ' '),
                                 ' ' || b.lhs || ' ' || b.rhs || ' ',
                                 ' ' || b.lhs || b.rhs || ' ')
               END AS syms
        FROM vocab{i - 1} v LEFT JOIN best{i} b ON TRUE
    )""")
    if tail is None:
        rules = "\n    UNION ALL ".join(
            f"SELECT {i} AS step, lhs, rhs, lhs || rhs AS merged, pair_ct FROM best{i}"
            for i in range(1, n_merges + 1)
        )
        tail = f"{rules}\n    ORDER BY step"
    parts.append(f"\n    {tail}\n    ")
    return "".join(parts)


def _bpe_batched_oracle() -> str:
    """Unrolled-CTE replay of the BATCHED training loop: per round, pair
    counts, a ranked top-K window, the rank-window conflict anti-join
    (NOT EXISTS earlier-ranked candidate sharing a symbol — the exact
    mirror of _bpe_select_batch), and a list_reduce fold applying the
    kept merges in rank order with the same two-pass fuse."""
    fuse = (
        "replace(replace(acc, ' ' || p || ' ', ' ' || replace(p, ' ', '') || ' '),"
        " ' ' || p || ' ', ' ' || replace(p, ' ', '') || ' ')"
    )
    parts = ["""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), vocab0 AS (
        SELECT tok, COUNT(*) AS wct,
               ' ' || regexp_replace(tok, '(.)', '\\1 ', 'g') AS syms
        FROM toks GROUP BY tok
    )"""]
    for r in range(1, BPE_BATCH_ROUNDS + 1):
        parts.append(f""", split{r} AS (
        SELECT wct, string_split(trim(syms), ' ') AS s FROM vocab{r - 1}
    ), pairs{r} AS (
        SELECT s[CAST(g.i AS INTEGER)] AS lhs, s[CAST(g.i AS INTEGER) + 1] AS rhs, wct
        FROM split{r}, unnest(range(1, len(s))) AS g(i)
    ), cand{r} AS MATERIALIZED (
        -- MATERIALIZED: cand/keep/vocab are each referenced more than
        -- once; DuckDB 1.0 inlines CTEs, and an inlined round chain
        -- re-evaluates vocab{{0..r-1}} exponentially (measured: the
        -- un-materialized 8-round unroll did not finish in 500 s).
        SELECT lhs, rhs, pair_ct,
               row_number() OVER (ORDER BY pair_ct DESC, lhs ASC, rhs ASC) AS rk
        FROM (SELECT lhs, rhs, CAST(SUM(wct) AS BIGINT) AS pair_ct
              FROM pairs{r} GROUP BY lhs, rhs)
        QUALIFY rk <= {BPE_BATCH_K}
    ), keep{r} AS MATERIALIZED (
        SELECT c.lhs, c.rhs, c.pair_ct, c.rk FROM cand{r} c
        WHERE NOT EXISTS (
            SELECT 1 FROM cand{r} e WHERE e.rk < c.rk
            AND (e.lhs IN (c.lhs, c.rhs) OR e.rhs IN (c.lhs, c.rhs)
                 OR (e.lhs || e.rhs) IN (c.lhs, c.rhs)))
    ), ms{r} AS (
        SELECT COALESCE(list(lhs || ' ' || rhs ORDER BY rk), []) AS ms FROM keep{r}
    ), vocab{r} AS MATERIALIZED (
        SELECT v.tok, v.wct,
               list_reduce(list_prepend(v.syms, m.ms), (acc, p) -> {fuse}) AS syms
        FROM vocab{r - 1} v CROSS JOIN ms{r} m
    )""")
    union = "\n        UNION ALL ".join(
        f"SELECT {r} AS rnd, rk, lhs, rhs, pair_ct FROM keep{r}"
        for r in range(1, BPE_BATCH_ROUNDS + 1)
    )
    parts.append(f""", allkeep AS (
        {union}
    ), stepped AS (
        SELECT CAST(row_number() OVER (ORDER BY rnd ASC, rk ASC) AS INTEGER) AS step,
               CAST(rnd AS INTEGER) AS round, lhs, rhs,
               lhs || rhs AS merged, pair_ct
        FROM allkeep
    )
    SELECT step, round, lhs, rhs, merged, pair_ct
    FROM stepped WHERE step <= {BPE_BATCH_MERGES}
    ORDER BY step
    """)
    return "".join(parts)


QUERIES = {
    "unigram_logprob": unigram_logprob,
    "bm25_rank": bm25_rank,
    "tfidf_top_terms": tfidf_top_terms,
    "bpe_merge_candidates": bpe_merge_candidates,
    "bpe_train_merges": bpe_train_merges,
    "bpe_train_merges_batched": bpe_train_merges_batched,
    "bpe_segmented_vocab": bpe_segmented_vocab,
    "bpe_doc_tokens": bpe_doc_tokens,
    "source_kl_divergence": source_kl_divergence,
    "doc_perplexity": doc_perplexity,
    "text_normalize": text_normalize,
    "token_count": token_count,
    "text_quality": text_quality,
    "quality_classifier": quality_classifier,
    "quality_rejection_sample": quality_rejection_sample,
    "top_tokens": top_tokens,
    "inverted_index": inverted_index,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "quality_buckets": quality_buckets,
    "token_positions": token_positions,
    "redact_pii": redact_pii,
    "repetition_stats": repetition_stats,
    "gopher_quality_flags": gopher_quality_flags,
    "ccnet_perplexity_buckets": ccnet_perplexity_buckets,
    "ngram_diversity": ngram_diversity,
    "tokenizer_fertility": tokenizer_fertility,
}

_STOP_LIST = "['the','a','of','and','to','in','is','it','for','on']"

# SQL twin of _quality_features — the single feature definition both the
# text_quality and quality_classifier oracles build on. COALESCE guards
# list_sum's empty-list NULL (a zero-token doc must score mtl=0 exactly
# like Spark's aggregate fold, not NULL).
_DUCK_QUALITY_F = f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
               length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha_ct,
               length(text) AS char_ct
        FROM documents
    ), f AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS token_ct,
               CAST(ROUND(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DECIMAL(18,6))
                    / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS stop_r,
               CAST(ROUND(CAST(alpha_ct AS DECIMAL(18,6)) / GREATEST(char_ct, 1), 4) AS DECIMAL(9,4)) AS alpha_r,
               CAST(ROUND(CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS DECIMAL(18,6))
                    / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS mtl
        FROM t
    )
"""

ORACLES = {
    "bpe_train_merges": _bpe_train_oracle(BPE_TRAIN_MERGES),
    "bpe_train_merges_batched": _bpe_batched_oracle(),
    "bpe_doc_tokens": _bpe_train_oracle(
        BPE_TRAIN_MERGES,
        f"""SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS word_ct,
               CAST(SUM(n_pieces) AS BIGINT) AS piece_ct,
               ROUND(CAST(SUM(n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS pieces_per_word
    FROM (
        SELECT d.doc_id, p.n_pieces
        FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents WHERE doc_id % {BPE_DOC_MOD} = 0
        ) d
        JOIN (
            SELECT tok, len(string_split(trim(syms), ' ')) AS n_pieces
            FROM vocab{BPE_TRAIN_MERGES}
        ) p ON d.tok = p.tok
    )
    GROUP BY doc_id
    ORDER BY doc_id""",
    ),
    "bpe_segmented_vocab": _bpe_train_oracle(
        BPE_TRAIN_MERGES,
        f"""SELECT tok, CAST(wct AS BIGINT) AS wct, trim(syms) AS pieces,
               CAST(len(string_split(trim(syms), ' ')) AS INTEGER) AS n_pieces
    FROM vocab{BPE_TRAIN_MERGES}
    ORDER BY wct DESC, tok ASC LIMIT {BPE_VOCAB_TOP}""",
    ),
    "tokenizer_fertility": _bpe_train_oracle(
        BPE_TRAIN_MERGES,
        f"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS word_ct,
               CAST(SUM(n_pieces) AS BIGINT) AS piece_ct,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_word_ct,
               ROUND(CAST(SUM(n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS pieces_per_word
    FROM (
        SELECT d.lang, d.tok, p.n_pieces
        FROM (
            SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM documents
        ) d
        JOIN (
            SELECT tok, len(string_split(trim(syms), ' ')) AS n_pieces
            FROM vocab{BPE_TRAIN_MERGES}
        ) p ON d.tok = p.tok
    )
    GROUP BY lang
    ORDER BY lang""",
    ),
    "doc_perplexity": f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
        FROM documents
    ), big AS (
        SELECT doc_id, toks[CAST(g.i AS INTEGER)] AS prev, toks[CAST(g.i AS INTEGER) + 1] AS cur
        FROM toks, unnest(range(1, len(toks))) AS g(i)
        WHERE len(toks) >= 2
    ), bigram_ct AS (
        SELECT prev, cur, COUNT(*) AS bc FROM big GROUP BY 1, 2
    ), unigram_ct AS (
        SELECT tok, COUNT(*) AS uc
        FROM (SELECT unnest(toks) AS tok FROM toks)
        GROUP BY 1
    ), n_tot AS (
        SELECT CAST(SUM(uc) AS BIGINT) AS n_c FROM unigram_ct
    ), scored AS (
        SELECT b.doc_id,
               CAST(ROUND(ln(
                   {PPL_LAMBDA} * (CAST(bg.bc AS DOUBLE) / CAST(pv.uc AS DOUBLE))
                   + {1.0 - PPL_LAMBDA} * (CAST(cu.uc AS DOUBLE) / CAST(n.n_c AS DOUBLE))
               ), 12) AS DECIMAL(28,12)) AS term
        FROM big b
        JOIN bigram_ct bg ON b.prev = bg.prev AND b.cur = bg.cur
        JOIN unigram_ct pv ON b.prev = pv.tok
        JOIN unigram_ct cu ON b.cur = cu.tok, n_tot n
        WHERE b.doc_id % {PPL_DOC_MOD} = 0
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(exp(-(CAST(SUM(term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))), 6) AS ppl
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    "source_kl_divergence": """
    WITH toks AS (
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), per_src AS (
        SELECT source, tok, COUNT(*) AS ct_s FROM toks GROUP BY 1, 2
    ), src_tot AS (
        SELECT source, CAST(SUM(ct_s) AS BIGINT) AS n_s FROM per_src GROUP BY 1
    ), corpus AS (
        SELECT tok, COUNT(*) AS ct_c FROM toks GROUP BY 1
    ), n_tot AS (
        SELECT CAST(SUM(ct_c) AS BIGINT) AS n_c FROM corpus
    )
    SELECT p.source,
           CAST(MAX(s.n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CAST(ROUND(
               (CAST(p.ct_s AS DOUBLE) / CAST(s.n_s AS DOUBLE))
               * ln((CAST(p.ct_s AS DOUBLE) / CAST(s.n_s AS DOUBLE))
                    / (CAST(c.ct_c AS DOUBLE) / CAST(n.n_c AS DOUBLE))), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS kl
    FROM per_src p
    JOIN src_tot s ON p.source = s.source
    JOIN corpus c ON p.tok = c.tok, n_tot n
    GROUP BY p.source
    ORDER BY p.source
    """,
    "text_normalize": r"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS raw_len,
           CAST(length(norm) AS INTEGER) AS norm_len,
           md5(norm) AS norm_md5
    FROM (
        SELECT doc_id, text,
               trim(regexp_replace(lower(nfc_normalize(
                   regexp_replace(text, '<[^>]*>', ' ', 'g'))), '\s+', ' ', 'g')) AS norm
        FROM documents
    )
    """,
    "bpe_merge_candidates": """
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), vocab AS (
        SELECT tok, COUNT(*) AS wct FROM toks GROUP BY tok
    ), pairs AS (
        SELECT wct, substr(tok, CAST(gs.i AS INTEGER), 2) AS pair
        FROM vocab, unnest(range(1, length(tok))) AS gs(i)
        WHERE length(tok) >= 2
    )
    SELECT pair, CAST(SUM(wct) AS BIGINT) AS pair_ct
    FROM pairs GROUP BY pair
    ORDER BY pair_ct DESC, pair ASC
    LIMIT 20
    """,
    "bm25_rank": """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), dl AS (
        SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
        FROM documents
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tok_total FROM dl
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE tok IN ('hash', 'vector', 'stream')
        GROUP BY doc_id, tok
    ), dfreq AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), scored AS (
        SELECT t.doc_id,
               CAST(ROUND(
                   ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                            / (CAST(f.df AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * 2.2)
                   / (CAST(t.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                              / (CAST(s.tok_total AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))),
                   9) AS DECIMAL(18,9)) AS contrib
        FROM tf t JOIN dfreq f USING (tok) JOIN dl d USING (doc_id), stats s
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS matched_terms,
           ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS bm25_score
    FROM scored GROUP BY doc_id
    ORDER BY bm25_score DESC, doc_id ASC
    LIMIT 15
    """,
    "tfidf_top_terms": """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), dfreq AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT t.doc_id, t.tok AS token,
               CAST(ROUND(CAST(t.tf AS DOUBLE)
                    * ln(CAST(n.n_docs AS DOUBLE) / CAST(f.df AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS tfidf
        FROM tf t JOIN dfreq f USING (tok), n
        WHERE t.doc_id % 50 = 0
    )
    SELECT doc_id, rank, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    "unigram_logprob": """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), freq AS (
        SELECT tok, COUNT(*) AS ct FROM toks GROUP BY tok
    ), tot AS (
        SELECT SUM(ct) AS total FROM freq
    ), scored AS (
        SELECT t.doc_id,
               CAST(ROUND(-ln(CAST(f.ct AS DOUBLE) / CAST(tot.total AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS lp
        FROM toks t JOIN freq f USING (tok), tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tok_ct,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS logprob_score
    FROM scored GROUP BY doc_id
    """,
    "gopher_quality_flags": f"""
    WITH t AS (
        SELECT doc_id, text,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS word_ct,
               CAST(ROUND(CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS DECIMAL(18,6))
                    / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS mean_tok_len,
               CAST(ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DECIMAL(18,6))
                    / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS alpha_word_r,
               CAST(ROUND(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DECIMAL(18,6))
                    / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS symbol_r,
               CAST(len(list_intersect(list_distinct(toks), {_STOP_LIST})) AS INTEGER) AS stop_distinct
        FROM t
    ), fl AS (
        SELECT *,
               (word_ct >= {GOPHER_MIN_WORDS} AND word_ct <= {GOPHER_MAX_WORDS}) AS f_words,
               (mean_tok_len >= 3 AND mean_tok_len <= 10) AS f_mtl,
               (alpha_word_r >= CAST('0.8' AS DECIMAL(9,4))) AS f_alpha,
               (symbol_r <= CAST('0.1' AS DECIMAL(9,4))) AS f_symbol,
               (stop_distinct >= 2) AS f_stop
        FROM m
    )
    SELECT *, (f_words AND f_mtl AND f_alpha AND f_symbol AND f_stop) AS keep FROM fl
    """,
    "ngram_diversity": """
    WITH toks AS (
        SELECT source,
               list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ), grams AS (
"""
    + "\n        UNION ALL\n".join(
        f"""        SELECT source, CAST({n} AS INTEGER) AS n,
               unnest(CASE WHEN len(toks) >= {n} THEN
                   [array_to_string(toks[i:i+{n} - 1], ' ')
                    for i in range(1, len(toks) - {n} + 2)]
               ELSE [] END) AS gram
        FROM toks"""
        for n in DIVERSITY_NS
    )
    + """
    )
    SELECT source, n, CAST(COUNT(*) AS BIGINT) AS total_ct,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ct,
           CAST(ROUND(CAST(COUNT(DISTINCT gram) AS DECIMAL(18,6)) / COUNT(*), 6)
                AS DECIMAL(9,6)) AS distinct_ratio
    FROM grams GROUP BY source, n
    ORDER BY source, n
    """,
    "ccnet_perplexity_buckets": f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ), freq AS (
        SELECT tok, COUNT(*) AS ct FROM toks GROUP BY tok
    ), tot AS (
        SELECT SUM(ct) AS total FROM freq
    ), lp AS (
        SELECT t.doc_id,
               CAST(ROUND(-ln(CAST(f.ct AS DOUBLE) / CAST(tot.total AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS lp
        FROM toks t JOIN freq f USING (tok), tot
    ), scored AS (
        SELECT s.doc_id, s.tok_ct, s.logprob_score, d.lang
        FROM (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tok_ct,
                   ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS logprob_score
            FROM lp GROUP BY doc_id
        ) s JOIN documents d USING (doc_id)
    ), cuts AS (
        SELECT lang,
               quantile_disc(logprob_score, {CCNET_Q1!r}) AS c1,
               quantile_disc(logprob_score, {CCNET_Q2!r}) AS c2
        FROM scored GROUP BY lang
    )
    SELECT s.lang,
           CASE WHEN s.logprob_score <= c.c1 THEN 'head'
                WHEN s.logprob_score <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           MIN(s.logprob_score) AS min_score,
           MAX(s.logprob_score) AS max_score,
           CAST(SUM(s.tok_ct) AS BIGINT) AS tok_sum
    FROM scored s JOIN cuts c USING (lang)
    GROUP BY 1, 2
    """,
    "token_count": """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS INTEGER) AS ws_token_ct,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_token_ct,
               CAST(length(text) AS INTEGER) AS char_ct
        FROM documents
    """,
    "text_quality": _DUCK_QUALITY_F + """
        SELECT doc_id, token_ct,
               stop_r AS stopword_ratio,
               alpha_r AS alpha_ratio,
               mtl AS mean_token_len
        FROM f
    """,
    "quality_classifier": _DUCK_QUALITY_F + f"""
        , s AS (
            SELECT doc_id,
                   CAST(ROUND(CAST(LEAST(token_ct, 256) AS DECIMAL(18,6)) / 256, 4) AS DECIMAL(9,4)) AS len_norm,
                   CAST(CAST('{QC_BIAS}' AS DECIMAL(4,2))
                        + CAST('{QC_W_STOP}' AS DECIMAL(4,2)) * stop_r
                        + CAST('{QC_W_ALPHA}' AS DECIMAL(4,2)) * alpha_r
                        + CAST('{QC_W_LEN}' AS DECIMAL(4,2)) * len_norm
                        + CAST('{QC_W_MTL}' AS DECIMAL(4,2)) * mtl
                     AS DECIMAL(12,6)) AS quality_logit
            FROM f
        )
        SELECT doc_id, quality_logit,
               CASE WHEN quality_logit >= CAST('{QC_KEEP}' AS DECIMAL(4,2)) THEN 'keep'
                    WHEN quality_logit >= CAST('{QC_REVIEW}' AS DECIMAL(4,2)) THEN 'review'
                    ELSE 'drop' END AS decision
        FROM s
    """,
    "quality_rejection_sample": _DUCK_QUALITY_F + f"""
        , s AS (
            SELECT doc_id,
                   CAST(ROUND(CAST(LEAST(token_ct, 256) AS DECIMAL(18,6)) / 256, 4) AS DECIMAL(9,4)) AS len_norm,
                   CAST(CAST('{QC_BIAS}' AS DECIMAL(4,2))
                        + CAST('{QC_W_STOP}' AS DECIMAL(4,2)) * stop_r
                        + CAST('{QC_W_ALPHA}' AS DECIMAL(4,2)) * alpha_r
                        + CAST('{QC_W_LEN}' AS DECIMAL(4,2)) * len_norm
                        + CAST('{QC_W_MTL}' AS DECIMAL(4,2)) * mtl
                     AS DECIMAL(12,6)) AS quality_logit
            FROM f
        ), dec AS (
            SELECT d.lang, d.n_chars,
                   (('0x' || substr(md5('rej:' || CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT % {REJ_DEN})
                     < CAST(LEAST(GREATEST(s.quality_logit, CAST('{REJ_P_FLOOR}' AS DECIMAL(12,6))),
                                  CAST('1' AS DECIMAL(12,6))) * {REJ_DEN} AS BIGINT) AS admitted
            FROM s JOIN documents d ON s.doc_id = d.doc_id
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS admitted_ct,
               CAST(CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS DECIMAL(18,6))
                    / COUNT(*) AS DECIMAL(9,6)) AS admit_rate,
               CAST(SUM(CASE WHEN admitted THEN n_chars ELSE 0 END) AS BIGINT) AS chars_admitted
        FROM dec GROUP BY lang ORDER BY lang
    """,
    "top_tokens": """
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
            FROM documents
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM toks GROUP BY token
        ORDER BY occurrences DESC, token ASC
        LIMIT 20
    """,
    "inverted_index": """
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
            FROM documents
        ), idx AS (
            SELECT token, list(doc_id ORDER BY doc_id) AS postings
            FROM toks GROUP BY token
        )
        SELECT token, postings FROM idx
        ORDER BY len(postings) ASC, token ASC LIMIT 10
    """,
    "token_positions": """
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents WHERE doc_id % 100 = 0
        )
        SELECT doc_id,
               CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
               unnest(toks) AS token
        FROM t
    """,
    "quality_buckets": f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS token_ct,
                   CAST(ROUND(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DECIMAL(18,6))
                        / GREATEST(len(toks), 1), 4) AS DECIMAL(9,4)) AS stopword_ratio
            FROM t
        ), cuts AS (
            SELECT {", ".join(f"quantile_disc(stopword_ratio, {p / 10}) AS c{p}" for p in range(1, 10))}
            FROM scored
        ), b AS (
            SELECT doc_id, token_ct,
                   1 {" ".join(f"+ CASE WHEN stopword_ratio > c{p} THEN 1 ELSE 0 END" for p in range(1, 10))} AS decile
            FROM scored, cuts
        )
        SELECT CAST(decile AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(token_ct) AS BIGINT) AS token_sum,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM b GROUP BY 1
    """,
    "lang_id": """
        WITH t AS (
            SELECT doc_id, lang, text,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents
        ), v AS (
            SELECT doc_id, lang,
                   regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk,
                   len(list_filter(toks, x -> list_contains(['the','and','of','is'], x))) AS en,
                   len(list_filter(toks, x -> list_contains(['der','und','die','ist'], x))) AS de,
                   len(list_filter(toks, x -> list_contains(['le','et','les','est'], x))) AS fr,
                   len(list_filter(toks, x -> list_contains(['el','y','los','es'], x))) AS es
            FROM t
        )
        SELECT doc_id, lang AS declared_lang,
               CASE WHEN has_cjk THEN 'zh'
                    WHEN de > en AND de >= fr AND de >= es THEN 'de'
                    WHEN fr > en AND fr >= es THEN 'fr'
                    WHEN es > en THEN 'es'
                    ELSE 'en' END AS predicted_lang
        FROM v
    """,
    "repetition_stats": """
        WITH t AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents
        ), b AS (
            SELECT doc_id, len(toks) AS token_ct,
                   len(list_distinct(toks)) AS distinct_ct, toks
            FROM t
        ), g AS (
            SELECT doc_id, token_ct, distinct_ct,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
                          ELSE [''] END) AS gram
            FROM b
        ), c AS (
            SELECT doc_id, token_ct, distinct_ct, gram, COUNT(*) AS ct
            FROM g GROUP BY ALL
        ), m AS (
            SELECT doc_id, token_ct, distinct_ct,
                   MAX(CASE WHEN gram <> '' THEN ct ELSE 0 END) AS top_gram_ct
            FROM c GROUP BY ALL
        )
        SELECT doc_id,
               CAST(token_ct AS INTEGER) AS token_ct,
               CAST(ROUND(CAST(distinct_ct AS DECIMAL(18,6)) / GREATEST(token_ct, 1), 4) AS DECIMAL(9,4)) AS distinct_ratio,
               CAST(ROUND(CAST(top_gram_ct * 3 AS DECIMAL(18,6)) / GREATEST(token_ct, 1), 4) AS DECIMAL(9,4)) AS top_trigram_frac
        FROM m
    """,
    "redact_pii": f"""
        WITH t AS (
            SELECT doc_id,
                   lower(text) || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.7 ref 4111111111111111' AS txt
            FROM documents
        ), r AS (
            SELECT doc_id, txt,
                   regexp_replace(regexp_replace(regexp_replace(txt,
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{IPV4_RE}', '<IP>', 'g'),
                       '{LONGNUM_RE}', '<NUM>', 'g') AS redacted
            FROM t
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS INTEGER) AS email_ct,
               CAST(len(regexp_extract_all(txt, '{IPV4_RE}')) AS INTEGER) AS ip_ct,
               CAST(len(regexp_extract_all(txt, '{LONGNUM_RE}')) AS INTEGER) AS longnum_ct,
               CAST(length(redacted) AS INTEGER) AS redacted_chars,
               right(redacted, 40) AS redacted_tail
        FROM r
    """,
    "doc_fingerprint": """
        WITH t AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents
        )
        SELECT doc_id,
               md5(norm) AS md5_fp,
               list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) * 7 + ascii(x) AS BIGINT))),
                           (acc, v) -> (acc * 31 + v) % 2147483647) AS poly_fp
        FROM t
    """,
}
