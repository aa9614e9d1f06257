"""Data-quality operators — the profiling / expectations surface a
production warehouse runs next to its pipelines (what Deequ-style
libraries do, expressed as plain aggregates).

- table_profile: per-column null counts, exact distinct counts, and
  typed min/max in ONE pass over the table (a single multi-expression
  aggregate; the per-column rows come from unioning projections of the
  one aggregate row — no second scan).
- integrity_audit: referential and domain checks as counted violations
  (orphan facts via anti join, childless parents, domain bounds). Each
  check is a broadcast/anti-join or pushed filter; the union is of
  single-row aggregates, so the audit costs one scan per base table.

At 100 TB: countDistinct becomes approx_count_distinct (mergeable
sketch) — the profile's plan shape is otherwise unchanged; the anti
joins shuffle on the already-partitioned join keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec
from ..io import load_table


PROFILE_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders: one aggregate computes every metric,
    then one row per column is projected out. min/max render through
    explicit typed casts so engines agree on the string form."""
    orders = load_table(spark, sf_dir, "orders")

    def render(c: str):
        if c == "o_totalprice":
            return F.min(dec(c)).cast("string"), F.max(dec(c)).cast("string")
        return F.min(F.col(c).cast("string")), F.max(F.col(c).cast("string"))

    aggs = [F.count("*").alias("n_rows")]
    for c in PROFILE_COLS:
        mn, mx = render(c)
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    per_col = [
        one.select(
            F.lit(c).alias("column"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"{c}__nonnull")).alias("null_ct"),
            F.col(f"{c}__distinct").alias("distinct_ct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in PROFILE_COLS
    ]
    return reduce(lambda a, b: a.unionByName(b), per_col)


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts for the fact/dim contract: orphan lineitems
    (no parent order), childless orders (no lineitem), out-of-domain
    rows. Passing audits read 0."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    checks = [
        ("orphan_lineitems",
         li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")),
        ("childless_orders",
         orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")),
        ("nonpositive_extendedprice", li.filter(F.col("l_extendedprice") <= 0)),
        ("null_custkey", orders.filter(F.col("o_custkey").isNull())),
        ("bad_discount", li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
    ]
    rows = [
        df.agg(F.count("*").alias("violation_ct")).select(F.lit(name).alias("check"), "violation_ct")
        for name, df in checks
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


import math

# Benford expected first-digit shares, precomputed in Python and inlined
# as LITERALS on both engines — no cross-engine log/pow at query time.
BENFORD_EXP = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the classic
    fabricated-data screen for financial columns: compare the observed
    first-significant-digit distribution against log10(1 + 1/d). The
    first digit comes from the DECIMAL STRING rendering (never from
    log10/pow at query time, whose last-ulp differences could flip
    floor() at exact powers of ten between engines). One scan, one
    9-group aggregate, the total broadcast back."""
    orders = load_table(spark, sf_dir, "orders")
    amt = dec("o_totalprice")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(amt.cast("string"), 1, 1).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("obs_ct"))
    total = counts.agg(F.sum("obs_ct").alias("n"))
    exp_share = reduce(
        lambda acc, d: acc.when(F.col("digit") == str(d), F.lit(BENFORD_EXP[d])),
        range(2, 10),
        F.when(F.col("digit") == "1", F.lit(BENFORD_EXP[1])),
    ).otherwise(F.lit(0.0))
    obs_share = F.round(F.col("obs_ct") / F.col("n"), 6)
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "obs_ct",
        obs_share.alias("obs_share"),
        exp_share.alias("exp_share"),
        F.round(F.abs(obs_share - exp_share), 6).alias("abs_dev"),
    )


K_ANON = 5
QUASI_IDS = ("c_nationkey", "c_mktsegment")


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: k-anonymity of the customer table
    under its quasi-identifier combination (nation x market segment).
    A released dataset is k-anonymous iff every quasi-identifier
    equivalence class holds >= k records; classes below k re-identify.
    Emits each class with its size and an at_risk flag plus dataset-
    level rollup columns — the report a release gate reads.

    One groupBy on the quasi-identifier tuple (map-side combined), a
    1-row summary broadcast back; nothing scales past the class count."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(*QUASI_IDS).agg(F.count("*").alias("class_size"))
    summary = classes.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.when(F.col("class_size") < K_ANON, 1).otherwise(0)).alias("n_at_risk"),
        F.min("class_size").alias("k_effective"),
    )
    return (
        classes.crossJoin(F.broadcast(summary))
        .select(
            *QUASI_IDS,
            "class_size",
            (F.col("class_size") < K_ANON).alias("at_risk"),
            "n_classes", "n_at_risk", "k_effective",
        )
        .orderBy("class_size", *QUASI_IDS)
    )


RATE_CAP = 5  # events allowed per user per hour


def rate_limited_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rate limiting (abuse/bot damping for log ingest): keep
    the first RATE_CAP events per (user, hour) in event-time order,
    report per-hour admission stats. The keep rule is a row_number
    window partitioned by (user, hour) — state bounded per key, the
    same shape a streaming limiter holds in keyed state; at 100 TB the
    shuffle keys on (user, hour) so no task sees more than one user-
    hour's events (AQE splits a runaway bot key).

    Tiebreak (ts, event_id) is total, so both engines admit the same
    events."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    hour = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("user_id", "hr").orderBy("ts", "event_id")
    flagged = (
        ev.select("event_id", "ts", "user_id", hour.alias("hr"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("kept", F.col("rn") <= RATE_CAP)
    )
    return admission_rollup(flagged)


def admission_rollup(flagged: DataFrame) -> DataFrame:
    """Per-hour admission stats over a (hr, user_id, kept) frame —
    shared by the batch limiter and its streaming twin so the two can
    never diverge on the rollup definition (both check against the
    same oracle)."""
    return (
        flagged.groupBy("hr")
        .agg(
            F.count("*").alias("total_ct"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("kept_ct"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("dropped_ct"),
            F.countDistinct(F.when(~F.col("kept"), F.col("user_id"))).alias("n_users_capped"),
        )
        .orderBy("hr")
    )


PSI_SPLIT_DATE = "1996-01-01"
PSI_BUCKETS = 10


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    reference window (orders before PSI_SPLIT_DATE) vs current window
    (after) — the standard ML-monitoring drift score (PSI < 0.1 stable,
    0.1-0.25 moderate, > 0.25 action). Buckets are the reference
    window's value deciles (exact percentile_disc cut points, the
    quality_buckets recipe: a tiny 1-row broadcast, no global sort);
    both windows bucket with the same when-chain, one shuffle each.

    Terms use the symmetric PSI form (q - p) * ln(q / p), rounded into
    DECIMAL so the sum is order-independent; empty buckets on either
    side are excluded (documented PSI practice) via the term filter.

    r13 (guide §2.3 — aggregate once): both windows' bucket counts come
    from ONE conditional aggregation over the orders scan instead of a
    groupBy per window, and the <=PSI_BUCKETS-row result is lazily
    checkpointed so the totals/detail/total-sum consumers in _psi_detail
    replay a 10-row relation, not the corpus aggregation (the detail
    subtree appears under the total-sum AND the final projection).
    Per-window relations derive from the combined row exactly as the
    per-window groupBys did — a window's bucket exists iff its count is
    nonzero, and each window total is the sum of its counts either way —
    so _psi_detail (shared with the streaming ledger twin, which keeps
    the per-side helpers) sees identical inputs; oracle unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.filter(F.col("o_orderdate") < PSI_SPLIT_DATE)
    cuts = _psi_cuts(ref)
    b = F.lit(1)
    for p in range(1, PSI_BUCKETS):
        b = b + F.when(F.col("o_totalprice") > F.col(f"c{p}"), 1).otherwise(0)
    counts = (
        orders.crossJoin(F.broadcast(cuts))
        .select(
            b.alias("bucket"),
            (F.col("o_orderdate") < PSI_SPLIT_DATE).alias("is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.count_if(F.col("is_ref")).alias("ref_ct"),
            F.count_if(~F.col("is_ref")).alias("cur_ct"),
        )
        .localCheckpoint(eager=False)
    )
    r = counts.filter(F.col("ref_ct") > 0).select("bucket", "ref_ct")
    c = counts.filter(F.col("cur_ct") > 0).select("bucket", "cur_ct")
    return _psi_detail(r, c)


def _psi_cuts(ref: DataFrame) -> DataFrame:
    """The reference window's decile cut points as one broadcastable row."""
    return ref.agg(*[
        F.expr(f"percentile_disc({p / PSI_BUCKETS}) WITHIN GROUP (ORDER BY o_totalprice)").alias(f"c{p}")
        for p in range(1, PSI_BUCKETS)
    ])


def _psi_bucket_counts(df: DataFrame, cuts: DataFrame) -> DataFrame:
    """Bucket o_totalprice by the reference cut points (shared
    when-chain) and count per bucket — one shuffle of at most
    PSI_BUCKETS rows per task."""
    b = F.lit(1)
    for p in range(1, PSI_BUCKETS):
        b = b + F.when(F.col("o_totalprice") > F.col(f"c{p}"), 1).otherwise(0)
    return (
        df.crossJoin(F.broadcast(cuts))
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )


def _psi_detail(r: DataFrame, c: DataFrame) -> DataFrame:
    """(bucket, ref_ct) × (bucket, cur_ct) → the PSI detail + total
    table — shared by psi_drift and its streaming ledger twin so both
    produce byte-identical reports."""
    r_tot = r.agg(F.sum("ref_ct").alias("ref_n"))
    c_tot = c.agg(F.sum("cur_ct").alias("cur_n"))
    p = F.col("ref_ct").cast("double") / F.col("ref_n").cast("double")
    q = F.col("cur_ct").cast("double") / F.col("cur_n").cast("double")
    term = F.round((q - p) * F.log(q / p), 12).cast("decimal(28,12)")
    detail = (
        r.join(c, "bucket")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(c_tot))
        .select(
            "bucket", "ref_ct", "cur_ct",
            F.round(p, 9).alias("p"),
            F.round(q, 9).alias("q"),
            term.alias("term"),
        )
        # <= PSI_BUCKETS rows, consumed by the total sum AND the final
        # projection — without the checkpoint both windows' count
        # subtrees replay once per consumer (r13, guide §2.4)
        .localCheckpoint(eager=False)
    )
    total = detail.agg(F.sum("term").cast("double").alias("psi"))
    return (
        detail.crossJoin(F.broadcast(total))
        .select("bucket", "ref_ct", "cur_ct", "p", "q",
                F.col("term").cast("double").alias("term"), "psi")
        .orderBy("bucket")
    )


def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit between two categorical columns
    (market segment x nation over customers) — the statistical screen
    for 'is this dimension informative or noise' in feature/stratum
    selection. Per-cell observed vs expected (row_tot * col_tot / n)
    with contributions (obs-exp)^2/exp rounded into DECIMAL so the
    chi2 total is order-independent; dof carried alongside.

    One contingency aggregate (small: |segments| x |nations| cells),
    margins broadcast back — nothing scales past the cell count. The
    FULL grid is materialized (distinct-level cross join) so
    zero-observed cells contribute their expected mass — dropping them
    would understate chi2 while dof still assumed the whole grid."""
    cust = load_table(spark, sf_dir, "customer")
    # the grid-bounded intermediates (<= |segments| x |nations| rows)
    # are each consumed by several branches below — lazily checkpointed
    # so the customer aggregation runs ONCE per call instead of once per
    # consumer branch (r13, guide §2.4: executed plan 28 -> ~8 exchanges)
    seen = (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("obs"))
        .localCheckpoint(eager=False)
    )
    grid = (
        seen.select("c_mktsegment").distinct()
        .crossJoin(seen.select("c_nationkey").distinct())
    )
    obs = (
        grid.join(seen, ["c_mktsegment", "c_nationkey"], "left")
        .select("c_mktsegment", "c_nationkey", F.coalesce("obs", F.lit(0)).alias("obs"))
        .localCheckpoint(eager=False)
    )
    rt = obs.groupBy("c_mktsegment").agg(F.sum("obs").alias("row_tot"))
    ct = obs.groupBy("c_nationkey").agg(F.sum("obs").alias("col_tot"))
    n1 = obs.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("c_mktsegment").alias("n_rows_d"),
        F.countDistinct("c_nationkey").alias("n_cols_d"),
    )
    exp = (
        F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    contrib = F.round(
        (F.col("obs").cast("double") - exp) * (F.col("obs").cast("double") - exp) / exp,
        9,
    ).cast("decimal(28,9)")
    detail = (
        obs.join(F.broadcast(rt), "c_mktsegment")
        .join(F.broadcast(ct), "c_nationkey")
        .crossJoin(F.broadcast(n1))
        .select(
            "c_mktsegment", "c_nationkey", "obs",
            F.round(exp, 6).alias("expected"),
            contrib.alias("contrib"),
            ((F.col("n_rows_d") - 1) * (F.col("n_cols_d") - 1)).alias("dof"),
        )
    )
    tot = detail.agg(F.sum("contrib").cast("double").alias("chi2"))
    return (
        detail.crossJoin(F.broadcast(tot))
        .select("c_mktsegment", "c_nationkey", "obs", "expected",
                F.col("contrib").cast("double").alias("contrib"), "dof", "chi2")
        .orderBy("c_mktsegment", "c_nationkey")
    )


def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset manifest (the reproducibility/versioning primitive a
    training run records next to its data): per source — doc count,
    char volume, id range, and an ORDER-INSENSITIVE content checksum
    (sum of per-doc 60-bit md5 prefixes over normalized text, reduced
    mod 2^31-1; the sum runs in decimal(38,0) so it is exact at any
    corpus size — int64 would wrap at ~10^5 docs and wrap DIFFERENTLY
    across engines). Any single changed/added/dropped document changes
    the checksum; two shards with identical content match regardless of
    row order or partitioning. One map-side-combined aggregate."""
    from ..io import load_table_spread
    from .dedup import _norm_text

    # spread: the per-row md5+normalize is the heavy part, and the
    # single-file source would otherwise run it on one core
    docs = load_table_spread(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(_norm_text(F.col("text"))), 1, 15), 16, 10)
        .cast("long") % F.lit(2147483647)
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            (F.sum(h.cast("decimal(38,0)")) % F.lit(2147483647))
            .cast("long").alias("content_checksum"),
        )
    )


QUERIES = {
    "table_profile": table_profile,
    "corpus_manifest": corpus_manifest,
    "chi2_independence": chi2_independence,
    "psi_drift": psi_drift,
    "rate_limited_events": rate_limited_events,
    "k_anonymity_audit": k_anonymity_audit,
    "integrity_audit": integrity_audit,
    "benford_digit_audit": benford_digit_audit,
}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN {BENFORD_EXP[d]}" for d in range(1, 10)
) + " ELSE 0.0 END"

_PSI_CUTS = ", ".join(
    f"quantile_disc(o_totalprice, {p / PSI_BUCKETS}) AS c{p}" for p in range(1, PSI_BUCKETS)
)
_PSI_BUCKET_EXPR = "1 + " + " + ".join(
    f"CASE WHEN o_totalprice > c{p} THEN 1 ELSE 0 END" for p in range(1, PSI_BUCKETS)
)

ORACLES = {
    "corpus_manifest": """
    WITH h AS (
        SELECT source, doc_id, length(text) AS chars,
               ('0x' || substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 15))::BIGINT
                   % 2147483647 AS hv
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           CAST(CAST(SUM(CAST(hv AS DECIMAL(38,0))) AS DECIMAL(38,0)) % 2147483647 AS BIGINT) AS content_checksum
    FROM h GROUP BY source
    """,
    "chi2_independence": """
    WITH seen AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS obs
        FROM customer GROUP BY 1, 2
    ), obs AS (
        SELECT g.c_mktsegment, g.c_nationkey, COALESCE(s.obs, 0) AS obs
        FROM (SELECT DISTINCT a.c_mktsegment, b.c_nationkey
              FROM seen a CROSS JOIN seen b) g
        LEFT JOIN seen s ON g.c_mktsegment = s.c_mktsegment
                        AND g.c_nationkey = s.c_nationkey
    ), rt AS (
        SELECT c_mktsegment, CAST(SUM(obs) AS BIGINT) AS row_tot FROM obs GROUP BY 1
    ), ctt AS (
        SELECT c_nationkey, CAST(SUM(obs) AS BIGINT) AS col_tot FROM obs GROUP BY 1
    ), n1 AS (
        SELECT CAST(SUM(obs) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_rows_d,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_cols_d
        FROM obs
    ), detail AS (
        SELECT o.c_mktsegment, o.c_nationkey, CAST(o.obs AS BIGINT) AS obs,
               ROUND(CAST(r.row_tot AS DOUBLE) * CAST(c.col_tot AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS expected,
               CAST(ROUND(
                   (CAST(o.obs AS DOUBLE) - CAST(r.row_tot AS DOUBLE) * CAST(c.col_tot AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * (CAST(o.obs AS DOUBLE) - CAST(r.row_tot AS DOUBLE) * CAST(c.col_tot AS DOUBLE) / CAST(n.n AS DOUBLE))
                   / (CAST(r.row_tot AS DOUBLE) * CAST(c.col_tot AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
                    AS DECIMAL(28,9)) AS contrib,
               (n.n_rows_d - 1) * (n.n_cols_d - 1) AS dof
        FROM obs o
        JOIN rt r ON o.c_mktsegment = r.c_mktsegment
        JOIN ctt c ON o.c_nationkey = c.c_nationkey, n1 n
    ), tot AS (
        SELECT CAST(SUM(contrib) AS DOUBLE) AS chi2 FROM detail
    )
    SELECT d.c_mktsegment, d.c_nationkey, d.obs, d.expected,
           CAST(d.contrib AS DOUBLE) AS contrib, d.dof, t.chi2
    FROM detail d, tot t
    ORDER BY d.c_mktsegment, d.c_nationkey
    """,
    "psi_drift": f"""
    WITH ref AS (
        SELECT o_totalprice FROM orders WHERE o_orderdate < DATE '{PSI_SPLIT_DATE}'
    ), cur AS (
        SELECT o_totalprice FROM orders WHERE o_orderdate >= DATE '{PSI_SPLIT_DATE}'
    ), cuts AS (
        SELECT {_PSI_CUTS} FROM ref
    ), rb AS (
        SELECT {_PSI_BUCKET_EXPR} AS bucket, COUNT(*) AS ref_ct
        FROM ref, cuts GROUP BY 1
    ), cb AS (
        SELECT {_PSI_BUCKET_EXPR} AS bucket, COUNT(*) AS cur_ct
        FROM cur, cuts GROUP BY 1
    ), rt AS (SELECT CAST(SUM(ref_ct) AS BIGINT) AS ref_n FROM rb),
    ct AS (SELECT CAST(SUM(cur_ct) AS BIGINT) AS cur_n FROM cb),
    detail AS (
        SELECT r.bucket, CAST(r.ref_ct AS BIGINT) AS ref_ct, CAST(c.cur_ct AS BIGINT) AS cur_ct,
               ROUND(CAST(r.ref_ct AS DOUBLE) / CAST(rt.ref_n AS DOUBLE), 9) AS p,
               ROUND(CAST(c.cur_ct AS DOUBLE) / CAST(ct.cur_n AS DOUBLE), 9) AS q,
               CAST(ROUND((CAST(c.cur_ct AS DOUBLE) / CAST(ct.cur_n AS DOUBLE)
                           - CAST(r.ref_ct AS DOUBLE) / CAST(rt.ref_n AS DOUBLE))
                          * ln((CAST(c.cur_ct AS DOUBLE) / CAST(ct.cur_n AS DOUBLE))
                               / (CAST(r.ref_ct AS DOUBLE) / CAST(rt.ref_n AS DOUBLE))), 12)
                    AS DECIMAL(28,12)) AS term
        FROM rb r JOIN cb c ON r.bucket = c.bucket, rt, ct
    ), tot AS (
        SELECT CAST(SUM(term) AS DOUBLE) AS psi FROM detail
    )
    SELECT d.bucket, d.ref_ct, d.cur_ct, d.p, d.q,
           CAST(d.term AS DOUBLE) AS term, t.psi
    FROM detail d, tot t
    ORDER BY d.bucket
    """,
    "rate_limited_events": f"""
    WITH flagged AS (
        SELECT event_id, ts, user_id, date_trunc('hour', ts) AS hr,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) <= {RATE_CAP} AS kept
        FROM events
    )
    SELECT hr,
           CAST(COUNT(*) AS BIGINT) AS total_ct,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_ct,
           CAST(SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS dropped_ct,
           CAST(COUNT(DISTINCT CASE WHEN NOT kept THEN user_id END) AS BIGINT) AS n_users_capped
    FROM flagged
    GROUP BY hr
    ORDER BY hr
    """,
    "k_anonymity_audit": f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS class_size
        FROM customer GROUP BY 1, 2
    ), summary AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
               MIN(class_size) AS k_effective
        FROM classes
    )
    SELECT c.c_nationkey, c.c_mktsegment, c.class_size,
           c.class_size < {K_ANON} AS at_risk,
           s.n_classes, s.n_at_risk, s.k_effective
    FROM classes c, summary s
    ORDER BY c.class_size, c.c_nationkey, c.c_mktsegment
    """,
    "benford_digit_audit": f"""
        WITH digits AS (
            SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), 1, 1) AS digit
            FROM orders WHERE o_totalprice >= 1
        ), counts AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs_ct FROM digits GROUP BY 1
        ), t AS (
            SELECT CAST(SUM(obs_ct) AS BIGINT) AS n FROM counts
        )
        SELECT digit, obs_ct,
               ROUND(obs_ct / n, 6) AS obs_share,
               {_BENFORD_CASE} AS exp_share,
               ROUND(ABS(ROUND(obs_ct / n, 6) - {_BENFORD_CASE}), 6) AS abs_dev
        FROM counts, t
    """,
    "table_profile": """
        WITH one AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(o_orderkey) AS BIGINT) AS k_nn,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_d,
                   CAST(MIN(CAST(o_orderkey AS VARCHAR)) AS VARCHAR) AS k_mn,
                   CAST(MAX(CAST(o_orderkey AS VARCHAR)) AS VARCHAR) AS k_mx,
                   CAST(COUNT(o_orderstatus) AS BIGINT) AS s_nn,
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
                   MIN(o_orderstatus) AS s_mn, MAX(o_orderstatus) AS s_mx,
                   CAST(COUNT(o_totalprice) AS BIGINT) AS p_nn,
                   CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS p_d,
                   CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS p_mn,
                   CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS p_mx,
                   CAST(COUNT(o_orderpriority) AS BIGINT) AS r_nn,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS r_d,
                   MIN(o_orderpriority) AS r_mn, MAX(o_orderpriority) AS r_mx
            FROM orders
        )
        SELECT 'o_orderkey' AS "column", n_rows, n_rows - k_nn AS null_ct,
               k_d AS distinct_ct, k_mn AS min_s, k_mx AS max_s FROM one
        UNION ALL
        SELECT 'o_orderstatus', n_rows, n_rows - s_nn, s_d, s_mn, s_mx FROM one
        UNION ALL
        SELECT 'o_totalprice', n_rows, n_rows - p_nn, p_d, p_mn, p_mx FROM one
        UNION ALL
        SELECT 'o_orderpriority', n_rows, n_rows - r_nn, r_d, r_mn, r_mx FROM one
    """,
    "integrity_audit": """
        SELECT 'orphan_lineitems' AS "check", CAST(COUNT(*) AS BIGINT) AS violation_ct
        FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'childless_orders', CAST(COUNT(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        UNION ALL
        SELECT 'nonpositive_extendedprice', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_extendedprice <= 0
        UNION ALL
        SELECT 'null_custkey', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_custkey IS NULL
        UNION ALL
        SELECT 'bad_discount', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_discount < 0 OR l_discount > 1
    """,
}
