"""Property-based tests (hypothesis) for the custom operators: the
composed implementations must agree with brute-force reference
semantics on arbitrary small inputs — the harness SURVEY §5 says we
must build ourselves."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1)

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user
        st.integers(min_value=0, max_value=3600),   # offset seconds
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=EVENTS, right=EVENTS)
def test_asof_join_matches_bruteforce(spark, left, right):
    from gmallbiguan_parent_spark.operators.asof import asof_join

    lrows = [
        (u, i, BASE + datetime.timedelta(seconds=s)) for i, (u, s) in enumerate(left)
    ]
    # dedupe right to one row per (user, ts): max id wins (operator contract)
    rbest = {}
    for j, (u, s) in enumerate(right):
        rbest[(u, s)] = max(rbest.get((u, s), -1), j + 100)
    rrows = [
        (u, rid, BASE + datetime.timedelta(seconds=s)) for (u, s), rid in rbest.items()
    ]
    ldf = spark.createDataFrame(lrows, "user_id long, left_id long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "user_id long, right_id long, ts timestamp")
    got = {
        r.left_id: r.asof_right_id
        for r in asof_join(ldf, rdf, key="user_id", right_attrs=("right_id",)).collect()
    }
    for u, lid, lts in lrows:
        cands = [(rts, rid) for (ru, rid, rts) in rrows if ru == u and rts <= lts]
        expect = max(cands)[1] if cands else None
        assert got[lid] == expect, (lid, got[lid], expect)


TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_minhash_candidates_superset_of_high_jaccard(spark, tmp_path_factory, texts):
    """LSH with 3 bands of 3 rows: any pair sharing an identical shingle
    SET must collide in every band, so jaccard==1.0 pairs are always
    candidates and must be emitted."""
    from gmallbiguan_parent_spark.operators.dedup import minhash_lsh_pairs

    docs = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    d = tmp_path_factory.mktemp("mh")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, str(d)).collect()}

    def toks(t):
        return [w for w in t.lower().split() if w]

    def shingles(t):
        tk = toks(t)
        if len(tk) >= 3:
            return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        return {" ".join(tk)}

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if shingles(texts[i]) == shingles(texts[j]):
                assert (i, j) in got, (texts[i], texts[j])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=50,
    ),
    nparts=st.integers(min_value=1, max_value=8),
)
def test_decimal_sum_invariant_under_partitioning(spark, vals, nparts):
    """The determinism cornerstone: decimal sums must not depend on
    partitioning/order (double sums would)."""
    from gmallbiguan_parent_spark.functions import dec

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    a = df.repartition(1).agg(F.sum(dec("v"))).collect()[0][0]
    b = df.repartition(nparts).agg(F.sum(dec("v"))).collect()[0][0]
    assert a == b


def test_permissive_json_parse_drops_corrupt_records(spark):
    """P1's PERMISSIVE contract: corrupt JSON yields nulls, valid rows
    survive (the reference's try/parse-skip, BaseLogApp2.java:63-69)."""
    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json at all",), ('{"k": 2}',), (None,)], "payload string"
    )
    parsed = df.select(F.from_json("payload", "k bigint").alias("j")).select("j.k")
    got = [r.k for r in parsed.collect()]
    assert got.count(None) == 2 and sorted(x for x in got if x) == [1, 2]


def test_bpe_merge_semantics_on_adversarial_vocab(spark):
    """Hypothesis-style adversarial vocab for the BPE merge machinery:
    words with repeated characters ('aaaa', 'abab') are exactly where
    two-pass replace semantics could diverge between the Spark fold,
    DuckDB replace, and Python str.replace. Replay all three on a
    synthetic vocabulary and demand identical merge tables."""
    import duckdb
    from pyspark.sql import functions as F

    words = ["aaaa", "abab", "aab", "bba", "aa", "ab", "ba", "abcabc", "ccc", "cacaca"]
    counts = [5, 4, 3, 3, 7, 6, 2, 2, 8, 1]

    # python reference (two-pass str.replace, argmax tiebreak)
    syms = {w: " " + " ".join(w) + " " for w in words}
    wct = dict(zip(words, counts))
    expected = []
    for step in range(1, 6):
        pc: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            parts = s.strip().split(" ")
            for a, b in zip(parts, parts[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + wct[w]
        if not pc:
            break
        (lhs, rhs), ct = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, lhs, rhs, lhs + rhs, ct))
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        syms = {w: s.replace(pat, rep).replace(pat, rep) for w, s in syms.items()}

    # spark replay of the same loop over a vocab DataFrame
    vocab = spark.createDataFrame(
        [(w, c, " " + " ".join(w) + " ") for w, c in zip(words, counts)],
        "tok string, wct long, syms string",
    )
    got = []
    from gmallbiguan_parent_spark.operators.text import _bpe_pair_counts
    for step in range(1, 6):
        best = (
            _bpe_pair_counts(vocab)
            .orderBy(F.desc("pair_ct"), F.asc("lhs"), F.asc("rhs"))
            .limit(1).collect()
        )
        if not best:
            break
        lhs, rhs, ct = best[0].lhs, best[0].rhs, int(best[0].pair_ct)
        got.append((step, lhs, rhs, lhs + rhs, ct))
        pat, rep = F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}{rhs} ")
        vocab = vocab.select(
            "tok", "wct", F.replace(F.replace(F.col("syms"), pat, rep), pat, rep).alias("syms")
        )
    assert got == expected

    # duckdb replay of one merge application on the trickiest word
    con = duckdb.connect()
    for (_, lhs, rhs, merged, _ct) in expected:
        for w in ["aaaa", "cacaca", "abab"]:
            s = " " + " ".join(w) + " "
            py = s.replace(f" {lhs} {rhs} ", f" {merged} ").replace(f" {lhs} {rhs} ", f" {merged} ")
            (dk,) = con.execute(
                "SELECT replace(replace(?, ?, ?), ?, ?)",
                [s, f" {lhs} {rhs} ", f" {merged} ", f" {lhs} {rhs} ", f" {merged} "],
            ).fetchone()
            assert py == dk


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),   # start offset seconds
        st.integers(min_value=0, max_value=9000),   # width seconds (0 = empty)
    ),
    min_size=1,
    max_size=8,
)

POINTS = st.lists(
    st.integers(min_value=-600, max_value=10_000),  # offset seconds
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(points=POINTS, intervals=INTERVALS, bin_seconds=st.sampled_from([60, 600, 3600]))
def test_interval_bin_join_matches_bruteforce(spark, points, intervals, bin_seconds):
    """For arbitrary interval widths (narrower/wider than the bin,
    zero-width) and any bin size, the bin join equals the theta join."""
    from gmallbiguan_parent_spark.operators.timeseries import interval_bin_join

    pts = spark.createDataFrame(
        [(i, BASE + datetime.timedelta(seconds=s)) for i, s in enumerate(points)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, BASE + datetime.timedelta(seconds=s), BASE + datetime.timedelta(seconds=s + w))
            for j, (s, w) in enumerate(intervals)
        ],
        "wid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r.pid, r.wid)
        for r in interval_bin_join(pts, ivs, "ts", "w_start", "w_end", bin_seconds=bin_seconds)
        .select("pid", "wid").collect()
    }
    ref = {
        (i, j)
        for i, s in enumerate(points)
        for j, (ws, w) in enumerate(intervals)
        if ws <= s < ws + w
    }
    assert got == ref
