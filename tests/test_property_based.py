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
