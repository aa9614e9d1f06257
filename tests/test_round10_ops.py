"""Round-10 operator tests: the posting-capped prefix/containment
twins (VERDICT r9 #6). The cap is a degradation CONTRACT — output must
be a subset of the complete form, produced by the same exact verify —
and it must actually engage at the scale the test runs (sf0.01: the
rarest-first prefix postings max out at 3 docs vs POSTING_CAP = 2),
or the subset claim is vacuous."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def test_prefix_jaccard_capped_is_engaged_subset(spark):
    from gmallbiguan_parent_spark.operators.dedup import (
        prefix_jaccard_pairs,
        prefix_jaccard_pairs_capped,
        prefix_posting_overflow,
    )

    over = prefix_posting_overflow(spark, SF_DIR).collect()[0]
    assert int(over.over_tokens) > 0, "cap never engaged — vacuous subset"
    assert int(over.dropped_pair_slots) > 0
    complete = {
        (r.doc_a, r.doc_b): (r.inter_ct, r.jaccard)
        for r in prefix_jaccard_pairs(spark, SF_DIR).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): (r.inter_ct, r.jaccard)
        for r in prefix_jaccard_pairs_capped(spark, SF_DIR).collect()
    }
    assert set(capped) <= set(complete)
    for k, v in capped.items():
        # verify semantics identical for surviving pairs
        assert complete[k] == v


def test_containment_capped_is_engaged_subset(spark):
    from gmallbiguan_parent_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_capped,
        containment_posting_overflow,
    )

    over = {r.side: r for r in containment_posting_overflow(spark, SF_DIR).collect()}
    assert set(over) == {"contained_prefix", "container_full"}
    assert int(over["container_full"].over_tokens) > 0, "cap never engaged"
    complete = {
        (r.doc_a, r.doc_b): (r.inter_ct, r.containment)
        for r in containment_pairs(spark, SF_DIR).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): (r.inter_ct, r.containment)
        for r in containment_pairs_capped(spark, SF_DIR).collect()
    }
    assert set(capped) < set(complete), (
        "capped output must be a STRICT subset here — sf0.01's container "
        "postings overflow the cap and drop at least one pair"
    )
    for k, v in capped.items():
        assert complete[k] == v
