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


def test_wide_band_is_wide_filtered_at_band_and_keeps_design_pairs(spark, tmp_path):
    """embedding_neardup_wide_band is EXACTLY the wide form filtered at
    NEARDUP_BAND_COSINE (the composition exists in code, not prose),
    and every planted design-point twin pair survives it — the wide
    governor's recall contract carries through the band cut."""
    from tests.test_round9_ops import _planted_dir

    from gmallbiguan_parent_spark.operators.similarity import (
        NEARDUP_BAND_COSINE,
        SRP_DESIGN_COSINE,
        embedding_neardup_multiprobe_wide,
        embedding_neardup_wide_band,
    )

    sf, planted = _planted_dir(spark, tmp_path, SRP_DESIGN_COSINE)
    wide_rows = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_multiprobe_wide(spark, sf).collect()
    }
    band_rows = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_wide_band(spark, sf).collect()
    }
    assert band_rows == {
        k: c for k, c in wide_rows.items() if c >= NEARDUP_BAND_COSINE
    }
    assert any(c < NEARDUP_BAND_COSINE for c in wide_rows.values())
    recovered = planted & set(band_rows)
    assert len(recovered) >= len(planted) - 1, (
        f"only {len(recovered)}/{len(planted)} planted twins in the band output"
    )
