"""Driver-contract invariants (no Spark needed): every oracle key maps
to a query, bench headline names exist, names are unique and stable."""

from __future__ import annotations


def test_every_oracle_has_a_query():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracles without queries: {orphans}"


def test_queries_without_oracle_are_the_declared_exceptions():
    import __spark_entry__ as e

    missing = set(e.queries()) - set(e.oracle_sql())
    # Round 5: ZERO rows-only queries remain. The last three graduated
    # via invariant/bounds oracles — the sketches emit exact columns +
    # rigorous error-band verdicts, the k-means capstone a one-row
    # invariant audit (stream_jump_detect graduated in round 3 via
    # sentinel flush; ann_cosine_topk_arrow in round 4 via half-way
    # boundary recompute).
    assert missing == set()


def test_bench_headline_names_resolve():
    import bench

    import __spark_entry__ as e

    unknown = set(bench.HEADLINE) - set(e.queries())
    assert not unknown, f"bench names not in queries(): {unknown}"
    unknown_ext = set(bench.EXTENDED) - set(e.queries())
    assert not unknown_ext, f"bench extended names not in queries(): {unknown_ext}"
    assert not set(bench.EXTENDED) & set(bench.HEADLINE), "extended must not overlap headline"


def test_query_names_are_stable_identifiers():
    import __spark_entry__ as e

    for name in e.queries():
        assert name.isidentifier() and name == name.lower()


def test_gate_priority_window_is_exactly_50_and_first():
    """The correctness driver grades the FIRST 50 registered queries;
    _GATE_PRIORITY pins that window. Guard it: exactly 50 unique names,
    all registered, and actually first in registration order."""
    from gmallbiguan_parent_spark.pipelines import _GATE_PRIORITY, _raw_queries

    names = list(_raw_queries())
    assert len(_GATE_PRIORITY) == 50
    assert len(set(_GATE_PRIORITY)) == 50
    assert names[:50] == list(_GATE_PRIORITY)
