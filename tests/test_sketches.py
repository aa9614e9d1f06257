"""Sketch accuracy contract: HLL approx distinct within 5% of exact."""

from __future__ import annotations

from gmallbiguan_parent_spark.operators.sketches import approx_distinct_stats

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_relative_error(spark):
    rows = approx_distinct_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.uv_approx - r.uv_exact) <= max(2, 0.05 * r.uv_exact), (
            r.dt, r.uv_exact, r.uv_approx,
        )
