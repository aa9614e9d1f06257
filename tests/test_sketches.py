"""Sketch accuracy contract: HLL approx distinct within 5% of exact."""

from __future__ import annotations

from gmallbiguan_parent_spark.operators.sketches import approx_distinct_raw

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_relative_error(spark):
    rows = approx_distinct_raw(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.uv_approx - r.uv_exact) <= max(2, 0.05 * r.uv_exact), (
            r.dt, r.uv_exact, r.uv_approx,
        )


def test_approx_percentile_rank_error(spark):
    from gmallbiguan_parent_spark.operators.sketches import approx_percentiles_raw

    rows = approx_percentiles_raw(spark, SF).collect()
    assert rows
    vals = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    # the sketch guarantees RANK error (<= 1/accuracy + discreteness),
    # not value error: assert the returned value sits at the right rank
    for r in rows:
        v = sorted(vals[r.event_type])
        n = len(v)
        for q, approx in ((0.5, r.p50_approx), (0.99, r.p99_approx)):
            rank = sum(1 for x in v if x <= approx) / n
            assert abs(rank - q) <= max(0.002, 2.0 / n), (r.event_type, q, rank)
