"""as-of join edge semantics: no-prior-row -> null, exact-ts tie counts
as 'at or before', latest-wins among earlier rows."""

from __future__ import annotations

import datetime

from gmallbiguan_parent_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T00:10:00")),  # matches r2 (latest <= ts)
            (1, 101, _ts("2024-01-01T00:04:00")),  # matches r1
            (1, 102, _ts("2024-01-01T00:00:30")),  # before any right -> null
            (2, 103, _ts("2024-01-01T00:05:00")),  # tie with r3 at same ts -> matches
        ],
        "user_id long, left_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 201, _ts("2024-01-01T00:01:00")),  # r1
            (1, 202, _ts("2024-01-01T00:08:00")),  # r2
            (2, 203, _ts("2024-01-01T00:05:00")),  # r3
        ],
        "user_id long, right_id long, ts timestamp",
    )
    out = asof_join(left, right, key="user_id", right_attrs=("right_id",))
    got = {r.left_id: r.asof_right_id for r in out.collect()}
    assert got == {100: 202, 101: 201, 102: None, 103: 203}
