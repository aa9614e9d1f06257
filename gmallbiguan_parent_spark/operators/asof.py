"""As-of join — an operator Spark lacks natively, composed from
built-ins (the brief's canonical custom-operator case).

For each left row, attach the latest right row with right.ts <= left.ts
for the same key. The naive formulation (range join + row_number) can
explode: |left| × |right-within-range| intermediate rows. The union
trick here never joins at all:

    union left (tagged) and right rows, sort per key by
    (ts, side[right first], id), and take last_value(right attrs,
    ignore nulls) over the running window — each left row sees exactly
    the most recent right row at or before its timestamp.

One shuffle (the key partition), linear state, no quadratic blowup —
this is the 100 TB-safe formulation. The DuckDB oracle uses its NATIVE
ASOF JOIN, so the composition is verified against a reference
implementation of the semantics.

Ties: the right side is deduplicated to one row per (key, ts) — max id
wins — making the as-of match unambiguous in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_attrs: tuple[str, ...] = (),
) -> DataFrame:
    """Generic as-of join via the union trick. Returns left rows + the
    matched right attributes (null when no prior right row exists)."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        "*",
        *[F.lit(None).cast(right.schema[a].dataType).alias(f"__r_{a}") for a in right_attrs],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(a).alias(f"__r_{a}") for a in right_attrs],
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{a}", ignorenulls=True).over(w).alias(f"asof_{a}")
            for a in right_attrs
        ],
    )
    return (
        filled.filter(F.col("__side") == 1)
        .drop("__k", "__ts", "__side", *[f"__r_{a}" for a in right_attrs])
    )


def asof_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined as-of to the user's latest preceding
    view/click — 'what was the user looking at when they bought'.
    Right side deduplicated to one row per (user, ts) before the as-of
    (max event_id wins) so the match is unique."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
    )
    context = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("ctx_event_id"))
    )
    joined = asof_join(
        purchases, context, key="user_id", left_ts="ts", right_ts="ts",
        right_attrs=("ctx_event_id",),
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("asof_ctx_event_id").alias("context_event_id"),
    )


QUERIES = {
    "asof_purchase_context": asof_purchase_context,
}

ORACLES = {
    # native ASOF JOIN as the reference implementation of the semantics
    "asof_purchase_context": """
        WITH purchases AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ), context AS (
            SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS ctx_event_id
            FROM events WHERE event_type IN ('view','click')
            GROUP BY 1, 2
        )
        SELECT p.purchase_id, p.user_id, c.ctx_event_id AS context_event_id
        FROM purchases p
        ASOF LEFT JOIN context c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
}
