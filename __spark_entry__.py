"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query surface lives in ``gmallbiguan_parent_spark`` (SURVEY.md §2
inventory mapped Spark-first onto the driver testdata).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmallbiguan_parent_spark.pipelines import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the OrderWide pipeline
    (fact⋈fact equi-join + 5 broadcast dim enrichments — the reference's
    J1+J3 surface). Same double output edge as the gate queries."""
    from gmallbiguan_parent_spark.pipelines import _cast_decimals_to_double
    from gmallbiguan_parent_spark.pipelines.dwm import order_wide

    return _cast_decimals_to_double(order_wide(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query (same column aliases)."""
    return all_oracles()
