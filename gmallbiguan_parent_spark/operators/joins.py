"""Join strategy utilities for scale: skew salting and bucketed
co-located joins.

The reference's only join-scale tooling is bounded interval state and a
Redis dim cache (SURVEY §4); Spark gives broadcast/AQE for free. These
utilities cover the two cases that still need engineering at 100 TB:

- `salted_join`: a hot key that AQE's skew splitting can't fix (e.g. a
  single key holding >1 executor's worth of build side) — explode the
  small side into SALT replicas, scatter the big side with a random
  salt, join on (key, salt). Result is identical to the plain join.
- `write_bucketed` / bucketed tables: pre-shuffle both fact tables into
  the same bucket layout on the join key so repeated joins are
  shuffle-free (verified by plan assertion in tests — no Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate `small` n_salt times (one per
    salt value), salt `big` rows deterministically by a hash of their
    full row id-ish key, and join on (key, salt). Each hot key's rows
    spread across n_salt tasks instead of one.

    Deterministic salting (hash of the key + a monotonic disambiguator
    would be ideal; pmod of xxhash here) keeps re-runs stable."""
    salt_values = F.array(*[F.lit(i) for i in range(n_salt)])
    small_rep = small.withColumn("__salt", F.explode(salt_values))
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(big_key), F.monotonically_increasing_id()), F.lit(n_salt)).cast("int")
    )
    joined = big_salted.join(
        small_rep,
        (big_salted[big_key] == small_rep[small_key]) & (big_salted["__salt"] == small_rep["__salt"]),
        how,
    )
    return joined.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16) -> None:
    """Persist as a bucketed managed table: pre-partitioned by hash(key)
    into n_buckets files per partition. Two tables bucketed identically
    on their join key join WITHOUT a shuffle (SortMergeJoin reads
    co-located buckets) — the 100 TB answer to the repeated
    orders⋈lineitem shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
