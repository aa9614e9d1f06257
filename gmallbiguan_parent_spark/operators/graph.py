"""Graph analytics over warehouse-derived co-occurrence graphs.

Two families the reference's surface lacks but a large-scale analytics
engine needs (SURVEY §2 extensions, same spirit as operators/dedup.py's
connected components):

- fixed-iteration PageRank over the supplier co-occurrence graph —
  the iterative bulk-synchronous pattern (one shuffle per iteration),
  unrolled to a fixed round count so a DuckDB oracle can replay it
  CTE-for-CTE and hash-match;
- item-item co-purchase lift — the association-rules / collaborative-
  filtering primitive (PMI-style normalization of pair counts).

Scale notes (100 TB): the co-occurrence edge build is a self-join on
the order key (co-partitioned single shuffle; per-order fan-out is
bounded by order size, and a hot mega-order would be AQE-skew-split).
PageRank at true graph scale runs the SAME join-agg loop per iteration
with localCheckpoint between rounds (the connected_components recipe,
dedup.py:170); the fixed unroll here keeps plans finite and
oracle-checkable. Dangling nodes don't exist in a symmetric graph, so
no dangling-mass redistribution term is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

PR_DAMP = 0.85
PR_ITERS = 3
PR_TOP = 20

# Python-computed double constants, embedded verbatim in the oracle so
# both engines use the bit-identical literal (1.0 - 0.85 != 0.15 in
# float64 — it is 0.15000000000000002).
_PR_TELEPORT = 1.0 - PR_DAMP


def _co_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric supplier co-occurrence edges: (src, dst) iff the two
    suppliers ship lines of the same order. Distinct bridge first so a
    supplier with many lines in one order contributes one edge."""
    li = load_table(spark, sf_dir, "lineitem")
    bridge = li.select("l_orderkey", "l_suppkey").distinct()
    a = bridge.alias("a")
    b = bridge.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .distinct()
    )


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous iterations) on the
    supplier co-occurrence graph; top 20 by final rank.

    Determinism contract: per-edge contributions (rank/outdeg) and
    per-node updates ((1-d)/n + d·Σ) round to 9 dp and SUM as exact
    decimal, so iteration results are order-independent and the DuckDB
    oracle (same formulas, unrolled CTEs) matches to the last bit.

    Plan: one shuffle builds the edge set (order-key self-join), one
    degree aggregate, then per iteration exactly one join (edges ⋈
    ranks on src — broadcast while ranks stay dim-sized, shuffle-on-key
    at graph scale) and one dst-keyed aggregate. The edge set is
    localCheckpoint'd (the connected_components recipe, dedup.py:170)
    so each iteration joins the MATERIALIZED edges instead of replaying
    the self-join lineage three times — at graph scale this is the
    'build the adjacency once, iterate over it' structure every BSP
    engine uses."""
    supp = load_table(spark, sf_dir, "supplier")
    return (
        _pagerank_ranks(spark, sf_dir)
        .join(F.broadcast(supp), F.col("node") == supp.s_suppkey, "inner")
        .select(
            F.col("node").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            F.col("outdeg").alias("degree"),
            F.col("rank").alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), F.asc("supplier_id"))
        .limit(PR_TOP)
    )


def _pagerank_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (node, outdeg, n, rank) table after PR_ITERS iterations —
    split out so tests can assert mass conservation over ALL nodes, not
    just the top-20 report."""
    edges = _co_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    n1 = deg.agg(F.count("*").alias("n"))

    # r0 = 1/n for every node, rounded like every later iterate.
    ranks = (
        deg.crossJoin(F.broadcast(n1))
        .select(
            F.col("src").alias("node"),
            "outdeg",
            "n",
            F.round(F.lit(1.0) / F.col("n").cast("double"), 9)
            .cast("decimal(18,9)")
            .alias("rank"),
        )
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(
            ranks, edges.src == ranks.node, "inner"
        ).select(
            F.col("dst"),
            F.round(
                F.col("rank").cast("double") / F.col("outdeg").cast("double"), 9
            )
            .cast("decimal(18,9)")
            .alias("contrib"),
        )
        summed = contrib.groupBy("dst").agg(F.sum("contrib").alias("mass"))
        ranks = (
            summed.join(deg, summed.dst == deg.src, "inner")
            .crossJoin(F.broadcast(n1))
            .select(
                F.col("dst").alias("node"),
                "outdeg",
                "n",
                F.round(
                    F.lit(_PR_TELEPORT) / F.col("n").cast("double")
                    + PR_DAMP * F.col("mass").cast("double"),
                    9,
                )
                .cast("decimal(18,9)")
                .alias("rank"),
            )
        )
    return ranks


LIFT_MIN_PAIR = 3
LIFT_TOP = 25


def copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items frequently bought together: part pairs ranked by LIFT —
    P(a,b) / (P(a)·P(b)) over order baskets, the association-rules /
    "customers also bought" primitive. Support floor keeps noise pairs
    out; a < b canonicalizes the pair.

    Plan: distinct (order, part) bridge (one shuffle), pair generation
    via the same-key self-join (co-partitioned — no extra exchange on
    the second leg at scale), per-part counts broadcast back onto the
    pair counts. Lift arithmetic is pure double with a single 6 dp
    round at the edge; counts are exact ints so both engines divide
    identical values."""
    li = load_table(spark, sf_dir, "lineitem")
    bridge = li.select("l_orderkey", "l_partkey").distinct()
    # Lazy 1-row basket count broadcast into the lift projection (the
    # supplier_pagerank n1 pattern) — constructing the DataFrame runs
    # no job and the plan is data-independent.
    n1 = bridge.agg(F.countDistinct("l_orderkey").alias("n"))
    a = bridge.alias("a")
    b = bridge.alias("b")
    pair_ct = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_ct"))
        .filter(F.col("pair_ct") >= LIFT_MIN_PAIR)
    )
    part_ct = bridge.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("part_ct")
    )
    n_d = F.col("n").cast("double")
    lift = F.round(
        (F.col("pair_ct").cast("double") / n_d)
        / (
            (F.col("ct_a").cast("double") / n_d)
            * (F.col("ct_b").cast("double") / n_d)
        ),
        6,
    )
    return (
        pair_ct.join(
            F.broadcast(part_ct.select(F.col("pk"), F.col("part_ct").alias("ct_a"))),
            F.col("part_a") == F.col("pk"),
        )
        .drop("pk")
        .join(
            F.broadcast(part_ct.select(F.col("pk"), F.col("part_ct").alias("ct_b"))),
            F.col("part_b") == F.col("pk"),
        )
        .drop("pk")
        .crossJoin(F.broadcast(n1))
        .select("part_a", "part_b", "pair_ct", "ct_a", "ct_b", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(LIFT_TOP)
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out}_c AS (
        SELECT e.dst,
               CAST(ROUND(CAST(r.rank AS DOUBLE) / CAST(r.outdeg AS DOUBLE), 9) AS DECIMAL(18,9)) AS contrib
        FROM edges e JOIN {prev} r ON e.src = r.node
    ), {out} AS (
        SELECT c.dst AS node, d.outdeg, n.n,
               CAST(ROUND({_PR_TELEPORT!r} / CAST(n.n AS DOUBLE)
                    + {PR_DAMP!r} * CAST(SUM(c.contrib) AS DOUBLE), 9) AS DECIMAL(18,9)) AS rank
        FROM {out}_c c JOIN deg d ON c.dst = d.src, n
        GROUP BY c.dst, d.outdeg, n.n
    )"""


QUERIES = {
    "supplier_pagerank": supplier_pagerank,
    "copurchase_lift": copurchase_lift,
}

ORACLES = {
    "supplier_pagerank": f"""
    WITH bridge AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM bridge a JOIN bridge b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey <> b.l_suppkey
    ), deg AS (
        SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), n AS (
        SELECT COUNT(*) AS n FROM deg
    ), r0 AS (
        SELECT src AS node, outdeg, n.n,
               CAST(ROUND(1.0 / CAST(n.n AS DOUBLE), 9) AS DECIMAL(18,9)) AS rank
        FROM deg, n
    ),{_pr_iter_sql("r0", "r1")},{_pr_iter_sql("r1", "r2")},{_pr_iter_sql("r2", "r3")}
    SELECT r.node AS supplier_id, s.s_name AS supplier_name,
           CAST(r.outdeg AS BIGINT) AS degree, r.rank AS pagerank
    FROM r3 r JOIN supplier s ON r.node = s.s_suppkey
    ORDER BY pagerank DESC, supplier_id ASC
    LIMIT {PR_TOP}
    """,
    "copurchase_lift": f"""
    WITH bridge AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n FROM bridge
    ), pair_ct AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_ct
        FROM bridge a JOIN bridge b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {LIFT_MIN_PAIR}
    ), part_ct AS (
        SELECT l_partkey AS pk, COUNT(*) AS part_ct FROM bridge GROUP BY 1
    )
    SELECT p.part_a, p.part_b,
           CAST(p.pair_ct AS BIGINT) AS pair_ct,
           CAST(ca.part_ct AS BIGINT) AS ct_a,
           CAST(cb.part_ct AS BIGINT) AS ct_b,
           ROUND((CAST(p.pair_ct AS DOUBLE) / CAST(n.n AS DOUBLE))
                 / ((CAST(ca.part_ct AS DOUBLE) / CAST(n.n AS DOUBLE))
                    * (CAST(cb.part_ct AS DOUBLE) / CAST(n.n AS DOUBLE))), 6) AS lift
    FROM pair_ct p
    JOIN part_ct ca ON p.part_a = ca.pk
    JOIN part_ct cb ON p.part_b = cb.pk, n_orders n
    ORDER BY lift DESC, part_a ASC, part_b ASC
    LIMIT {LIFT_TOP}
    """,
}
