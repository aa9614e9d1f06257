"""Skew probe: build an events table where ONE user owns ~45% of all
rows (the hot-key case that breaks naive hash/sort-merge joins at
scale), then measure the payment-activity pair join four ways:

1. PLAIN, AQE at default thresholds — the hot key's pay x act pair
   enumeration (~700M row comparisons) lands in ONE sort-merge task;
   the default 256 MB skewedPartitionThresholdInBytes never fires at
   probe scale, so this is the unmitigated baseline.
2. PLAIN, AQE with the skew thresholds scaled DOWN in proportion to the
   probe and forceOptimizeSkewedJoin on: OptimizeSkewedJoin splits the
   hot partition into sub-ranges and replicates the matching other
   side — the mitigation a 100 TB job gets at default thresholds once
   partitions are genuinely large (see SKEW_CONFS comments for the two
   engagement subtleties this probe surfaced).
3. salted_join(n=16) — the explicit mitigation for when one KEY exceeds
   what even a split task should hold: scatter one side by salt,
   replicate the other.
4. Result equivalence asserted across all variants.

Writes SKEW.md with wall times. Hot-key sizing: user 1 has 12
purchases + 26 view/clicks per copy; HOT_COPIES=1500 makes the single
key enumerate 12*1500 x 26*1500 = ~700M pairs — minutes in one task,
so the mitigation effect is far outside noise.

Usage: python tools/skew_probe.py      (~5-10 min)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/skew_events"
HOT_COPIES = 1500  # hot user: ~18k purchases x ~39k activities = ~700M pairs

# Broadcast is disabled in EVERY variant: at probe scale the filtered
# pay side fits a broadcast, and a broadcast-hash join has no key skew
# at all (the streamed side partitions arbitrarily) — which is exactly
# why the earlier probe measured nothing. At 100 TB neither fact side
# broadcasts, so the shuffle-join regime below is the one that matters.
_NO_BCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

SKEW_CONFS = {
    # production defaults (what variant 1 runs under)
    "default": {
        **_NO_BCAST,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
    },
    # thresholds scaled to probe size. TWO subtleties this probe
    # surfaced, both relevant at 100 TB:
    # - skew thresholds compare COMPRESSED map-output bytes, and a
    #   hot key's rows are maximally compressible (a run of identical
    #   keys), so a partition holding ~700M-comparison fan-out
    #   compresses to under 256 KB here — byte thresholds UNDERSTATE
    #   row-skew whenever hot keys compress better than the median.
    # - the downstream groupBy(pay_user) REUSES the join's hash
    #   partitioning, and OptimizeSkewedJoin refuses any split that
    #   introduces an extra shuffle unless forced — a skewed join
    #   feeding a same-key aggregate gets NO free AQE mitigation at
    #   any threshold without forceOptimizeSkewedJoin.
    "tuned": {
        **_NO_BCAST,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    },
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import load_table

    shutil.rmtree(DST, ignore_errors=True)
    ev = load_table(spark, SRC, "events")
    # replicate the hot user's rows via explode (HOT_COPIES-branch
    # unions don't analyze at this count)
    hot = (
        ev.filter(F.col("user_id") == 1)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(HOT_COPIES))))
        .withColumn(
            "event_id",
            F.col("event_id").cast("long")
            + F.col("i").cast("long") * F.lit(50_000_000).cast("long"),
        )
        .drop("i")
    )
    ev.withColumn("event_id", F.col("event_id").cast("long")).unionByName(
        hot
    ).repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")


def _sides(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    pay = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"), F.col("user_id").alias("pay_user"),
        F.col("ts").alias("pay_ts"),
    )
    act = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("act_id"), F.col("user_id").alias("act_user"),
        F.col("ts").alias("act_ts"),
    )
    return pay, act


def pair_join_plain(spark, sf_dir: str):
    from pyspark.sql import functions as F

    pay, act = _sides(spark, sf_dir)
    return pay.join(
        act,
        (F.col("pay_user") == F.col("act_user"))
        & (F.col("act_ts") <= F.col("pay_ts"))
        & (F.unix_micros("act_ts") > F.unix_micros("pay_ts") - 1800 * 1_000_000),
    ).groupBy("pay_user").count()


def pair_join_salted(spark, sf_dir: str):
    """Salting for a skewed RANGE join: scatter the hot side by salting
    the PAY side key and replicating the ACT side — each hot-key task
    handles 1/n of the pairs."""
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.operators.joins import salted_join

    pay, act = _sides(spark, sf_dir)
    joined = salted_join(pay, act, "pay_user", "act_user", n_salt=16)
    return (
        joined.filter(
            (F.col("act_ts") <= F.col("pay_ts"))
            & (F.unix_micros("act_ts") > F.unix_micros("pay_ts") - 1800 * 1_000_000)
        )
        .groupBy("pay_user")
        .count()
    )


def _timed(spark, confs: dict[str, str], fn):
    for k, v in confs.items():
        spark.conf.set(k, v)
    t0 = time.time()
    df = fn()
    # collect() (not count()) so the EXECUTED plan we inspect for the
    # skew=true annotation is this DataFrame's own queryExecution —
    # count() plans a separate aggregate and leaves df's plan unrun
    rows = df.collect()
    t = round(time.time() - t0, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return rows, len(rows), t, ("skew=true" in plan)


def main() -> None:
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("skew_probe")
    spark.range(1000).count()
    # snapshot the session's pre-probe values of every conf we touch
    baseline = {}
    for k in set(SKEW_CONFS["default"]) | set(SKEW_CONFS["tuned"]):
        try:
            baseline[k] = spark.conf.get(k)
        except Exception:
            pass  # unset in this session; restored via unset afterwards
    t0 = time.time()
    build(spark)
    print(f"# build: {round(time.time() - t0, 1)}s", file=sys.stderr)

    plain_rows, n_plain, t_plain, skew_plain = _timed(
        spark, SKEW_CONFS["default"], lambda: pair_join_plain(spark, DST)
    )
    tuned_rows, n_tuned, t_tuned, skew_tuned = _timed(
        spark, SKEW_CONFS["tuned"], lambda: pair_join_plain(spark, DST)
    )
    salt_rows, n_salt, t_salt, _ = _timed(
        spark, SKEW_CONFS["default"], lambda: pair_join_salted(spark, DST)
    )
    # restore EVERY conf any variant touched to its pre-probe value
    # (unset keys restored via conf.unset) — a later query in this
    # session must plan under the session's real defaults, not the
    # probe's broadcast-off/forced-skew regime
    touched = set(SKEW_CONFS["default"]) | set(SKEW_CONFS["tuned"])
    for k in touched:
        if k in baseline:
            spark.conf.set(k, baseline[k])
        else:
            spark.conf.unset(k)

    a = {(r.pay_user, r["count"]) for r in plain_rows}
    b = {(r.pay_user, r["count"]) for r in tuned_rows}
    c = {(r.pay_user, r["count"]) for r in salt_rows}
    assert a == b == c, "mitigated join result diverged"

    lines = [
        "# SKEW — hot-key probe",
        "",
        f"events with one user's rows replicated {HOT_COPIES}x: the hot key is",
        "~45% of the table and its pay x act sort-merge enumeration is ~700M",
        "row comparisons — ONE task without mitigation. Broadcast is disabled",
        "in every variant (a broadcast-hash join has no key skew, which is",
        "what masked the earlier probe; at 100 TB neither fact side",
        "broadcasts). The 'tuned' row scales AQE's thresholds to probe size",
        "AND sets forceOptimizeSkewedJoin — two findings worth recording:",
        "skew thresholds compare COMPRESSED map-output bytes and a hot key's",
        "identical-key run compresses far better than the median (byte",
        "thresholds understate row-skew), and a skewed join feeding a",
        "same-key aggregate is never split without the force flag (the",
        "split would add a shuffle the reused partitioning avoided).",
        "",
        "| variant | wall s | rows | AQE skew-split engaged |",
        "|---|---|---|---|",
        f"| plain join (AQE defaults) | {t_plain} | {n_plain} | {skew_plain} |",
        f"| plain join (AQE thresholds scaled to probe) | {t_tuned} | {n_tuned} | {skew_tuned} |",
        f"| salted_join(n=16) | {t_salt} | {n_salt} | n/a (pre-scattered) |",
        "",
        "All three variants produce the identical result set (asserted).",
        "Levers at 100 TB, in order: AQE skew-join splitting first (free at",
        "default thresholds once partitions are actually large), then explicit",
        "salting when a single KEY exceeds what one split task should hold",
        "(salted_join spreads each hot key over n_salt tasks by construction).",
    ]
    with open("/root/repo/SKEW.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[9:14]))


if __name__ == "__main__":
    main()
