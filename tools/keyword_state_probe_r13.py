"""r13 probe (VERDICT r12 #4): put a NUMBER on the stream_keyword_stats
state-partition exemption. Measures (a) the cost of estimating the
vocabulary-key state (tokenize + countDistinct — the price the
derivation would add per session), (b) the derived partition count it
would produce, (c) warm replay time at the session default vs at the
derived count (conf-scoped, fresh stream each run).

Usage: python tools/keyword_state_probe_r13.py <sf_dir>
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    from pyspark.sql import functions as F

    from gmallbiguan_parent_spark.functions import tokenize
    from gmallbiguan_parent_spark.io import load_table
    from gmallbiguan_parent_spark.session import get_spark
    from gmallbiguan_parent_spark.streaming.pipelines import _state_partitions
    from gmallbiguan_parent_spark.streaming.queries import QUERIES

    spark = get_spark("kw_state_probe")
    fn = QUERIES["stream_keyword_stats"]

    # (a) the estimate's own cost: tokenize + distinct over documents
    t0 = time.time()
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokenize("text")).alias("keyword"))
        .filter(F.length("keyword") >= 2)
        .select("keyword", "source")
        .distinct()
        .count()
    )
    est_cost = round(time.time() - t0, 2)
    derived = _state_partitions(spark, vocab)
    print(f"vocab_keys={vocab} estimate_cost_s={est_cost} derived_parts={derived}")

    fn(spark, sf_dir).count()  # session warm-up (codegen etc.)
    for parts in (int(spark.conf.get("spark.sql.shuffle.partitions")), derived,
                  int(spark.conf.get("spark.sql.shuffle.partitions")), derived):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            t0 = time.time()
            fn(spark, sf_dir).count()
            print(f"warm parts={parts}: {time.time()-t0:.2f}s", flush=True)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    main()
