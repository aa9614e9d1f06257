"""Fresh-session 10x re-measure of the streaming SCALE rows affected by
the r12 state-partition derivation, with the derived counts printed.

Protocol (SCALE.md "Round-12 streaming state-partition derivation"):
one process per measurement — calib job, corpus key stats + derived
store counts, then ONE query timed cold. The 10x corpus is
/tmp/scale_sf1 (tools/scale_probe.py build).

Usage: python tools/stream_scale_probe_r12.py <sf_dir> <query> [...]
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
names = sys.argv[2:]
from gmallbiguan_parent_spark.pipelines import all_queries
from gmallbiguan_parent_spark.session import get_spark
from gmallbiguan_parent_spark.streaming.pipelines import (
    _events_key_stats, _state_partitions,
)
spark = get_spark("stream_10x")
t0=time.time()
spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy("k").count().write.format("noop").mode("overwrite").save()
out = {"_calib": round(time.time()-t0,3)}
n_users, span_us, n_rows = _events_key_stats(spark, sf_dir)
out["_stats"] = {"users": n_users, "span_h": span_us//3_600_000_000, "rows": n_rows}
out["_derived_parts"] = {
    "user_keyed (funnel/jump/sessions/payment)": _state_partitions(spark, n_users),
    "hour_windows (hour_append)": _state_partitions(spark, min(n_rows, span_us//3_600_000_000+1)),
    "user_x_day (uv_dedup)": _state_partitions(spark, min(n_rows, n_users*(span_us//86_400_000_000+1))),
}
qs = all_queries()
for name in names:
    t0=time.time()
    n = qs[name](spark, sf_dir).count()
    out[name] = {"s": round(time.time()-t0,2), "rows": n}
    print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
print(json.dumps(out))
