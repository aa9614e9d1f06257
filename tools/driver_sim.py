"""Simulate the per-round driver: plain SparkSession (NO engine
configs — exactly what the correctness driver hands the engine), import
__spark_entry__, smoke entry(), then run the first 50 queries() against
oracle_sql() with float-canonicalized compare.

Run this before every round handoff: verify_local uses get_spark(), so
only this script catches configs the engine forgot to re-apply on a
foreign session (the events nanosAsLong read, session timezone, etc.).

Usage: python tools/driver_sim.py
"""
import sys, time, decimal, math, datetime
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]").appName("driver_sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
import duckdb

rows = e.entry(spark).collect()
print(f"SMOKE entry: {len(rows)} rows", flush=True)

qs = e.queries(); oracles = e.oracle_sql()
con = duckdb.connect()
from gmallbiguan_parent_spark.io import TABLES
SF = "/root/testdata/sf0.01"
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal): return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

fails = []
for i, (name, fn) in enumerate(qs.items()):
    if i >= 50: break
    try:
        sdf = fn(spark, SF); srows = sdf.collect(); scols = sdf.columns
    except Exception as ex:
        print(f"FAIL {name}: spark {ex}", flush=True); fails.append(name); continue
    if name not in oracles:
        print(f"rows-only {name}: {len(srows)}", flush=True); continue
    ores = con.execute(oracles[name]); ocols = [d[0] for d in ores.description]; orows = ores.fetchall()
    ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols)
    if ok:
        idx_s = sorted(range(len(scols)), key=lambda j: scols[j])
        idx_o = sorted(range(len(ocols)), key=lambda j: ocols[j])
        ss = sorted("|".join(canon(r[j]) for j in idx_s) for r in srows)
        oo = sorted("|".join(canon(r[j]) for j in idx_o) for r in orows)
        ok = ss == oo
    if not ok:
        print(f"FAIL {name}", flush=True); fails.append(name)
print(f"DONE: {50 - len(fails)}/50 window queries pass under a PLAIN driver session; fails={fails}", flush=True)
sys.exit(1 if fails else 0)
