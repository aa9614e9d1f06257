"""Local replica of the driver's correctness gate.

Runs every query in __spark_entry__.queries() at a given sf_dir AND its
DuckDB oracle, compares row count, column names, and an
order-insensitive value representation. Exact-match by default: sorted
rows rendered to canonical strings must be identical.

On a full (unscoped) run, also writes CORRECTNESS_LOCAL.json in the
driver's CORRECTNESS format — the machine-readable evidence for the
queries beyond the driver gate's 50-query window.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    """Canonical string for a cell value, engine-agnostic."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Mirror the driver's canonicalization: DuckDB decimals surface as
        # float64 while Spark yields decimal.Decimal — round-1 showed str()
        # here hides exactly that mismatch (29 hash-fails). Compare as floats.
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_repr(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("|".join(canon(r[i]) for i in idx))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from gmallbiguan_parent_spark.io import TABLES
    from gmallbiguan_parent_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            record[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "err": f"spark: {e}"}
            continue
        if name not in oracles:
            print(f"okNO-ORACLE {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            record[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(srows), "oracle_rows": None,
                            "err": None, "note": "rows-only (no SQL-expressible oracle)"}
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            record[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "err": f"duckdb: {e}"}
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = False
        problems = []
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not schema_match:
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sr = rows_repr(scols, [tuple(r) for r in srows])
            dr = rows_repr(ocols, orows)
            hash_match = sr == dr
            if not hash_match:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": len(srows),
                        "oracle_rows": len(orows), "err": None}
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"ok {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    checked = len(record)
    print(f"\n{checked - len(failed)}/{checked} passed")
    if not only:
        payload = {
            "generated_by": "tools/verify_local.py (driver-format local gate)",
            "sf_dir": sf_dir,
            "checked": len(record),
            "passed": len(record) - len(failed),
            "results": record,
        }
        with open("/root/repo/CORRECTNESS_LOCAL.json", "w") as fh:
            json.dump(payload, fh, indent=2)
        print("wrote CORRECTNESS_LOCAL.json")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
