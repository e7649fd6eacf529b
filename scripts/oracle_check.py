#!/usr/bin/env python3
"""Compare Verify.scala output parquet against the DuckDB oracle SQL.

Usage: oracle_check.py <verifyOutDir> <sfDir> [query ...]
Mirrors the driver's check: row count, schema (column names), and a hash of
the sorted row set.
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracle = json.load(f)

con = duckdb.connect()
# register tables
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
con.create_function  # noqa

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        print(f"{name}: MISSING spark output")
        continue
    try:
        srows = con.sql(f"SELECT * FROM '{files[0]}'").fetchall()
        scols = [d[0] for d in con.sql(f"SELECT * FROM '{files[0]}'").description]
        orows = con.sql(sql).fetchall()
        ocols = [d[0] for d in con.sql(sql).description]
    except Exception as e:
        fails.append((name, str(e)[:200]))
        print(f"{name}: ERR {str(e)[:200]}")
        continue
    ok_rows = len(srows) == len(orows)
    ok_schema = [c.lower() for c in scols] == [c.lower() for c in ocols]
    sset = sorted(tuple(canon(v) for v in r) for r in srows)
    oset = sorted(tuple(canon(v) for v in r) for r in orows)
    ok_hash = sset == oset
    status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append((name, f"rows={ok_rows} schema={ok_schema} hash={ok_hash}"))
        print(f"{name}: FAIL rows={len(srows)}/{len(orows)} schema={ok_schema} hash={ok_hash}")
        for a, b in list(zip(sset, oset))[:200]:
            if a != b:
                print("  spark:", a)
                print("  duck :", b)
                break
    else:
        print(f"{name}: OK ({len(srows)} rows)")
print("=" * 40)
print(f"{len(fails)} failures" if fails else "ALL GREEN")
sys.exit(1 if fails else 0)
