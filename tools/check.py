#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py [outDir] [sfDir]

Reads the parquet results dumped by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB over the same fixture parquet, and compares
schema (sorted column names), row count, and the value hash the driver
uses (columns sorted by name, rows in result order).

Dev-only tool (driver-side python libs); the shipped library is pure Scala.
"""
import sys, json, glob, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftout"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name in sorted(oracle):
    qdir = os.path.join(out, name)
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark result dir")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        exp = con.sql(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    g = got[gc].round(9) if len(got) else got[gc]
    e = exp[ec].round(9) if len(exp) else exp[ec]
    same = g.reset_index(drop=True).equals(e.reset_index(drop=True))
    if not same:
        print(f"FAIL {name}: values differ")
        diff = (g.reset_index(drop=True) != e.reset_index(drop=True))
        try:
            idx = diff.any(axis=1)
            print("  spark:", g.reset_index(drop=True)[idx].head(5).to_dict("records"))
            print("  duckdb:", e.reset_index(drop=True)[idx].head(5).to_dict("records"))
        except Exception:
            pass
        fails += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")

extra = [os.path.basename(d) for d in glob.glob(os.path.join(out, "*"))
         if os.path.isdir(d) and os.path.basename(d) not in oracle]
if extra:
    print(f"note: queries without oracle (rows-only check): {sorted(extra)}")
print("PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
