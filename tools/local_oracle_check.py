#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate (dev tooling only — the
engine itself is pure Scala/Spark). Mimics the driver: run each
oracle_sql.json query in DuckDB over the sf tables, compare against the
Spark parquet dumps from graft.Verify (columns sorted by name, rows
sorted, values compared exactly)."""
import json, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").fetchdf()
        exp = con.sql(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"query error: {e}")); continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols spark={list(got.columns)} oracle={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows spark={len(got)} oracle={len(exp)}")); continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    diff_cols = []
    for c in got.columns:
        a, b = gs[c], es[c]
        if str(a.dtype) != str(b.dtype):
            diff_cols.append(f"{c} dtype {a.dtype}!={b.dtype}")
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            diff_cols.append(f"{c} row{i}: spark={a[i]!r} oracle={b[i]!r} ({int((~eq).sum())} diffs)")
    if diff_cols:
        fails.append((name, "; ".join(diff_cols[:3])))
    else:
        passes.append(name)

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
