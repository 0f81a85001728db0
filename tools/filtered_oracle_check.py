#!/usr/bin/env python3
"""local_oracle_check for a PARTIAL graft.Verify dump (dev tooling):
checks only the queries that actually have parquet output in out_dir —
the dev loop for SPARK_GRAFT_QUERIES-filtered Verify runs. Same
compare as local_oracle_check.py (columns sorted, rows sorted, exact)."""
import json, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = [n for n in sorted(oracle) if glob.glob(f"{out_dir}/{n}/*.parquet")]
fails, passes = [], []
for name in names:
    # read EVERY part file: a multi-part Verify dump compared via
    # files[0] alone surfaces as a spurious row-count FAIL
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchdf()
        exp = con.sql(oracle[name]).fetchdf()
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
    diff = []
    for c in got.columns:
        a, b = gs[c], es[c]
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            diff.append(f"{c} row{i}: spark={a[i]!r} oracle={b[i]!r}")
    if diff:
        fails.append((name, "; ".join(diff[:3])))
    else:
        passes.append(name)

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(("PASS" if not fails else "FAIL") +
      f" {len(passes)}/{len(names)}: " + " ".join(passes))
sys.exit(1 if fails else 0)
