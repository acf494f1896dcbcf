#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  python3 tools/check_oracle.py [sfdir] [outdir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfdir> <outdir>"` (unless --skip-verify)
2. Loads each <outdir>/<name> parquet (Spark result)
3. Runs the matching oracle SQL from <outdir>/oracle_sql.json in DuckDB with
   views for every test table
4. Compares schemas (column names, sorted) and row multisets exactly.
"""
import json, subprocess, sys, math
from pathlib import Path

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/graft_verify")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    p = f"{SFDIR}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ordered_cols = [cols[i] for i in order]
    canon_rows = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return ordered_cols, canon_rows

fails = 0
names = sorted(d.name for d in OUT.iterdir() if d.is_dir())
for name in names:
    got_rel = con.sql(f"SELECT * FROM '{OUT / name}/*.parquet'")
    g_cols, g_rows = canon(got_rel.columns, got_rel.fetchall())
    if name not in oracle:
        print(f"  ~ {name}: no oracle ({len(g_rows)} rows, rows-only check)")
        continue
    exp_rel = con.sql(oracle[name])
    e_cols, e_rows = canon(exp_rel.columns, exp_rel.fetchall())
    if [c.lower() for c in g_cols] != [c.lower() for c in e_cols]:
        print(f"  ✗ {name}: SCHEMA got={g_cols} exp={e_cols}")
        fails += 1
    elif g_rows != e_rows:
        print(f"  ✗ {name}: ROWS got={len(g_rows)} exp={len(e_rows)}")
        diff_g = [r for r in g_rows if r not in set(e_rows)][:3]
        diff_e = [r for r in e_rows if r not in set(g_rows)][:3]
        print(f"      only-in-got: {diff_g}\n      only-in-exp: {diff_e}")
        fails += 1
    else:
        print(f"  ✓ {name} ({len(g_rows)} rows)")

missing = set(oracle) - set(names)
for m in sorted(missing):
    print(f"  ✗ {m}: oracle declared but no Spark result written")
    fails += 1
print(f"{'FAIL' if fails else 'PASS'}: {len(names)} queries, {fails} mismatches")
sys.exit(1 if fails else 0)
