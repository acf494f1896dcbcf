#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICT.

Usage:
  python3 tools/check_oracle.py [sfdir] [outdir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfdir> <outdir>"` (unless --skip-verify)
2. Loads each <outdir>/<name> parquet (Spark result) with pandas
3. Runs the matching oracle SQL from <outdir>/oracle_sql.json in DuckDB with
   views for every test table
4. Mirrors the driver: sort columns by name, sort rows by all columns, then
   require EXACT value equality (no rounding slop) and compatible dtypes.
   A LIST-typed column in a multi-row result is flagged (the driver's
   comparator crashes on those — CORRECTNESS_r01).
"""
import json, subprocess, sys, math
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

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


def prepare(df: pd.DataFrame):
    """Sort columns by name, then rows by all columns (driver's canon)."""
    df = df[sorted(df.columns)]
    listy = [c for c in df.columns
             if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()]
    if listy and len(df) > 1:
        return None, f"LIST column(s) {listy} in multi-row result (driver comparator crashes)"
    if not listy and len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, None


def cell_eq(a, b):
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if isinstance(a, (list, np.ndarray)) else a
        b = list(b) if isinstance(b, (list, np.ndarray)) else b
        if not isinstance(a, list) or not isinstance(b, list) or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) \
            or (isinstance(b, float) and math.isnan(b)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)  # EXACT — no rounding slop
    return a == b


fails = 0
names = sorted(d.name for d in OUT.iterdir() if d.is_dir())
for name in names:
    got = pd.read_parquet(sorted(Path(f"{OUT}/{name}").glob("*.parquet")))
    if name not in oracle:
        print(f"  ~ {name}: no oracle ({len(got)} rows, rows-only check)")
        continue
    exp = con.sql(oracle[name]).df()
    g, gerr = prepare(got)
    e, eerr = prepare(exp)
    if gerr or eerr:
        print(f"  ✗ {name}: {gerr or eerr}")
        fails += 1
        continue
    if [c.lower() for c in g.columns] != [c.lower() for c in e.columns]:
        print(f"  ✗ {name}: SCHEMA got={list(g.columns)} exp={list(e.columns)}")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"  ✗ {name}: ROWS got={len(g)} exp={len(e)}")
        fails += 1
        continue
    bad = None
    for c_g, c_e in zip(g.columns, e.columns):
        gk, ek = g[c_g].dtype.kind, e[c_e].dtype.kind
        if gk != ek and {gk, ek} != {"O"} and not ({gk, ek} <= {"i", "u"}):
            bad = f"DTYPE {c_g}: got={g[c_g].dtype} exp={e[c_e].dtype}"
            break
        for i in range(len(g)):
            if not cell_eq(g[c_g].iloc[i], e[c_e].iloc[i]):
                bad = (f"VALUE {c_g}[{i}]: got={g[c_g].iloc[i]!r} "
                       f"exp={e[c_e].iloc[i]!r}")
                break
        if bad:
            break
    if bad:
        print(f"  ✗ {name}: {bad}")
        fails += 1
    else:
        print(f"  ✓ {name} ({len(g)} rows)")

missing = set(oracle) - set(names)
for m in sorted(missing):
    print(f"  ✗ {m}: oracle declared but no Spark result written")
    fails += 1
print(f"{'FAIL' if fails else 'PASS'}: {len(names)} queries, {fails} mismatches")
sys.exit(1 if fails else 0)
