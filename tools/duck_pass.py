#!/usr/bin/env python3
"""One DuckDB timing pass for tools/campaign.py — runs in a SUBPROCESS so
the native heap (duckdb buffer pool + fetchall conversion) is returned to
the OS between passes; an in-process pass at sf10 exhausted the heap on
the packed-sequence string_agg and poisoned every later connection.

Usage: python3 tools/duck_pass.py <sfdir> <true|false> <oracle.json> <out.json> <name> [name ...]
Writes {"times": {name: min_seconds}, "errs": {name: msg}}.
"""
import json, pathlib, sys, time

import duckdb

SFDIR, PRESERVE, ORACLE_PATH, OUT = sys.argv[1:5]
NAMES = sys.argv[5:]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ORACLE = json.loads(pathlib.Path(ORACLE_PATH).read_text())


def conn():
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"SET preserve_insertion_order={PRESERVE}")
    # Spill rather than OOM on memory-heavy shapes (sf10 string_agg), and
    # leave native headroom for result conversion.
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        p = pathlib.Path(SFDIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def reconnect():
    """Fresh connection with backoff: right after an OOM the dying pool's
    pages may not be reclaimed yet and even tiny allocations fail."""
    import gc
    gc.collect()
    for delay in (0.5, 3, 10):
        time.sleep(delay)
        try:
            return conn()
        except Exception:
            gc.collect()
    return None


times, errs = {}, {}
con = conn()
for name in NAMES:
    if con is None:
        errs.setdefault(name, "no connection (pool unrecoverable after OOM)")
        continue
    try:
        for _ in range(2):
            t0 = time.time()
            con.execute(ORACLE[name]).fetchall()
            times[name] = min(times.get(name, 9e9), time.time() - t0)
    except Exception as e:
        errs[name] = f"{type(e).__name__}: {e}"[:300]
        # Fresh connection so one failing gate cannot cascade.
        try:
            con.close()
        except Exception:
            pass
        con = reconnect()
# ALWAYS write the pass result — partial data beats a crashed pass (the
# other flag's pass and the per-gate min still salvage the campaign).
pathlib.Path(OUT).write_text(json.dumps({"times": times, "errs": errs}))
