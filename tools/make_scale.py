#!/usr/bin/env python3
"""Derive a larger scale factor from the driver's sf0.1 fixtures by keyed
replication — bench-only data (no oracle hash compare at this scale; both
engines read the SAME derived parquet, so the timing comparison is fair).

Replication design (replica r in 0..N-1, key offset r * 100_000_000):
 - region/nation: copied (dimension tables don't scale in TPC-H either)
 - customer/supplier/part/orders/lineitem: keys AND foreign keys offset
   together, so join fan-out scales with the data (replica 0 = original)
 - events: event_id/user_id offset -> 10x users, same time range
   (generated in DuckDB so TIMESTAMP_NS survives; Spark cannot write nanos)
 - documents: doc_id offset, one replica token appended to the text ->
   cross-replica pairs are REAL near-duplicates (J ~= 0.97), the workload a
   replicated corpus actually presents to the dedup pipelines
 - embeddings: vec_id offset, a per-(row, replica) exact-binary constant
   added to every component -> no artificial exact-tie distances

Usage: python3 tools/make_scale.py [factor] [outdir] [srcdir]
Defaults: 10 /tmp/graft_sf1 /root/testdata/sf0.1
"""
import pathlib, sys

import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1")
SRC = pathlib.Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
OFF = 100_000_000

OUT.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute(f"CREATE VIEW r AS SELECT * FROM range({FACTOR}) t(rep)")


# Row groups are the parallelism quantum for BOTH engines (Spark splits
# at row-group boundaries; DuckDB schedules one thread per row group), so
# size them for ~10+ groups per table at this scale. A single-row-group
# file serializes every scan of it no matter how many cores exist.
GROUP_ROWS = {"lineitem": 131072, "orders": 131072, "events": 131072,
              "customer": 16384, "supplier": 16384, "part": 16384,
              "documents": 4096, "embeddings": 2048}


def emit(table, sql):
    src = SRC / f"{table}.parquet"
    dst = OUT / f"{table}.parquet"
    rg = GROUP_ROWS.get(table, 262144)
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}')")
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"{table}: {n} rows")


emit("region", "SELECT * FROM src")
emit("nation", "SELECT * FROM src")
emit("customer", f"""
  SELECT c_custkey + rep * {OFF} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM src, r""")
emit("supplier", f"""
  SELECT s_suppkey + rep * {OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM src, r""")
emit("part", f"""
  SELECT p_partkey + rep * {OFF} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM src, r""")
emit("orders", f"""
  SELECT o_orderkey + rep * {OFF} AS o_orderkey,
         o_custkey + rep * {OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM src, r""")
emit("lineitem", f"""
  SELECT l_orderkey + rep * {OFF} AS l_orderkey,
         l_partkey + rep * {OFF} AS l_partkey,
         l_suppkey + rep * {OFF} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM src, r""")
# events goes through pyarrow, not DuckDB, so the source's exact timestamp
# logical type survives (timestamp[us] since the round-6 fixture regen;
# timestamp[ns] before it — DuckDB would silently coerce either to its own
# write convention, changing what the Spark side reads).
def emit_events():
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(SRC / "events.parquet")
    reps = []
    for rep in range(FACTOR):
        x = t
        for key in ("event_id", "user_id"):
            i = x.schema.get_field_index(key)
            x = x.set_column(i, key, pc.add(x.column(key), rep * OFF))
        reps.append(x)
    out = pa.concat_tables(reps)
    pq.write_table(out, OUT / "events.parquet", version="2.6",
                   coerce_timestamps=None, row_group_size=GROUP_ROWS["events"])
    print(f"events: {out.num_rows} rows (pyarrow, source timestamp type preserved)")


emit_events()
emit("documents", f"""
  SELECT doc_id + rep * {OFF} AS doc_id,
         CASE WHEN rep = 0 THEN text ELSE text || ' rep' || rep END AS text,
         lang, source, n_chars
  FROM src, r""")
emit("embeddings", f"""
  SELECT vec_id + rep * {OFF} AS vec_id,
         CASE WHEN rep = 0 THEN embedding ELSE list_transform(embedding,
           x -> x + ((CAST(hash(vec_id * 131 + rep) % 64 AS BIGINT) - 32)
                     * 0.015625)::FLOAT) END AS embedding,
         label
  FROM src, r""")
print(f"done -> {OUT}")
