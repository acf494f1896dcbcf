#!/usr/bin/env python3
"""Derive a NULL-hardened copy of a correctness fixture dir (r15 verdict
item 6; embeddings added r16): every table is carried over unchanged
except `documents` (gains null-text rows — doc_ids past the original
range, text NULL, lang/source populated, n_chars NULL) and `embeddings`
(gains null-vector rows — vec_ids past the range, embedding NULL, label
populated) — so every text AND vector gate's null contract actually
fires in anger instead of resting untested on a fixture with zero
nulls. Run the full gate suite over it with:

    python3 tools/make_nulls_fixture.py            # -> /tmp/graft_sf001_nulls
    python3 tools/check_oracle.py /tmp/graft_sf001_nulls /tmp/graft_verify_nulls

Expected result: 104/105 green. The one mismatch is doc_fingerprints,
whose oracle is a digest PINNED to the exact sf0.01 corpus (any fixture
change moves it by construction). r16 verified the delta is EXACTLY the
7 null rows' deterministic contribution (md5 of "id|\\x00|\\x00|\\x00"
canon rows summed into the four digest registers) — the engine's null
handling is per contract; only the pin is corpus-specific.

The embeddings hardening (r16) caught, and the same commit fixed: IVF /
IVF-PQ layout builds NPE-ing on null vectors (array_to_vector); the
emb_semdedup oracle silently excluding the null rows the Spark contract
keeps; brute-force recall truths and the routed corpus ranking NULL
distances FIRST (Spark asc) and poisoning every query's truth set; and
24 oracle SQLs crashing outright (DuckDB's list_distance/cosine/ip
ERROR on a NULL list where Spark null-propagates) — the symmetric
cross-engine posture adopted everywhere is exclusion: a null vector
never enters an index or a distance computation.

Usage: python3 tools/make_nulls_fixture.py [outdir] [srcdir] [n_nulls]
"""
import pathlib, shutil, sys

import duckdb

OUT = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf001_nulls")
SRC = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
N_NULLS = int(sys.argv[3]) if len(sys.argv) > 3 else 7

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

OUT.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()

for t in TABLES:
    src = SRC / f"{t}.parquet"
    if not src.exists():
        continue
    dst = OUT / f"{t}.parquet"
    if t == "embeddings":
        # r16: the same hardening for the VECTOR gates — null-embedding
        # rows (vec_ids past the original range, embedding NULL, label
        # populated) so every vss_*/hybrid/cluster gate's null posture
        # fires in anger instead of resting on a fixture with zero null
        # vectors.
        base = con.execute(
            f"SELECT max(vec_id), count(*) FROM read_parquet('{src}')"
        ).fetchone()
        con.execute(f"""
            COPY (
              SELECT * FROM read_parquet('{src}')
              UNION ALL
              SELECT {base[0]} + 1 + r AS vec_id,
                     CAST(NULL AS FLOAT[]) AS embedding,
                     CAST(r % 4 AS INTEGER) AS label
              FROM range({N_NULLS}) t(r)
            ) TO '{dst}' (FORMAT parquet)
        """)
        print(f"embeddings: {base[1]} rows + {N_NULLS} null-vector rows -> {dst}")
        continue
    if t != "documents":
        if dst.exists() or dst.is_symlink():
            dst.unlink()
        # copy, not symlink: Spark's mtime-keyed layout caches (bucketed
        # tables, index staleness) must see this dir as its own fixture.
        shutil.copy(src, dst)
        continue
    base = con.execute(
        f"SELECT max(doc_id) AS m, count(*) AS n FROM read_parquet('{src}')"
    ).fetchone()
    max_id = base[0]
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{src}')
          UNION ALL
          -- lang/source stay inside the fixture's existing value families
          -- ('src<N>' is parsed by the source gates' rates apparatus);
          -- only text/n_chars go null.
          SELECT {max_id} + 1 + r AS doc_id,
                 CAST(NULL AS VARCHAR) AS text,
                 (SELECT min(lang) FROM read_parquet('{src}')) AS lang,
                 'src' || CAST(r % 3 AS VARCHAR) AS source,
                 CAST(NULL AS BIGINT) AS n_chars
          FROM range({N_NULLS}) t(r)
        ) TO '{dst}' (FORMAT parquet)
    """)
    print(f"documents: {base[1]} rows + {N_NULLS} null-text rows -> {dst}")

print(f"null-hardened fixture at {OUT}")
