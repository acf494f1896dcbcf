#!/usr/bin/env python3
"""Cross-engine timing campaign over derived scales — the measurement
protocol PERF_VS_DUCKDB.md documents, automated end to end:

1. Poll tools/cpu_probe.py until the box is in a fast window (hypervisor
   steal on this host swings identical code 2-3.5x; campaigns measured in
   a slow window are discarded, not corrected).
2. Per scale: N fresh-JVM Spark sessions over the fair-gate subset
   (SPARK_GRAFT_ONLY), each already min-of-2 in-process; per-query MIN
   across sessions is the steady-state estimator.
3. DuckDB side: each gate's oracle SQL over the SAME parquet, 32 threads,
   min of 2.
4. Probes re-run between scales and at the end — a campaign whose closing
   probe is slow is reported as tainted.

Writes one JSON with everything (per-query, totals, marginals between
consecutive scales, probe readings).

Usage: python3 tools/campaign.py out.json label=dir [label=dir ...]
  e.g. python3 tools/campaign.py /tmp/camp.json sf1=/tmp/graft_sf1 sf10=/tmp/graft_sf10
Env: CAMPAIGN_SESSIONS (default 3), CAMPAIGN_SKIP_WAIT=1 (start even if
slow — for smoke-testing the harness only), CAMPAIGN_DUMP (verify dump dir
with oracle_sql.json, default /tmp/graft_verify).
"""
import json, os, re, subprocess, sys, time, pathlib

import duckdb

OUT = sys.argv[1]
SCALES = [a.split("=", 1) for a in sys.argv[2:]]
SESSIONS = int(os.environ.get("CAMPAIGN_SESSIONS", "3"))
DUMP = os.environ.get("CAMPAIGN_DUMP", "/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE = json.load(open(f"{DUMP}/oracle_sql.json"))
# Fair comparisons: same algorithm on both engines (mirrors bench_duckdb).
FAIR = sorted([k for k in ORACLE if k.startswith(("q", "vss_"))] + [
    "doc_text_stats", "doc_exact_dedup", "doc_lang_quality",
    "doc_quality_filter", "doc_det_sample",
    "doc_repetition", "doc_chunks", "doc_decontam",
    "doc_pii_redact", "doc_source_mix", "doc_top_ngrams", "doc_token_freq",
    "doc_pipeline_e2e", "doc_source_rates", "doc_url_domains",
    "doc_stopword_filter", "doc_split_assign", "doc_domain_caps",
    "doc_chunk_dedup", "doc_pack_sequences", "doc_pack_emit",
    # round-8 late additions, same-algorithm on both engines:
    "doc_substr_dedup", "emb_kmeans",
    # round-12: DSIR fit (hashed-ngram counts + integer weights, exact
    # replay both sides). The select/perplexity gates are digest-pinned
    # (constant-SELECT oracles) — never fair, do not add them.
    # round-14: the BPE gates (doc_bpe_token_count, doc_pack_sequences_bpe,
    # doc_source_mix_bpe) are also excluded: their oracle replays the merge
    # chain as ~90 nested string replaces over per-char-split words — a
    # correctness device, not DuckDB's best algorithm, so timing it would
    # flatter Spark. Same-algorithm timing for BPE is the PERF_VS_DUCKDB
    # round-14 scale receipt (train pass + 0.56 s sf10 scoring scan).
    "doc_dsir_weights",
    # round-16: retrieval gates — both engines run the same fit + fused
    # score (idf ppm-pinned so the replay is bit-exact) and, for hybrid,
    # the same int8-quantize + integer-L2 + RRF pipeline. doc_bpe_roundtrip
    # is EXCLUDED: its oracle is md5(replace(text,' ','')) — a correctness
    # statement, not an equivalent-work query.
    "doc_bm25_score", "doc_bm25_topk", "hybrid_rrf_topk"])


def probe():
    out = subprocess.run(["python3", "tools/cpu_probe.py"], cwd="/root/repo",
                         capture_output=True, text=True).stdout
    m = re.search(r"single=([\d.]+)s par32=([\d.]+)s", out)
    return (float(m.group(1)), float(m.group(2))) if m else (99.0, 99.0)


# IO-bracket thresholds (r14 verdict item 5), set from the r14c untainted
# baseline series: fdatasync 70.3-96.9 MB/s with psi_some avg10 0.00-0.18 /
# avg60 0.00-0.03 across all three brackets. A bracket reading well below
# that band (or real IO pressure) marks the campaign tainted — the r13/r14
# counter-audits proved virtio IO latency swings same-code gate timings
# 3-22x while the CPU probe stays fast.
IO_MBPS_MIN = 50.0
IO_PSI_AVG10_MAX = 10.0
IO_PSI_AVG60_MAX = 5.0


def io_fast(bracket):
    if not bracket or "error" in bracket:
        return False
    ok = bracket.get("fdatasync_mbps", 0.0) >= IO_MBPS_MIN
    m = re.search(r"avg10=([\d.]+) avg60=([\d.]+)", bracket.get("psi_some", ""))
    if m:
        ok = ok and float(m.group(1)) <= IO_PSI_AVG10_MAX \
            and float(m.group(2)) <= IO_PSI_AVG60_MAX
    return ok


def io_probe():
    """Disk-latency bracket (round-14 audit: the box's interference channel
    can be virtio IO, invisible to the CPU probe). Part of the taint gate
    since r15 (thresholds above, from the r14c baseline series); each
    bracket records its own pass/fail."""
    try:
        t0 = time.time()
        with open("/tmp/graft_io_probe", "wb") as f:
            f.write(b"\0" * (256 << 20))
            f.flush()
            os.fsync(f.fileno())
        mbps = 256 / max(time.time() - t0, 1e-9)
        os.unlink("/tmp/graft_io_probe")
        psi = ""
        try:
            psi = open("/proc/pressure/io").readline().strip()
        except OSError:
            pass
        b = {"fdatasync_mbps": round(mbps, 1), "psi_some": psi}
        b["pass"] = io_fast(b)
        return b
    except OSError as e:
        return {"error": str(e), "pass": False}


def fast(p):
    return p[0] < 0.80 and p[1] < 1.30


def wait_fast(max_wait_s=7200):
    t0 = time.time()
    while True:
        p = probe()
        b = io_probe()
        print(f"[probe] single={p[0]:.2f}s par32={p[1]:.2f}s "
              f"io={b.get('fdatasync_mbps')}MB/s pass={b.get('pass')}",
              flush=True)
        if (fast(p) and b.get("pass")) \
                or os.environ.get("CAMPAIGN_SKIP_WAIT") == "1":
            return p
        if time.time() - t0 > max_wait_s:
            print("[probe] no fast window within budget; proceeding TAINTED",
                  flush=True)
            return p
        time.sleep(120)


def spark_scale(sfdir):
    per = {}
    for i in range(SESSIONS):
        # Scale-unique path + fresh file per run: a stale file from a prior
        # scale must never be silently re-read if this session's JVM dies.
        out = f"/tmp/campaign_bench_{pathlib.Path(sfdir).name}_{i}.json"
        pathlib.Path(out).unlink(missing_ok=True)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir, BENCH_OUT=out,
                   SPARK_GRAFT_ONLY=",".join(FAIR))
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           cwd="/root/repo", env=env, capture_output=True,
                           text=True)
        try:
            if r.returncode != 0:
                raise RuntimeError(f"Bench exited {r.returncode} for {sfdir}")
            qs = json.load(open(out))["queries"]
        except Exception:
            print(r.stdout[-2000:], r.stderr[-1500:], flush=True)
            raise
        n = 0
        for k, v in qs.items():
            if isinstance(v, (int, float)):
                per[k] = min(per.get(k, 9e9), v)
                n += 1
        print(f"[spark {sfdir}] session {i + 1}/{SESSIONS}: {n} queries",
              flush=True)
    return per


def duck_scale(sfdir):
    # Each (scale, flag) pass runs in a SUBPROCESS (tools/duck_pass.py):
    # the sf10 packed-sequence string_agg exhausts the process native heap
    # (duck pool + fetchall conversion) and poisons every later in-process
    # connection; a subprocess returns the memory to the OS between
    # passes. Within a pass a failing gate gets a fresh connection, so an
    # OOM cannot cascade. Per-gate time = min over both
    # preserve_insertion_order settings x 2 runs each — the flag cuts both
    # ways on unordered queries (=true serializes heavy projection
    # pipelines, =false regresses some wide-output shapes), and the min is
    # the generous-to-the-baseline reading. Warmth lives in the OS page
    # cache, shared across passes.
    per = {}
    errs = {}
    names = [n for n in FAIR if n in ORACLE]
    for preserve in ("false", "true"):
        out = f"/tmp/duck_pass_{preserve}.json"
        r = subprocess.run(
            ["python3", "tools/duck_pass.py", sfdir, preserve,
             f"{DUMP}/oracle_sql.json", out] + names,
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[duckdb {sfdir}] pass preserve={preserve} CRASHED: "
                  f"{r.stderr[-300:]}", flush=True)
            continue
        res = json.loads(pathlib.Path(out).read_text())
        for k, v in res["times"].items():
            per[k] = min(per.get(k, 9e9), v)
        for k, v in res["errs"].items():
            print(f"[duckdb {sfdir}] {k} (preserve={preserve}) ERR {v}",
                  flush=True)
            errs[k] = v
    # A gate that succeeded under EITHER flag has a time; drop its error.
    for name in list(errs):
        if name in per:
            del errs[name]
    print(f"[duckdb {sfdir}] {len(per)} queries, {len(errs)} errors", flush=True)
    return per, errs


result = {"sessions": SESSIONS, "fair_n": len(FAIR), "probes": {},
          "io_probes": {}, "scales": {}}
result["probes"]["start"] = wait_fast()
result["io_probes"]["start"] = io_probe()
for label, sfdir in SCALES:
    d, derrs = duck_scale(sfdir)
    s = spark_scale(sfdir)
    both = sorted(set(d) & set(s))
    result["scales"][label] = {
        "dir": sfdir, "duck": d, "spark": s, "duck_errors": derrs,
        "duck_total": sum(d[k] for k in both),
        "spark_total": sum(s[k] for k in both),
    }
    result["probes"][f"after_{label}"] = probe()
    result["io_probes"][f"after_{label}"] = io_probe()
    print(f"[{label}] duck={result['scales'][label]['duck_total']:.2f}s "
          f"spark={result['scales'][label]['spark_total']:.2f}s", flush=True)

labels = [l for l, _ in SCALES]
result["marginals"] = {}
for a, b in zip(labels, labels[1:]):
    sa, sb = result["scales"][a], result["scales"][b]
    common = sorted(set(sa["duck"]) & set(sa["spark"]) &
                    set(sb["duck"]) & set(sb["spark"]))
    dd = sum(sb["duck"][k] for k in common) - sum(sa["duck"][k] for k in common)
    ds = sum(sb["spark"][k] for k in common) - sum(sa["spark"][k] for k in common)
    result["marginals"][f"{a}->{b}"] = {
        "duck": dd, "spark": ds,
        "ratio": (ds / dd) if dd > 0 else None}
result["tainted"] = (
    not all(fast(tuple(p)) for p in result["probes"].values())
    or not all(b.get("pass", False) for b in result["io_probes"].values()))
json.dump(result, open(OUT, "w"), indent=1)
print(json.dumps({k: v for k, v in result.items() if k != "scales"}, indent=1))
for a, b in zip(labels, labels[1:]):
    m = result["marginals"][f"{a}->{b}"]
    ratio = f"{m['ratio']:.2f}x" if m["ratio"] else "n/a"
    print(f"marginal {a}->{b}: duck={m['duck']:.2f}s spark={m['spark']:.2f}s "
          f"ratio={ratio}")
