"""Scaling-efficiency evidence (BASELINE.json north rule: >=0.8 throughput
scaling efficiency from N to 4N executors, evidenced at two local parallelism
levels on identical input).

Runs the same index build + query batch at local[8] and local[32] over ONE
pre-generated parquet corpus, in separate JVMs, and writes
BENCH/BASELINE.md + BENCH/scaling.json.

Usage: python tools/scaling_bench.py [n_docs]  (default 200000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/lps_scaling_corpus"

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
IndexBuilder(spark, catalog, docs_per_slice=max(2048, n_docs // 64)).build(src)
build_sec = time.perf_counter() - t0

engine = SearchEngine(spark, catalog)
queries = ["get", "user name", "index query cache", "parse AND token",
           '"get user"', "segment -merge", "getUserName", "[se TO st]"]
lat = []
t0 = time.perf_counter()
for rep in range(2):
    for q in queries:
        t1 = time.perf_counter()
        engine.search(None, q, limit=10).collect()
        lat.append(time.perf_counter() - t1)
query_sec = time.perf_counter() - t0
lat.sort()
out = {{"cpus": cpus, "n_docs": n_docs, "build_sec": round(build_sec, 2),
       "build_docs_per_sec": round(n_docs / build_sec, 1),
       "n_queries": len(lat), "query_total_sec": round(query_sec, 2),
       "query_p50_ms": round(1000 * lat[len(lat) // 2], 1),
       "query_p95_ms": round(1000 * lat[int(len(lat) * 0.95) - 1], 1),
       "queries_per_sec": round(len(lat) / query_sec, 2)}}
shutil.rmtree(wh, ignore_errors=True)
print("SCALING_RESULT " + json.dumps(out))
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = RUN_SNIPPET.format(repo=REPO, corpus=CORPUS)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"run at {cpus} cpus failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    if not os.path.exists(CORPUS):
        sys.path.insert(0, REPO)
        from lucene_plugin_spark.corpus import corpus_df_distributed
        from lucene_plugin_spark.session import get_spark
        spark = get_spark("gen", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        corpus_df_distributed(spark, n_docs).write.mode("overwrite").parquet(CORPUS)
        spark.stop()

    r8 = run_at(8)
    r32 = run_at(32)
    build_speedup = r8["build_sec"] / r32["build_sec"]
    build_eff = build_speedup / 4.0
    q_speedup = r8["query_total_sec"] / r32["query_total_sec"]
    q_eff = q_speedup / 4.0
    result = {"N": r8, "4N": r32,
              "build_speedup_8_to_32": round(build_speedup, 3),
              "build_scaling_efficiency": round(build_eff, 3),
              "query_speedup_8_to_32": round(q_speedup, 3),
              "query_scaling_efficiency": round(q_eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
