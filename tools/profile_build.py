"""Per-stage build profile at pinned CPU budgets — evidence for the N->4N
build-scaling analysis (which stage stops scaling, and why).

Runs the full index build on the 1M-doc scaling corpus at each requested
core count (taskset-pinned, fresh JVM + warehouse per level) and reports
wall time per stage: ingest (docs write), count, docs_meta (range shuffle +
id assignment), segments (fused tokenize->blocks pass), derived (norms +
term_dict chains).

Usage: python tools/profile_build.py [cores ...]   (default: 8 32)
Writes BENCH/build_profile.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/lps_scaling_corpus_1m"

LEVELS = {1: "0", 2: "0,1", 4: "0-3", 8: "0-7", 16: "0-15", 32: "0-31"}

RUN = r"""
import json, shutil, sys, time, os
sys.path.insert(0, {repo!r})
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
from lucene_plugin_spark.session import get_spark
spark = get_spark("profile", cores=cpus, shuffle_partitions=max(cpus, 2))
spark.sparkContext.setLogLevel("ERROR")
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.storage.catalog import Catalog
src = spark.read.parquet({corpus!r})
n_docs = src.count()
wh = f"/tmp/lps_profile_wh_{{cpus}}"
shutil.rmtree(wh, ignore_errors=True)
catalog = Catalog(wh)
b = IndexBuilder(spark, catalog, docs_per_slice=max(8192, n_docs // 96))
t0 = time.perf_counter()
snap = b.ingest_docs(src)
t_ingest = time.perf_counter() - t0
t1 = time.perf_counter()
b.build_from_docs(snap)
total = time.perf_counter() - t0
out = {{"cpus": cpus, "n_docs": n_docs, "total_sec": round(total, 2),
       "ingest_sec": round(t_ingest, 2),
       "stages": b.stage_times,
       "docs_per_sec": round(n_docs / total, 1)}}
shutil.rmtree(wh, ignore_errors=True)
print("PROFILE_RESULT " + json.dumps(out))
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = RUN.format(repo=REPO, corpus=CORPUS)
    cmd = ["taskset", "-c", LEVELS[cpus], sys.executable, "-c", code]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=7200)
    for line in p.stdout.splitlines():
        if line.startswith("PROFILE_RESULT "):
            return json.loads(line[len("PROFILE_RESULT "):])
    raise RuntimeError(f"profile at {cpus} failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    if not os.path.exists(CORPUS):
        sys.path.insert(0, REPO)
        from lucene_plugin_spark.corpus import corpus_df_distributed
        from lucene_plugin_spark.session import get_spark
        spark = get_spark("gen", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        corpus_df_distributed(spark, 1_000_000).write.mode("overwrite").parquet(CORPUS)
        spark.stop()
    results = {}
    for c in levels:
        results[c] = run_at(c)
        print(f"level {c}: {json.dumps(results[c])}", flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "build_profile.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
