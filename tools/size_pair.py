"""Cluster-size pair at a LARGE corpus: local[8] vs local[32] on 16M docs.

The 1M-doc ladder (tools/scaling_bench.py) carries the N->4N evidence; this
adds the second corpus size the scaling story needs — the same 8<->32 pair
at 16x the data, with positions-selective transfer enabled.  Interleaved
reps (8, 32, 8, 32) with taskset pinning, merged best-per-metric per level
(same drift methodology as scaling_bench).

Usage: python tools/size_pair.py [n_docs] [reps]   (default 16_000_000 2)
Appends {"pair_16m": ...} into BENCH/size_scaling.json after each rep.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS = {8: "0-7", 32: "0-31"}

RUN_SNIPPET = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
n_docs = {n_docs}
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
from lucene_plugin_spark.session import get_spark
spark = get_spark("size_pair", cores=cpus, shuffle_partitions=max(cpus, 2))
spark.sparkContext.setLogLevel("ERROR")
from lucene_plugin_spark.corpus import corpus_df_distributed
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

corpus_path = f"/tmp/lps_size_corpus_{{n_docs}}"
if not os.path.exists(corpus_path):
    corpus_df_distributed(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
src = spark.read.parquet(corpus_path)

wh = f"/tmp/lps_size_pair_wh_{{cpus}}"
shutil.rmtree(wh, ignore_errors=True)
catalog = Catalog(wh)
t0 = time.perf_counter()
IndexBuilder(spark, catalog, docs_per_slice=max(8192, n_docs // 96)).build(src)
build_sec = time.perf_counter() - t0

engine = SearchEngine(spark, catalog).warm()
from lucene_plugin_spark.corpus import _STEMS
def _mk_query(i):
    a = _STEMS[i % len(_STEMS)]
    b = _STEMS[(3 * i + 1) % len(_STEMS)]
    kind = i % 8
    if kind == 0: return a
    if kind == 1: return f"{{a}} {{b}}"
    if kind == 2: return f"{{a}} AND {{b}}"
    if kind == 3: return f'"{{a}} {{b}}"'
    if kind == 4: return a + b.capitalize()
    if kind == 5: return f"{{a}} -{{b}}"
    if kind == 6: return f"+{{a}} +{{b}}"
    return f"[{{a[:2]}} TO {{a[:2]}}z]"
batch = [(f"q{{i}}", None, _mk_query(i)) for i in range(64)]
runs = []
for _ in range(2):
    t1 = time.perf_counter()
    engine.search_many(batch, limit=10).count()
    runs.append(time.perf_counter() - t1)
batch_sec = min(runs)
out = {{"cpus": cpus, "n_docs": n_docs, "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "batch64_sec": round(batch_sec, 2),
        "batch_qps": round(64 / batch_sec, 2)}}
shutil.rmtree(wh, ignore_errors=True)
print("SIZE_PAIR_RESULT " + json.dumps(out))
"""


def run_at(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = RUN_SNIPPET.format(repo=REPO, n_docs=n_docs)
    cmd = ["taskset", "-c", PINS[cpus], sys.executable, "-c", code]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=7200)
    for line in p.stdout.splitlines():
        if line.startswith("SIZE_PAIR_RESULT "):
            return json.loads(line[len("SIZE_PAIR_RESULT "):])
    raise RuntimeError(f"size_pair at {cpus} cpus failed:\n"
                       f"{p.stdout[-3000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = os.path.join(REPO, "BENCH", "size_scaling.json")
    with open(path) as f:
        doc = json.load(f)
    key = f"pair_{n_docs // 1_000_000}m"
    entry = doc.get(key) or {
        "methodology": "8<->32 core pair at the large corpus, interleaved "
                       "reps, taskset-pinned, merged best-per-metric per "
                       "level (drift control; see scaling.json); efficiency "
                       "= speedup/4",
        "epochs": []}
    doc[key] = entry
    for rep in range(reps):
        for c in (8, 32):
            r = run_at(c, n_docs)
            entry["epochs"].append(r)
            print(f"rep{rep} level {c}: {json.dumps(r)}", flush=True)
            best = {}
            for c2 in (8, 32):
                es = [e for e in entry["epochs"] if e["cpus"] == c2]
                if es:
                    best[c2] = {
                        "build_sec": min(e["build_sec"] for e in es),
                        "build_docs_per_sec": max(e["build_docs_per_sec"]
                                                  for e in es),
                        "batch64_sec": min(e["batch64_sec"] for e in es),
                        "batch_qps": max(e["batch_qps"] for e in es)}
            entry["best"] = best
            if len(best) == 2:
                entry["pair_8_to_32"] = {
                    "build_speedup": round(best[8]["build_sec"]
                                           / best[32]["build_sec"], 3),
                    "build_efficiency": round(best[8]["build_sec"]
                                              / best[32]["build_sec"] / 4, 3),
                    "batch_speedup": round(best[32]["batch_qps"]
                                           / best[8]["batch_qps"], 3),
                    "batch_efficiency": round(best[32]["batch_qps"]
                                              / best[8]["batch_qps"] / 4, 3)}
            with open(path, "w") as f:
                json.dump(doc, f, indent=2)


if __name__ == "__main__":
    main()
