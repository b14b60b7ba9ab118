"""Standalone-cluster executor-process pairs on ONE box: separate the
executor-JVM-count variable from the socket's memory-bandwidth wall.

The 8->32 local[N] pair (BENCH/BASELINE.md) is attributed to this host's
single-socket bandwidth/disk limit, with a pure-CPU control and per-stage
A/B as evidence.  One question that evidence leaves open: does packing all
executor threads into ONE JVM (local mode) itself cost scaling — GC, lock
contention, a shared Python-worker pool?  This harness answers it by
running the SAME job through a real standalone cluster (master + worker
daemons + spark:// driver, separate executor JVMs, separate Python worker
pools) at matched total core budgets:

  1x8    one   worker JVM,  8 cores          (taskset 0-7)
  2x4    two   worker JVMs, 4 cores each     (taskset 0-3 / 4-7)
  1x32   one   worker JVM, 32 cores          (0-31)
  2x16   two   worker JVMs, 16 cores each    (0-15 / 16-31)
  4x8    four  worker JVMs,  8 cores each    (0-7/8-15/16-23/24-31)

If KxM matches 1x(K*M) at equal total cores, executor-process count is not
the limiter and the 8->32 wall is the socket, as BENCH/PLANS.md §6 says.
Every daemon + the driver is taskset-pinned INSIDE the config's core range
so a config is a bounded CPU budget, same methodology as the local ladder.

Usage: python tools/standalone_pair.py [n_docs] [reps] [configs...]
       (defaults: 1_000_000 1 1x8 2x4 1x32 2x16 4x8)
Appends per-run rows into BENCH/standalone_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"

CONFIGS: dict[str, dict] = {
    # name -> worker core pins (one entry per worker JVM) + driver pin
    "1x8":  {"workers": ["0-7"], "driver": "0-7"},
    "2x4":  {"workers": ["0-3", "4-7"], "driver": "0-7"},
    "1x32": {"workers": ["0-31"], "driver": "0-31"},
    "2x16": {"workers": ["0-15", "16-31"], "driver": "0-31"},
    "4x8":  {"workers": ["0-7", "8-15", "16-23", "24-31"], "driver": "0-31"},
}

DRIVER_SNIPPET = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
n_docs = {n_docs}
exec_cores = {exec_cores}
total_cores = {total_cores}
from pyspark.sql import SparkSession
b = (SparkSession.builder.master({master!r})
     .appName("standalone_pair")
     .config("spark.executor.cores", str(exec_cores))
     .config("spark.executor.memory", {exec_mem!r})
     .config("spark.cores.max", str(total_cores))
     .config("spark.sql.shuffle.partitions", str(max(total_cores, 8)))
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
     .config("spark.sql.adaptive.skewJoin.enabled", "true")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
     .config("spark.driver.memory", "8g")
     .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
     .config("spark.ui.enabled", "false")
     .config("spark.ui.showConsoleProgress", "false")
     .config("spark.sql.files.maxPartitionBytes", str(4 << 30))
     .config("spark.sql.files.openCostInBytes", str(4 << 30))
     .config("spark.driver.host", "127.0.0.1"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# ship the package to the executor JVMs' Python workers — the north rule's
# spark-submit --py-files deployment shape (local mode never needs it
# because executors share the driver's sys.path)
import zipfile
zip_path = f"/tmp/lps_pyfiles_{{os.getpid()}}.zip"
pkg = os.path.join({repo!r}, "lucene_plugin_spark")
with zipfile.ZipFile(zip_path, "w") as zf:
    for root, _, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, {repo!r}))
spark.sparkContext.addPyFile(zip_path)
from lucene_plugin_spark.corpus import corpus_df_distributed, _STEMS
from lucene_plugin_spark.index.builder import IndexBuilder
from lucene_plugin_spark.query.executor import SearchEngine
from lucene_plugin_spark.storage.catalog import Catalog

corpus_path = f"/tmp/lps_size_corpus_{{n_docs}}"
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    corpus_df_distributed(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
src = spark.read.parquet(corpus_path)

wh = f"/tmp/lps_standalone_wh_{{os.getpid()}}"
shutil.rmtree(wh, ignore_errors=True)
catalog = Catalog(wh)
t0 = time.perf_counter()
IndexBuilder(spark, catalog, docs_per_slice=max(8192, n_docs // 96)).build(src)
build_sec = time.perf_counter() - t0

engine = SearchEngine(spark, catalog).warm()
def _mk_query(i):
    a = _STEMS[i % len(_STEMS)]
    b2 = _STEMS[(3 * i + 1) % len(_STEMS)]
    kind = i % 8
    if kind == 0: return a
    if kind == 1: return f"{{a}} {{b2}}"
    if kind == 2: return f"{{a}} AND {{b2}}"
    if kind == 3: return f'"{{a}} {{b2}}"'
    if kind == 4: return a + b2.capitalize()
    if kind == 5: return f"{{a}} -{{b2}}"
    if kind == 6: return f"+{{a}} +{{b2}}"
    return f"[{{a[:2]}} TO {{a[:2]}}z]"
batch = [(f"q{{i}}", None, _mk_query(i)) for i in range(64)]
runs = []
for _ in range(2):
    t1 = time.perf_counter()
    engine.search_many(batch, limit=10).count()
    runs.append(time.perf_counter() - t1)
out = {{"n_docs": n_docs, "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "batch64_sec": round(min(runs), 2),
        "batch_qps": round(64 / min(runs), 2)}}
shutil.rmtree(wh, ignore_errors=True)
print("STANDALONE_RESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def _spark_class() -> str:
    import pyspark
    home = os.path.dirname(pyspark.__file__)
    return os.path.join(home, "bin", "spark-class")


def _daemon_env() -> dict:
    import pyspark
    env = dict(os.environ)
    env["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_NO_DAEMONIZE"] = "1"
    return env


def run_config(name: str, n_docs: int) -> dict:
    cfg = CONFIGS[name]

    def _span(pin: str) -> int:
        lo, hi = pin.split("-")
        return int(hi) - int(lo) + 1

    worker_cores = [_span(p) for p in cfg["workers"]]
    total = sum(worker_cores)
    env = _daemon_env()
    procs: list[subprocess.Popen] = []
    try:
        procs.append(subprocess.Popen(
            ["taskset", "-c", cfg["driver"], _spark_class(),
             "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        time.sleep(5)
        for pin, cores in zip(cfg["workers"], worker_cores):
            procs.append(subprocess.Popen(
                ["taskset", "-c", pin, _spark_class(),
                 "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                 "--cores", str(cores), "--memory", "24g",
                 "--work-dir", f"/tmp/lps_worker_{pin}",
                 "--webui-port", "0"],
                env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        time.sleep(6)
        code = DRIVER_SNIPPET.format(
            repo=REPO, n_docs=n_docs, master=MASTER_URL,
            exec_cores=worker_cores[0], total_cores=total,
            exec_mem="20g" if worker_cores[0] >= 16 else
            ("10g" if worker_cores[0] >= 8 else "6g"))
        denv = dict(env)
        p = subprocess.run(
            ["taskset", "-c", cfg["driver"], sys.executable, "-c", code],
            env=denv, capture_output=True, text=True, timeout=3600)
        for line in p.stdout.splitlines():
            if line.startswith("STANDALONE_RESULT "):
                r = json.loads(line[len("STANDALONE_RESULT "):])
                r["config"] = name
                r["workers"] = len(worker_cores)
                r["cores_per_worker"] = worker_cores[0]
                r["total_cores"] = total
                return r
        raise RuntimeError(f"standalone {name} failed:\n"
                           f"{p.stdout[-3000:]}\n{p.stderr[-3000:]}")
    finally:
        for pr in reversed(procs):
            pr.terminate()
        for pr in procs:
            try:
                pr.wait(timeout=20)
            except Exception:
                pr.kill()
        time.sleep(2)


def main() -> None:
    args = sys.argv[1:]
    n_docs = int(args[0]) if args and args[0].isdigit() else 1_000_000
    rest = args[1:] if args and args[0].isdigit() else args
    reps = int(rest[0]) if rest and rest[0].isdigit() else 1
    names = [a for a in rest if a in CONFIGS] or list(CONFIGS)
    path = os.path.join(REPO, "BENCH", "standalone_scaling.json")
    doc = {"methodology": __doc__.strip().splitlines()[0], "runs": []}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    for rep in range(reps):
        for name in names:
            r = run_config(name, n_docs)
            r["rep"] = rep
            doc["runs"].append(r)
            print(f"rep{rep} {name}: {json.dumps(r)}", flush=True)
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
