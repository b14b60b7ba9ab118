"""Dissect the warmed single-query latency floor.

The scaling ladder's "single p50 ms" column is ~420-460 ms at EVERY core
count — a fixed, driver-side cost (the ladder queries all take the driver
fast path at 1M docs).  This profiler runs the ladder's exact 8-query mix
against the 1M-doc index, reports per-query warmed latency, and cProfiles
the loop so the floor can be attributed to parse/compile vs block fetch vs
kernel vs the final createDataFrame hop.

Usage: taskset -c 0-31 python tools/single_query_profile.py [n_docs]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from lucene_plugin_spark.corpus import corpus_df_distributed
    from lucene_plugin_spark.index.builder import IndexBuilder
    from lucene_plugin_spark.query.executor import SearchEngine
    from lucene_plugin_spark.session import get_spark
    from lucene_plugin_spark.storage.catalog import Catalog

    spark = get_spark("sq_profile", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    wh = f"/tmp/lps_qprof_wh_{n_docs}"
    catalog = Catalog(wh)
    if not catalog.table("segments").exists():
        corpus_path = f"/tmp/lps_size_corpus_{n_docs}"
        if not os.path.exists(corpus_path):
            corpus_df_distributed(spark, n_docs).write.mode(
                "overwrite").parquet(corpus_path)
        IndexBuilder(spark, catalog, docs_per_slice=max(8192, n_docs // 96)
                     ).build(spark.read.parquet(corpus_path))
    engine = SearchEngine(spark, catalog).warm()

    queries = ["get", "user name", "index query cache", "parse AND token",
               '"get user"', "segment -merge", "getUserName", "[se TO st]"]

    # warmup pass (dropped, fills caches) exactly like the ladder
    for q in queries:
        engine.search(None, q, limit=10).collect()

    # per-query warmed latency, 3 reps
    for q in queries:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            engine.search(None, q, limit=10).collect()
            ts.append(time.perf_counter() - t0)
        print(f"{min(ts)*1000:8.1f} ms (best of 3)  {q!r}", flush=True)

    # attribute the loop
    prof = cProfile.Profile()
    prof.enable()
    for _ in range(3):
        for q in queries:
            engine.search(None, q, limit=10).collect()
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(40)
    print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
