"""Profile the DRIVER-SIDE serial cost of SearchEngine.search_many.

The N->4N batch-query scaling pair is bounded by per-batch serial driver
work (Amdahl fit on the 1M-doc ladder: ~1.6 s serial per 64-query batch,
~25 ms/query).  This tool builds (or reuses) a warehouse at the given sf
dir, warms the engine, then cProfiles ONLY the plan-construction half of
search_many (everything before the distributed job) plus the end-to-end
batch, so the serial component can be attributed to parse/compile/py4j/
DataFrame-assembly and re-measured after cuts.

Usage: python tools/batch_profile.py [sf_dir] [n_queries]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from lucene_plugin_spark.session import get_spark
    spark = get_spark("batch_profile", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import _docs_source
    from lucene_plugin_spark.corpus import _STEMS
    from lucene_plugin_spark.index.builder import IndexBuilder
    from lucene_plugin_spark.query.executor import SearchEngine
    from lucene_plugin_spark.storage.catalog import Catalog

    wh = f"/tmp/lps_batchprof_{os.getpid()}"
    catalog = Catalog(wh)
    IndexBuilder(spark, catalog).build(_docs_source(spark, sf_dir))
    engine = SearchEngine(spark, catalog).warm()

    def mk_q(i: int) -> str:
        a, b = _STEMS[i % len(_STEMS)], _STEMS[(i * 7 + 3) % len(_STEMS)]
        kind = i % 4
        if kind == 0:
            return f"{a} {b}"
        if kind == 1:
            return f"{a} AND {b}"
        if kind == 2:
            return f'"{a} {b}"'
        return f"{a} -{b}"

    batch = [(f"q{i}", None, mk_q(i)) for i in range(n_q)]
    # warm run fills compile/df caches exactly like a serving deployment
    engine.search_many(batch, limit=10).count()

    distinct = [(f"w{i}", None, mk_q(i) + f" w{i % 16}") for i in range(n_q)]
    t0 = time.perf_counter()
    engine.search_many(distinct, limit=10).count()
    cold = time.perf_counter() - t0

    fresh = [(f"f{i}", None, mk_q(i) + f" f{i % 16}") for i in range(n_q)]
    prof = cProfile.Profile()
    prof.enable()
    df = engine.search_many(fresh, limit=10)
    prof.disable()  # plan construction only; job not yet run
    t1 = time.perf_counter()
    df.count()
    exec_sec = time.perf_counter() - t1

    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())
    print(f"batch={n_q} cold_total={cold:.3f}s  plan_construction="
          f"{pstats.Stats(prof).total_tt:.3f}s  exec={exec_sec:.3f}s")


if __name__ == "__main__":
    main()
