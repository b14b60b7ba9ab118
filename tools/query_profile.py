"""Dissect batched-query wall time into its serial/parallel phases.

The scaling ladder's batch-query pairs (BENCH/scaling.json) read low at 1->4
and 8->32.  This profiler separates, for one 64-query batch against the 1M-doc
index, the phases that SHOULD shrink with cores (the distributed kernel job)
from the ones that cannot (driver-side parse/compile, the single term_dict
prefetch job, plan construction, result merge), so the ladder numbers can be
attributed instead of guessed at.

Run pinned, like the ladder does:
    taskset -c 0-7  python tools/query_profile.py 8
    taskset -c 0-31 python tools/query_profile.py 32
Prints one JSON line per run; compare phase-by-phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from lucene_plugin_spark.corpus import _STEMS, corpus_df_distributed
    from lucene_plugin_spark.index.builder import IndexBuilder
    from lucene_plugin_spark.query.executor import SearchEngine
    from lucene_plugin_spark.session import get_spark
    from lucene_plugin_spark.storage.catalog import Catalog

    spark = get_spark("query_profile", cores=cores, shuffle_partitions=cores)
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

    def mk_query(i: int) -> str:
        a = _STEMS[i % len(_STEMS)]
        b = _STEMS[(3 * i + 1) % len(_STEMS)]
        kind = i % 8
        return [a, f"{a} {b}", f"{a} AND {b}", f'"{a} {b}"', a + b.capitalize(),
                f"{a} -{b}", f"+{a} +{b}", f"[{a[:2]} TO {a[:2]}z]"][kind]

    batch = [(f"q{i}", None, mk_query(i)) for i in range(64)]

    # ---- warm every cache exactly as the ladder's first (discarded) pass
    engine.search_many(batch, limit=10).count()

    phases: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *a):
                phases[name] = phases.get(name, 0.0) + time.perf_counter() - self.t
        return _C()

    # phase 1: parse + prefetch with COLD driver caches (serial driver cost)
    engine._compile_cache.clear()
    engine._df_cache.clear()
    engine._cf_cache.clear()
    engine._range_cache.clear()
    from lucene_plugin_spark.query.executor import _leaves_of
    from lucene_plugin_spark.query.parser import parse_query
    from lucene_plugin_spark.query.plan import Term
    from lucene_plugin_spark.query.expand import EXPANDABLE
    with clock("parse_s"):
        prepass = {}
        pending, exact = [], set()
        for _qid, _repo, q in batch:
            leaves = _leaves_of(parse_query(q))
            prepass[q] = leaves
            for grp in leaves:
                for l in grp:
                    if isinstance(l, EXPANDABLE):
                        pending.append(l)
                    elif isinstance(l, Term):
                        exact.add((l.field, l.term))
                    else:
                        exact.update((l.field, t) for t in l.terms)
    with clock("prefetch_job_s"):     # ONE Spark job filling df/cf/range caches
        engine._prefetch_batch(pending, exact)

    # phase 2: full search_many with warm driver caches, split into plan
    # construction (driver) vs job execution (cluster) via a no-op action
    with clock("plan_build_s"):
        df = engine.search_many(batch, limit=10)
    with clock("kernel_job_s"):
        n = df.count()

    # phase 3: end-to-end repeats for the wall number the ladder reports
    reps = []
    for _ in range(3):
        t = time.perf_counter()
        engine.search_many(batch, limit=10).count()
        reps.append(time.perf_counter() - t)
    phases["end_to_end_best_s"] = min(reps)
    serial = phases["parse_s"] + phases["prefetch_job_s"] + phases["plan_build_s"]

    print("QPROF " + json.dumps({
        "cores": cores, "n_docs": n_docs, "n_queries": len(batch), "rows": n,
        **{k: round(v, 4) for k, v in phases.items()},
        "serial_driver_s": round(serial, 4),
        "serial_share_of_e2e": round(
            serial / (serial + phases["kernel_job_s"]), 3),
    }))


if __name__ == "__main__":
    main()
