"""Dump the formatted physical plan of every driver-contract entry.

Writes BENCH/plans_audit.txt with, per entry: exchanges (shuffles),
broadcast joins, pushed filters, and whole-stage-codegen coverage — the
at-a-glance audit trail behind BENCH/PLANS.md.  Read-only: plans are
compiled, not executed (entries whose result requires engine state still
build/read the cached index).

Usage: python tools/plan_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from lucene_plugin_spark.session import get_spark
    spark = get_spark("plan_audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    out_path = os.path.join(REPO, "BENCH", "plans_audit.txt")
    qs = E.queries()
    lines = [f"# Physical-plan audit over {sf} ({len(qs)} entries)", ""]
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # plan-TREE node counts: a cached/reused subtree prints once per
            # reference, so exchange counts are an upper bound on physical
            # shuffles (InMemoryRelation / ReusedExchange dedupe at runtime)
            n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
            n_reuse = len(re.findall(r"InMemoryTableScan|ReusedExchange", plan))
            n_bcast = len(re.findall(r"\(\d+\) Broadcast(?:HashJoin|Exchange)",
                                     plan))
            pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan)))
            codegen_ids = set(re.findall(r"codegen id : (\d+)", plan))
            lines.append(f"## {name}")
            lines.append(f"exchanges<={n_exch} broadcast_nodes={n_bcast} "
                         f"cached_or_reused={n_reuse} "
                         f"codegen_spans={len(codegen_ids)}")
            for p in pushed[:6]:
                lines.append(f"  {p[:160]}")
            lines.append("")
        except Exception as e:  # keep auditing the rest
            lines.append(f"## {name}\nERROR: {type(e).__name__}: {e}\n")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
