"""Targeted mini-sweep: run the scaling_bench job at a subset of levels and
append the raw runs to the BENCH/scaling.json pool (best-per-metric merge
happens on regeneration with ``scaling_bench.py <n_docs> 0``).

The full 5-level ladder costs ~10 min/sweep (dominated by the 1-core build);
when one pair needs fresh epochs — e.g. the 2->8 pair after a code change
that only newer sweeps reflect — interleaving just those two levels gets
same-epoch ratios at a fraction of the cost.

Usage: python tools/mini_sweep.py <reps> <level> [<level> ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, _git_head, run_at  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1])
    levels = [int(x) for x in sys.argv[2:]]
    pool_path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(pool_path) as f:
        pool = json.load(f)
    head = _git_head()
    for rep in range(reps):
        for c in levels:
            r = run_at(c)
            r["code"] = head
            pool["sweeps"].setdefault(str(c), []).append(r)
            with open(pool_path, "w") as f:
                json.dump(pool, f, indent=2)
            print(f"rep {rep} level {c}: {json.dumps(r)}", flush=True)


if __name__ == "__main__":
    main()
