#!/usr/bin/env python
"""Compare a fresh bench run against the previous round's recorded bench
(default BENCH_r01.json) and flag per-query regressions beyond a threshold.

The previous round's file is the regression floor (VERDICT.md round-1,
"keep the bench honest"): any query slowing >25% needs a named cause.
local[32] single runs are noisy — rerun before believing a flag.

Usage: python scripts/bench_compare.py [prev.json] [--threshold 0.25]
Runs bench.py, prints a table, exits 1 if any regression exceeds threshold.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def load_prev(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    # Driver files wrap the bench line under "parsed"; accept both shapes.
    parsed = doc.get("parsed", doc)
    return parsed["queries"]


def main() -> int:
    prev_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r01.json"
    threshold = 0.25
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith('{"metric"')][-1]
    cur = json.loads(line)["queries"]
    prev = load_prev(os.path.join(here, prev_path))

    regressions = []
    print(f"{'query':40s} {'prev':>8s} {'cur':>8s} {'delta':>8s}")
    for name, t in cur.items():
        p = prev.get(name)
        if p is None:
            print(f"{name:40s} {'new':>8s} {t:8.3f}")
            continue
        delta = (t - p) / p
        flag = " <-- REGRESSION" if delta > threshold else ""
        print(f"{name:40s} {p:8.3f} {t:8.3f} {delta:+7.1%}{flag}")
        if delta > threshold:
            regressions.append(name)

    print(f"\ntotal cur={sum(cur.values()):.3f}s prev={sum(prev.values()):.3f}s")
    if regressions:
        print(f"regressions >{threshold:.0%}: {regressions}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
