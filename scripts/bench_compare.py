#!/usr/bin/env python
"""Compare a fresh bench run against the previous round's recorded bench
and flag per-query regressions beyond a threshold.

The previous round's file is the regression floor (VERDICT.md round-1,
"keep the bench honest"): any query slowing >25% needs a named cause.
local[32] single runs are noisy — rerun before believing a flag.

Usage: python scripts/bench_compare.py [prev.json] [--threshold 0.25]
Runs bench.py, prints a table, exits 1 if any regression exceeds threshold.
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "prev", nargs="?", default="BENCH_r02.json",
        help="previous bench JSON (raw bench line or driver-wrapped)",
    )
    ap.add_argument("--threshold", type=float, default=0.25)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    lines = [l for l in out.splitlines() if l.startswith('{"metric"')]
    if not lines:
        print("ERROR: bench.py emitted no '{\"metric\"' JSON line; stdout was:")
        print(out[-2000:])
        return 2
    cur = json.loads(lines[-1])["queries"]
    prev_path = args.prev if os.path.isabs(args.prev) else os.path.join(here, args.prev)
    if not os.path.exists(prev_path):
        print(f"ERROR: previous bench file not found: {prev_path}")
        return 2
    prev = load_prev(prev_path)

    regressions = []
    print(f"{'query':40s} {'prev':>8s} {'cur':>8s} {'delta':>8s}")
    for name, t in cur.items():
        p = prev.get(name)
        if p is None:
            print(f"{name:40s} {'new':>8s} {t:8.3f}")
            continue
        delta = (t - p) / p
        flag = " <-- REGRESSION" if delta > args.threshold else ""
        print(f"{name:40s} {p:8.3f} {t:8.3f} {delta:+7.1%}{flag}")
        if delta > args.threshold:
            regressions.append(name)

    print(f"\ntotal cur={sum(cur.values()):.3f}s prev={sum(prev.values()):.3f}s")
    if regressions:
        print(f"regressions >{args.threshold:.0%}: {regressions}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
