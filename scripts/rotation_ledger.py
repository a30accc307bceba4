#!/usr/bin/env python
"""Rotation ledger: mechanize the driver-window rotation bookkeeping.

The driver sweeps the FIRST 50 ``queries()`` entries each round; the
rotation policy (plans/__init__.py) pins the 12 ref_* parity rows and
fills the other 38 slots from the head of the never-driver-verified
queue. This script derives the ground truth from the CORRECTNESS_r*.json
records and checks the CURRENT window against it — the r9/r10 rotations
were executed by hand-editing _CONTRACT_PRIORITY, and a mis-queued entry
(duplicate slot, already-verified rotate-in, rows-only slot) would waste
an official verification slot silently.

Checks (exit 1 on any failure):
  1. window[0:12] are exactly the 12 pinned ref_* rows;
  2. every non-pin window entry is oracle-backed (no rows-only slots);
  3. every non-pin window entry is NEVER-driver-verified (first-time);
  4. no duplicates anywhere in the priority list (also enforced at
     import time by _apply_contract_order).

Also prints the ledger: cumulative driver-verified count, remaining
backlog, and the SUGGESTED next-round window (head of the remaining
queue) to paste into _CONTRACT_PRIORITY at round close.

Run: python scripts/rotation_ledger.py [--next 38]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DRIVER_WINDOW = 50
N_PINS = 12


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--next", type=int, default=DRIVER_WINDOW - N_PINS,
                    help="suggested next-round rotate-in count")
    args = ap.parse_args()

    from usedcars_bigdata_spark.plans import ORACLES, QUERIES

    keys = list(QUERIES)
    window = keys[:DRIVER_WINDOW]

    verified: set[str] = set()
    rounds = sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")))
    for path in rounds:
        with open(path) as fh:
            verified |= set(json.load(fh))

    failures: list[str] = []
    pins = window[:N_PINS]
    if [n for n in pins if not n.startswith("ref_")] or len(set(pins)) != N_PINS:
        failures.append(f"window[0:{N_PINS}] must be the ref_* pins, got {pins}")
    rotate_ins = window[N_PINS:]
    rows_only = [n for n in rotate_ins if n not in ORACLES]
    if rows_only:
        failures.append(f"rows-only entries waste window slots: {rows_only}")
    stale = [n for n in rotate_ins if n in verified]
    if stale:
        failures.append(f"already-driver-verified entries re-queued: {stale}")

    oracle_backed = [k for k in keys if k in ORACLES]
    backlog = [k for k in oracle_backed if k not in verified and k not in window]
    done_after = len(verified | set(window))

    print(f"registry: {len(keys)} entries, {len(oracle_backed)} oracle-backed")
    print(f"driver-verified so far (r1..r{len(rounds)}): {len(verified)}")
    print(f"this window: {N_PINS} pins + {len(rotate_ins)} rotate-ins "
          f"({sum(1 for n in rotate_ins if n not in verified)} first-time)")
    print(f"after this round: {done_after} verified; "
          f"never-verified oracle-backed backlog: {len(backlog)}")
    nxt = backlog[:args.next]
    print(f"\nsuggested next-round rotate-ins (head {len(nxt)} of the queue):")
    for n in nxt:
        print(f'    "{n}",')

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print("  -", f)
        return 1
    print("\nledger OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
