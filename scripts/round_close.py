#!/usr/bin/env python
"""Round-close gate: ONE command that runs every end-of-round audit and
exits nonzero if any is red (r11 verdict #5 — the r11 close ran every
audit but forgot the window rotation; a single gate would have caught
it).

Stages, in dependency order (fail-fast):
  1. rotation_ledger      — the next driver window is queued correctly
  2. driver window sweep  — scripts/driver_sim.py over the first-50
                            window entries at sf0.01 (vanilla session,
                            DuckDB oracles, exact equality)
  3. constructed-plan SinglePartition audit (fast)
  4. scan audit           — every >=3-raw-scan entry must be 0
                            outside-cache or carry a pinned budget in
                            tests/test_plan_shapes.py
  5. executed-plan audit  — EXECUTES the registry and classifies every
                            plan the JVM ran (~35 min; skip with
                            --fast when iterating)

pytest is NOT run here (30 min on its own, and the driver runs it
implicitly through CI-of-record expectations) — run it separately.

Usage: python scripts/round_close.py [--fast]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> tuple[bool, str]:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True)
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-12:])
    print(tail)
    ok = p.returncode == 0
    print(f"=== {label}: {'OK' if ok else f'FAILED (exit {p.returncode})'}")
    return ok, p.stdout


def check_scan_audit() -> bool:
    """scan_audit prints findings without an exit contract; adjudicate
    here — every HOT3+ entry must be 0-outside-cache on every hot table
    or appear in the pinned scan-budget table."""
    ok, out = run(
        "scan-audit", [sys.executable, os.path.join(HERE, "scripts/scan_audit.py")]
    )
    if not ok:
        return False
    pins: set[str] = set()
    with open(os.path.join(HERE, "tests/test_plan_shapes.py")) as fh:
        for m in re.finditer(r'\(\s*"([a-z0-9_]+)",\s*"[a-z]+",\s*\d+\s*\)', fh.read()):
            pins.add(m.group(1))
    bad = []
    for line in out.splitlines():
        m = re.match(r"HOT3\+\s+(\S+): (.*)", line)
        if not m:
            continue
        name, detail = m.groups()
        outside = [int(x) for x in re.findall(r"(\d+) outside-cache", detail)]
        if any(o > 0 for o in outside) and name not in pins:
            bad.append(line)
    if bad:
        print("UNPINNED >=3-scan entries with outside-cache I/O:")
        for b in bad:
            print("  ", b)
        return False
    print("scan-audit adjudication: all flagged entries pinned or 0-outside-cache")
    return True


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--fast",
        action="store_true",
        help="skip the executed-plan audit (~35 min) — for mid-round iteration only",
    )
    args = ap.parse_args()
    py = sys.executable
    stages: list[tuple[str, list[str]]] = [
        ("rotation-ledger", [py, "scripts/rotation_ledger.py"]),
        ("driver-window-sweep", [py, "scripts/driver_sim.py", "50"]),
        ("constructed-plan-audit", [py, "scripts/audit_single_partition.py"]),
    ]
    failed: list[str] = []
    for label, cmd in stages:
        if not run(label, cmd)[0]:
            failed.append(label)
            if label in ("rotation-ledger",):
                break  # everything downstream reads the same window
    if not failed or "rotation-ledger" not in failed:
        if not check_scan_audit():
            failed.append("scan-audit")
        if not args.fast:
            if not run(
                "executed-plan-audit",
                [py, "scripts/audit_executed_plans.py"],
            )[0]:
                failed.append("executed-plan-audit")
        else:
            print("\n(--fast: executed-plan audit SKIPPED — not a close)")
    print(
        f"\nROUND CLOSE: {'ALL GREEN' if not failed else 'RED: ' + ', '.join(failed)}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
