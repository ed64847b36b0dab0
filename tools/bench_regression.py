#!/usr/bin/env python3
"""Per-entry steady-state bench regression gate (VERDICT r7 item 4).

Cold TOTALS on identical code swing up to 1.6x across sessions (r7:
141.5 committed vs 188.2 driver), so round-over-round tracking is done
on the STEADY regime instead: each entry's 3rd same-session execution
(``python bench.py --steady`` writes ``bench_result_steady.json``),
which SCALE.md measured as the JIT convergence point.

Gate: any entry whose steady time grew by more than THRESHOLD (1.3x)
over the baseline needs a named cause.  Known-and-explained regressions
are allowlisted in EXPLAINED below (entry -> one-line cause), which is
reviewed each round like rotation_plan.DIRTY.

Usage:
    python tools/bench_regression.py                 # vs HEAD-committed file
    python tools/bench_regression.py --baseline f.json  # vs explicit file
Exit 0 = no unexplained regression; 2 = regressions listed on stdout.
Entries faster than FLOOR_SEC in the baseline are ignored — sub-second
steady numbers are scheduler noise, not plan signal.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEADY = os.path.join(REPO, "bench_result_steady.json")
THRESHOLD = 1.3
FLOOR_SEC = 1.0

# entry -> named cause for an accepted >1.3x steady regression this
# round (reviewed and re-emptied each round, like rotation_plan.DIRTY)
EXPLAINED: dict[str, str] = {}


def _committed_baseline() -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:bench_result_steady.json"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baseline", help="explicit baseline steady sidecar "
                                       "(default: HEAD-committed file)")
    ap.add_argument("--current", default=STEADY)
    args = ap.parse_args()

    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)
    else:
        base = _committed_baseline()
    if base is None:
        print("no committed bench_result_steady.json yet — gate vacuous")
        return 0
    with open(args.current) as f:
        cur = json.load(f)

    if base.get("sf") != cur.get("sf"):
        print(f"baseline sf={base.get('sf')} != current sf={cur.get('sf')} "
              f"— cross-SF comparison is meaningless; gate vacuous")
        return 0
    # steady is DEFINED as the 3rd same-session pass (ADVICE r8: a file
    # produced under --cold/--shared was a 2nd execution mislabeled
    # steady); files predating the pass_index field are grandfathered
    # as protocol-3 (the only protocol bench.py ever ran for --steady)
    bp, cp = base.get("pass_index", 3), cur.get("pass_index", 3)
    if bp != cp:
        print(f"baseline pass_index={bp} != current pass_index={cp} — "
              f"non-comparable execution protocols; gate vacuous")
        return 0

    bq, cq = base.get("queries", {}), cur.get("queries", {})
    regressions = []
    for name, t0 in sorted(bq.items()):
        t1 = cq.get(name)
        if t1 is None or t0 < FLOOR_SEC:
            continue
        if t1 > t0 * THRESHOLD and name not in EXPLAINED:
            regressions.append((name, t0, t1))

    new = sorted(set(cq) - set(bq))
    if new:
        print(f"# new entries (no baseline): {', '.join(new)}")
    for name, cause in sorted(EXPLAINED.items()):
        print(f"# explained: {name}: {cause}")
    if not regressions:
        print(f"OK: no unexplained steady regression > {THRESHOLD}x "
              f"({len(bq)} baseline entries, floor {FLOOR_SEC}s)")
        return 0
    print(f"STEADY REGRESSIONS (> {THRESHOLD}x, unexplained):")
    for name, t0, t1 in regressions:
        print(f"  {name:36s} {t0:7.2f}s -> {t1:7.2f}s  ({t1 / t0:.2f}x)")
    print("name the cause (EXPLAINED in tools/bench_regression.py) or fix it")
    return 2


if __name__ == "__main__":
    sys.exit(main())
