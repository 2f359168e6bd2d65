"""Per-query bench delta table between two bench_queries_*.json snapshots.

Prints a markdown table of every query whose time moved more than the
threshold (default 1.5x in either direction, and at least 0.5s absolute
on the larger side — sub-second entries whipsaw with scheduler noise),
plus summary stats over the common set. The closing-round discipline
(VERDICT r6 #3): the BENCH artifact must be accompanied by this diff
against the previous committed snapshot, with >1.5x lines explained in
SCALING.md.

Usage: python tools/bench_delta.py OLD.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq = old.get("queries", old)
    nq = new.get("queries", new)
    common = sorted(set(oq) & set(nq))
    ratios = [nq[k] / oq[k] for k in common if oq[k] > 0]
    print(f"common set: {len(common)} queries")
    print(f"median ratio new/old: {statistics.median(ratios):.3f}")
    print(f"sum old: {sum(oq[k] for k in common):.1f}s   "
          f"sum new: {sum(nq[k] for k in common):.1f}s")
    print(f"only in new: {sorted(set(nq) - set(oq))}")
    print(f"only in old: {sorted(set(oq) - set(nq))}")
    print()
    moved = [
        k
        for k in common
        if oq[k] > 0
        and max(oq[k], nq[k]) >= 0.5
        and (nq[k] / oq[k] >= thr or oq[k] / nq[k] >= thr)
    ]
    if not moved:
        print(f"no per-query move >= {thr}x")
        return 0
    print(f"| query | old s | new s | ratio |")
    print(f"|---|---|---|---|")
    for k in sorted(moved, key=lambda k: -(nq[k] / oq[k])):
        print(f"| {k} | {oq[k]:.2f} | {nq[k]:.2f} | {nq[k] / oq[k]:.2f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
