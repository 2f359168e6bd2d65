"""Quiet-window driver for the flagship A/B (VERDICT r13 #1).

Probes the bench host calibration on an interval; when the matmul
ratio vs the pinned quiet reference drops under THRESHOLD, launches ONE
opt_flagship_ab.py invocation — alternating old/new trees so samples
interleave across windows — until each side has N_RUNS completed runs.
Every probe and launch is appended to the JSONL trace (the committed
wait/launch evidence, same discipline as probe_watch.py).

Usage:
  python tools/opt_ab_watch.py <trace.jsonl> <old_repo> <new_repo> \
      <out_dir> [interval_s] [threshold] [n_runs_per_side]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_w", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_w"] = mod
    spec.loader.exec_module(mod)
    return mod


def _record(trace: Path, row: dict) -> None:
    with trace.open("a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main() -> None:
    trace = Path(sys.argv[1])
    old_repo, new_repo = sys.argv[2], sys.argv[3]
    out_dir = Path(sys.argv[4])
    interval = float(sys.argv[5]) if len(sys.argv) > 5 else 60.0
    threshold = float(sys.argv[6]) if len(sys.argv) > 6 else 1.3
    n_runs = int(sys.argv[7]) if len(sys.argv) > 7 else 3
    out_dir.mkdir(parents=True, exist_ok=True)
    bench = _load_bench()
    ref = bench._REF_CAL["matmul_sec"]
    done = {"old": 0, "new": 0}
    while done["old"] < n_runs or done["new"] < n_runs:
        cal = bench._host_calibration()
        ratio = round(cal["matmul_sec"] / ref, 2)
        # alternate, starting with whichever side has fewer runs (old
        # first on ties so the before-tree gets the first quiet window)
        side = "old" if done["old"] <= done["new"] else "new"
        if done[side] >= n_runs:
            side = "new" if side == "old" else "old"
        row = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            **cal,
            "matmul_ratio": ratio,
            "action": "watch",
        }
        if ratio < threshold:
            repo = old_repo if side == "old" else new_repo
            out = out_dir / f"ab_{side}_{done[side] + 1}.json"
            row["action"] = f"launch {side} -> {out.name}"
            _record(trace, row)
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(repo, "tools", "opt_flagship_ab.py"),
                    repo,
                    str(out),
                ],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            ok = proc.returncode == 0 and out.exists()
            _record(
                trace,
                {
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "action": f"{'done' if ok else 'FAILED'} {side} rc={proc.returncode}",
                },
            )
            if ok:
                done[side] += 1
            continue
        _record(trace, row)
        time.sleep(interval)
    _record(
        trace,
        {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "action": "complete", **done},
    )


if __name__ == "__main__":
    main()
