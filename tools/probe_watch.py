"""Quiet-window watcher for the closing bench (VERDICT r12 #3).

Samples bench.py's host calibration every INTERVAL seconds, appends
every sample to a JSONL trace (the committed evidence that a quiet
window did or did not occur), and — when the matmul ratio vs the pinned
quiet-host reference drops below THRESHOLD — launches one full bench
candidate with SPARK_GRAFT_BENCH_OUT set, then resumes watching. At
most MAX_CANDIDATES candidates are launched.

Usage:
  python tools/probe_watch.py trace.jsonl r13 [interval_s] [threshold] [max_candidates]

The trace rows carry (ts, py_loop_sec, matmul_sec, matmul_ratio,
action). Candidates launched here are ordinary bench runs — the
medians-based chooser (tools/choose_candidate.py) still decides.
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
sys.path.insert(0, str(REPO))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    trace = Path(sys.argv[1])
    tag = sys.argv[2]
    interval = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    max_cand = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    bench = _load_bench()
    ref = bench._REF_CAL["matmul_sec"]
    launched = 0
    failures = 0
    while True:
        cal = bench._host_calibration()
        ratio = round(cal["matmul_sec"] / ref, 2)
        row = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            **cal,
            "matmul_ratio": ratio,
            "action": "watch",
        }
        launch = ratio < threshold and launched < max_cand
        if launch:
            # index from a fresh scan of the candq namespace at launch
            # time: a restarted or concurrent watcher, or files created
            # after startup, cannot collide with (and overwrite) an
            # earlier candidate
            taken = [
                int(p.stem.rsplit("candq", 1)[1])
                for p in REPO.glob(f"bench_queries_{tag}_candq*.json")
                if p.stem.rsplit("candq", 1)[1].isdigit()
            ]
            out = f"bench_queries_{tag}_candq{max(taken, default=0) + 1}.json"
            row["action"] = f"launch {out}"
        _record(trace, row)
        if launch:
            env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=out)
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py")],
                cwd=REPO,
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            # a crashed bench must not consume a scarce quiet-window
            # slot silently: only a zero exit with the output file on
            # disk counts as a candidate, and the trace says which
            ok = proc.returncode == 0 and (REPO / out).exists()
            _record(
                trace,
                {
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "action": (
                        f"{'done' if ok else 'FAILED'} {out} "
                        f"rc={proc.returncode}"
                    ),
                },
            )
            if ok:
                launched += 1
            else:
                failures += 1
                if failures >= 3:
                    break
            continue
        if launched >= max_cand:
            break
        time.sleep(interval)


def _record(trace: Path, row: dict) -> None:
    with trace.open("a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
