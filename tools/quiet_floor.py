"""Quiet-host floor sampling for named registry entries (VERDICT r11
#2): bench-style min-of-2 timings bracketed by the bench's own host
calibration probes, so a per-entry floor recorded in SCALING.md carries
its quietness evidence. Refuses to print a floor table without probes.

Methodology matches bench.py's timed loop: session warmed (range-agg,
mapInPandas, table counts, streaming warm), noop sink, release_tracked
between samples, min-of-2 per entry. Graph entries' first sample builds
the shared graph cache exactly as their bench position does after the
warmup front — the MIN therefore reads as the bench-comparable warm
number (the r11 incremental_near_dup adjudication convention).

Usage: python tools/quiet_floor.py <query> [query ...]
"""

from __future__ import annotations

import importlib.util
import os
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
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        raise SystemExit(2)
    bench = _load_bench()
    from pyspark.sql import functions as F

    from pysparkflow.engine.cache import release_tracked
    from pysparkflow.relational.registry import QUERIES, TABLES, load_table
    from pysparkflow.session import get_spark

    # ADVICE r12: scale-factor directory is overridable, matching the
    # bench's own env contract
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cal_before = bench._host_calibration()
    spark = get_spark(
        app_name="quiet-floor", master="local[32]", shuffle_partitions=32
    )
    spark.range(5_000_000).groupBy((F.col("id") % 16).alias("k")).count().collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    bench._warm_streaming(spark)
    n_samples = int(os.environ.get("QUIET_FLOOR_SAMPLES", "2"))
    rows = []
    for name in names:
        fn = QUERIES[name]
        samples = []
        probes = []
        for _ in range(n_samples):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            release_tracked()
            # per-sample probe: on a flapping host the MIN sample is the
            # floor claim, and its adjacent probe is its quietness
            # evidence (min-of-N through noise converges to the floor)
            probes.append(bench._host_calibration()["matmul_sec"])
        rows.append((name, samples, min(samples), probes))
        print(
            f"[floor] {name}: samples={samples} min={min(samples):.2f}s "
            f"probes={probes}",
            file=sys.stderr,
        )
    cal_after = bench._host_calibration()
    flag, ratio = bench._host_flag(cal_before, cal_after)
    print(f"host: {flag} ratio={ratio} before={cal_before} after={cal_after}")
    for name, samples, floor, probes in rows:
        print(f"{name}\t{samples}\t{floor}\tprobes={probes}")


if __name__ == "__main__":
    main()
