"""Persistence lifetime tracking for operator-internal caches.

Several operators persist an intermediate that the RETURNED (lazy)
DataFrame still depends on — a shingle inverted index, normalized
vectors, collected blocks. The operator cannot unpersist those before the
caller consumes the result, and Spark's CacheManager holds cached plans
until an explicit unpersist, so a long-lived session running these
operators repeatedly would accumulate dead cache entries (round-3 ADVICE
carryover).

``track(df)`` persists and registers the intermediate;
``release_tracked()`` unpersists everything registered — callers (bench
loop, driver pipelines, notebooks) invoke it once the result of the
operator has been fully consumed (written, collected, or counted).
Unpersisting a DataFrame a pending lazy plan still references is safe in
Spark — the plan recomputes from lineage — so a premature release costs
time, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for a later release_tracked()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked intermediate (non-blocking); returns how
    many were released. Idempotent; never raises on an already-stopped
    session (the blocks die with the executors anyway)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED)
