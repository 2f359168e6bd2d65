"""Structured Streaming smoke: the windowed streaming plan over the static
events parquet must equal the batch hourly rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkflow.relational.registry import load_events
from pysparkflow.streaming.events import run_windowed_counts_batchlike


def test_stream_equals_batch(spark, sf_dir):
    """Append mode emits exactly the finalized windows: window_end <=
    max(ts floored to ms) - watermark delay (boundary inclusive)."""
    import datetime as dt

    stream_out = run_windowed_counts_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_eq_batch"
    )
    e = load_events(spark, sf_dir)
    wm = e.agg(F.date_trunc("millisecond", F.max("ts")).alias("m")).collect()[0].m
    wm -= dt.timedelta(hours=2)
    batch = (
        e.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    s = {tuple(r) for r in stream_out.collect()}
    b = {
        tuple(r)
        for r in batch.collect()
        if r.window_start + dt.timedelta(hours=1) <= wm
    }
    assert s == b and len(s) > 0


def test_stream_join_equals_batch(spark, sf_dir):
    from pysparkflow.streaming.events import run_stream_join_batchlike

    out = run_stream_join_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_join"
    )
    e = load_events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round("value", 2).alias("p_value"),
    )
    batch = clicks.join(
        purch,
        (clicks.user_id == purch.p_user)
        & (purch.p_ts >= clicks.click_ts - F.expr("INTERVAL 30 MINUTES"))
        & (purch.p_ts <= clicks.click_ts),
    ).select("user_id", "click_id", "click_ts", "p_ts", "p_value")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_dedup_equals_distinct(spark, sf_dir):
    from pysparkflow.streaming.events import run_stream_dedup_batchlike

    out = run_stream_dedup_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_dedup"
    )
    batch = load_events(spark, sf_dir).select("user_id", "event_type").distinct()
    got = {tuple(r) for r in out.collect()}
    assert got == {tuple(r) for r in batch.collect()} and len(got) > 0


# ---------------------------------------------------------------------------
# Late / out-of-order data: the watermark must actually drop late rows and
# evict state (VERDICT r2 items 1, 4, 5).
# ---------------------------------------------------------------------------

_NANOS = 1_000  # micros -> nanos (the legacy encoding stores ts as nanos long)


def _write_event_file(spark, path, rows, mtime, encoding="nanos"):
    """rows: list of (event_id, ts_iso, user_id, event_type, value).

    ``encoding`` mirrors the two shapes the testdata generator has
    shipped (registry.events_ts_encoding): "nanos" = legacy
    TIMESTAMP(NANOS) as int64, "micros" = native timestamp[us] — the
    dtype of the CURRENT /root/testdata parquet."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if encoding == "nanos":
        ts_arr = pa.array([_iso_nanos(ts) for _, ts, *_ in rows], pa.int64())
        ts_field = pa.field("ts", pa.int64())
    else:
        ts_arr = pa.array(
            [dt.datetime.fromisoformat(ts) for _, ts, *_ in rows],
            pa.timestamp("us"),
        )
        ts_field = pa.field("ts", pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        },
        schema=pa.schema(
            [
                pa.field("event_id", pa.int64()),
                ts_field,
                pa.field("user_id", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("value", pa.float64()),
                pa.field("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _iso_nanos(ts_iso):
    import datetime as dt

    t = dt.datetime.fromisoformat(ts_iso).replace(tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1_000_000) * _NANOS


def _events_file_stream(spark, d):
    """The PRODUCTION schema-adaptive scan (streaming.events
    .adaptive_events_scan) over a fixture directory, one file per batch."""
    from pysparkflow.streaming.events import adaptive_events_scan

    schema, finish = adaptive_events_scan(spark, d)
    return finish(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(d)
    )


import pytest


@pytest.mark.parametrize("encoding", ["nanos", "micros"])
def test_windowed_append_drops_late_row(spark, tmp_path, encoding):
    """Out-of-order file arrival: a row older than the watermark is dropped
    (never re-emits its already-finalized window), and windows finalize as
    the watermark advances — stream output == batch oracle minus the
    dropped row, restricted to finalized windows."""
    from pysparkflow.streaming.events import windowed_event_counts

    d = str(tmp_path / "late_win")
    import os

    os.makedirs(d)
    # batch 0: one event per hour 00..10 (watermark still 1970 -> no emission)
    f0 = [(i, f"2024-01-01 {i:02d}:30:00", 1, "click", 1.0) for i in range(11)]
    # batch 1: row at 23:00. Watermark DURING this batch = 10:30-2h = 08:30
    # -> windows 00..07 finalized+emitted; after it, watermark = 21:00.
    f1 = [(101, "2024-01-01 23:00:00", 1, "click", 1.0)]
    # batch 2: late row at 05:45 — its window (end 06:00 <= wm 21:00) was
    # already finalized and evicted, so Spark drops the row (measured:
    # numRowsDroppedByWatermark=1): no duplicate emission, no count bump.
    # Windows 08,09,10 finalize in this batch (end <= 21:00).
    f2 = [(102, "2024-01-01 05:45:00", 1, "click", 1.0)]
    _write_event_file(spark, f"{d}/f0.parquet", f0, 1_000_000, encoding)
    _write_event_file(spark, f"{d}/f1.parquet", f1, 2_000_000, encoding)
    _write_event_file(spark, f"{d}/f2.parquet", f2, 3_000_000, encoding)

    agg = windowed_event_counts(_events_file_stream(spark, d))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_win")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from t_late_win").collect()
    got = {(r.window_start.hour, r.event_type, r.n_events, r.sum_value) for r in out}
    # finalized windows are 00..10 (end <= 21:00), each with exactly ONE
    # event: the late 05:45 row was dropped after its window finalized, so
    # window 05 has n=1 not n=2 and was not emitted a second time. This is
    # exactly "batch oracle minus the dropped row" over finalized windows.
    expected = {(h, "click", 1, 1.0) for h in range(11)}
    assert got == expected
    assert len(out) == 11  # no window emitted twice


@pytest.mark.parametrize("encoding", ["nanos", "micros"])
def test_stream_dedup_watermark_drops_late_and_evicts(spark, tmp_path, encoding):
    """dropDuplicatesWithinWatermark: (a) a row later than the watermark is
    dropped even for an unseen key; (b) key state is evicted one horizon
    past its first occurrence, so a re-appearing key re-emits — bounded
    state with documented horizon semantics."""
    d = str(tmp_path / "late_dedup")
    import os

    os.makedirs(d)
    # horizon 1h. Measured pyspark-4.1 semantics this test pins down:
    # late-row filtering uses the PREVIOUS batch's watermark, eviction the
    # current one, and the dedup probe sees state before eviction runs.
    # batch 0 (wm 1970): (1,click)@00:00, (9,x)@10:00 -> wm after = 09:00
    f0 = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:00:00", 9, "x", 1.0),
    ]
    # batch 1 (late-wm 1970, evict-wm 09:00): (2,click)@05:00 emitted (not
    # late under the previous wm), then evicted at commit (expiry 06:00 <
    # 09:00); (1,click)@09:30 suppressed (expired entry still in store
    # during processing); (1,click)+(2,click) old entries evicted at commit.
    f1 = [
        (3, "2024-01-01 05:00:00", 2, "click", 1.0),
        (4, "2024-01-01 09:30:00", 1, "click", 1.0),
    ]
    # batch 2 (wm 09:00): (1,click)@19:30 — state was evicted -> RE-EMITTED
    # (the horizon contract: a key idle past the horizon starts over);
    # (9,x)@20:00 suppressed (its entry, expiry 11:00 > evict-wm 09:00, is
    # still live). wm after = 19:00.
    f2 = [
        (5, "2024-01-01 19:30:00", 1, "click", 1.0),
        (6, "2024-01-01 20:00:00", 9, "x", 1.0),
    ]
    # batch 3 (late-wm 09:00): (5,y)@03:00 is beyond-watermark late ->
    # DROPPED even though the key was never seen (measured:
    # numRowsDroppedByWatermark=1); (9,x)@23:00 suppressed by the
    # not-yet-evicted entry.
    f3 = [
        (7, "2024-01-01 03:00:00", 5, "y", 1.0),
        (8, "2024-01-01 23:00:00", 9, "x", 1.0),
    ]
    _write_event_file(spark, f"{d}/f0.parquet", f0, 1_000_000, encoding)
    _write_event_file(spark, f"{d}/f1.parquet", f1, 2_000_000, encoding)
    _write_event_file(spark, f"{d}/f2.parquet", f2, 3_000_000, encoding)
    _write_event_file(spark, f"{d}/f3.parquet", f3, 4_000_000, encoding)

    dedup = (
        _events_file_stream(spark, d).select("user_id", "event_type", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(r.user_id, r.event_type) for r in spark.sql(
        "select * from t_late_dedup"
    ).collect()]
    assert rows.count((5, "y")) == 0  # beyond-watermark late row dropped
    assert rows.count((1, "click")) == 2  # evicted after horizon, re-emitted
    assert rows.count((9, "x")) == 1  # duplicates within horizon suppressed
    assert rows.count((2, "click")) == 1  # not late under the previous wm


def test_session_windows_stream_equals_batch(spark, sf_dir):
    """Append-mode session windows emit exactly the finalized sessions:
    last event + gap at or before the ms-floored watermark; counts/sums
    equal the batch lag/cumsum sessionization of the same file."""
    import datetime as dt

    from pysparkflow.streaming.events import run_session_windows_batchlike

    out = run_session_windows_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_sess_eq_batch"
    )
    got = {
        (r.session_start, r.session_end, r.user_id, r.n_events, float(r.sum_value))
        for r in out.collect()
    }

    e = load_events(spark, sf_dir).select("user_id", "ts", "value").collect()
    mx = max(r.ts for r in e)
    wm = mx.replace(microsecond=(mx.microsecond // 1000) * 1000) - dt.timedelta(hours=2)
    gap = dt.timedelta(minutes=30)
    by_user: dict[int, list] = {}
    for r in sorted(e, key=lambda r: (r.user_id, r.ts)):
        sessions = by_user.setdefault(r.user_id, [])
        if sessions and r.ts < sessions[-1]["last"] + gap:
            s = sessions[-1]
            s["last"] = r.ts
            s["n"] += 1
            s["v"] += r.value
        else:
            sessions.append({"first": r.ts, "last": r.ts, "n": 1, "v": r.value})
    exp = {
        (s["first"], s["last"] + gap, uid, s["n"], round(s["v"], 2))
        for uid, sessions in by_user.items()
        for s in sessions
        if s["last"] + gap <= wm
    }
    assert got == exp and len(got) > 0


def test_stream_static_enrich_equals_batch_join(spark, sf_dir):
    """Stream-static broadcast enrichment emits exactly the batch join's
    rows (stateless append, one emission per match)."""
    from pysparkflow.streaming.events import run_stream_enrich_batchlike

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", F.col("c_nationkey").cast("long").alias("nation"))
    )
    out = run_stream_enrich_batchlike(
        spark,
        f"{sf_dir}/events.parquet",
        cust,
        join_key=F.col("user_id") == F.col("c_custkey"),
        query_name="t_enrich",
        select_cols=["event_id", "nation"],
    )
    batch = (
        load_events(spark, sf_dir)
        .join(cust, F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "nation")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


@pytest.mark.parametrize("encoding", ["micros"])
def test_left_outer_join_emits_expired_unmatched_only(spark, tmp_path, encoding):
    """Null-padded rows appear ONLY for clicks the watermark has proven
    unmatched; clicks still inside the horizon are withheld."""
    from pysparkflow.streaming.events import run_stream_left_join_batchlike

    rows = [
        # matched pair: purchase 10 min after the click? (no: p must be
        # <= click_ts) -> purchase 10 min BEFORE the click
        (1, "2024-01-01 00:50:00", 7, "purchase", 5.0),
        (2, "2024-01-01 01:00:00", 7, "click", 0.0),
        # unmatched click, far in the past -> expires, null row
        (3, "2024-01-01 02:00:00", 8, "click", 0.0),
        # unmatched click inside the 2h horizon of max ts -> withheld
        (4, "2024-01-01 11:30:00", 9, "click", 0.0),
        # tail events advance both sides' watermarks (and match each
        # other: same user, same instant satisfies p_ts <= click_ts)
        (5, "2024-01-01 12:00:00", 1, "click", 0.0),
        (6, "2024-01-01 12:00:00", 1, "purchase", 1.0),
    ]
    d = tmp_path / "ev"
    d.mkdir()
    _write_event_file(spark, str(d / "events.parquet"), rows, 1000, encoding)
    out = run_stream_left_join_batchlike(
        spark, str(d / "events.parquet"), query_name="t_louter"
    ).collect()
    by_click = {r["click_id"]: r for r in out}
    # watermark = min-side max (12:00) - 2h = 10:00
    assert by_click[2]["p_value"] == 5.0          # matched emits
    assert by_click[3]["p_ts"] is None            # expired unmatched: null row
    assert 4 not in by_click                      # inside horizon: withheld
    assert by_click[5]["p_value"] == 1.0          # same-instant match emits


def test_topk_windowed_agg_prunes_value_column(spark, tmp_path):
    """The counts-only windowed aggregate (events_stream_topk's shape,
    with_sums=False) must not read the ``value`` column: its state rows
    carry no sum and the parquet scan's ReadSchema excludes value —
    verified on the batch-side optimized plan, which shares the
    expression path with the streaming one (r14 opt)."""
    from pysparkflow.streaming.events import windowed_event_counts

    rows = [(1, "2024-01-01 00:10:00", 1, "click", 2.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    p = str(tmp_path / "ev.parquet")
    df.write.parquet(p)
    src = spark.read.parquet(p)
    lean = windowed_event_counts(src, with_sums=False)
    plan = lean._jdf.queryExecution().executedPlan().toString()
    assert "value" not in plan.split("ReadSchema")[-1], plan[-1500:]
    assert "sum_value" not in lean.columns
    full = windowed_event_counts(src)
    assert "sum_value" in full.columns
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "value" in fplan.split("ReadSchema")[-1]
