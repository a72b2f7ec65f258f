"""Streaming sessionization (native session_window) == the batch
gaps-and-islands operator on the same events, away from the exact-boundary
microsecond where their documented semantics differ."""

from __future__ import annotations

import datetime as dt

import pytest

from deduplicator_spark.entry_queries import q_user_sessions

pytestmark = pytest.mark.slow

_T0 = dt.datetime(2024, 5, 1, 8, 0, 0)


def _events():
    rows = []
    eid = 0
    # user 1: bursts at 0-3min, 45-47min, 120min -> 3 sessions
    for sec in (0, 60, 180, 2700, 2820, 7200):
        rows.append((eid, _T0 + dt.timedelta(seconds=sec), 1, "view", 2.0, "{}"))
        eid += 1
    # user 2: one long session, 10 events 5 min apart
    for k in range(10):
        rows.append((eid, _T0 + dt.timedelta(seconds=300 * k), 2, "click", 1.5, "{}"))
        eid += 1
    return rows


def test_streaming_sessions_match_batch(spark, tmp_path):
    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.sessions import sessionize_stream

    ev = spark.createDataFrame(
        _events(), "event_id long, ts timestamp_ntz, user_id long, "
                   "event_type string, value double, props string")
    src = str(tmp_path / "sess_src")
    ev.write.mode("overwrite").parquet(src)
    # flush sentinel: a far-future event written LAST (later mtime -> last
    # micro-batch) advances the watermark past every real session's close,
    # so append mode emits them all in the final no-data batch.
    import time as _time
    _time.sleep(1.1)
    sentinel = spark.createDataFrame(
        [(9999, _T0 + dt.timedelta(days=30), 999, "view", 0.0, "{}")],
        ev.schema)
    sentinel.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, watermark="3 hours")
        .writeStream.format("memory").queryName("sessions_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        ((r["user_id"], r["n_events"], r["total_value"])
         for r in spark.table("sessions_out").collect()
         if r["user_id"] != 999))

    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    batch = sorted(
        ((r["user_id"], r["n_events"], r["total_value"])
         for r in q_user_sessions(spark, str(tmp_path)).collect()))
    assert got == batch
    assert [g for g in got if g[0] == 1] == [(1, 1, 2.0), (1, 2, 4.0), (1, 3, 6.0)]
    assert [g for g in got if g[0] == 2] == [(2, 10, 15.0)]
