"""Streaming sessionization: Spark's native session_window aggregation.

The streaming twin of the batch gaps-and-islands operator
(entry_queries.q_user_sessions): per user, events separated by less than
the gap merge into one session window; a quiet period closes it. Uses the
engine's built-in merging session windows + watermark, so state is evicted
by the runtime once the watermark passes a session's close — no custom
state store code, and late events within the watermark still merge into
their session (the batch operator is the post-hoc exact form; the
watermark bounds how late).

Boundary semantics note (deliberate, documented): the batch operator keeps
a gap of EXACTLY the threshold in-session ('at-or-before', microsecond
arithmetic); Spark's session_window is right-exclusive — an event arriving
exactly gap after the previous one starts a NEW session. The equivalence
test avoids exact-boundary gaps; real event streams hit that microsecond
exactly with probability ~0.

100 TB shape: one shuffle on user_id per micro-batch; state size is one
open-session row per active user, bounded by the watermark horizon."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """(ts, user_id, event_type, value) stream -> one row per CLOSED
    session: (user_id, session_start, session_end, n_events, total_value).
    session_end is the last event's ts + gap (the engine's window end);
    subtract the gap downstream if last-event time is wanted."""
    e = events.withColumn("_ts", F.col("ts").cast("timestamp")) \
        .withWatermark("_ts", watermark)
    return (
        e.groupBy(F.session_window("_ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "total_value")
    )
