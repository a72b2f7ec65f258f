"""Planted-truth tests for sessionization (entry_queries.q_user_sessions).
Cross-engine proof is the `user_sessions` oracle row (green at sf0.01 and
sf0.1); these pin the boundary semantics: a gap of EXACTLY 30 minutes stays
in-session, one microsecond more opens a new session."""

from __future__ import annotations

import datetime as dt

import pytest

from deduplicator_spark.entry_queries import q_user_sessions

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events() -> list[tuple]:
    rows = []
    # user 1: three events, gaps exactly 30:00.000000 -> ONE session
    for i, off in enumerate([0, 1800, 3600]):
        rows.append((i, _T0 + dt.timedelta(seconds=off), 1, "view", 1.0, "{}"))
    # user 2: gap of 30:00.000001 -> TWO sessions
    rows.append((10, _T0, 2, "view", 2.0, "{}"))
    rows.append((11, _T0 + dt.timedelta(seconds=1800, microseconds=1),
                 2, "click", 3.0, "{}"))
    # user 3: single event
    rows.append((20, _T0, 3, "error", 5.0, "{}"))
    return rows


@pytest.fixture(scope="module")
def sessions(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sessions")
    ev = spark.createDataFrame(
        _events(),
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    return q_user_sessions(spark, str(tmp)).collect()


def test_exact_gap_stays_in_session(sessions):
    u1 = [r for r in sessions if r["user_id"] == 1]
    assert len(u1) == 1
    assert u1[0]["n_events"] == 3
    assert u1[0]["session_start"] == "2024-01-01 12:00:00"
    assert u1[0]["session_end"] == "2024-01-01 13:00:00"
    assert u1[0]["total_value"] == pytest.approx(3.0)


def test_one_microsecond_over_opens_new_session(sessions):
    u2 = sorted((r for r in sessions if r["user_id"] == 2),
                key=lambda r: r["session_no"])
    assert len(u2) == 2
    assert [r["n_events"] for r in u2] == [1, 1]
    assert u2[0]["n_types"] == 1 and u2[1]["n_types"] == 1


def test_singleton_session(sessions):
    u3 = [r for r in sessions if r["user_id"] == 3]
    assert len(u3) == 1
    assert u3[0]["session_start"] == u3[0]["session_end"]
