"""Planted-truth tests for the as-of join (entry_queries.q_asof_join).
Cross-engine proof is the `asof_join` oracle row — DuckDB's NATIVE ASOF
JOIN vs our union+window build, green at sf0.01 and sf0.1; these pin the
boundary semantics: equal-timestamp matches count ('at-or-before'), clicks
before any view match NULL, and the LATEST qualifying view wins."""

from __future__ import annotations

import datetime as dt

import pytest

from deduplicator_spark.entry_queries import q_asof_join

_T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _ev(eid, sec, uid, typ):
    return (eid, _T0 + dt.timedelta(seconds=sec), uid, typ, 1.0, "{}")


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asof")
    rows = [
        # user 1: view@10, view@20, click@20 (tie -> matches view@20),
        #         click@25 (-> view@20), view@30, click@31 (-> view@30)
        _ev(1, 10, 1, "view"), _ev(2, 20, 1, "view"), _ev(3, 20, 1, "click"),
        _ev(4, 25, 1, "click"), _ev(5, 30, 1, "view"), _ev(6, 31, 1, "click"),
        # user 2: click@5 with no view ever -> NULL match
        _ev(10, 5, 2, "click"),
        # user 3: two views at the SAME ts (ids 20, 21) -> dedup keeps 21
        _ev(20, 40, 3, "view"), _ev(21, 40, 3, "view"), _ev(22, 50, 3, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    return {r["click_event_id"]: r for r in q_asof_join(spark, str(tmp)).collect()}


def test_tie_counts_as_at_or_before(result):
    assert result[3]["view_event_id"] == 2
    assert result[3]["lag_seconds"] == 0


def test_latest_qualifying_view_wins(result):
    assert result[4]["view_event_id"] == 2  # view@30 is in the future
    assert result[4]["lag_seconds"] == 5
    assert result[6]["view_event_id"] == 5
    assert result[6]["lag_seconds"] == 1


def test_click_before_any_view_is_null(result):
    r = result[10]
    assert r["view_event_id"] is None and r["view_ts"] is None
    assert r["lag_seconds"] is None


def test_same_ts_views_dedup_to_largest_id(result):
    assert result[22]["view_event_id"] == 21
