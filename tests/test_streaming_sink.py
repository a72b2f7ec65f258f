"""Exactly-once foreachBatch sink: idempotent replay, crash-window
invisibility, and restart-without-duplication end to end."""

from __future__ import annotations

import os

import pytest

from deduplicator_spark.streaming.sink import (
    committed_ids,
    exactly_once_committer,
    read_committed,
    write_exactly_once,
)


def _rows(spark, root):
    return sorted(
        (r["record_id"], r["digest"])
        for r in read_committed(spark, str(root)).collect()
    )


def test_committer_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("r1", "d1"), ("r2", "d2")], ["record_id", "digest"])
    commit = exactly_once_committer(root)
    commit(df, 0)
    commit(df, 0)  # replay after a crash that lost the engine's offset ack
    assert _rows(spark, root) == [("r1", "d1"), ("r2", "d2")]
    assert committed_ids(spark, root) == {0}


def test_crash_window_partition_is_invisible(spark, tmp_path):
    root = str(tmp_path / "sink")
    df = spark.createDataFrame([("r1", "d1")], ["record_id", "digest"])
    exactly_once_committer(root)(df, 0)
    # simulate a crash AFTER the data write, BEFORE the marker: an orphan
    # partition with real parquet files but no commit record
    orphan = spark.createDataFrame([("rX", "dX")], ["record_id", "digest"])
    orphan.write.mode("overwrite").parquet(f"{root}/data/batch_id=1")
    assert _rows(spark, root) == [("r1", "d1")]
    # the replayed batch then overwrites the orphan and commits it
    exactly_once_committer(root)(orphan, 1)
    assert ("rX", "dX") in _rows(spark, root)


@pytest.mark.slow
def test_restart_appends_without_duplication(spark, tmp_path):
    from deduplicator_spark.streaming.probe import read_capture_stream

    src = str(tmp_path / "src")
    root = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    a = spark.createDataFrame(
        [(f"r{i}", f"d{i % 3}") for i in range(6)], ["record_id", "digest"])
    a.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        q = write_exactly_once(stream.select("record_id", "digest"),
                               root, ckpt)
        q.awaitTermination(120)

    run_once()
    first = _rows(spark, root)
    assert len(first) == 6

    # second run over the SAME checkpoint with new files appended: the
    # engine resumes from committed offsets; nothing from run 1 re-emits
    b = spark.createDataFrame(
        [(f"s{i}", "dz") for i in range(4)], ["record_id", "digest"])
    b.write.mode("append").parquet(src)
    run_once()
    final = _rows(spark, root)
    assert len(final) == 10
    assert len(set(final)) == 10  # exactly once, across the restart
    assert set(first) <= set(final)
    assert len(committed_ids(spark, str(root))) >= 2
    assert os.path.isdir(f"{root}/_commits")
