"""Streaming audio print probe (stream-static subfingerprint join) == the
identical batch join, with a planted shifted clip recovered at one dominant
offset and the structural one-row-per-window-pair guarantee."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicator_spark.codecs import audio_subfingerprints, encode_audio

pytestmark = pytest.mark.slow

WIN = 1024


def _prints_rows(audio_id: str, samples: np.ndarray) -> list[tuple]:
    return [(audio_id, int(k), int(p))
            for k, p in enumerate(audio_subfingerprints(samples))]


def test_streaming_audio_probe_matches_batch(spark, tmp_path):
    from deduplicator_spark.streaming.audio_probe import (
        print_index_for_stream,
        probe_audio_stream,
    )
    from deduplicator_spark.streaming.probe import read_capture_stream

    rng = np.random.Generator(np.random.PCG64(77))
    base = rng.integers(-3000, 3000, size=30 * WIN).astype(np.int16)
    novel = rng.integers(-3000, 3000, size=30 * WIN).astype(np.int16)

    index_rows = _prints_rows("idx-000", base) + _prints_rows("idx-001", novel)
    static = print_index_for_stream(
        spark.createDataFrame(index_rows,
                              "audio_id string, win_idx int, print long")
    ).persist()
    static.count()

    # probe stream: the base clip trimmed by 4 windows (a re-master) plus an
    # unrelated clip
    probe_rows = (_prints_rows("probe-shift", base[4 * WIN:])
                  + _prints_rows("probe-novel",
                                 rng.integers(-3000, 3000, size=20 * WIN)
                                 .astype(np.int16)))
    probe_df = spark.createDataFrame(
        probe_rows, "audio_id string, win_idx int, print long")

    src = str(tmp_path / "audio_src")
    probe_df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        probe_audio_stream(stream, static)
        .writeStream.format("memory").queryName("audio_probe_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("audio_probe_out").collect()

    # structurally one row per (probe window, index window) pair
    keys = [(r["probe_id"], r["idx_id"], r["probe_win"], r["idx_win"])
            for r in rows]
    assert len(keys) == len(set(keys))

    # == the identical batch join
    batch = probe_audio_stream(probe_df, static).collect()
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in batch)

    # the planted re-master dominates at offset -4 (its window w is the
    # base's window w+4): all 25 of its prints hit idx-000 there
    hits = [r for r in rows if r["probe_id"] == "probe-shift"
            and r["idx_id"] == "idx-000"]
    offsets = {}
    for r in hits:
        offsets[r["offset"]] = offsets.get(r["offset"], 0) + 1
    assert max(offsets, key=offsets.get) == -4
    assert offsets[-4] == 25  # 30-4 windows -> 26 -> 25 prints, all aligned
