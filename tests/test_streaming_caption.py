"""Streaming caption probe (streaming/caption_probe.py): planted exact +
near + novel probes through a real availableNow stream, checking verdicts,
one-row-per-pair dedup (even when a probe hits several index captions), and
tier precedence (exact probes never reach the near join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_BASE = "the of " + " ".join(f"w{i:02d}" for i in range(1, 29))  # 30 tokens


@pytest.mark.slow
def test_streaming_caption_probe(spark, tmp_path):
    from deduplicator_spark.plans.caption_index import build_caption_index
    from deduplicator_spark.streaming.caption_probe import (
        caption_bands_for_stream,
        caption_exact_for_stream,
        probe_caption_stream,
    )
    from deduplicator_spark.streaming.probe import read_capture_stream

    index = build_caption_index(spark.createDataFrame(
        [
            ("idx-a", _BASE),
            ("idx-b", _BASE + " extra more"),
            ("idx-c", " ".join(f"qq{i:02d}" for i in range(25))),
        ],
        "image_id string, caption string",
    )).persist()
    exact_ref = caption_exact_for_stream(index).persist()
    banded = caption_bands_for_stream(index).persist()

    probes = spark.createDataFrame(
        [
            ("p-exact", _BASE),                 # digest hit on idx-a
            ("p-near", _BASE + " tail1"),       # near idx-a AND idx-b
            ("p-nov", " ".join(f"rr{i:02d}" for i in range(25))),
        ],
        "image_id string, caption string",
    )
    src = str(tmp_path / "caption_src")
    probes.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        probe_caption_stream(stream, exact_ref, banded)
        .writeStream.format("memory").queryName("caption_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("caption_out").collect()

    pairs = {(r["image_id"], r["refers_to_id"]): r for r in rows}
    assert len(rows) == len(pairs)  # first-agreeing-band dedup: one row/pair
    assert set(pairs) == {
        ("p-exact", "idx-a"),
        ("p-near", "idx-a"), ("p-near", "idx-b"),
    }  # the novel probe emits nothing; exact never reaches the near join

    assert pairs[("p-exact", "idx-a")]["verdict"] == "duplicate"
    assert pairs[("p-exact", "idx-a")]["jaccard"] is None
    na = pairs[("p-near", "idx-a")]
    nb = pairs[("p-near", "idx-b")]
    assert na["verdict"] == nb["verdict"] == "near_duplicate"
    # exact Jaccard on shingle sets: 28/29 vs idx-a, 28/31 vs idx-b
    assert abs(na["jaccard"] - 28 / 29) < 1e-9
    assert abs(nb["jaccard"] - 28 / 31) < 1e-9
