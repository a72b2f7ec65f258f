"""Streaming winnow probe (streaming/winnow_probe.py): planted passage
probes through a real availableNow stream — one row per (probe, indexed
doc) pair, and hit-for-hit equivalence with the batch lifecycle's overlap
verdicts."""

from __future__ import annotations

import pytest

PASSAGE = "the quick brown fox jumps over the lazy dog by the riverbank"


@pytest.mark.slow
def test_streaming_winnow_probe_matches_batch(spark, tmp_path):
    from deduplicator_spark.plans.winnow_index import (
        build_winnow_index,
        probe_winnow,
    )
    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.winnow_probe import (
        probe_winnow_stream,
        winnow_index_for_stream,
    )

    index_docs = spark.createDataFrame(
        [
            (0, "opening words here " + PASSAGE + " and closing remarks"),
            (1, "totally different indexed content about winter weather"),
            (2, PASSAGE + " with a distinct continuation of its own"),
        ],
        "doc_id long, text string",
    ).persist()
    probes = spark.createDataFrame(
        [
            (10, PASSAGE),                       # covered by BOTH 0 and 2
            (11, "zzz qqq completely unrelated probe text wwww"),
            (12, "opening words here " + PASSAGE),  # closer to 0
        ],
        "doc_id long, text string",
    )

    post, arrays = winnow_index_for_stream(index_docs)
    static = (post.persist(), arrays.persist())
    src = str(tmp_path / "winnow_src")
    probes.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        probe_winnow_stream(stream, static)
        .writeStream.format("memory").queryName("winnow_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("winnow_out").collect()

    pairs = {(r.probe_id, r.refers_to): r for r in rows}
    assert len(rows) == len(pairs), "one row per (probe, indexed doc) pair"
    # probe 10 hits both passage-bearing index docs; 11 emits nothing
    assert {p for p, _ in pairs} == {10, 12}
    assert {(10, 0), (10, 2)} <= set(pairs)

    # hit-for-hit parity with the batch lifecycle on the SAME pairs: the
    # batch probe keeps top-1 only, so its overlap verdicts must appear in
    # the stream's pair set with identical shared/score
    batch = {
        (r.probe_id, r.refers_to): r
        for r in probe_winnow(probes, build_winnow_index(index_docs))
        .filter("verdict = 'overlap'").collect()
    }
    assert set(batch) <= set(pairs)
    for key, b in batch.items():
        s = pairs[key]
        assert (s.shared, s.n_probe, s.score) == (b.shared, b.n_probe, b.score)
