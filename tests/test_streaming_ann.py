"""Streaming embedding ANN probe (stream-static LSH-bucketed cosine) ==
the identical batch join, with planted near-duplicate recall and the
structural one-row-per-pair guarantee."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

DIM = 16
THRESHOLD = 0.98


def _split_embeddings(spark, n_bases=25, dim=DIM, seed=23):
    """Planted corpus split across the stream boundary: each base vector goes
    to the INDEX (even vec_id), its near-identical copy (cos >= 0.999) to the
    PROBE stream (odd vec_id), plus random background on both sides."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows, planted = [], []
    vid = 0
    for _ in range(n_bases):
        base = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in base]))
        noisy = base + rng.normal(scale=0.003, size=dim)
        rows.append((vid + 1, [float(x) for x in noisy]))
        planted.append((vid + 1, vid))  # (probe, index)
        vid += 2
    for _ in range(60):
        rows.append((vid, [float(x) for x in rng.normal(size=dim)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return (df.filter(F.col("vec_id") % 2 == 0),
            df.filter(F.col("vec_id") % 2 == 1), planted,
            {r[0]: np.array(r[1]) for r in rows})


def test_streaming_ann_probe_matches_batch(spark, tmp_path):
    from deduplicator_spark.streaming.ann_probe import (
        lsh_index_for_stream,
        probe_ann_stream,
    )
    from deduplicator_spark.streaming.probe import read_capture_stream

    index_df, probe_df, planted, vecs = _split_embeddings(spark)
    static_buckets = lsh_index_for_stream(index_df, DIM).persist()
    static_buckets.count()

    src = str(tmp_path / "ann_src")
    probe_df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        probe_ann_stream(stream, static_buckets, DIM, threshold=THRESHOLD)
        .writeStream.format("memory").queryName("ann_probe_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("ann_probe_out").collect()

    # structurally one row per (probe, index) pair — no stateless dedup needed
    got = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in rows}
    assert len(rows) == len(got)

    # == the IDENTICAL operator run in batch mode (micro-batching is invisible)
    batch = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in probe_ann_stream(
            spark.read.parquet(src), static_buckets, DIM, threshold=THRESHOLD
        ).collect()
    }
    assert got == batch

    # every emitted cos is the true cosine (recomputed driver-side), >= t
    for (qid, nid), cos in got.items():
        a, b = vecs[qid], vecs[nid]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - true_cos) < 1e-5
        assert cos >= THRESHOLD

    # planted near-identical copies land in the same (or Hamming-1) bucket:
    # multiprobe radius 1 must recover nearly all of them across the split
    found = sum(1 for p in planted if p in got)
    assert found >= int(0.9 * len(planted))
