"""Stream-static probe == batch probe (the reference's crawl-time semantics,
SURVEY.md §2.7), and the watermarked verdict rollup."""

from __future__ import annotations

from pyspark.sql import functions as F


def _probe_and_index(spark):
    from deduplicator_spark.entry_queries import _probe_index, load

    return _probe_index(load(spark, "/root/testdata/sf0.001", "events"))


def test_stream_static_probe_matches_batch(spark, tmp_path):
    from deduplicator_spark.streaming.probe import (
        probe_stream,
        read_capture_stream,
        run_probe_to_memory,
        static_index_for_stream,
    )

    probe, index = _probe_and_index(spark)
    static_idx = static_index_for_stream(index).persist()

    src = str(tmp_path / "stream_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    run_probe_to_memory(spark, stream, static_idx, "probe_out")
    got = {
        (r["probe_id"], r["verdict"], r["refers_to_record_id"])
        for r in spark.table("probe_out").collect()
    }

    batch = probe_stream(spark.read.parquet(src), static_idx)
    want = {
        (r["probe_id"], r["verdict"], r["refers_to_record_id"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == probe.count()
    assert any(v == "duplicate" for _, v, _ in got)


def test_streaming_exact_dedup_keeps_first_per_digest(spark, tmp_path):
    """Stateful watermarked dedup: exactly one capture survives per digest
    across micro-batches (the incremental index-build upsert)."""
    from deduplicator_spark.streaming.probe import (
        read_capture_stream,
        streaming_exact_dedup,
    )

    probe, _ = _probe_and_index(spark)
    src = str(tmp_path / "dedup_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("dedup_out").collect()
    digests = [r["digest"] for r in got]
    assert len(digests) == len(set(digests))  # one row per digest
    assert set(digests) == {r["digest"] for r in probe.collect()}  # none lost


def test_stateful_dup_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom operator: per-digest running dup stats
    across micro-batches converge to the batch groupBy answer, with the
    deterministic first-capture rule (earliest ts, record_id tie-break)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import streaming_dup_stats

    probe, _ = _probe_and_index(spark)
    src = str(tmp_path / "stateful_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    q = (
        streaming_dup_stats(stream)
        .writeStream.format("memory").queryName("dupstats_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode re-emits running totals; the final state per digest is the
    # row with the max n_seen
    got = {
        r["digest"]: (r["n_seen"], r["first_record_id"])
        for r in spark.table("dupstats_out")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("digest").orderBy(F.col("n_seen").desc())))
        .filter("rn = 1").collect()
    }
    want = {
        r["digest"]: (r["n"], r["first"])
        for r in spark.read.parquet(src)
        .groupBy("digest")
        .agg(F.count("*").alias("n"),
             F.min(F.struct("ts", "record_id")).alias("m"))
        .select("digest", "n", F.col("m.record_id").alias("first")).collect()
    }
    assert got == want
    assert any(n > 1 for n, _ in got.values())  # real dups exercised


def test_verdict_rollup_stream(spark, tmp_path):
    from deduplicator_spark.streaming.probe import (
        probe_stream,
        read_capture_stream,
        static_index_for_stream,
        verdict_rollup_stream,
    )

    probe, index = _probe_and_index(spark)
    static_idx = static_index_for_stream(index)

    src = str(tmp_path / "rollup_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema)
    rollup = verdict_rollup_stream(probe_stream(stream, static_idx), window="1 hour")
    q = (
        rollup.writeStream.format("memory").queryName("rollup_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("rollup_out")

    want = (
        probe_stream(spark.read.parquet(src), static_idx)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "verdict")
        .agg(F.count("*").alias("n"))
    )
    got_d = {(str(r["window_start"]), r["verdict"]): r["n"] for r in got.collect()}
    want_d = {(str(r["window_start"]), r["verdict"]): r["n"] for r in want.collect()}
    assert got_d == want_d
