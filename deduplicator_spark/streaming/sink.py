"""Exactly-once verdict sink: idempotent foreachBatch parquet commits.

The reference writes crawl-side verdicts into CrawlURI annotations inside
Heritrix's own checkpoint/recovery envelope (DeDuplicator.java:183-205); a
Spark stream needs the sink itself to deliver exactly-once. Structured
Streaming guarantees foreachBatch is invoked with a MONOTONIC, REPLAYABLE
(epoch) batch_id: after a crash the engine replays the last uncommitted
batch with the SAME id and the SAME data (deterministic source offsets from
the checkpoint WAL). Exactly-once therefore reduces to making the per-batch
write idempotent in batch_id — this module keys every commit by it:

    <root>/data/batch_id=<id>/...   dynamic-overwrite parquet partition
    <root>/_commits/<id>            zero-byte marker, written AFTER data

A replayed batch either (a) finds its marker and skips entirely, or
(b) re-OVERWRITES its own partition — partial files from the crash are
replaced, never duplicated. Readers take `read_committed`, which inner-joins
the data against the marker list so an in-flight partition is invisible
until its marker lands (markers are tiny; the join is a partition filter).

Scale: one parquet partition per micro-batch per sink, no global state; the
marker dir holds one empty file per batch (compactable offline). Works on
any Hadoop filesystem (local, HDFS, S3A via the JVM FileSystem API) — no
POSIX assumptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _marker(root: str, batch_id: int) -> str:
    return f"{root}/_commits/{batch_id}"


def committed_ids(spark: SparkSession, root: str) -> set[int]:
    """Batch ids with a commit marker under <root>/_commits."""
    fs, hpath, jvm = _fs(spark, f"{root}/_commits")
    if not fs.exists(hpath):
        return set()
    out = set()
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.isdigit():
            out.add(int(name))
    return out


def exactly_once_committer(root: str):
    """foreachBatch function: idempotent batch_id-keyed parquet commit."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, marker, jvm = _fs(spark, _marker(root, batch_id))
        if fs.exists(marker):
            return  # replay of a fully committed batch: exact skip
        # batch_id travels as the partition DIRECTORY, not a data column;
        # overwrite replaces any partial files from a crashed attempt
        batch_df.write.mode("overwrite") \
            .parquet(f"{root}/data/batch_id={batch_id}")
        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()  # marker last: commit point

    return commit


def write_exactly_once(df: DataFrame, root: str, checkpoint_dir: str,
                       trigger_available_now: bool = True,
                       output_mode: str | None = None, **trigger):
    """Start an exactly-once parquet sink for a streaming DataFrame.

    ``output_mode`` must match the frame's operator ("update" for the
    stateful dup-stats operators, "append"/default otherwise) — foreachBatch
    accepts any mode, since the committer sees whole micro-batch frames."""
    w = (
        df.writeStream.foreachBatch(exactly_once_committer(root))
        .option("checkpointLocation", checkpoint_dir)
    )
    if output_mode is not None:
        w = w.outputMode(output_mode)
    if trigger_available_now and not trigger:
        w = w.trigger(availableNow=True)
    elif trigger:
        w = w.trigger(**trigger)
    return w.start()


def read_committed(spark: SparkSession, root: str) -> DataFrame:
    """Only rows whose batch committed: scan exactly the marker-listed
    partitions, so a crash between data write and marker write exposes
    nothing (the orphan partition is never even listed)."""
    ids = sorted(committed_ids(spark, root))
    if not ids:
        raise ValueError(f"no committed batches under {root}")
    return spark.read.option("basePath", f"{root}/data").parquet(
        *[f"{root}/data/batch_id={i}" for i in ids])
