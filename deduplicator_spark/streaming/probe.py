"""Structured Streaming probe: the reference's crawl-time path as a
stream-static join.

The reference probes each fetched URI against a frozen Lucene index inside
Heritrix's processor chain (DeDuplicator.java:149-192) — a record-at-a-time
stream-vs-static-table join with no watermarks or stateful operators
(SURVEY.md §2.7). The Spark shape: readStream(captures) joined against the
static, last-wins-deduplicated index; each micro-batch gets verdicts exactly
like the batch path.

Streaming-legality note: top-1-per-probe ranking (W1) needs a window
function, which streams can't do — so the STATIC side is deduplicated to one
row per key up front (A5/A6 last-wins). The join then yields at most one
match per probe row, which is precisely the reference's DIGEST_ANY semantics
against a deduplicated index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def static_index_for_stream(index: DataFrame, keys: tuple[str, ...] = ("digest",),
                            order_col: str = "ts") -> DataFrame:
    """Last-wins dedup of the index to one row per key (IndexBuilder.java:
    227-236), renamed for join-output lineage (K3)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col("record_id").desc())
    return (
        index.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col("url").alias("refers_to_uri"),
            F.col(order_col).alias("refers_to_date"),
            F.col("record_id").alias("refers_to_record_id"),
        )
    )


def read_capture_stream(spark: SparkSession, path: str, schema: StructType,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def probe_stream(captures: DataFrame, static_index: DataFrame,
                 keys: tuple[str, ...] = ("digest",)) -> DataFrame:
    """Stream-static left join + verdict (novel/duplicate) per record."""
    joined = captures.join(F.broadcast(static_index), list(keys), "left")
    return joined.withColumn(
        "verdict",
        F.when(F.col("refers_to_record_id").isNull(), "novel").otherwise("duplicate"),
    )


def verdict_rollup_stream(verdicts: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling-window dup/novel counts — the streaming form of
    the reference's AtomicLong statistics (DeDuplicator.java:54-94), with a
    late-data bound the reference never needed (its stats were process-local)."""
    # watermarks require TIMESTAMP (with zone); parquet often yields NTZ
    verdicts = verdicts.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        verdicts.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "verdict")
        .agg(F.count("*").alias("n"), F.sum("bytes_len").alias("bytes_total"))
        .select(F.col("w.start").alias("window_start"), "verdict", "n", "bytes_total")
    )


def streaming_exact_dedup(captures: DataFrame, key: str = "digest",
                          ts_col: str = "ts",
                          watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming exact dedup: the FIRST capture per digest passes,
    later re-occurrences within the watermark horizon are dropped — the
    incremental form of the index-build upsert (a capture stream feeding a
    growing digest index) using Spark's watermarked dedup state store. State
    per key is bounded by the watermark, so a 100 TB/day stream holds only
    the horizon's distinct digests in state."""
    captures = captures.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        captures.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([key])
    )


def run_probe_to_memory(spark: SparkSession, captures: DataFrame,
                        static_index: DataFrame, table_name: str,
                        keys: tuple[str, ...] = ("digest",)) -> None:
    """Drive the probe with availableNow (process-everything-then-stop) into
    an in-memory sink — the test/bench harness path."""
    q = (
        probe_stream(captures, static_index, keys)
        .writeStream.format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
