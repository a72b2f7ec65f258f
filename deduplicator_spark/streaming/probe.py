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


def phash_index_for_stream(index_images: DataFrame,
                           cfg=None) -> DataFrame:
    """Static side of the streaming NEAR-IMAGE probe: every indexed image
    exploded into its 4 x 16-bit pigeonhole band keys (the same banding as
    the batch tier, functions/hashing.phash_band_keys), phash carried along
    for the verify. The 'index pre-organized by key' Lucene analog — at
    cluster scale write it bucketed by (band, key) (plans/bucketed.py) so
    each micro-batch shuffles only the probe side."""
    from ..config import DEFAULT
    from ..functions.hashing import phash_band_keys

    cfg = cfg or DEFAULT
    return index_images.select(
        F.col("image_id").alias("idx_image_id"),
        F.col("phash").alias("idx_phash"),
        F.explode(phash_band_keys(F.col("phash"), cfg)).alias("bk"),
    ).select("idx_image_id", "idx_phash",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def probe_phash_stream(captures: DataFrame, banded_index: DataFrame,
                       cfg=None) -> DataFrame:
    """Streaming near-duplicate IMAGE hits: incoming (image_id, phash) rows
    band-exploded and equi-joined against the static banded index on
    (band, key), then Hamming-verified JVM-side — the incremental form of
    the batch near_image tier, recall-1 for Hamming <= cfg.phash_max_hamming
    by pigeonhole, with NO stream-side state.

    A pair agreeing on several bands would emit once per shared band, and
    streams cannot distinct/window it away without state — so dedup is
    STATELESS: both phashes are present after the join, so each row computes
    the pair's FIRST agreeing band from xor alone and survives only if it IS
    that band (exactly one row per verified pair, deterministic).

    Emits verified hits only (duplicate verdicts). Novelty ('no index image
    within Hamming 3') is a negative over ALL 4 band joins, which no
    stateless per-row operator can decide — reconcile novels batch-side via
    anti-join on the processed ids, or keep the exact-digest probe_stream's
    left join for the tier-0 verdict."""
    from ..config import DEFAULT
    from ..functions.hashing import hamming64, phash_band_keys

    cfg = cfg or DEFAULT
    probes = captures.select(
        "*",
        F.explode(phash_band_keys(F.col("phash"), cfg)).alias("bk"),
    ).select(F.col("*"), F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key")).drop("bk")
    joined = probes.join(banded_index, ["band", "key"]).filter(
        F.col("image_id") != F.col("idx_image_id"))
    x = F.col("phash").bitwiseXOR(F.col("idx_phash"))
    first_agree = F.coalesce(*[
        F.when(F.shiftrightunsigned(x, 16 * i).bitwiseAND(F.lit(0xFFFF)) == 0,
               F.lit(i))
        for i in range(4)
    ])
    return (
        joined.filter(F.col("band") == first_agree)
        .withColumn("hamming", hamming64(F.col("phash"), F.col("idx_phash")))
        .filter(F.col("hamming") <= cfg.phash_max_hamming)
        .drop("band", "key")
        .withColumn("verdict", F.lit("duplicate"))
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
