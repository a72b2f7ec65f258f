"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench, and the driver entry
all run the same engine configuration. Tuned for local[N] in the sandbox but
every setting is the one you'd ship to a 1000-executor cluster:

- AQE on (runtime coalescing + skew-join splitting: the LSH band join over
  boilerplate captions is skewed by construction — SURVEY.md §7.4).
- Runtime bloom-filter join pruning (the set-oriented analog of the reference's
  BloomFilter64bit pre-filter, LuceneIndexSearcher.java:172-199).
- Arrow everywhere Python touches data; bounded batch size so image-decode
  UDFs cannot blow worker memory (SURVEY.md §7.4 hard part #2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT, DedupConfig


def get_spark(
    app_name: str = "deduplicator-spark",
    cores: int | None = None,
    cfg: DedupConfig = DEFAULT,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` pins local parallelism (used by the N-vs-4N scaling bench);
    default comes from $SPARK_GRAFT_CPUS or all cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle = max(cfg.shuffle_partitions, cores)
    b = SparkSession.builder.appName(app_name)
    # Under spark-submit the JVM gateway already exists and --master (a real
    # cluster, or local[N] in the sandbox evidence runs) is authoritative —
    # forcing local[] here would silently un-cluster a submitted job. Plain
    # `python` launches its own gateway, so local[N] applies.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        b = b.master(f"local[{cores}]")
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
