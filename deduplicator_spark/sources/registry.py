"""U1/S4 — pluggable source registry.

The reference's main extension point is a source connector chosen by
fully-qualified classname via reflection (CrawlDataIterator.java:27-67,
instantiated at IndexingLauncher.java:103,137). The Spark-native analog is a
name -> reader-function registry (the lightweight form of a DataSourceV2
registration): ``read_source(spark, "warc"|"crawl_log"|"parquet", path)``
returns a DataFrame from the named connector, and ``register_source`` adds
user connectors at runtime — same contract, no reflection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _read_parquet(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def _read_text(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).text(path)


def _read_warc(spark: SparkSession, path: str, **options) -> DataFrame:
    from .warc import scan_warc_dir

    return scan_warc_dir(spark, path, **options)


def _read_crawl_log(spark: SparkSession, path: str, **options) -> DataFrame:
    from .crawl_log import read_crawl_log

    return read_crawl_log(spark, path, **options)


_REGISTRY: dict[str, Callable[..., DataFrame]] = {
    "parquet": _read_parquet,
    "text": _read_text,
    "warc": _read_warc,
    "crawl_log": _read_crawl_log,
}


def register_source(name: str, reader: Callable[..., DataFrame]) -> None:
    """Plug in a user connector: reader(spark, path, **options) -> DataFrame
    (the Class.forName(iteratorClassName) analog)."""
    _REGISTRY[name] = reader


def available_sources() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def read_source(spark: SparkSession, name: str, path: str, **options) -> DataFrame:
    """Dispatch to the named connector; unknown names raise with the
    available set (mirroring the launcher's fail-fast on a bad classname)."""
    try:
        reader = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown source {name!r}; registered: {available_sources()}"
        ) from None
    return reader(spark, path, **options)
