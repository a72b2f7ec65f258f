"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship near-dup detection + clustering over sf0.001 documents.
queries()    — one entry per implemented operator family (SURVEY.md §2).
oracle_sql() — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash/LSH near-dup clustering over sf0.001 documents —
    every doc gets (cluster_id, verdict, refers_to) like the reference's
    crawl-log verdicts (DeDuplicator.java:183-188), computed set-oriented."""
    from deduplicator_spark.entry_queries import q_dedup_clusters

    clusters = q_dedup_clusters(spark, "/root/testdata/sf0.001")
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") == F.col("cluster_id"), "novel")
        .otherwise("duplicate")
        .alias("verdict"),
        F.when(F.col("doc_id") != F.col("cluster_id"), F.col("cluster_id")).alias("refers_to_id"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deduplicator_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from deduplicator_spark.entry_queries import complete_oracles

    return dict(complete_oracles())
