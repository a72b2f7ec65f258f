"""Tier 0 — exact duplicate detection by content digest.

This is the reference's entire value proposition re-expressed set-oriented:
DIGEST_ANY probe (SearchStrategy.java:25-28, LuceneIndexSearcher.java:274-276)
+ last-wins index upsert (IndexBuilder.java:227-236) collapse into one
groupBy(digest). What the reference does per-URI a trillion times, Spark does
as a single shuffle on the digest key.

Edges are emitted as a STAR to the group minimum, not all O(g^2) pairs — a
digest group of a million boilerplate pages yields 10^6-1 edges, not 10^12/2.
Star edges are sufficient and exact for connected-components clustering
because digest equality is transitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import digest_sha256


def with_digest(images: DataFrame) -> DataFrame:
    return images.withColumn("digest", digest_sha256(F.col("bytes")))


def exact_pairs(images: DataFrame) -> DataFrame:
    """(id_a, id_b, tier='exact', score=1.0) star edges within digest groups."""
    return exact_pairs_from_digests(
        images.select("image_id", digest_sha256(F.col("bytes")).alias("digest"))
    )


def exact_pairs_from_digests(d: DataFrame) -> DataFrame:
    """Star edges from a precomputed (image_id, digest) frame — lets a fused
    upstream pass (validation_features) supply digests so payload bytes are
    not rescanned (hex sha256 either way)."""
    # NULL digests (sha2(NULL)=NULL for NULL payloads) must never form a
    # group: window partitioning would otherwise star-join all corrupt rows
    # into one bogus exact cluster
    w = Window.partitionBy("digest")
    grouped = d.filter(F.col("digest").isNotNull()) \
        .withColumn("rep", F.min("image_id").over(w))
    return (
        grouped.filter(F.col("image_id") != F.col("rep"))
        .select(
            F.col("rep").alias("id_a"),
            F.col("image_id").alias("id_b"),
            F.lit("exact").alias("tier"),
            F.lit(1.0).alias("score"),
        )
    )


def exact_groups(images: DataFrame) -> DataFrame:
    """Digest -> group size + representative (min id; deterministic analog of
    the reference's last-wins scan-order determinism, WarcIterator.java:59)."""
    return (
        with_digest(images)
        .groupBy("digest")
        .agg(
            F.count("*").alias("n"),
            F.min("image_id").alias("rep"),
            F.sum(F.length("bytes")).alias("bytes_total"),
        )
    )
