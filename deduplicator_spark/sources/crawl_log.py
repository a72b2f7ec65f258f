"""Heritrix crawl.log source — the reference's CrawlLogIterator re-expressed
declaratively (CrawlLogIterator.java:82-86 open, :146-228 parse).

A crawl.log line is 13 whitespace-separated fields (split limit 13 —
CrawlLogIterator.java:166):

    0 log timestamp (w3c-iso8601)
    1 HTTP status (negative/0 = Heritrix-internal failure)
    2 payload bytes
    3 URL
    4 discovery hop-path
    5 via/referer URL
    6 MIME type
    7 worker thread
    8 fetch timestamp, 17-digit yyyyMMddHHmmssSSS, optional "+duration" tail
      (CrawlLogIterator.java:179-189)
    9 content digest, "sha1:BASE32" scheme prefix (CrawlLogIterator.java:193)
   10 source tag
   11 annotations (revisit marker matched by regex, :197-201)
   12 JSON extra-info (:203-212)

Everything is Column algebra: split / element_at / to_timestamp /
regexp / from_json — one scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ref DeDuplicatorConstants.java:20 + CrawlLogIterator.java:49-56 (overridable)
REVISIT_ANNOTATION_REGEX = r".*Revisit:IdenticalPayloadDigest.*"

# ref CrawlLogIterator.java:203-212: three keys read from the JSON tail
EXTRA_INFO_SCHEMA = (
    "RevisitProfile string, RevisitRefersToURI string, RevisitRefersToDate string"
)


def parse_crawl_log_lines(
    lines: DataFrame,
    col: str = "value",
    revisit_regex: str = REVISIT_ANNOTATION_REGEX,
) -> DataFrame:
    """lines(value string) -> parsed capture rows.

    Gates mirror the reference: <10 fields or line length <= 42 -> dropped
    (F8, CrawlLogIterator.java:147-155); status <= 0 -> dropped (F2,
    :160-164). The 17-digit fetch timestamp is reformatted to a real
    timestamp (P3, :179-189; '+duration' tail stripped); the digest scheme
    prefix is preserved verbatim (:193 — stripping is the INDEXER's choice,
    IndexBuilder.java:203-207, exposed here as digest_stripped)."""
    f = F.split(F.trim(F.col(col)), r"\s+", 13)
    parsed = (
        lines.select(f.alias("f"), F.length(F.trim(F.col(col))).alias("_len"))
        .filter((F.size("f") >= 10) & (F.col("_len") > 42))
        .select(
            # try_cast / try_to_timestamp, NOT cast: under Spark's ANSI
            # default a single '-' size or garbled timestamp on an otherwise
            # valid line must degrade to a null field (the reference ignores
            # the size field entirely and tolerates such lines), not abort
            # the whole job. A non-numeric status parses to null and is then
            # dropped by the status>0 gate below.
            F.element_at("f", 2).try_cast("int").alias("status"),
            F.element_at("f", 3).try_cast("long").alias("bytes_len"),
            F.element_at("f", 4).alias("url"),
            F.element_at("f", 5).alias("hop_path"),
            F.element_at("f", 6).alias("via"),
            F.element_at("f", 7).alias("mime"),
            # first 14 of the 17 digits: the reference reformats to
            # second-precision w3c-iso8601 anyway (IndexBuilder.java:52)
            F.try_to_timestamp(
                F.substring(F.element_at("f", 9), 1, 14), F.lit("yyyyMMddHHmmss")
            ).alias("ts"),
            F.element_at("f", 10).alias("digest"),
            F.substring_index(F.element_at("f", 10), ":", -1).alias("digest_stripped"),
            F.when(F.size("f") >= 12, F.element_at("f", 12)).alias("annotations"),
            F.when(F.size("f") >= 13, F.element_at("f", 13)).alias("extra_json"),
        )
        .filter(F.col("status") > 0)
    )
    extra = F.from_json(F.col("extra_json"), EXTRA_INFO_SCHEMA)
    return parsed.select(
        "*",
        F.coalesce(F.col("annotations").rlike(revisit_regex), F.lit(False)).alias("revisit"),
        extra["RevisitProfile"].alias("revisit_profile"),
        extra["RevisitRefersToURI"].alias("original_url"),
        extra["RevisitRefersToDate"].alias("original_ts_str"),
        F.coalesce("mime", F.lit("unknown")).alias("mime_or_unknown"),
    )


def read_crawl_log(spark: SparkSession, path: str) -> DataFrame:
    """S3 source: line-oriented scan + parse (CrawlLogIterator.java:82-86)."""
    return parse_crawl_log_lines(spark.read.text(path))
