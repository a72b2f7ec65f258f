"""§3.2 — the reference's crawl-time probe as one composed declarative plan.

DeDuplicator.innerProcessResult (DeDuplicator.java:149-192) runs per URI:
shouldProcess gates -> canonicalize -> index lookup -> verdict -> annotate +
count. Set-oriented re-expression over a captures table:

    F4  2XX-success gate              (DeDuplicator.java:124-127)
    F5  http-transaction gate         (:129-132)
    F6  already-revisit gate          (:134-138: records pre-flagged as
                                       revisits by an upstream processor are
                                       not re-judged)
    P1  canonicalize probe URL        (:157-160, U5-injectable)
    J*  strategy lookup (top-1)       (:162-166; strategies.py)
    A1  verdict + 3-way dup class     (:194-205)
    K2  crawl.log annotation + JSON extra-info (:183-188; keys from
        DeDuplicatorConstants.java:20-25)
    K3  revisit-profile lineage       (LuceneIndexSearcher.java:298-310)

What the reference does a trillion times sequentially collapses into one
distributed left join + window + projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlcanon import canonicalize_url
from ..operators.strategies import classify_verdicts, lookup

# ref DeDuplicatorConstants.java:20 + profile-crawler-beans.cxml:600
DUPLICATE_ANNOTATION = "duplicate:digest,Revisit:IdenticalPayloadDigest"
REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def probe_gates(captures: DataFrame) -> DataFrame:
    """shouldProcess (F4/F5/F6). A missing ``revisit`` column means no
    upstream processor flags revisits — the F6 gate is then a no-op."""
    gated = captures.filter(
        F.col("status").between(200, 299) & F.col("url").startswith("http")
    )
    if "revisit" in captures.columns:
        gated = gated.filter(~F.coalesce(F.col("revisit"), F.lit(False)))
    return gated


def probe_captures(captures: DataFrame, index: DataFrame,
                   strategy: str = "DIGEST_ANY",
                   canonicalizer=canonicalize_url) -> DataFrame:
    """Full §3.2 lifecycle; returns verdict rows with the K2 annotation and
    JSON extra-info columns the reference writes into the crawl log."""
    probe = probe_gates(captures).withColumn(
        "url_canon", canonicalizer(F.col("url")))
    v = classify_verdicts(lookup(probe, index, strategy))
    is_dup = F.col("verdict") == "duplicate"
    return v.select(
        "probe_id", "url", "digest", "verdict", "dup_class",
        "refers_to_uri", "refers_to_date", "refers_to_record_id",
        F.when(is_dup, F.lit(DUPLICATE_ANNOTATION)).alias("annotation"),
        F.when(is_dup, F.to_json(F.struct(
            F.lit(REVISIT_PROFILE).alias("RevisitProfile"),
            F.col("refers_to_uri").alias("RevisitRefersToURI"),
            F.date_format("refers_to_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("RevisitRefersToDate"),
        ))).alias("extra_json"),
    )
