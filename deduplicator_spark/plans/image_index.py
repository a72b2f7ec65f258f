"""Image index + probe lifecycle — the reference's two-job workflow applied
to the IMAGE payload.

The reference never probes everything against everything: it builds an index
of a trusted corpus ONCE (IndexingLauncher, SURVEY §3.1) and every crawl
probes its captures against it (DeDuplicator processor, §3.2). This module is
that lifecycle for images — the incremental complement of the all-pairs
pipeline (plans/pipeline.py): a 100 TB corpus is indexed once, then each
daily increment is ONE equi-join pass against the frozen index instead of a
re-clustering of the world.

Probe semantics (per new image, mirroring DIGEST_URL_PREFERRED's
exact-beats-weaker preference, LuceneIndexSearcher.java:131-170):
  1. exact: sha256 digest hit in the index        -> verdict 'duplicate'
  2. else banded pHash Hamming<=k near-match      -> verdict 'near_duplicate'
     (top-1 by (hamming, index id) — deterministic total order, O10)
  3. else                                         -> verdict 'novel'

Scale shape: the exact leg is a digest equi-join against the (deduplicated)
index; the near leg reuses the stateless banded probe join of
streaming/probe.py (pigeonhole recall-1, one row per verified pair via the
first-agreeing-band trick) and only probes rows the exact leg missed. Store
the index bucketed (plans/bucketed.py) and neither leg shuffles the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT, DedupConfig


def build_image_index(images: DataFrame,
                      digests: DataFrame | None = None) -> DataFrame:
    """(image_id, digest, phash) index projection. ``digests`` lets a fused
    upstream decode pass (plans/pipeline.validation_features) supply digests
    without a second byte scan; otherwise sha256 over the bytes column."""
    if digests is not None:
        return images.select("image_id", "phash").join(digests, "image_id") \
            .select("image_id", "digest", "phash")
    return images.select(
        "image_id", F.sha2(F.col("bytes"), 256).alias("digest"), "phash")


def probe_images(probes: DataFrame, index: DataFrame,
                 cfg: DedupConfig = DEFAULT) -> DataFrame:
    """Probe (image_id, digest, phash) rows against an index frame from
    build_image_index. Returns (image_id, verdict, refers_to_id, hamming);
    hamming is null for exact/novel verdicts. A re-probed indexed image is
    an exact duplicate of its indexed self (reference semantics: the index
    is the history, any hit is a revisit)."""
    from ..streaming.probe import phash_index_for_stream, probe_phash_stream

    exact_ref = index.groupBy("digest").agg(
        F.min("image_id").alias("exact_ref"))
    e = probes.select("image_id", "digest", "phash") \
        .join(exact_ref, "digest", "left")
    hits_exact = e.filter(F.col("exact_ref").isNotNull()).select(
        "image_id",
        F.lit("duplicate").alias("verdict"),
        F.col("exact_ref").alias("refers_to_id"),
        F.lit(None).cast("long").alias("hamming"),
    )
    miss = e.filter(F.col("exact_ref").isNull()).drop("exact_ref", "digest")

    banded = phash_index_for_stream(index, cfg)
    near = probe_phash_stream(miss, banded, cfg)  # batch frames: plain joins
    w = Window.partitionBy("image_id").orderBy(
        F.col("hamming").asc(), F.col("idx_image_id").asc())
    hits_near = (
        near.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "image_id",
            F.lit("near_duplicate").alias("verdict"),
            F.col("idx_image_id").alias("refers_to_id"),
            F.col("hamming").cast("long").alias("hamming"),
        )
    )
    novel = (
        miss.join(hits_near.select("image_id"), "image_id", "left_anti")
        .select(
            "image_id",
            F.lit("novel").alias("verdict"),
            F.lit(None).cast("string").alias("refers_to_id"),
            F.lit(None).cast("long").alias("hamming"),
        )
    )
    return hits_exact.unionByName(hits_near).unionByName(novel)
