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
                 cfg: DedupConfig = DEFAULT,
                 observation=None) -> DataFrame:
    """Probe (image_id, digest, phash) rows against an index frame from
    build_image_index. Returns (image_id, verdict, refers_to_id, hamming);
    hamming is null for exact/novel verdicts. A re-probed indexed image is
    an exact duplicate of its indexed self (reference semantics: the index
    is the history, any hit is a revisit). Pass a pyspark Observation to
    collect per-verdict counters with the result action — the AtomicLong
    statistics of DeDuplicator.java:54-94 without a second pass."""
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

    # Near-side skew guard, EXACT by construction: collapse the index to one
    # representative (min image_id) per distinct phash before banding.
    # Hamming depends only on phash, and the top-1 tiebreak is
    # (hamming, idx_image_id) ascending — the min id of an equal-phash group
    # is precisely the row top-1 would pick — so output is unchanged while a
    # 100 TB hot class (black frames, logo cards: one phash, millions of
    # rows) contributes ONE posting per band instead of a mega-bucket.
    idx_by_phash = index.groupBy("phash").agg(
        F.min("image_id").alias("image_id"))
    banded = phash_index_for_stream(idx_by_phash, cfg)
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
    out = hits_exact.unionByName(hits_near).unionByName(novel)
    if observation is not None:
        out = out.observe(
            observation,
            F.count(F.lit(1)).alias("handled"),
            *[F.sum((F.col("verdict") == v).cast("long")).alias(v)
              for v in ("duplicate", "near_duplicate", "novel")],
        )
    return out


def append_novel_to_index(index: DataFrame, probes: DataFrame,
                          verdicts: DataFrame) -> DataFrame:
    """The reference's APPEND indexing mode (K1: IndexingLauncher CREATE vs
    APPEND, IndexBuilder.java) as incremental image-index maintenance: after
    probing an increment, only its NOVEL rows enter the index — duplicates
    and near-duplicates are already represented by the row they refer to, so
    the index stays one-entry-per-content-class instead of growing with the
    crawl. The next increment then probes against corpus UNION novels.

    Scale shape: the novel filter is a broadcast-able semi-join on the
    increment (bounded by increment size, never the corpus), and the union
    is metadata-only — at cluster scale write novels as an appended
    partition of the bucketed store (plans/bucketed.py) and the index stays
    pre-organized by key with no rewrite of history."""
    novel_ids = verdicts.filter(F.col("verdict") == "novel").select("image_id")
    novel_rows = probes.join(F.broadcast(novel_ids), "image_id") \
        .select("image_id", "digest", "phash")
    return index.unionByName(novel_rows)


def probe_and_extend(probes: DataFrame, index: DataFrame,
                     cfg: DedupConfig = DEFAULT) -> tuple[DataFrame, DataFrame]:
    """One increment of the §3.1/§3.2 lifecycle: verdicts for the increment
    plus the extended index for the next one. Persist `verdicts` before
    consuming both outputs — the append re-reads it as the novel filter."""
    verdicts = probe_images(probes, index, cfg)
    return verdicts, append_novel_to_index(index, probes, verdicts)
