"""Tier 1 — near-image candidates via banded pHash / SimHash.

Generalizes the reference's exact-digest equality to Hamming-ball equality on
a 64-bit perceptual hash: split into 4 x 16-bit bands (pigeonhole: any pair
with Hamming distance <= 3 agrees exactly on at least one band), equi-join on
(band, key), verify true Hamming distance JVM-side (bit_count(xor)).

The verified output still goes through pixel-level PSNR verification
(operators/verify.py) — the generalized digest sanity check of
DeDuplicator.java:169-172 — before any pair may merge clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig
from ..functions.hashing import hamming64, phash_band_keys, simhash64, tokens
from .candidates import candidate_pairs_from_bands


def phash_banded(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    return images.select(
        "image_id",
        F.explode(phash_band_keys(F.col("phash"), cfg)).alias("bk"),
    ).select("image_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def near_image_pairs(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(id_a, id_b, tier='near_image', score=hamming) with hamming <= cfg max."""
    cands = candidate_pairs_from_bands(
        phash_banded(images, cfg),
        pair_cap=cfg.hot_band_threshold, salt_buckets=cfg.salt_buckets)
    ph = images.select("image_id", "phash")
    verified = (
        cands.join(ph.withColumnRenamed("image_id", "id_a").withColumnRenamed("phash", "ph_a"), "id_a")
        .join(ph.withColumnRenamed("image_id", "id_b").withColumnRenamed("phash", "ph_b"), "id_b")
        .withColumn("hamming", hamming64(F.col("ph_a"), F.col("ph_b")))
        .filter(F.col("hamming") <= cfg.phash_max_hamming)
    )
    return verified.select(
        "id_a",
        "id_b",
        F.lit("near_image").alias("tier"),
        F.col("hamming").cast("double").alias("score"),
    )


def with_caption_simhash(images: DataFrame) -> DataFrame:
    """64-bit SimHash over caption tokens (secondary text signature; the
    north star's 'SimHash over perceptual-hash bitplanes' is phash_banded —
    this is the same operator applied to text features)."""
    return images.withColumn("caption_simhash", simhash64(tokens(F.col("caption"))))
