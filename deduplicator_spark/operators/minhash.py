"""Tier 2 — near-caption candidates via MinHash/LSH + exact-Jaccard verify.

Pipeline (all JVM-side until the final join):
    caption -> tokens -> k-shingles -> 128 min-hashes -> 32 x 4 band keys
    -> explode (band, key) -> bucketed candidate pairs -> exact Jaccard
    verification on the shingle sets (array_intersect; no Python).

With b=32, r=4: P(candidate | J) = 1-(1-J^4)^32, i.e. ~1 for J >= 0.8
(miss ~5e-8) and ~0.02 at J = 0.3 — the verified output at threshold 0.8 is
the exact-Jaccard join with negligible recall loss, at O(n·bands) instead of
O(n^2) cost.

A numpy mapInPandas signature path (minhash_signatures_pandas) exists for
parity testing and as the template for signatures that can't be expressed as
Column algebra.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig
from ..functions.hashing import lsh_band_keys, minhash_signature, shingles, tokens
from .candidates import candidate_pairs_from_bands


def with_shingles(images: DataFrame, cfg: DedupConfig = DEFAULT,
                  text_col: str = "caption") -> DataFrame:
    return images.withColumn("shingles", shingles(tokens(F.col(text_col)), cfg.shingle_k))


def minhash_banded(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(image_id, band, key) — exploded LSH band keys."""
    sig = with_shingles(images, cfg).select(
        "image_id", minhash_signature(F.col("shingles"), cfg).alias("sig")
    )
    return sig.select(
        "image_id", F.explode(lsh_band_keys(F.col("sig"), cfg)).alias("bk")
    ).select("image_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def jaccard_verify(cands: DataFrame, shingled: DataFrame,
                   threshold: float) -> DataFrame:
    """Join candidate pairs back to shingle sets; exact Jaccard, JVM-side."""
    sh = shingled.select("image_id", "shingles")
    a = sh.withColumnRenamed("image_id", "id_a").withColumnRenamed("shingles", "sh_a")
    b = sh.withColumnRenamed("image_id", "id_b").withColumnRenamed("shingles", "sh_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= threshold)
    )


def near_caption_pairs(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(id_a, id_b, tier='near_caption', score=jaccard)."""
    shingled = with_shingles(images, cfg)
    cands = candidate_pairs_from_bands(minhash_banded(images, cfg))
    verified = jaccard_verify(cands, shingled, cfg.jaccard_threshold)
    return verified.select(
        "id_a", "id_b",
        F.lit("near_caption").alias("tier"),
        F.col("jaccard").alias("score"),
    )


# --- Arrow/pandas twin (parity + template for non-Column signatures) ---------

def minhash_signatures_pandas(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """Same signature semantics as minhash_signature(), computed with
    vectorized numpy over Arrow batches. Used by tests to pin the two paths
    together; at 100 TB you run the Column path (codegen, no Python)."""
    k, nperm, seed = cfg.shingle_k, cfg.minhash_perms, cfg.minhash_seed
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    m1 = np.uint64(0xBF58476D1CE4E5B9)
    m2 = np.uint64(0x94D049BB133111EB)

    # universal-hash family over a base 64-bit shingle hash
    rng = np.random.Generator(np.random.PCG64(seed))
    a_coef = rng.integers(1, 1 << 62, size=nperm, dtype=np.uint64) | np.uint64(1)
    b_coef = rng.integers(0, 1 << 62, size=nperm, dtype=np.uint64)

    def splitmix(x: np.ndarray) -> np.ndarray:
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & mask
        z = ((z ^ (z >> np.uint64(30))) * m1) & mask
        z = ((z ^ (z >> np.uint64(27))) * m2) & mask
        return z ^ (z >> np.uint64(31))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_sig = []
            for cap in pdf["caption"]:
                toks = cap.split()
                if len(toks) >= k:
                    sh = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
                else:
                    sh = {" ".join(toks)}
                base = splitmix(
                    np.fromiter((np.uint64(hash(s)) for s in sh), dtype=np.uint64)
                )
                hv = (a_coef[None, :] * base[:, None] + b_coef[None, :]) & mask
                out_sig.append(hv.min(axis=0).astype(np.int64))
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "sig": [s.tolist() for s in out_sig]}
            )

    return images.select("image_id", "caption").mapInPandas(
        gen, schema="image_id string, sig array<long>"
    )
