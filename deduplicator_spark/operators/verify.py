"""Pair verification — the generalized digest sanity check.

The reference hard-fails if a matched index document's digest differs from the
probe's (DeDuplicator.java:169-172). Generalized per BASELINE.json: an image
candidate pair is a real duplicate only if the decoded pixels agree —
byte-equality for lossless, PSNR >= cfg.psnr_min_db for lossy re-encodes.

Decode runs inside bounded Arrow batches (mapInPandas); batch size is capped
by spark.sql.execution.arrow.maxRecordsPerBatch so workers never hold more
than a few thousand decoded bitmaps (SURVEY.md §7.4 hard part #2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import psnr
from ..config import DEFAULT, DedupConfig
from .media import decode_any


def psnr_pairs(pairs: DataFrame, images: DataFrame) -> DataFrame:
    """(id_a, id_b, ...) + images -> (id_a, id_b, psnr double).

    The two joins that attach payload bytes are plain equi-joins on image_id;
    at scale the pairs side is tiny relative to images, so AQE turns these
    into broadcast/shuffle-hash joins with the pairs side built."""
    payload = images.select("image_id", "bytes")
    joined = (
        pairs.select("id_a", "id_b")
        .join(payload.withColumnRenamed("image_id", "id_a").withColumnRenamed("bytes", "b_a"), "id_a")
        .join(payload.withColumnRenamed("image_id", "id_b").withColumnRenamed("bytes", "b_b"), "id_b")
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for ba, bb in zip(pdf["b_a"], pdf["b_b"]):
                try:
                    # decode_any, not raw decode_image: the SAME decode the
                    # feature/tier pass used (incl. the Pillow fallback for
                    # real PNG/JPEG), else every candidate pair over real
                    # codecs silently fails the PSNR gate as psnr=0
                    v = psnr(decode_any(bytes(ba)), decode_any(bytes(bb)))
                except Exception:
                    v = 0.0
                vals.append(min(v, 99.0))  # cap inf (byte-identical) at 99 dB
            out = pdf[["id_a", "id_b"]].copy()
            out["psnr"] = vals
            yield out

    return joined.mapInPandas(compute, schema="id_a string, id_b string, psnr double")


def verify_image_pairs(pairs: DataFrame, images: DataFrame,
                       cfg: DedupConfig = DEFAULT) -> DataFrame:
    """Keep only pairs whose decoded pixels pass the PSNR bound; score=psnr."""
    scored = psnr_pairs(pairs, images)
    return (
        pairs.join(scored, ["id_a", "id_b"])
        .filter(F.col("psnr") >= cfg.psnr_min_db)
        .select("id_a", "id_b", "tier", F.col("psnr").alias("score"))
    )
