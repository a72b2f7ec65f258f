"""Multimodal operators: decode, feature-extract, resize, frame-sample.

Media payloads are opaque ``binary`` columns with typed metadata (the graft
input schema: bytes/w/h/fmt). Every operator here is an Arrow-batched
mapInPandas transform — bounded batches (spark.sql.execution.arrow.
maxRecordsPerBatch) so workers never hold more than a few thousand decoded
bitmaps at once (SURVEY.md §7.4 hard part #2).

Codec reality in this container: the deterministic FPNG/FJPG/FVID codecs from
``codecs.py`` are real code paths end-to-end; real-world formats (actual
PNG/JPEG via Pillow, mp4 via PyAV) are attempted behind import-guards and
raise clearly-marked NotImplementedError otherwise — the Spark-side plumbing
(schemas, batch shapes, UDF signatures, partitioning) is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codecs import (
    decode_image,
    decode_video_frames,
    encode_image,
    phash64,
    resize_area_mean,
)

try:  # real-codec path, absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_any(payload: bytes) -> np.ndarray:
    """Canonical payload decode for every consumer (media UDFs and the PSNR
    verify gate): deterministic FPNG/FJPG first, Pillow fallback when
    present."""
    try:
        return decode_image(payload)
    except ValueError:
        if _HAVE_PIL:
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        raise NotImplementedError(
            "real PNG/JPEG decode requires Pillow; only FPNG/FJPG payloads "
            "are supported in this container"
        )


def image_features(images: DataFrame, safe: bool = False) -> DataFrame:
    """Decode + per-image features: exact sha256 content digest, dimensions,
    channel means, luma std, recomputed pHash (lets callers validate the
    stored phash column).

    The digest rides in the SAME pass so pipelines that validate payloads
    read the payload bytes only once for digest+validation (hex sha256 —
    identical output to F.sha2(bytes, 256), so the exact tier can consume it
    directly). Digest is computed even for undecodable rows.

    safe=True turns decode failures into decode_ok=False rows instead of
    task failures — the quarantine path (F9 analog: route corrupt records to
    a quarantine table instead of aborting the crawl, SURVEY.md §2.2)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, payload in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(payload)
                digest = hashlib.sha256(raw).hexdigest()
                try:
                    arr = decode_any(raw)
                except Exception:
                    if not safe:
                        raise
                    rows.append({"image_id": image_id, "digest": digest,
                                 "decode_ok": False,
                                 "h": 0, "w": 0, "mean_r": 0.0, "mean_g": 0.0,
                                 "mean_b": 0.0, "luma_std": 0.0,
                                 "phash_recomputed": 0})
                    continue
                luma = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                rows.append({
                    "image_id": image_id,
                    "digest": digest,
                    "decode_ok": True,
                    "h": int(arr.shape[0]),
                    "w": int(arr.shape[1]),
                    "mean_r": float(arr[:, :, 0].mean()),
                    "mean_g": float(arr[:, :, 1].mean()),
                    "mean_b": float(arr[:, :, 2].mean()),
                    "luma_std": float(luma.std()),
                    "phash_recomputed": phash64(arr),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "digest", "decode_ok", "h", "w", "mean_r", "mean_g",
                "mean_b", "luma_std", "phash_recomputed",
            ])

    return images.select("image_id", "bytes").mapInPandas(
        gen,
        schema="image_id string, digest string, decode_ok boolean, h int, w int, "
               "mean_r double, mean_g double, mean_b double, "
               "luma_std double, phash_recomputed long",
    )


def resize_images(images: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Decode -> area-mean resample -> re-encode (lossless FPNG)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, payload in zip(pdf["image_id"], pdf["bytes"]):
                arr = resize_area_mean(decode_any(bytes(payload)), out_w, out_h)
                rows.append({
                    "image_id": image_id,
                    "bytes": encode_image(arr, "png"),
                    "w": out_w,
                    "h": out_h,
                    "fmt": "png",
                })
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes").mapInPandas(
        gen, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def sample_video_frames(videos: DataFrame, every_n: int = 2,
                        id_col: str = "video_id") -> DataFrame:
    """(video_id, bytes) -> one row per sampled frame, re-encoded FPNG, plus
    the frame's pHash — the frame-level dedup feed for video near-dup."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf[id_col], pdf["bytes"]):
                for k, arr in enumerate(decode_video_frames(bytes(payload), every_n)):
                    rows.append({
                        id_col: vid,
                        "frame_idx": k * every_n,
                        "frame_bytes": encode_image(arr, "png"),
                        "frame_phash": phash64(arr),
                    })
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx",
                                              "frame_bytes", "frame_phash"])

    return videos.select(id_col, "bytes").mapInPandas(
        gen,
        schema=f"{id_col} string, frame_idx int, frame_bytes binary, frame_phash long",
    )
