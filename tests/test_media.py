"""Multimodal plumbing: decode/feature/resize/frame-sample over binary cols."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicator_spark.codecs import (
    decode_image,
    decode_video_frames,
    encode_video,
    psnr,
    resize_area_mean,
)


def test_image_features_match_stored_metadata(spark, images_500):
    from deduplicator_spark.operators.media import image_features

    feats = image_features(images_500.limit(50))
    joined = feats.join(images_500.select("image_id", "w", "h", "phash", "fmt"),
                        "image_id").collect()
    assert len(joined) == 50
    for r in joined:
        assert (r["w"], r["h"]) == (r["w"], r["h"])
        assert 0.0 <= r["mean_r"] <= 255.0
        if r["fmt"] == "png":  # lossless: recomputed phash must match exactly
            assert r["phash_recomputed"] == r["phash"]


def test_resize_images(spark, images_500):
    from deduplicator_spark.operators.media import resize_images

    out = resize_images(images_500.limit(10), 32, 32).collect()
    assert len(out) == 10
    for r in out:
        arr = decode_image(bytes(r["bytes"]))
        assert arr.shape == (32, 32, 3)


def test_resize_area_mean_preserves_flat_regions():
    flat = np.full((100, 80, 3), 37, dtype=np.uint8)
    small = resize_area_mean(flat, 16, 16)
    assert (small == 37).all()


def test_video_frame_sampling(spark):
    from deduplicator_spark.operators.media import sample_video_frames

    rng = np.random.Generator(np.random.PCG64(7))
    frames = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8) for _ in range(6)]
    vids = spark.createDataFrame(
        [("vid-0", bytearray(encode_video(frames)))], "video_id string, bytes binary"
    )
    out = sample_video_frames(vids, every_n=2).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r, want in zip(out, frames[::2]):
        got = decode_image(bytes(r["frame_bytes"]))
        assert psnr(got, want) == float("inf")  # lossless round trip


def test_near_video_pairs(spark):
    """Composed video near-dup: sampled-frame pHash matching finds the
    re-encoded/noised copy and rejects the unrelated video."""
    from deduplicator_spark.codecs import encode_video
    from deduplicator_spark.operators.video import near_video_pairs

    rng = np.random.Generator(np.random.PCG64(21))
    # smooth frames (low-res field upsampled) so pHashes are non-degenerate
    def frame():
        low = rng.integers(0, 256, (8, 8, 3)).astype(np.float64)
        return np.repeat(np.repeat(low, 6, axis=0), 8, axis=1).astype(np.uint8)

    base = [frame() for _ in range(8)]
    # near-copy: same frames with +-1 salt-and-pepper noise (phash within 3)
    noisy = []
    for f in base:
        mask = rng.random(f.shape) < 0.05
        delta = (rng.integers(0, 2, f.shape).astype(np.int16) * 2 - 1) * mask
        noisy.append(np.clip(f.astype(np.int16) + delta, 0, 255).astype(np.uint8))
    other = [frame() for _ in range(8)]

    vids = spark.createDataFrame(
        [("vid-a", bytearray(encode_video(base))),
         ("vid-b", bytearray(encode_video(noisy))),
         ("vid-c", bytearray(encode_video(other)))],
        "video_id string, bytes binary",
    )
    pairs = near_video_pairs(vids, every_n=2, min_shared_frac=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["score"] for r in pairs}
    assert ("vid-a", "vid-b") in got
    assert got[("vid-a", "vid-b")] >= 0.5
    assert all({a, b} == {"vid-a", "vid-b"} for a, b in got)  # no c pairs


def test_real_container_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00\x20ftypisom....", 1)
    from deduplicator_spark.operators.media import decode_any

    with pytest.raises(NotImplementedError):
        decode_any(b"\x89PNG\r\n\x1a\n....")  # real PNG, no Pillow here
