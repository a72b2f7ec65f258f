"""Self-contained image codec + perceptual hashing (no external image libs).

The container has no PIL/OpenCV, so the *decode* step a production deployment
would delegate to a real codec library is implemented here as a deterministic
stand-in with genuinely lossless ("png") and lossy-quantized ("jpeg") paths.
The PSNR math, the DCT pHash, and all Spark-side plumbing (binary columns,
Arrow batch shapes, UDF signatures) are real; only the container format is
simplified. Swap `encode_image`/`decode_image` for Pillow calls in production.

Formats (little-endian header, zlib body):
    b"FPNG" | u16 w | u16 h | zlib(raw HxWx3 uint8)                 lossless
    b"FJPG" | u16 w | u16 h | u8 step | zlib(quantized HxWx3 uint8) lossy

Uniform quantization with step s has RMSE ≈ s/sqrt(12); step<=6 keeps
PSNR >= 40 dB (BASELINE.json per-row invariant: "decoded-pixel allclose,
PSNR>=40dB for lossy formats").
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"


def encode_image(arr: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt in {"png", "jpeg"}."""
    h, w = arr.shape[0], arr.shape[1]
    if fmt == "png":
        return MAGIC_PNG + struct.pack("<HH", w, h) + zlib.compress(arr.tobytes(), 6)
    if fmt == "jpeg":
        # quality 85..95 -> step 6..2 (higher quality = finer quantization)
        step = max(2, int(round((100 - quality) / 2.5)))
        q = (arr.astype(np.int32) // step) * step + step // 2
        q = np.clip(q, 0, 255).astype(np.uint8)
        return MAGIC_JPG + struct.pack("<HHB", w, h, step) + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode payload -> (h, w, 3) uint8 array."""
    magic = payload[:4]
    if magic == MAGIC_PNG:
        w, h = struct.unpack("<HH", payload[4:8])
        raw = zlib.decompress(payload[8:])
    elif magic == MAGIC_JPG:
        w, h, _step = struct.unpack("<HHB", payload[4:9])
        raw = zlib.decompress(payload[9:])
    else:
        raise ValueError(f"bad magic {magic!r}")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


MAGIC_VID = b"FVID"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Deterministic fake video container: u16 frame count, then length-
    prefixed FPNG frames. Real mp4/webm demuxing needs libs absent from this
    container; the Spark-side plumbing (binary column -> frame sampling in
    Arrow batches) is identical either way."""
    parts = [MAGIC_VID, struct.pack("<H", len(frames))]
    for f in frames:
        p = encode_image(f, "png")
        parts.append(struct.pack("<I", len(p)))
        parts.append(p)
    return b"".join(parts)


def decode_video_frames(payload: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Every n-th frame of an FVID payload. Raises NotImplementedError for
    real containers (clearly-marked stub: swap in PyAV/ffmpeg in production)."""
    if payload[:4] != MAGIC_VID:
        raise NotImplementedError(
            "real video container decode (mp4/webm) requires PyAV/ffmpeg; "
            "only the deterministic FVID test container is supported here"
        )
    (n,) = struct.unpack("<H", payload[4:6])
    pos = 6
    out = []
    for i in range(n):
        (ln,) = struct.unpack("<I", payload[pos:pos + 4])
        pos += 4
        if i % every_n == 0:
            out.append(decode_image(payload[pos:pos + ln]))
        pos += ln
    return out


MAGIC_AUD = b"FAUD"


def encode_audio(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Deterministic fake audio container: u32 sample rate, u32 sample
    count, zlib'd int16 PCM. Real wav/mp3/flac decode needs libs absent from
    this container; the Spark-side plumbing (binary column -> Arrow-batched
    fingerprinting) is identical either way."""
    s = np.asarray(samples, dtype=np.int16)
    return (MAGIC_AUD + struct.pack("<II", sample_rate, s.size)
            + zlib.compress(s.tobytes(), 6))


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) of an FAUD payload. Raises
    NotImplementedError for real containers (clearly-marked stub: swap in
    soundfile/ffmpeg in production)."""
    if payload[:4] != MAGIC_AUD:
        raise NotImplementedError(
            "real audio decode (wav/mp3/flac) requires soundfile/ffmpeg; "
            "only the deterministic FAUD test container is supported here"
        )
    rate, n = struct.unpack("<II", payload[4:12])
    raw = zlib.decompress(payload[12:])
    return rate, np.frombuffer(raw, dtype=np.int16)[:n]


def audio_subfingerprints(samples: np.ndarray, win: int = 1024,
                          bands: int = 32) -> np.ndarray:
    """Haitsma-Kalker-style subfingerprints: split the waveform into
    fixed-length windows, compute per-band energies (contiguous bands stand
    in for the FFT filterbank real pipelines use — the container has no FFT
    dependency), and emit one integer per window whose bits are the SIGNS of
    the band-energy differences differentiated across time:
    bit[b] = (E[t,b]-E[t,b+1]) - (E[t-1,b]-E[t-1,b+1]) > 0. Signs survive
    volume scaling and mild noise, which is what makes exact-match joins on
    subfingerprints a sound candidate generator. Returns int64[n_windows-1]
    (window t's print uses windows t-1 and t). Fully vectorized numpy.

    bands=32 gives 31 sign bits per print (~2.1e9 values) — the print-space
    sizing is load-bearing at scale: the first 48k-clip scaling bench ran
    with 16 bands (15 bits, 32,768 values), the 1.4M corpus windows
    saturated every value past the hot-print cap, and recall silently
    collapsed (416 of ~19,200 planted pairs). Sized like the original
    Haitsma-Kalker 32-bit subfingerprint for exactly this reason; at 10^12
    windows, widen further (two stacked 31-bit prints per window)."""
    s = samples.astype(np.float64)
    n_win = s.size // win
    if n_win < 2:
        return np.zeros(0, dtype=np.int64)
    e = (s[:n_win * win].reshape(n_win, bands, win // bands) ** 2).mean(axis=2)
    d = e[:, :-1] - e[:, 1:]            # (n_win, bands-1) band deltas
    bits = (d[1:] - d[:-1]) > 0          # (n_win-1, bands-1) time-diffed signs
    weights = (1 << np.arange(bands - 1, dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def resize_area_mean(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-mean resample to (out_h, out_w, 3) uint8."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    c = np.zeros((h + 1, w + 1, 3))
    c[1:, 1:, :] = arr.astype(np.float64).cumsum(0).cumsum(1)
    area = ((ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1]))[:, :, None]
    s = (c[ys[1:, None], xs[None, 1:]] - c[ys[:-1, None], xs[None, 1:]]
         - c[ys[1:, None], xs[None, :-1]] + c[ys[:-1, None], xs[None, :-1]])
    return np.clip(s / np.maximum(area, 1), 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    The generalized per-pair verification invariant (ref sanity check:
    DeDuplicator.java:169-172 asserts matched digests are equal; for lossy
    near-images equality relaxes to PSNR >= cfg.psnr_min_db)."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- DCT perceptual hash -----------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        _DCT32[0, :] = np.sqrt(1.0 / n)
    return _DCT32


def _resize_gray_32(arr: np.ndarray) -> np.ndarray:
    """Grayscale + area-mean resample to 32x32 (deterministic, numpy-only)."""
    g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = (np.arange(33) * h // 32).astype(np.int64)
    xs = (np.arange(33) * w // 32).astype(np.int64)
    c = np.zeros((h + 1, w + 1))
    c[1:, 1:] = g.cumsum(0).cumsum(1)
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    s = c[ys[1:, None], xs[None, 1:]] - c[ys[:-1, None], xs[None, 1:]] \
        - c[ys[1:, None], xs[None, :-1]] + c[ys[:-1, None], xs[None, :-1]]
    return s / np.maximum(area, 1)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT pHash: 32x32 gray -> 2D DCT -> 8x8 low-freq block (minus DC)
    -> median threshold -> sign bits packed MSB-first. Returns signed int64."""
    d = _dct_matrix(32)
    freq = d @ _resize_gray_32(arr) @ d.T
    block = freq[:8, :8].flatten()
    vals = np.delete(block, 0)  # drop DC
    med = np.median(vals)
    bits = (block > med).astype(np.uint64)
    bits[0] = 0
    out = np.uint64(0)
    for bit in bits:
        out = (out << np.uint64(1)) | bit
    return int(out.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
