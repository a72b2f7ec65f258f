"""Deterministic synthetic image+caption corpus with planted duplicate structure.

The graft input (BASELINE.json.input_hint) is an Iceberg table
``images(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)``. This module synthesizes it *distributed*
(spark.range -> mapInPandas, everything a pure function of the row id and the
seed, so any scale regenerates identically with zero driver memory) together
with ground-truth tables, mirroring FIXTURES.md §1.

Planted structure, per 100-id block (ids b..b+99, bases are ids with
pos<60):
    pos 60-64  exact        byte-identical copy of a base (tier 0)
    pos 65-69  near-image   same bitmap re-encoded png<->jpeg (tier 1)
    pos 70-74  near-image   bitmap + tiny noise, PSNR >= 40 dB (tier 1)
    pos 75-79  near-caption 1-token edit, shingle-Jaccard > 0.85 (tier 2)
    pos 80-82  near-caption 3-token edit, Jaccard < 0.8 — planted BELOW
                threshold (truth-negative; must NOT merge)
    pos 83-85  containment  base caption embedded verbatim in a 200+-token
                caption (tier 3)
    pos 86-92  hot          one global boilerplate caption (identical text)
                shared by ~7% of rows — LSH band-key skew exercise
    pos 93-99  novel        no partner (verdict must be "novel")

Truth emitted as ``truth_pairs(id_a, id_b, kind, positive)``; cluster truth is
derived by union-find over positive pairs (tests/conftest).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codecs import encode_image, phash64
from .schema import IMAGES_SCHEMA, TRUTH_PAIRS_SCHEMA

VOCAB = (
    "the a of and to in scan join filter window sort merge hash agg group order "
    "key row column table query data stream batch spark fast slow big small "
    "vector index shuffle stage task node disk cache spill codegen arrow plan "
    "cost rule push prune skew salt bloom digest crawl fetch revisit novel dup "
    "cluster image caption pixel frame tile light dark red green blue"
).split()

HOT_CAPTION = "stock photo of a generic product on a white background " * 4

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray | int, seed: int) -> np.ndarray:
    """splitmix64 finalizer — the single stable hash everything derives from.
    uint64 wraparound is intentional (modular arithmetic)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def _h(i: int, seed: int, salt: int = 0) -> int:
    return int(_mix(np.uint64(i) ^ (np.uint64(salt) << np.uint64(48)), seed))


# --- deterministic per-id derivations ---------------------------------------

def _kind(i: int) -> str:
    p = i % 100
    if p < 60:
        return "base"
    if p < 65:
        return "exact"
    if p < 70:
        return "reencode"
    if p < 75:
        return "noise"
    if p < 80:
        return "near_caption"
    if p < 83:
        return "near_caption_below"
    if p < 86:
        return "containment"
    if p < 93:
        return "hot"
    return "novel"


def _base_of(i: int, seed: int) -> int:
    """Copy rows point at a deterministic base inside their own block."""
    block = (i // 100) * 100
    return block + _h(i, seed, 1) % 55  # bases 0..54 (55-59 reserved short docs)


def _caption_tokens(i: int, seed: int) -> list[str]:
    p = i % 100
    h = _h(i, seed, 2)
    if p < 55:  # regular base: 40-60 tokens (long enough for 1-edit J>0.8)
        n = 40 + h % 21
    elif p < 60:  # short base: 5-10 tokens
        n = 5 + h % 6
    else:  # own-caption copy rows and novels
        n = 30 + h % 31
    idx = _mix(np.arange(n, dtype=np.uint64) + np.uint64(h & 0xFFFFFFFF), seed)
    return [VOCAB[int(j) % len(VOCAB)] for j in idx]


def _bitmap(i: int, seed: int) -> np.ndarray:
    """Smooth seeded bitmap: low-res random field upsampled — gives the DCT
    pHash real low-frequency structure (flat noise would make all pHashes
    degenerate)."""
    h = _h(i, seed, 3)
    rng = np.random.Generator(np.random.PCG64(h & 0x7FFFFFFFFFFFFFFF))
    # realistic thumbnail-to-web sizes: the decode/digest cost per image is
    # part of the measured workload, so toy 32px bitmaps would understate it
    w_px = (128, 192, 256)[h % 3]
    h_px = (128, 192, 256)[(h >> 8) % 3]
    low = rng.integers(0, 256, size=(8, 8, 3)).astype(np.float64)
    img = np.repeat(np.repeat(low, (h_px + 7) // 8, axis=0), (w_px + 7) // 8, axis=1)
    img = img[:h_px, :w_px]
    ramp = np.linspace(0, 40, w_px)[None, :, None]
    return np.clip(img + ramp, 0, 255).astype(np.uint8)


def _fmt(i: int, seed: int) -> str:
    return "png" if _h(i, seed, 4) % 2 == 0 else "jpeg"


def _quality(i: int, seed: int) -> int:
    return 85 + _h(i, seed, 5) % 11  # 85..95


def _edit_tokens(toks: list[str], i: int, seed: int, n_edits: int) -> list[str]:
    """Replace n_edits interior tokens at deterministic positions >=4 apart,
    so each edit perturbs a disjoint set of 3 shingle windows. With e
    separated edits on n tokens: J = (n-2-3e)/(n-2+3e); for n in [40,60]:
    e=1 -> J in [0.85, 0.90] (above 0.8), e=3 -> J in [0.62, 0.73] (below)."""
    out = list(toks)
    n = len(out)
    for e in range(n_edits):
        if n_edits == 1:
            pos = 2 + (_h(i, seed, 10) % max(n - 5, 1))
        else:
            pos = min(2 + 6 * e + (_h(i, seed, 10 + e) % 3), n - 3)
        repl = VOCAB[_h(i, seed, 20 + e) % len(VOCAB)]
        if out[pos] == repl:
            repl = VOCAB[(_h(i, seed, 20 + e) + 1) % len(VOCAB)]
        out[pos] = repl
    return out


def make_row(i: int, seed: int) -> dict:
    """Fully materialize row i — pure function of (i, seed)."""
    kind = _kind(i)
    image_id = f"img-{i:012d}"
    if kind in ("exact", "reencode", "noise"):
        b = _base_of(i, seed)
        arr = _bitmap(b, seed)
        if kind == "exact":
            fmt, q = _fmt(b, seed), _quality(b, seed)
            caption = " ".join(_caption_tokens(b, seed))
        elif kind == "reencode":
            fmt = "jpeg" if _fmt(b, seed) == "png" else "png"
            q = _quality(i, seed)
            caption = " ".join(_caption_tokens(i, seed))
        else:  # noise: +-1 salt-and-pepper on ~10% of pixels, PSNR ~ 58 dB
            rng = np.random.Generator(np.random.PCG64(_h(i, seed, 6) & 0x7FFFFFFF))
            mask = rng.random(arr.shape) < 0.1
            delta = rng.integers(0, 2, size=arr.shape).astype(np.int16) * 2 - 1
            arr = np.clip(arr.astype(np.int16) + delta * mask, 0, 255).astype(np.uint8)
            fmt, q = _fmt(i, seed), _quality(i, seed)
            caption = " ".join(_caption_tokens(i, seed))
    elif kind in ("near_caption", "near_caption_below"):
        b = _base_of(i, seed)
        arr = _bitmap(i, seed)
        fmt, q = _fmt(i, seed), _quality(i, seed)
        edits = 1 if kind == "near_caption" else 3
        caption = " ".join(_edit_tokens(_caption_tokens(b, seed), i, seed, edits))
    elif kind == "containment":
        b = _base_of(i, seed)
        arr = _bitmap(i, seed)
        fmt, q = _fmt(i, seed), _quality(i, seed)
        filler = _caption_tokens(i, seed) * 7  # ~200+ tokens
        ins = 10 + _h(i, seed, 7) % 50
        caption = " ".join(filler[:ins] + _caption_tokens(b, seed) + filler[ins:200])
    elif kind == "hot":
        arr = _bitmap(i, seed)
        fmt, q = _fmt(i, seed), _quality(i, seed)
        caption = HOT_CAPTION.strip()
    else:  # base / novel
        arr = _bitmap(i, seed)
        fmt, q = _fmt(i, seed), _quality(i, seed)
        caption = " ".join(_caption_tokens(i, seed))
    payload = encode_image(arr, fmt, q)
    return {
        "image_id": image_id,
        "bytes": payload,
        "w": int(arr.shape[1]),
        "h": int(arr.shape[0]),
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(arr if kind != "exact" else _bitmap(_base_of(i, seed), seed)),
    }


# --- distributed generation ---------------------------------------------------

def synthesize_images(spark: SparkSession, n: int, seed: int = 42,
                      partitions: int | None = None) -> DataFrame:
    """images table as a distributed DataFrame; O(1) driver memory."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def truth_pairs(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Planted ground truth. positive=False rows are *anti*-pairs (the planted
    below-threshold edits) that a correct pipeline must NOT merge."""
    rows = []
    for i in range(n):
        kind = _kind(i)
        if kind in ("exact", "reencode", "noise", "near_caption",
                    "near_caption_below", "containment"):
            b = _base_of(i, seed)
            k = {"reencode": "near_image", "noise": "near_image"}.get(kind, kind)
            rows.append((f"img-{b:012d}", f"img-{i:012d}", k,
                         kind != "near_caption_below"))
    # hot rows all share one caption -> pairwise dups; emit star to first hot id
    hots = [i for i in range(n) if _kind(i) == "hot"]
    for i in hots[1:]:
        rows.append((f"img-{hots[0]:012d}", f"img-{i:012d}", "hot", True))
    return spark.createDataFrame(
        [(a, b, k, p) for a, b, k, p in rows], TRUTH_PAIRS_SCHEMA
    )


def write_images_parquet(spark: SparkSession, n: int, path: str, seed: int = 42) -> None:
    synthesize_images(spark, n, seed).write.mode("overwrite").parquet(path)


def expected_cluster_members(n: int, seed: int = 42) -> dict[str, set[str]]:
    """Driver-side union-find over positive planted pairs (test oracle only)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    hots = []
    for i in range(n):
        k = _kind(i)
        if k in ("exact", "reencode", "noise", "near_caption", "containment"):
            union(_base_of(i, seed), i)
        elif k == "hot":
            hots.append(i)
    for i in hots[1:]:
        union(hots[0], i)
    out: dict[str, set[str]] = {}
    for i in list(parent):
        out.setdefault(f"img-{find(i):012d}", set()).add(f"img-{i:012d}")
    return out
