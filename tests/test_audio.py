"""Audio tier tests: FAUD codec roundtrip, subfingerprint invariances, and
the end-to-end decode -> fingerprint -> alignment pipeline on planted
shifted/novel clips. The alignment scorer's cross-engine proof is the
`near_audio_pairs` oracle row (green at sf0.01 and sf0.1); these cover the
codec/UDF layer the oracle can't reach."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicator_spark.codecs import (
    audio_subfingerprints,
    decode_audio,
    encode_audio,
)
from deduplicator_spark.operators.audio import (
    near_audio_pairs,
    near_audio_pairs_from_prints,
)

WIN = 1024


def _wave(seed: int, n_win: int = 24) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(-3000, 3000, size=n_win * WIN).astype(np.int16)


def test_codec_roundtrip():
    w = _wave(1)
    rate, out = decode_audio(encode_audio(w, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, w)


def test_decode_rejects_real_containers():
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVEfmt ")


def test_subfingerprints_volume_invariant_and_shift_aligned():
    w = _wave(2)
    base = audio_subfingerprints(w)
    assert base.size == 23  # n_win - 1
    # halving the volume scales all band energies equally -> same signs
    half = audio_subfingerprints((w.astype(np.int32) // 2).astype(np.int16))
    assert (base == half).mean() > 0.95
    # trimming 5 whole windows shifts prints, values preserved
    shifted = audio_subfingerprints(w[5 * WIN:])
    np.testing.assert_array_equal(shifted, base[5:])


def test_end_to_end_shifted_clip_found_novel_not(spark):
    rows = []
    w0 = _wave(10, 30)
    rows.append(("a-000", bytearray(encode_audio(w0))))
    rows.append(("a-001", bytearray(encode_audio(w0[6 * WIN:]))))  # trimmed re-master
    rows.append(("a-002", bytearray(encode_audio(_wave(11, 30)))))  # novel
    audios = spark.createDataFrame(rows, "audio_id string, bytes binary")
    pairs = near_audio_pairs(audios).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == ("a-000", "a-001")
    assert p["offset"] == 6
    assert p["score"] >= 0.95  # all 23 of the shorter side's prints align


def test_hot_print_cap_drops_silence_matches(spark):
    # 80 audios all sharing one constant print (silence analog) plus a
    # unique print each: with cap=64 the shared print is dropped, so no
    # pair reaches the 0.5 gate; raising the cap floods pairs back in.
    rows = []
    for i in range(80):
        rows += [(f"s-{i:03d}", 0, 777), (f"s-{i:03d}", 1, 1000 + i)]
    prints = spark.createDataFrame(rows, "audio_id string, win_idx int, print long")
    assert near_audio_pairs_from_prints(prints, print_cap=64).count() == 0
    flooded = near_audio_pairs_from_prints(prints, print_cap=1000).count()
    assert flooded == 80 * 79 // 2
