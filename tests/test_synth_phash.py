"""Planted-truth checks for the cross-engine perceptual-hash queries.

The DuckDB oracle gate proves Spark == exact-self-join; these tests pin that
BOTH engines see the intended planted structure (a bug planted symmetrically
in the synth SQL would pass the parity gate but fail here).
"""

from __future__ import annotations

import pytest

from deduplicator_spark.entry_queries import (
    q_near_video_pairs,
    q_phash_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def test_phash_neardup_planted_structure(spark):
    out = q_phash_neardup_pairs(spark, SF_DIR)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    n_docs = 500  # sf0.001 documents
    for a in range(0, n_docs, 10):
        assert pairs.get((a, a + 1)) == 1          # planted Hamming-1
        assert pairs.get((a, a + 2)) == 3          # planted Hamming-3
        assert (a, a + 3) not in pairs             # Hamming-5 negative control
    assert all(h <= 3 for h in pairs.values())
    assert all(a < b for a, b in pairs)


def test_near_video_planted_structure(spark):
    out = q_near_video_pairs(spark, SF_DIR)
    rows = {(r["id_a"], r["id_b"]): r["score"] for r in out.collect()}
    # 500 docs -> videos 0..24; partners are (2v, 2v+1), 16/20 frames within
    # Hamming 1 -> score exactly 0.8; video 24 has no partner
    expected = {(v, v + 1) for v in range(0, 24, 2)}
    assert set(rows) == expected
    for score in rows.values():
        assert score == pytest.approx(0.8)
