"""Reproducible global shuffle (entry_queries.q_corpus_shuffle): the
two-pass bucket construction must equal the naive global sort exactly."""

import hashlib

from deduplicator_spark.entry_queries import SHUFFLE_SHARDS, q_corpus_shuffle

SF = "/root/testdata/sf0.001"


def test_positions_are_exact_global_ranks(spark):
    rows = q_corpus_shuffle(spark, SF).collect()
    n = len(rows)
    # positions are a permutation of 0..n-1
    assert sorted(r.pos for r in rows) == list(range(n))
    # and equal the rank in md5-key order (driver-side reference)
    want = sorted(
        rows,
        key=lambda r: (hashlib.md5(f"shuf:{r.doc_id}".encode()).hexdigest(),
                       r.doc_id))
    for pos, r in enumerate(want):
        assert r.pos == pos
    # shards are contiguous chunks of ceil(n/SHARDS)
    chunk = -(-n // SHUFFLE_SHARDS)
    assert all(r.shard == r.pos // chunk for r in rows)


def test_deterministic(spark):
    a = {(r.doc_id, r.pos) for r in q_corpus_shuffle(spark, SF).collect()}
    b = {(r.doc_id, r.pos) for r in q_corpus_shuffle(spark, SF).collect()}
    assert a == b and a
