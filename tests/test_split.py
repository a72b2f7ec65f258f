"""Planted-truth tests for the leakage-safe train/eval split
(entry_queries.q_leakage_safe_split). Cross-engine proof is the
`leakage_safe_split` oracle row (green at sf0.01 and sf0.1); these pin the
property the query exists for: near-duplicate documents NEVER straddle the
train/eval boundary, while the naive doc-id-hash split demonstrably does on
the same corpus."""

from __future__ import annotations

import hashlib

import pytest

from deduplicator_spark.entry_queries import q_leakage_safe_split

# 60 planted near-dup pairs (2i, 2i+1 share a long base text; the +1 variant
# appends two tokens -> Jaccard well above threshold) plus 80 distinct
# singletons so the train fraction estimate has mass.
_N_PAIRS = 60
_N_SINGLE = 80


def _base(i: int) -> str:
    return " ".join(f"p{i:03d}w{j:02d}" for j in range(30))


@pytest.fixture(scope="module")
def split_rows(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("split")
    rows = []
    for i in range(_N_PAIRS):
        rows.append((2 * i, _base(i)))
        rows.append((2 * i + 1, _base(i) + " extra more"))
    for k in range(_N_SINGLE):
        rows.append((1000 + k, " ".join(f"s{k:03d}u{j:02d}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    return q_leakage_safe_split(spark, str(tmp)).collect()


def test_assignment_is_total_and_clusters_never_straddle(split_rows):
    by_id = {r["doc_id"]: r for r in split_rows}
    assert len(by_id) == 2 * _N_PAIRS + _N_SINGLE  # every doc assigned once
    for i in range(_N_PAIRS):
        a, b = by_id[2 * i], by_id[2 * i + 1]
        assert a["cluster_id"] == b["cluster_id"] == 2 * i  # planted pair clustered
        assert a["split"] == b["split"]  # the leakage guarantee


def test_train_fraction_near_ninety_percent(split_rows):
    n_train = sum(r["split"] == "train" for r in split_rows)
    assert 0.8 <= n_train / len(split_rows) <= 0.97


def test_doc_level_hash_split_would_leak_on_this_corpus(split_rows):
    """The counterfactual the query prevents: bucket each DOC id with the
    same md5 arithmetic and at least one planted near-dup pair straddles
    train/eval (expected ~18% of 60 pairs), while the cluster-keyed split
    above straddles zero."""

    def doc_bucket(doc_id: int) -> str:
        h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16)
        return "train" if h % 100 < 90 else "eval"

    leaks = sum(
        doc_bucket(2 * i) != doc_bucket(2 * i + 1) for i in range(_N_PAIRS))
    assert leaks >= 1


def test_split_matches_python_md5_reference(split_rows):
    """The engine-side conv(substr(md5(...)),16,10) % 100 arithmetic equals
    an independent Python md5 derivation — pins hex-prefix width and the
    'split:' domain tag against silent drift."""
    for r in split_rows:
        h = int(hashlib.md5(
            f"split:{r['cluster_id']}".encode()).hexdigest()[:15], 16)
        want = "train" if h % 100 < 90 else "eval"
        assert r["split"] == want
