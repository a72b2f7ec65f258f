"""Planted-truth tests for corpus profiling (q_corpus_length_profile) and
distinctive-term extraction (q_distinctive_terms). Cross-engine proof is the
oracle rows (green at sf0.01 and sf0.1); these pin the semantics against
independent numpy / hand-derived references on corpora with known structure."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicator_spark.entry_queries import (
    q_corpus_length_profile,
    q_distinctive_terms,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("profterms")
    rows = []
    # 10 'en' docs with lengths 10..19 tokens; common word 'filler', one doc
    # carries a doubled rare token.
    for i in range(10):
        words = ["filler"] * (10 + i)
        if i == 0:
            words = ["rareword", "rareword"] + words[2:]
        rows.append((i, " ".join(words), "en"))
    # 4 'de' docs, fixed length 5
    for k in range(4):
        rows.append((100 + k, " ".join(["gemein"] * 5), "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    return str(tmp)


def test_length_profile_matches_numpy(spark, corpus_dir):
    prof = {r["lang"]: r for r in
            q_corpus_length_profile(spark, corpus_dir).collect()}
    en = np.arange(10, 20)
    assert prof["en"]["n_docs"] == 10
    assert prof["en"]["mean_tok"] == pytest.approx(float(en.mean()))
    for col, p in (("p10", 10), ("p50", 50), ("p90", 90), ("p99", 99)):
        assert prof["en"][col] == pytest.approx(
            float(np.percentile(en, p)), abs=1e-6), col
    assert prof["de"]["p50"] == 5.0 and prof["de"]["n_docs"] == 4


def test_rare_token_outranks_filler(spark, corpus_dir):
    terms = q_distinctive_terms(spark, corpus_dir).collect()
    doc0 = sorted((r for r in terms if r["doc_id"] == 0),
                  key=lambda r: r["rank"])
    # rareword: tf=2, df=1 -> score 2e9; filler: tf=8, df=10 -> 8e8
    assert doc0[0]["token"] == "rareword"
    assert doc0[0]["score_ppb"] == 2_000_000_000
    assert doc0[1]["token"] == "filler"
    assert doc0[1]["score_ppb"] == 800_000_000
    # single-token docs emit exactly one term row
    assert sum(r["doc_id"] == 100 for r in terms) == 1
