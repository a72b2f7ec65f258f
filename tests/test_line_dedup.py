"""Planted-truth tests for CCNet-style line/paragraph dedup
(entry_queries.q_line_dedup). Cross-engine proof is the `line_dedup` oracle
row (green at sf0.01 and sf0.1); these pin the semantics on a corpus with
KNOWN boilerplate: a chunk-aligned "cookie banner" planted in many docs must
be excised everywhere, unique content must survive verbatim, and the whole
output must match an independent pure-Python reference."""

from __future__ import annotations

import math

import pytest

from deduplicator_spark.entry_queries import LINE_DUP_K, LINE_W, q_line_dedup

BANNER = "accept all cookies now"          # exactly LINE_W tokens
_N_BOILER = 10                             # docs carrying the banner
_N_CLEAN = 6


def _unique_words(doc: int, n: int) -> list[str]:
    return [f"d{doc:02d}w{j:02d}" for j in range(n)]


def _corpus() -> list[tuple[int, str]]:
    assert len(BANNER.split()) == LINE_W
    rows = []
    for i in range(_N_BOILER):
        # banner at chunk slot 1 (chunk-aligned: slots are LINE_W tokens)
        words = _unique_words(i, LINE_W) + BANNER.split() + _unique_words(i, 2 * LINE_W)[LINE_W:]
        rows.append((i, " ".join(words)))
    for k in range(_N_CLEAN):
        rows.append((100 + k, " ".join(_unique_words(50 + k, 3 * LINE_W + 2))))
    return rows


def _reference(rows: list[tuple[int, str]]) -> dict[int, tuple[int, int, str]]:
    """Independent chunk/count/excise implementation."""
    chunks = {}
    for doc_id, text in rows:
        toks = text.split()
        chunks[doc_id] = [
            " ".join(toks[i * LINE_W:(i + 1) * LINE_W])
            for i in range(math.ceil(len(toks) / LINE_W))
        ]
    freq: dict[str, int] = {}
    for cs in chunks.values():
        for c in cs:
            freq[c] = freq.get(c, 0) + 1
    out = {}
    for doc_id, cs in chunks.items():
        kept = [c for c in cs if freq[c] <= LINE_DUP_K]
        out[doc_id] = (len(cs), len(cs) - len(kept), " ".join(kept))
    return out


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("linededup")
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    return {r["doc_id"]: r for r in q_line_dedup(spark, str(tmp)).collect()}


def test_banner_excised_from_every_carrier(result):
    for i in range(_N_BOILER):
        r = result[i]
        assert BANNER not in r["clean_text"]
        assert r["n_dropped"] == 1
        # everything else survives in order
        assert r["clean_text"].split() == (
            _unique_words(i, LINE_W) + _unique_words(i, 2 * LINE_W)[LINE_W:])


def test_clean_docs_untouched(result):
    for k in range(_N_CLEAN):
        r = result[100 + k]
        assert r["n_dropped"] == 0
        assert r["clean_text"].split() == _unique_words(50 + k, 3 * LINE_W + 2)


def test_matches_python_reference(result):
    ref = _reference(_corpus())
    assert set(result) == set(ref)
    for doc_id, (n_chunks, n_dropped, clean) in ref.items():
        r = result[doc_id]
        assert (r["n_chunks"], r["n_dropped"], r["clean_text"]) == (
            n_chunks, n_dropped, clean)
