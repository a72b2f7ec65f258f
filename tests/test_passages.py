"""Planted-truth tests for corpus-level repeated-passage detection
(operators/passages.py). Cross-engine proof is the `repeated_passages` /
`repeated_coverage` oracle rows; these pin the planted semantics: exact
span boundaries for a cross-doc shared passage, within-doc repeats,
overlapping-window merge (disjoint spans), and zero-coverage docs."""

from __future__ import annotations

from deduplicator_spark.operators.passages import (
    repeated_passages,
    repeated_token_fraction,
)

_PASSAGE = "lorem ipsum dolor sit amet consectetur"  # 6 tokens -> 2 windows


def _docs(spark):
    return spark.createDataFrame(
        [
            # shared passage at positions 2..7 of doc 1 and 0..5 of doc 2
            (1, "aa bb " + _PASSAGE + " cc dd ee"),
            (2, _PASSAGE + " xx yy zz ww qq rr"),
            # within-doc repeat: the same 5 tokens at pos 0 and pos 7
            (3, "p1 p2 p3 p4 p5 mm nn p1 p2 p3 p4 p5 oo"),
            # no repeats anywhere
            (4, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            # too short for a 5-token window
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )


def test_cross_doc_span_boundaries(spark):
    spans = {
        (r["doc_id"], r["span_start"]): r
        for r in repeated_passages(_docs(spark)).collect()
    }
    # doc 1: passage tokens at 2..7 -> windows start 2,3 -> one span 2..7
    s1 = spans[(1, 2)]
    assert (s1["span_end"], s1["span_tokens"]) == (7, 6)
    # doc 2: same passage at 0..5
    s2 = spans[(2, 0)]
    assert (s2["span_end"], s2["span_tokens"]) == (5, 6)


def test_within_doc_repeat_merges_disjoint(spark):
    spans = [r for r in repeated_passages(_docs(spark)).collect()
             if r["doc_id"] == 3]
    # windows at pos 0 and pos 7: gap 7 > k=5 -> two DISJOINT spans 0..4, 7..11
    got = sorted((r["span_start"], r["span_end"]) for r in spans)
    assert got == [(0, 4), (7, 11)]


def test_clean_and_short_docs(spark):
    cov = {r["doc_id"]: r
           for r in repeated_token_fraction(_docs(spark)).collect()}
    assert set(cov) == {1, 2, 3, 4, 5}  # one row per doc, even span-less ones
    assert cov[4]["repeated_tokens"] == 0 and cov[4]["repeated_frac"] == 0.0
    assert cov[5]["repeated_tokens"] == 0  # sub-k doc has no window at all
    assert cov[1]["repeated_tokens"] == 6
    assert abs(cov[1]["repeated_frac"] - 6 / 11) < 1e-6  # rounded to 6 dp
    assert cov[3]["repeated_tokens"] == 10
    # disjoint-span guarantee: coverage can never exceed 1
    assert all(r["repeated_frac"] <= 1.0 for r in cov.values())


def test_overlapping_windows_one_span(spark):
    # adjacent repeated windows with gap < k must merge, not double-count:
    # docs share tokens 0..6 (7 tokens -> 3 windows at 0,1,2 -> one span 0..6)
    docs = spark.createDataFrame(
        [(1, "s0 s1 s2 s3 s4 s5 s6 aa bb"),
         (2, "s0 s1 s2 s3 s4 s5 s6 cc dd")],
        "doc_id long, text string",
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in repeated_passages(docs).collect())
    assert spans == [(1, 0, 6, 7), (2, 0, 6, 7)]
