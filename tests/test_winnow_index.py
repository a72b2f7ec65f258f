"""Winnow index -> probe lifecycle (plans/winnow_index.py): planted
passage-containment probes, top-1 determinism, novel fallback."""

import pytest

from deduplicator_spark.plans.winnow_index import (
    build_winnow_index,
    probe_winnow,
)

PASSAGE = "the quick brown fox jumps over the lazy dog by the riverbank"


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (0, "opening words here " + PASSAGE + " and closing remarks"),
            (1, "totally different indexed content about winter weather"),
            # 2 duplicates 0's passage context -> tie candidate for probes
            (2, "opening words here " + PASSAGE + " and closing remarks"),
        ],
        "doc_id long, text string",
    )
    return build_winnow_index(docs).persist()


def _probe(spark, index, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.probe_id: r for r in
            probe_winnow(df, index, **kw).collect()}


def test_contained_passage_overlaps_and_ties_break_to_min_id(spark, index):
    got = _probe(spark, index, [
        (10, PASSAGE),                          # pure passage -> covered
        (11, "zzz qqq completely unrelated probe text wwww"),
        (12, "xy"),                             # shorter than k: no grams
    ])
    assert got[10].verdict == "overlap"
    # docs 0 and 2 tie exactly (same text) -> min index id wins
    assert got[10].refers_to == 0
    assert got[10].score >= 0.5 and got[10].shared > 0
    assert got[11].verdict == "novel" and got[11].refers_to is None
    # a too-short probe has zero fingerprints and must come back novel
    assert got[12].verdict == "novel" and got[12].n_probe == 0


def test_min_score_gates_partial_overlap(spark, index):
    # probe = the passage plus a long unrelated tail: coverage of the
    # probe's fingerprint set falls below 0.5 -> novel at the default
    # gate, overlap when the gate is lowered
    tail = " ".join(f"filler{i:04d}" for i in range(60))
    rows = [(20, PASSAGE + " " + tail)]
    strict = _probe(spark, index, rows)
    loose = _probe(spark, index, rows, min_score=0.05)
    assert strict[20].verdict == "novel"
    assert loose[20].verdict == "overlap" and loose[20].refers_to == 0


def test_df_cap_drops_hot_fingerprints(spark, index):
    # df_cap=1 drops every fingerprint indexed by both 0 and 2 (the
    # duplicated passage) -> the pure-passage probe finds nothing
    got = _probe(spark, index, [(30, PASSAGE)], df_cap=1)
    assert got[30].verdict == "novel"
