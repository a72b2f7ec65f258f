"""Planted-truth tests for the caption index -> probe lifecycle
(plans/caption_index.py). Cross-engine proof of the same path is the
`caption_index_probe` oracle row; these pin verdict precedence and APPEND
increments on hand-built captions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.config import DEFAULT
from deduplicator_spark.plans.caption_index import (
    append_novel_to_index,
    build_caption_index,
    probe_captions,
)

BASE = ("the quick brown fox jumps over the lazy dog while rain falls "
        "softly on the quiet village roofs tonight and nobody is watching")


@pytest.fixture(scope="module")
def planted(spark):
    index = build_caption_index(spark.createDataFrame(
        [("idx0", BASE), ("idx1", "completely different reference text here")],
        "image_id string, caption string"))

    probes = spark.createDataFrame(
        [
            ("p_exact", BASE),                       # digest hit on idx0
            ("p_near", BASE + " suddenly"),          # one appended token
            ("p_far", "unrelated words entirely about submarine engineering"),
        ],
        "image_id string, caption string")
    out = probe_captions(build_caption_index(probes), index, DEFAULT)
    return {r["image_id"]: r for r in out.collect()}


def test_caption_probe_verdicts(planted):
    assert len(planted) == 3
    assert planted["p_exact"]["verdict"] == "duplicate"
    assert planted["p_exact"]["refers_to_id"] == "idx0"
    assert planted["p_exact"]["jaccard"] is None

    near = planted["p_near"]
    assert near["verdict"] == "near_duplicate"
    assert near["refers_to_id"] == "idx0"
    # 23 tokens -> 21 distinct shingles; +1 token adds exactly one shingle
    assert near["jaccard"] == pytest.approx(21 / 22)

    assert planted["p_far"]["verdict"] == "novel"
    assert planted["p_far"]["refers_to_id"] is None


def test_caption_append_mode(spark):
    index = build_caption_index(spark.createDataFrame(
        [("idx0", BASE)], "image_id string, caption string"))
    b1 = build_caption_index(spark.createDataFrame(
        [("n1", "a wholly new caption about glacier melt observations today")],
        "image_id string, caption string"))
    v1 = probe_captions(b1, index, DEFAULT).persist()
    assert {r["verdict"] for r in v1.collect()} == {"novel"}
    index2 = append_novel_to_index(index, b1, v1)
    assert index2.count() == 2

    b2 = build_caption_index(spark.createDataFrame(
        [("d2", "a wholly new caption about glacier melt observations today")],
        "image_id string, caption string"))
    rows = {r["image_id"]: r
            for r in probe_captions(b2, index2, DEFAULT).collect()}
    assert rows["d2"]["verdict"] == "duplicate"
    assert rows["d2"]["refers_to_id"] == "n1"
    v1.unpersist()


def test_identical_caption_index_collapses(spark):
    # a boilerplate caption indexed many times must yield the MIN id as the
    # near-tier referent (the dedup-by-digest representative), and the exact
    # tier's min-id rule agrees
    idx = build_caption_index(spark.createDataFrame(
        [(f"idx{i}", BASE) for i in (3, 1, 2)],
        "image_id string, caption string"))
    probes = build_caption_index(spark.createDataFrame(
        [("p_near", BASE + " suddenly")], "image_id string, caption string"))
    rows = {r["image_id"]: r for r in probe_captions(probes, idx, DEFAULT).collect()}
    assert rows["p_near"]["verdict"] == "near_duplicate"
    assert rows["p_near"]["refers_to_id"] == "idx1"
