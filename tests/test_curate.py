"""Planted-truth tests for the text-curation capstone (plans/curate.py).
Cross-engine proof is the `curate_corpus` oracle row; these pin the planted
semantics: reason precedence (eval_overlap beats quality beats dup), each
quality bucket, keep-best-by-tokens representative selection, and the
observe()-riding counters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.entry_queries import q_curate_corpus

_BASE = "the of " + " ".join(f"w{i:02d}" for i in range(1, 29))  # 30 tokens


@pytest.fixture(scope="module")
def verdicts(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("curate")
    docs = spark.createDataFrame(
        [
            # eval doc (id % 100 == 0)
            (100, "alpha beta gamma delta epsilon"),
            # contaminated AND short -> precedence says eval_overlap
            (1, "beta gamma delta epsilon"),
            # short, clean
            (2, "just a few clean words here"),
            # near-dup pair: 4 is longer -> kept; 3 folds into it
            (3, _BASE),
            (4, _BASE + " extra more"),
            # repetitive: 25 tokens, 1 distinct -> ttr 0.04
            (5, " ".join(["spam"] * 25)),
            # >= 20 distinct tokens, zero stopwords
            (6, " ".join(f"xenon{i:02d}" for i in range(24))),
            # clean singleton keeper
            (7, "the of " + " ".join(f"z{i:02d}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    return {r["doc_id"]: r for r in q_curate_corpus(spark, str(tmp)).collect()}


def test_one_verdict_per_training_doc(verdicts):
    assert set(verdicts) == {1, 2, 3, 4, 5, 6, 7}  # eval doc not judged


def test_reason_precedence_and_quality_buckets(verdicts):
    assert verdicts[1]["reason"] == "eval_overlap"      # not quality:short
    assert verdicts[2]["reason"] == "quality:short"
    assert verdicts[5]["reason"] == "quality:repetitive"
    assert verdicts[6]["reason"] == "quality:no_stopwords"
    for d in (1, 2, 5, 6):
        assert verdicts[d]["status"] == "dropped"
        assert verdicts[d]["cluster_id"] is None
        assert verdicts[d]["refers_to"] is None


def test_keep_best_representative(verdicts):
    # cluster label is the min member id (3); the keeper is the LONGER doc (4)
    assert verdicts[4]["status"] == "kept"
    assert verdicts[4]["cluster_id"] == 3
    assert verdicts[4]["reason"] is None
    assert verdicts[3]["status"] == "dropped"
    assert verdicts[3]["reason"] == "near_duplicate"
    assert verdicts[3]["cluster_id"] == 3
    assert verdicts[3]["refers_to"] == 4


def test_singleton_survivor_kept(verdicts):
    assert verdicts[7]["status"] == "kept"
    assert verdicts[7]["cluster_id"] == 7
    assert verdicts[7]["refers_to"] is None


def test_observation_counters(spark):
    from pyspark.sql import Observation

    from deduplicator_spark.plans.curate import curate_documents

    docs = spark.createDataFrame(
        [(1, _BASE), (2, _BASE + " extra more"), (3, "too short")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "unrelated eval material entirely")], "doc_id long, text string")
    obs = Observation("curate_counters")
    out = curate_documents(docs, ev, observation=obs)
    n = out.count()
    got = obs.get
    assert got["total"] == n == 3
    assert got["kept"] == 1
    assert got["near_duplicate"] == 1
    assert got["quality_short"] == 1
    assert got["eval_overlap"] == 0


def test_broadcast_guard_fallback_identical(spark, tmp_path):
    """Forcing the shuffle-join fallback (max_broadcast_rows=0) produces
    verdicts identical to the broadcast path — the guard changes the
    physical join strategy only."""
    from deduplicator_spark.plans.curate import curate_documents

    docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"),
         (1, "beta gamma delta epsilon leaks here"),
         (2, _BASE),
         (3, _BASE + " extra more"),
         (4, "a clean and unique document with the usual stopwords of note "
             "plus enough distinct words to pass every quality bucket")],
        "doc_id long, text string",
    )
    ev = docs.filter("doc_id % 100 = 0")
    train = docs.filter("doc_id % 100 != 0")
    key = lambda rows: sorted(map(tuple, rows))
    bcast = key(curate_documents(train, ev).collect())
    shuffled = key(curate_documents(train, ev, max_broadcast_rows=0).collect())
    assert bcast == shuffled
    assert any(r[1] == "dropped" and r[2] == "eval_overlap" for r in bcast)
