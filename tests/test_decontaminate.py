"""Planted-truth test for train/eval n-gram decontamination
(entry_queries.q_ngram_decontaminate). Cross-engine proof is the
`ngram_decontaminate` oracle row; this pins the planted semantics: a
training doc sharing one k-shingle with an eval doc (doc_id%100==0) is
flagged, an unrelated doc is not, and eval docs never appear in the output."""

from __future__ import annotations

from deduplicator_spark.entry_queries import q_ngram_decontaminate


def test_decontaminate_planted(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            # eval doc (id % 100 == 0)
            (100, "alpha beta gamma delta epsilon"),
            # train doc leaking the shingle "beta gamma delta" (+1 more)
            (1, "prefix beta gamma delta epsilon suffix"),
            # clean train doc
            (2, "totally unrelated words about glacier melt"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r
            for r in q_ngram_decontaminate(spark, str(tmp_path)).collect()}

    assert set(rows) == {1, 2}  # eval doc 100 is not judged
    hit = rows[1]
    assert hit["contaminated"] is True
    # shared 3-shingles: "beta gamma delta", "gamma delta epsilon"
    assert hit["n_shared_ngrams"] == 2
    assert hit["first_eval_id"] == 100
    clean = rows[2]
    assert clean["contaminated"] is False
    assert clean["n_shared_ngrams"] == 0
    assert clean["first_eval_id"] is None
