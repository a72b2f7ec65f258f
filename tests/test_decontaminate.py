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


def test_eval_span_excision_planted(spark, tmp_path):
    """Span-level decontamination: a training doc with an eval passage in
    the middle SURVIVES with exactly that span excised (cut-list semantics),
    while its clean head/tail are untouched and a clean doc passes verbatim."""
    from deduplicator_spark.entry_queries import q_eval_span_decontaminate
    from deduplicator_spark.plans.curate import excise_spans

    head = "clean head words here and"          # tokens 0-4
    leak = "alpha beta gamma delta epsilon"     # tokens 5-9 <- planted eval text
    tail = "then a clean tail follows after"    # tokens 10-15
    docs = spark.createDataFrame(
        [
            (100, leak),                            # eval doc (id % 100 == 0)
            (1, f"{head} {leak} {tail}"),           # contaminated mid-span
            (2, "totally unrelated words about glacier melt"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    spans = q_eval_span_decontaminate(spark, str(tmp_path))
    rows = spans.collect()
    # one maximal span on doc 1 covering exactly the leaked tokens 5..9
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in rows] == [(1, 5, 9, 5)]

    cut = {r["doc_id"]: r["text"]
           for r in excise_spans(
               docs.filter("doc_id % 100 != 0"), spans).collect()}
    assert cut[1] == f"{head} {tail}"   # survives, leak excised
    assert cut[2] == "totally unrelated words about glacier melt"


def test_eval_span_disjoint_islands(spark, tmp_path):
    """Two separated leaks in one doc produce two disjoint spans; adjacent/
    overlapping leaked windows merge into one maximal span."""
    from deduplicator_spark.entry_queries import q_eval_span_decontaminate

    leak1 = "alpha beta gamma"            # one 3-gram
    leak2 = "omega psi chi phi"           # two overlapping 3-grams -> merge
    docs = spark.createDataFrame(
        [
            (100, f"{leak1} junk junk {leak2}"),
            (1, f"{leak1} w01 w02 w03 w04 w05 {leak2} w06"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in q_eval_span_decontaminate(spark, str(tmp_path)).collect()
    )
    # leak1 at tokens 0-2; leak2 at tokens 8-11 (windows 8 and 9 merged)
    assert got == [(0, 2), (8, 11)]
