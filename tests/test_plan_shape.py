"""Physical-plan shape pins for the broadcast-hazard class the 100x gate
caught (BENCH/SF100X_GATE.md): a join against an aggregated table whose
cardinality grows with the corpus must build per-partition (shuffled hash
join), never as a driver broadcast relation — AQE's compressed-size estimate
understates the deserialized relation for string-heavy tables, and the
failure mode is a nondeterministic driver OOM that only appears at scale.

These tests pin the STRATEGY, not the results (the oracle gate and the
exactness pytests own results): if a refactor drops the shuffle_hash hint,
the hazard silently returns and only a 100x-scale run would notice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.operators.passages import repeated_passages
from deduplicator_spark.operators.prefixjoin import prefix_filtered_pairs


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=24):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30)))
            for i in range(n)]
    # plant repeats so the hot/rare aggregates are non-empty
    rows += [(100 + i, rows[i][1]) for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_passages_gram_join_is_shuffled_hash(spark):
    plan = _executed_plan(repeated_passages(_docs(spark)))
    assert "ShuffledHashJoin" in plan, plan
    # the only joins in this operator are the gram join — no broadcast edge
    assert "BroadcastHashJoin" not in plan, plan


def test_prefix_join_df_table_join_is_shuffled_hash(spark):
    items = _docs(spark).select(
        F.format_string("%012d", "doc_id").alias("image_id"),
        F.col("text").alias("caption"))
    plan = _executed_plan(prefix_filtered_pairs(items, 0.8))
    assert "ShuffledHashJoin" in plan, plan


def test_ngram_rare_shingle_join_is_shuffled_hash(spark):
    import __spark_entry__ as entry

    df = entry.queries()["ngram_jaccard_pairs"](spark, "/root/testdata/sf0.001")
    assert "ShuffledHashJoin" in _executed_plan(df)


def _captions(spark, n=40):
    rows = [(f"img-{i:012d}",
             " ".join(f"t{(i * 5 + j) % 60}" for j in range(24)))
            for i in range(n)]
    rows += [(f"img-{100 + i:012d}", rows[i][1]) for i in range(4)]
    return spark.createDataFrame(rows, "image_id string, caption string")


def test_minhash_cascade_has_no_broadcast_edge(spark):
    """near_caption_pairs end-to-end: the big-bucket star join (big_mins)
    and both jaccard_verify joins ride hinted per-partition strategies —
    no corpus-growing aggregate may appear as a driver-broadcast relation."""
    from deduplicator_spark.operators.minhash import near_caption_pairs

    plan = _executed_plan(near_caption_pairs(_captions(spark)))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_containment_verify_joins_are_hinted(spark):
    """containment_pairs' verify joins: pair side builds per-partition,
    the array-carrying second join is pinned sort-merge."""
    from deduplicator_spark.operators.containment import containment_pairs

    short = [(f"img-{500 + i:012d}", "t1 t2 t3 t4 t5") for i in range(3)]
    df = _captions(spark).unionByName(
        spark.createDataFrame(short, "image_id string, caption string"))
    plan = _executed_plan(containment_pairs(df))
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" in plan, plan
