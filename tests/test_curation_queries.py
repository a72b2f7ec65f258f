"""Unit pins for the round-5 curation queries (domain_quota,
unigram_surprisal) beyond their DuckDB gate rows: the distributed-top-k
lemma against a naive window on SKEWED data (the gate corpus is uniform,
which would never catch a bucket-boundary bug), and the integer-surprisal
arithmetic against a pure-Python model."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deduplicator_spark.entry_queries import DOMAIN_QUOTA_CAP


def _skewed_docs(spark, n=3000):
    # one dominant domain (~80%), several small ones incl. one UNDER the cap
    rows = []
    for i in range(n):
        src = "big" if i % 10 < 8 else f"small{i % 7}"
        rows.append((i, f"tok{i % 13} tok{i % 7} tok{i % 3}", "en", src, 10))
    rows += [(n + i, "tiny doc", "en", "undercap", 8) for i in range(5)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_domain_quota_two_pass_equals_naive_window(spark, tmp_path):
    docs = _skewed_docs(spark)
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    from deduplicator_spark.entry_queries import q_domain_quota

    got = {(r["doc_id"], r["source"], r["src_rank"])
           for r in q_domain_quota(spark, str(tmp_path)).collect()}

    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    naive = (
        docs.select(
            "doc_id", "source",
            F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
            .alias("hk"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= DOMAIN_QUOTA_CAP)
    )
    want = {(r["doc_id"], r["source"], r["rk"]) for r in naive.collect()}
    assert got == want
    # the under-cap domain keeps ALL its docs; the dominant one exactly cap
    by_src = {}
    for _, src, _ in got:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src["undercap"] == 5
    assert by_src["big"] == DOMAIN_QUOTA_CAP


def test_unigram_surprisal_matches_pure_python(spark, tmp_path):
    docs = _skewed_docs(spark, n=200)
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    from deduplicator_spark.entry_queries import q_unigram_surprisal

    rows = {r["doc_id"]: r
            for r in q_unigram_surprisal(spark, str(tmp_path)).collect()}

    data = [(r["doc_id"], r["text"].split())
            for r in docs.collect()]
    cnt: dict[str, int] = {}
    for _, toks in data:
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
    total = sum(cnt.values())
    for doc_id, toks in data:
        bits = [int(math.log2(total // cnt[t])) for t in toks]
        # floor(log2(total div c)) == bit_length - 1 of the integer quotient
        assert rows[doc_id]["n_tokens"] == len(toks)
        assert rows[doc_id]["sum_bits"] == sum(
            (total // cnt[t]).bit_length() - 1 for t in toks)
    # rare tokens must carry at least as many bits as frequent ones
    rare_bits = (total // 1).bit_length() - 1
    stop_bits = (total // max(cnt.values())).bit_length() - 1
    assert rare_bits >= stop_bits
