"""Bucketed index store: the probe join must not shuffle the index side
(the write-once bucketBy shuffle is amortized over every later probe)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_probe_join_shuffles_probe_side_only(spark, tmp_path):
    from deduplicator_spark.entry_queries import _probe_index, load
    from deduplicator_spark.plans.bucketed import (
        probe_bucketed,
        write_bucketed_index,
    )

    probe, index = _probe_index(load(spark, "/root/testdata/sf0.001", "events"))
    index = index.select("digest", "url", "ts", "record_id")

    spark.sql("DROP TABLE IF EXISTS bucketed_idx_test")
    (
        index.write.mode("overwrite")
        .bucketBy(8, "digest").sortBy("digest")
        .option("path", str(tmp_path / "bidx"))
        .format("parquet")
        .saveAsTable("bucketed_idx_test")
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucket layout matters
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = probe_bucketed(probe, spark, "bucketed_idx_test")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # exactly ONE exchange: the probe side. The bucketed index side is
        # read in place (its scan reports the selected buckets).
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Bucketed: true" in plan, plan

        # semantics identical to the plain join
        got = {(r["probe_id"], r["idx_record_id"]) for r in
               joined.select("probe_id", "idx_record_id").collect()}
        plain = probe.join(
            index.select("digest", F.col("record_id").alias("idx_record_id")),
            "digest", "left")
        want = {(r["probe_id"], r["idx_record_id"]) for r in
                plain.select("probe_id", "idx_record_id").collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bucketed_idx_test")


def test_write_bucketed_index_roundtrip(spark, tmp_path):
    from deduplicator_spark.plans.bucketed import read_bucketed_index

    df = spark.range(100).select(
        F.concat(F.lit("d"), (F.col("id") % 10).cast("string")).alias("digest"),
        F.col("id").alias("payload"),
    )
    spark.sql("DROP TABLE IF EXISTS bucketed_rt_test")
    (
        df.write.mode("overwrite").bucketBy(4, "digest").sortBy("digest")
        .option("path", str(tmp_path / "rt"))
        .format("parquet").saveAsTable("bucketed_rt_test")
    )
    back = read_bucketed_index(spark, "bucketed_rt_test")
    assert back.count() == 100
    assert back.groupBy("digest").count().count() == 10
    spark.sql("DROP TABLE IF EXISTS bucketed_rt_test")
