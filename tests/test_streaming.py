"""Stream-static probe == batch probe (the reference's crawl-time semantics,
SURVEY.md §2.7), and the watermarked verdict rollup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _probe_and_index(spark):
    from deduplicator_spark.entry_queries import _probe_index, load

    return _probe_index(load(spark, "/root/testdata/sf0.001", "events"))


def test_stream_static_probe_matches_batch(spark, tmp_path):
    from deduplicator_spark.streaming.probe import (
        probe_stream,
        read_capture_stream,
        run_probe_to_memory,
        static_index_for_stream,
    )

    probe, index = _probe_and_index(spark)
    static_idx = static_index_for_stream(index).persist()

    src = str(tmp_path / "stream_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    run_probe_to_memory(spark, stream, static_idx, "probe_out")
    got = {
        (r["probe_id"], r["verdict"], r["refers_to_record_id"])
        for r in spark.table("probe_out").collect()
    }

    batch = probe_stream(spark.read.parquet(src), static_idx)
    want = {
        (r["probe_id"], r["verdict"], r["refers_to_record_id"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == probe.count()
    assert any(v == "duplicate" for _, v, _ in got)


def test_streaming_exact_dedup_keeps_first_per_digest(spark, tmp_path):
    """Stateful watermarked dedup: exactly one capture survives per digest
    across micro-batches (the incremental index-build upsert)."""
    from deduplicator_spark.streaming.probe import (
        read_capture_stream,
        streaming_exact_dedup,
    )

    probe, _ = _probe_and_index(spark)
    src = str(tmp_path / "dedup_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("dedup_out").collect()
    digests = [r["digest"] for r in got]
    assert len(digests) == len(set(digests))  # one row per digest
    assert set(digests) == {r["digest"] for r in probe.collect()}  # none lost


def test_stateful_dup_stats_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom operator: per-digest running dup stats
    across micro-batches converge to the batch groupBy answer, with the
    deterministic first-capture rule (earliest ts, record_id tie-break)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import streaming_dup_stats

    probe, _ = _probe_and_index(spark)
    src = str(tmp_path / "stateful_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    q = (
        streaming_dup_stats(stream)
        .writeStream.format("memory").queryName("dupstats_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode re-emits running totals; the final state per digest is the
    # row with the max n_seen
    got = {
        r["digest"]: (r["n_seen"], r["first_record_id"])
        for r in spark.table("dupstats_out")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("digest").orderBy(F.col("n_seen").desc())))
        .filter("rn = 1").collect()
    }
    want = {
        r["digest"]: (r["n"], r["first"])
        for r in spark.read.parquet(src)
        .groupBy("digest")
        .agg(F.count("*").alias("n"),
             F.min(F.struct("ts", "record_id")).alias("m"))
        .select("digest", "n", F.col("m.record_id").alias("first")).collect()
    }
    assert got == want
    assert any(n > 1 for n, _ in got.values())  # real dups exercised


@pytest.mark.slow
def test_stateful_dup_stats_sharded_equivalence(spark, tmp_path):
    """The shard-granularity dup-stats operator emits EXACTLY the per-digest
    operator's rows (same running totals at the same micro-batch boundaries,
    same first-capture rule) when both consume identical file batches."""
    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_dup_stats,
        streaming_dup_stats_sharded,
    )

    probe, _ = _probe_and_index(spark)
    src = str(tmp_path / "shard_stats_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    results = {}
    for name, op, kw in (("fine", streaming_dup_stats, {}),
                         ("sharded", streaming_dup_stats_sharded,
                          {"n_shards": 16})):
        stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
        q = (
            op(stream, **kw)
            .writeStream.format("memory").queryName(f"stats_{name}")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        results[name] = sorted(
            (r["digest"], r["n_seen"], r["n_dups"], r["first_record_id"],
             r["first_ts"])
            for r in spark.table(f"stats_{name}").collect()
        )
    # multiset equality: multiplicities must match too
    assert results["sharded"] == results["fine"]
    assert any(t[1] > 1 for t in results["fine"])  # real dups exercised


def test_streaming_phash_probe_matches_exact_hamming(spark, tmp_path):
    """Streaming near-image probe == the exact Hamming<=3 probe-x-index join:
    pigeonhole recall-1 through the stream-static band join, and the
    stateless first-agreeing-band dedup emits EXACTLY one row per verified
    pair (a Hamming-1 pair agrees on 3 bands — without the dedup it would
    triple-emit)."""
    from deduplicator_spark.entry_queries import synth_phash_sql
    from deduplicator_spark.streaming.probe import (
        phash_index_for_stream,
        probe_phash_stream,
        read_capture_stream,
    )

    base = spark.range(0, 400).select(
        F.format_string("idx-%04d", "id").alias("image_id"),
        F.expr(synth_phash_sql("spark", "id")).alias("phash"),
    )
    # probes: planted decade variants (Hamming 1/3 hit, 5 miss) + exact dups
    probes = spark.range(0, 400).filter("id % 10 in (1, 2, 3, 0)").select(
        F.format_string("probe-%04d", "id").alias("image_id"),
        F.expr(synth_phash_sql("spark", "id")).alias("phash"),
    )
    banded_idx = phash_index_for_stream(base).persist()

    src = str(tmp_path / "phash_src")
    probes.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=2)
    q = (
        probe_phash_stream(stream, banded_idx)
        .writeStream.format("memory").queryName("phash_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("phash_out").collect()
    got = {(r["image_id"], r["idx_image_id"]): r["hamming"] for r in rows}
    assert len(rows) == len(got)  # first-agreeing-band dedup: one row/pair

    want = {
        (r["pid"], r["iid"]): r["hamming"]
        for r in probes.alias("p").crossJoin(base.alias("i"))
        .select(F.col("p.image_id").alias("pid"), F.col("i.image_id").alias("iid"),
                F.bit_count(F.col("p.phash").bitwiseXOR(F.col("i.phash"))).alias("hamming"))
        .filter("hamming <= 3").collect()
    }
    assert got == want
    assert any(h == 0 for h in got.values())   # exact-dup probes (x%10==0)
    assert any(h == 3 for h in got.values())   # Hamming-3 plants
    # Hamming-5 negative controls: a x%10==3 probe pairs only with its
    # IDENTICAL index twin (same synth formula), never its decade anchor
    h5_to_anchor = {(f"probe-{i:04d}", f"idx-{i - 3:04d}")
                    for i in range(400) if i % 10 == 3}
    assert not (set(got) & h5_to_anchor)


def test_verdict_rollup_stream(spark, tmp_path):
    from deduplicator_spark.streaming.probe import (
        probe_stream,
        read_capture_stream,
        static_index_for_stream,
        verdict_rollup_stream,
    )

    probe, index = _probe_and_index(spark)
    static_idx = static_index_for_stream(index)

    src = str(tmp_path / "rollup_src")
    probe.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema)
    rollup = verdict_rollup_stream(probe_stream(stream, static_idx), window="1 hour")
    q = (
        rollup.writeStream.format("memory").queryName("rollup_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("rollup_out")

    want = (
        probe_stream(spark.read.parquet(src), static_idx)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "verdict")
        .agg(F.count("*").alias("n"))
    )
    got_d = {(str(r["window_start"]), r["verdict"]): r["n"] for r in got.collect()}
    want_d = {(str(r["window_start"]), r["verdict"]): r["n"] for r in want.collect()}
    assert got_d == want_d


@pytest.mark.slow
def test_streaming_neardup_dedup_in_stream(spark, tmp_path):
    """Stateful in-stream near-dup (no static index): per planted family of
    mutually Hamming<=3 phashes, exactly ONE member emits all-null refs (the
    first arrival, which seeds the band buckets) and every other member gets
    >= 1 agreeing-band ref pointing INSIDE its family — recall-1 by
    pigeonhole, order-robust across micro-batch boundaries. Unrelated hashes
    (every band differs) never match anything."""
    from datetime import datetime

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import streaming_neardup_dedup

    # three families of 4 (base + <=3 flipped low bits), 5 far-apart loners
    bases = [0x1111_2222_3333_4444, 0x5555_6666_7777_0888, 0x0AAA_BBBB_CCCC_DDDD]
    rows, family_of = [], {}
    vid = 0
    for fi, b in enumerate(bases):
        for flips in (0b000, 0b001, 0b011, 0b111):
            rows.append((f"img{vid:04d}", b ^ flips, datetime(2026, 1, 1, 0, vid)))
            family_of[f"img{vid:04d}"] = fi
            vid += 1
    for k in range(5):  # loners: distinct in every 16-bit band
        h = 0
        for band in range(4):
            h |= (0x6000 + 0x111 * k + 0x10 * band) << (16 * band)
        rows.append((f"lone{k}", h, datetime(2026, 1, 1, 0, vid))); vid += 1

    src = str(tmp_path / "neardup_src")
    df = spark.createDataFrame(rows, "image_id string, phash long, ts timestamp")
    df.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        streaming_neardup_dedup(stream)
        .writeStream.format("memory").queryName("neardup_out")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("neardup_out").collect()

    assert len(got) == len(rows) * 4  # one row per (image, band)
    refs = {}
    for r in got:
        refs.setdefault(r["image_id"], []).append((r["ref_id"], r["hamming"]))
    for k in range(5):  # loners never match
        assert all(ref is None for ref, _ in refs[f"lone{k}"])
    for fi in range(len(bases)):
        members = [i for i, f in family_of.items() if f == fi]
        seeds = [m for m in members if all(ref is None for ref, _ in refs[m])]
        assert len(seeds) == 1, f"family {fi}: seeds {seeds}"
        for m in members:
            if m in seeds:
                continue
            hits = [(ref, ham) for ref, ham in refs[m] if ref is not None]
            assert hits, f"{m} found no agreeing band"
            for ref, ham in hits:
                assert family_of.get(ref) == fi and 0 <= ham <= 3


@pytest.mark.parametrize("variant", ["fine", "sharded"])
def test_streaming_neardup_bucket_cap(spark, tmp_path, variant):
    """bucket_cap bounds state: with cap=2 and 4 identical hashes, exactly
    one seed emits all-null refs and the other three match a stored member
    on every band — for both the per-(band,key) operator and its
    shard-granularity twin."""
    from datetime import datetime

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    op = (streaming_neardup_dedup if variant == "fine"
          else streaming_neardup_dedup_sharded)
    rows = [(f"d{i}", 0x0123_4567_89AB_CDEF, datetime(2026, 1, 1, 0, i))
            for i in range(4)]
    src = str(tmp_path / "cap_src")
    df = spark.createDataFrame(rows, "image_id string, phash long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_capture_stream(spark, src, schema)
    q = (
        op(stream, bucket_cap=2)
        .writeStream.format("memory").queryName(f"cap_out_{variant}")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(f"cap_out_{variant}").collect()
    refs = {}
    for r in got:
        refs.setdefault(r["image_id"], []).append(r["ref_id"])
    seeds = [i for i, rs in refs.items() if all(x is None for x in rs)]
    assert seeds == ["d0"]  # single file, (ts, id)-sorted replay
    for i in ("d1", "d2", "d3"):
        assert all(x == "d0" for x in refs[i])  # first-inserted member wins


@pytest.mark.slow
def test_streaming_neardup_sharded_equivalence(spark, tmp_path):
    """The shard-granularity operator emits EXACTLY the per-(band,key)
    operator's rows — same refs, hammings and cap markers — on a corpus that
    exercises multi-bucket shards (key collisions mod n_shards), multi-file
    micro-batch boundaries, planted families, loners, and an over-cap
    bucket."""
    from datetime import datetime

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    rows, vid = [], 0
    # three families of 4 whose band keys collide mod 8 across families
    bases = [0x1111_2222_3333_4444, 0x5555_6666_7777_0888,
             0x1119_222A_333B_444C]
    # all timestamps inside one watermark horizon so no micro-batch order
    # can late-drop a row (repartition(4) shuffles rows across files)
    for b in bases:
        for flips in (0b000, 0b001, 0b011, 0b111):
            rows.append((f"img{vid:04d}", b ^ flips,
                         datetime(2026, 1, 1, 0, vid)))
            vid += 1
    # an over-cap pile vs bucket_cap=4: 7 hashes sharing band 0's key but
    # pairwise Hamming >= 9 overall, so none matches, all try to insert,
    # and arrivals 5..7 hit a full band-0 bucket (capped=true there)
    for k in range(7):
        h = 0x4321
        for band in range(1, 4):
            h |= (0x7000 + 0x111 * k) << (16 * band)
        rows.append((f"pile{k}", h, datetime(2026, 1, 1, 0, 40, k)))
    # loners distinct in every band
    for k in range(5):
        h = 0
        for band in range(4):
            h |= (0x6000 + 0x111 * k + 0x10 * band) << (16 * band)
        rows.append((f"lone{k}", h, datetime(2026, 1, 1, 0, 50, k)))

    src = str(tmp_path / "equiv_src")
    df = spark.createDataFrame(rows, "image_id string, phash long, ts timestamp")
    df.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    results = {}
    for name, op in (("fine", streaming_neardup_dedup),
                     ("sharded", streaming_neardup_dedup_sharded)):
        stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
        kw = {"n_shards": 8} if name == "sharded" else {}
        q = (
            op(stream, bucket_cap=4, **kw)
            .writeStream.format("memory").queryName(f"equiv_{name}")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        results[name] = sorted(
            (r["image_id"], r["band"], r["key"], r["ref_id"], r["hamming"],
             r["capped"])
            for r in spark.table(f"equiv_{name}").collect()
        )
    assert len(results["fine"]) == len(rows) * 4
    # multiset equality: multiplicities must match too
    assert results["sharded"] == results["fine"]
    assert any(t[5] for t in results["fine"])  # the cap actually bound


@pytest.mark.slow
def test_streaming_neardup_sharded_horizon_boundary(spark, tmp_path):
    """Equivalence AT the watermark-eviction boundary, where a naive
    watermark prune diverges from Spark's EventTimeTimeout: a re-arrival
    landing in the first micro-batch whose watermark has passed the
    bucket's horizon must still MATCH the stored member (Spark never times
    out a group with data in the trigger), while a re-arrival after an
    idle expired batch must re-seed. File-per-batch corpus, lexicographic
    file order = deterministic batch order."""
    from datetime import datetime, timedelta

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    t0 = datetime(2026, 1, 1, 6, 0)
    P = 0x1111_2222_3333_4444

    def loner(k):
        h = 0
        for band in range(4):
            h |= (0x6000 + 0x111 * k + 0x10 * band) << (16 * band)
        return h

    # batch-by-batch script (watermark = 2 hours):
    #  b1: A1 seeds bucket P           (wm after: t0-2h)
    #  b2: filler at t0+6h             (wm after: t0+4h -> P's timer expired)
    #  b3: A2 (P^1) at t0+6h -> the bucket has DATA in the first expired
    #      batch: fine keeps state and matches; a naive prune would re-seed
    #  b4: filler at t0+12h            (wm after: t0+10h)
    #  b5: filler at t0+13h -> P idle in an expired batch: timer fires
    #  b6: A3 (P^2) at t0+13h -> both operators re-seed
    files = [
        [("A1", P, t0)],
        [("f1", loner(1), t0 + timedelta(hours=6))],
        [("A2", P ^ 1, t0 + timedelta(hours=6))],
        [("f2", loner(2), t0 + timedelta(hours=12))],
        [("f3", loner(3), t0 + timedelta(hours=13))],
        [("A3", P ^ 2, t0 + timedelta(hours=13))],
    ]
    src = str(tmp_path / "boundary_src")
    import os
    os.makedirs(src)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(
            rows, "image_id string, phash long, ts timestamp").coalesce(1)
        part_dir = str(tmp_path / f"_b{i}")
        df.write.mode("overwrite").parquet(part_dir)
        part = [p for p in os.listdir(part_dir) if p.endswith(".parquet")][0]
        os.rename(f"{part_dir}/{part}", f"{src}/file_{i:03d}.parquet")
    schema = spark.read.parquet(src).schema

    results = {}
    for name, op in (("fine", streaming_neardup_dedup),
                     ("sharded", streaming_neardup_dedup_sharded)):
        stream = read_capture_stream(spark, src, schema, max_files_per_trigger=1)
        kw = {"n_shards": 8} if name == "sharded" else {}
        q = (
            op(stream, **kw)
            .writeStream.format("memory").queryName(f"bound_{name}")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        results[name] = sorted(
            (r["image_id"], r["band"], r["key"], r["ref_id"], r["hamming"],
             r["capped"])
            for r in spark.table(f"bound_{name}").collect()
        )
    assert results["sharded"] == results["fine"]
    refs = {}
    for iid, _, _, ref, _, _ in results["fine"]:
        refs.setdefault(iid, []).append(ref)
    # A2 arrives in the first batch past the horizon WITH data: must match
    assert any(r == "A1" for r in refs["A2"])
    # A3 arrives after an idle expired batch evicted the bucket: re-seeds
    assert all(r is None for r in refs["A3"])


@pytest.mark.slow
def test_stateful_dup_stats_sharded_horizon_boundary(spark, tmp_path):
    """Dup-stats twin of the neardup horizon-boundary test: a digest
    re-arriving in the first micro-batch past its horizon (WITH data in the
    trigger) keeps its running count, while a re-arrival after an idle
    expired batch re-seeds at n_seen=1 — and the sharded operator must do
    both in the SAME batches as the per-digest EventTimeTimeout, even when
    a long-lived shard-mate digest would (under max-anchor arming) defer
    the shard's timeout past the eviction batch."""
    import os
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_dup_stats,
        streaming_dup_stats_sharded,
    )

    n_shards = 4
    # pick filler digests by their REAL shard assignment: f_same shares D's
    # shard (extends a max-armed timer); f_other does not (leaves the shard
    # un-invoked in the eviction batch)
    cands = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(64)], "digest string"
    ).withColumn("shard", F.pmod(F.xxhash64("digest"), F.lit(n_shards)))
    by_shard = {}
    for r in cands.collect():
        by_shard.setdefault(r["shard"], []).append(r["digest"])
    target = spark.createDataFrame([("DUP",)], "digest string").select(
        F.pmod(F.xxhash64("digest"), F.lit(n_shards))).collect()[0][0]
    f_same = [d for s, ds in by_shard.items() if s == target for d in ds]
    f_other = [d for s, ds in by_shard.items() if s != target for d in ds]
    assert len(f_same) >= 2 and len(f_other) >= 1

    t0 = datetime(2026, 1, 1, 6, 0)
    # batch script (watermark = 2 hours):
    #  b1: DUP r1 seeds                 (wm after: t0-2h)
    #  b2: same-shard filler at t0+6h   (wm after: t0+4h -> DUP expired)
    #  b3: DUP r2 at t0+6h -> data in the first expired batch: count runs on
    #  b4: same-shard filler at t0+12h  (max-armed timer would jump to 14h)
    #  b5: OTHER-shard filler at t0+13h -> DUP idle in an expired batch:
    #      min-armed shard timeout fires, DUP evicted (fine: group timeout)
    #  b6: DUP r3 at t0+13h -> both operators re-seed at n_seen=1
    files = [
        [("r1", "DUP", t0)],
        [("g1", f_same[0], t0 + timedelta(hours=6))],
        [("r2", "DUP", t0 + timedelta(hours=6))],
        [("g2", f_same[1], t0 + timedelta(hours=12))],
        [("g3", f_other[0], t0 + timedelta(hours=13))],
        [("r3", "DUP", t0 + timedelta(hours=13))],
    ]
    src = str(tmp_path / "stats_boundary_src")
    os.makedirs(src)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(
            rows, "record_id string, digest string, ts timestamp").coalesce(1)
        part_dir = str(tmp_path / f"_sb{i}")
        df.write.mode("overwrite").parquet(part_dir)
        part = [p for p in os.listdir(part_dir) if p.endswith(".parquet")][0]
        os.rename(f"{part_dir}/{part}", f"{src}/file_{i:03d}.parquet")
    schema = spark.read.parquet(src).schema

    results = {}
    for name, op, kw in (("fine", streaming_dup_stats, {}),
                         ("sharded", streaming_dup_stats_sharded,
                          {"n_shards": n_shards})):
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        q = (
            op(stream, **kw)
            .writeStream.format("memory").queryName(f"sbound_{name}")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        results[name] = sorted(
            (r["digest"], r["n_seen"], r["n_dups"], r["first_record_id"])
            for r in spark.table(f"sbound_{name}").collect()
        )
    assert results["sharded"] == results["fine"]
    dup_counts = sorted(n for d, n, _, _ in results["fine"] if d == "DUP")
    # r2 lands in the first expired batch WITH data -> count continues (2);
    # r3 lands after an idle expired batch -> state re-seeded (1)
    assert dup_counts == [1, 1, 2]


def _write_batch_file(spark, tmp_path, src, tag, rows, schema_str):
    """Append one single-file micro-batch to a file-stream source dir."""
    import os

    os.makedirs(src, exist_ok=True)
    df = spark.createDataFrame(rows, schema_str).coalesce(1)
    part_dir = str(tmp_path / f"_stage_{tag}")
    df.write.mode("overwrite").parquet(part_dir)
    part = [p for p in os.listdir(part_dir) if p.endswith(".parquet")][0]
    n = len(os.listdir(src))
    os.rename(f"{part_dir}/{part}", f"{src}/file_{n:03d}.parquet")


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["fine", "sharded"])
def test_streaming_neardup_restart_recovers_state(spark, tmp_path, variant):
    """North-rule resumability on the streaming side: stop the in-stream
    near-dup query, start a NEW query from the same checkpointLocation, and
    the bucket membership written by the first query must still match — the
    applyInPandasWithState state store survives query restarts, and the
    file source resumes from its committed offsets (the seed file is not
    reprocessed). Parquet sink = exactly-once row counts across the restart."""
    from datetime import datetime, timedelta

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    op = (streaming_neardup_dedup if variant == "fine"
          else streaming_neardup_dedup_sharded)
    kw = {} if variant == "fine" else {"n_shards": 8}
    t0 = datetime(2026, 1, 1, 6, 0)
    P = 0x1111_2222_3333_4444
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema_str = "image_id string, phash long, ts timestamp"

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        q = (
            op(stream, **kw)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    _write_batch_file(spark, tmp_path, src, "seed", [("A1", P, t0)],
                      schema_str)
    run_once()  # query 1: seeds the (band, key) buckets, then stops
    _write_batch_file(spark, tmp_path, src, "dup",
                      [("A2", P ^ 1, t0 + timedelta(minutes=30))],
                      schema_str)
    run_once()  # query 2: fresh query object, same checkpoint

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8  # 2 images x 4 bands, each file processed once
    a2_refs = sorted((r["ref_id"] or "-") for r in rows
                     if r["image_id"] == "A2")
    # bit 0 flips A2's band-0 key (new bucket, no match); bands 1-3 hit
    # A1's bucket — possible ONLY if query 2 recovered query 1's state
    assert a2_refs == ["-", "A1", "A1", "A1"]
    assert all(r["ref_id"] is None for r in rows if r["image_id"] == "A1")


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["fine", "sharded"])
def test_streaming_dup_stats_restart_recovers_counts(spark, tmp_path,
                                                     variant):
    """Dup-stats twin of the restart test (update output mode, so the sink
    is a foreachBatch parquet append): a digest's running n_seen must
    continue across a stop + fresh-query restart from the same checkpoint."""
    from datetime import datetime, timedelta

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_dup_stats,
        streaming_dup_stats_sharded,
    )

    op = (streaming_dup_stats if variant == "fine"
          else streaming_dup_stats_sharded)
    kw = {} if variant == "fine" else {"n_shards": 4}
    t0 = datetime(2026, 1, 1, 6, 0)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema_str = "record_id string, digest string, ts timestamp"

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        q = (
            op(stream, **kw)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    _write_batch_file(spark, tmp_path, src, "seed", [("r1", "DUP", t0)],
                      schema_str)
    run_once()
    _write_batch_file(spark, tmp_path, src, "dup",
                      [("r2", "DUP", t0 + timedelta(minutes=30))],
                      schema_str)
    run_once()

    got = sorted((r["digest"], r["n_seen"], r["first_record_id"])
                 for r in spark.read.parquet(out).collect())
    # n_seen reaches 2 with first_record_id preserved ONLY if query 2
    # recovered query 1's per-digest state from the checkpoint
    assert got == [("DUP", 1, "r1"), ("DUP", 2, "r1")]


@pytest.mark.slow
def test_streaming_neardup_sharded_equality_boundary(spark, tmp_path):
    """Exact-equality twin of the horizon-boundary test: Spark fires an
    EventTimeTimeout only when timeout < watermark STRICTLY, so a bucket
    whose expiry EQUALS the watermark is still alive in the fine operator.
    A shard-mate arrival (same shard, different key) invokes the shard in
    precisely that equality batch; the prune must keep the untouched
    at-equality bucket or a later same-hash arrival re-seeds instead of
    matching (the off-by-one this test originally caught). The dup-stats
    shard shares the identical >= logic."""
    import os
    from datetime import datetime, timedelta

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    t0 = datetime(2026, 1, 1, 6, 0)
    P = 0x1111_2222_3333_4444  # band-0 key 0x4444 -> shard 0x4444 % 8 == 4

    def far(band0_key, k):
        """phash with a chosen band-0 key and far-away other bands."""
        h = band0_key
        for band in range(1, 4):
            h |= (0x7000 + 0x111 * k + 0x10 * band) << (16 * band)
        return h

    # batch script (watermark = horizon = 2h, all fillers at t0+4h so the
    # watermark PINS at t0+2h == A1's anchor t0 + horizon — exact equality):
    #  b1: A1 seeds bucket P (anchor t0)
    #  b2: far filler       -> wm after: t0+2h (equality reached)
    #  b3: shard-mate of A1's band-0 bucket (key 0x4454 % 8 == 4): the
    #      shard is invoked AT equality with A1's bucket untouched
    #  b4: A3 with A1's exact phash: fine matches in all 4 bands (timer
    #      t0+2h is NOT < wm t0+2h); sharded must too
    files = [
        [("A1", P, t0)],
        [("f1", far(0x0101, 2), t0 + timedelta(hours=4))],
        [("m1", far(0x4454, 1), t0 + timedelta(hours=4))],
        [("A3", P, t0 + timedelta(hours=4))],
    ]
    src = str(tmp_path / "eq_src")
    os.makedirs(src)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(
            rows, "image_id string, phash long, ts timestamp").coalesce(1)
        part_dir = str(tmp_path / f"_eq{i}")
        df.write.mode("overwrite").parquet(part_dir)
        part = [p for p in os.listdir(part_dir) if p.endswith(".parquet")][0]
        os.rename(f"{part_dir}/{part}", f"{src}/file_{i:03d}.parquet")
    schema = spark.read.parquet(src).schema

    results = {}
    for name, op in (("fine", streaming_neardup_dedup),
                     ("sharded", streaming_neardup_dedup_sharded)):
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        kw = {"n_shards": 8} if name == "sharded" else {}
        q = (
            op(stream, **kw)
            .writeStream.format("memory").queryName(f"eq_{name}")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        results[name] = sorted(
            (r["image_id"], r["band"], r["key"], r["ref_id"], r["hamming"],
             r["capped"])
            for r in spark.table(f"eq_{name}").collect()
        )
    assert results["sharded"] == results["fine"]
    # A3 matches A1 in every band — the at-equality bucket stayed alive
    a3_refs = [t[3] for t in results["fine"] if t[0] == "A3"]
    assert a3_refs == ["A1"] * 4


def test_duration_ms_accepts_what_withwatermark_accepts():
    """The horizon parser must accept the same delay-threshold strings
    Spark's withWatermark does: any case, every CalendarInterval time unit,
    compound forms — it used to KeyError on '2 HOURS' and '1 week'."""
    from deduplicator_spark.streaming.stateful import _duration_ms

    assert _duration_ms("2 hours") == 7_200_000
    assert _duration_ms("2 HOURS") == 7_200_000
    assert _duration_ms("1 week") == 604_800_000
    assert _duration_ms("1 hour 30 minutes") == 5_400_000
    assert _duration_ms("500 milliseconds") == 500
    assert _duration_ms("interval 10 minutes") == 600_000
    assert _duration_ms("1500 microseconds") == 1
    for bad in ("", "2", "2 fortnights"):
        with pytest.raises(ValueError):
            _duration_ms(bad)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["fine", "sharded"])
def test_streaming_neardup_restart_smaller_cap_still_matches(
        spark, tmp_path, variant):
    """Restarting a checkpointed query with a SMALLER bucket_cap must keep
    matching against every restored member: the state schema is unchanged
    so Spark allows the restart, and the match scratch must size itself to
    the restored state (it used to raise a numpy broadcast ValueError and
    kill the query every micro-batch)."""
    from datetime import datetime, timedelta

    from deduplicator_spark.streaming.probe import read_capture_stream
    from deduplicator_spark.streaming.stateful import (
        streaming_neardup_dedup,
        streaming_neardup_dedup_sharded,
    )

    op = (streaming_neardup_dedup if variant == "fine"
          else streaming_neardup_dedup_sharded)
    kw = {} if variant == "fine" else {"n_shards": 8}
    t0 = datetime(2026, 1, 1, 6, 0)
    P = 0x1111_2222_3333_4444
    # three members of the SAME band-0 bucket (low 16 bits equal) that are
    # mutually non-matching (pairwise Hamming > 3), so all three insert
    M1, M2, M3 = P, P ^ (0xF << 16), P ^ (0xF << 32)
    # probe: Hamming 1 from M3 (flip a band-1 bit so the band-0 key is
    # unchanged), Hamming > 3 from M1 and M2 -> must ref M3, the member a
    # cap-sized scratch would not even scan
    D = M3 ^ (1 << 16)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema_str = "image_id string, phash long, ts timestamp"

    def run_once(cap):
        schema = spark.read.parquet(src).schema
        stream = read_capture_stream(spark, src, schema,
                                     max_files_per_trigger=1)
        q = (
            op(stream, bucket_cap=cap, **kw)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    _write_batch_file(
        spark, tmp_path, src, "seed",
        [("M1", M1, t0), ("M2", M2, t0 + timedelta(minutes=1)),
         ("M3", M3, t0 + timedelta(minutes=2))], schema_str)
    run_once(cap=3)
    _write_batch_file(spark, tmp_path, src, "probe",
                      [("D", D, t0 + timedelta(minutes=3))], schema_str)
    run_once(cap=2)  # restart with a smaller cap over 3-member state

    rows = spark.read.parquet(out).collect()
    d0 = [r for r in rows if r["image_id"] == "D" and r["band"] == 0]
    assert len(d0) == 1
    assert d0[0]["ref_id"] == "M3" and d0[0]["hamming"] == 1
    assert not d0[0]["capped"]


def test_sharded_variants_are_the_default_entry_points():
    """VERDICT r4 item #3: the package-level streaming defaults must route
    to the SHARDED state layouts (5.3x/2.4x ingest at equal verdicts);
    the fine-grained forms stay available as the semantic reference."""
    from deduplicator_spark import streaming

    assert streaming.dup_stats is streaming.streaming_dup_stats_sharded
    assert streaming.neardup_dedup is streaming.streaming_neardup_dedup_sharded
    assert streaming.dup_stats is not streaming.streaming_dup_stats
