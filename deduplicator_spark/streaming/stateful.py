"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps crawl-wide AtomicLong statistics (DeDuplicator.java:
54-94) and a frozen index; its streaming generalization needs PER-KEY
running state that Spark's built-in aggregations don't express: for every
digest, which capture was FIRST (the would-be index entry) and how many
revisits followed (the dup counter), updated incrementally as micro-batches
arrive. That is exactly the applyInPandasWithState shape:

    groupBy(digest) -> update(key, batches, state) -> emit running stats

State per key is a flat tuple (count, first_record_id, first_ts_epoch);
eviction is the caller's watermark horizon (EventTimeTimeout), so a
100 TB/day stream holds only the horizon's digests in the state store —
the same bound as streaming_exact_dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "digest string, n_seen long, n_dups long, "
    "first_record_id string, first_ts timestamp"
)
STATE_SCHEMA = "n long, first_id string, first_ts long"

_US = 1_000_000  # state timestamps are epoch-microseconds (long)


def _update_digest_stats(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    (digest,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, first_id, first_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        for ts, rid in zip(pdf["ts"], pdf["record_id"]):
            us = int(ts.value // 1000)  # pandas Timestamp ns -> us
            # deterministic first-capture rule: earliest ts, record_id
            # tie-break (the reference's scan-order determinism, O10)
            if first_id is None or (us, rid) < (first_us, first_id):
                first_id, first_us = rid, us
            n += 1
    state.update((n, first_id, first_us))
    yield pd.DataFrame([{
        "digest": digest,
        "n_seen": n,
        "n_dups": max(n - 1, 0),
        "first_record_id": first_id,
        "first_ts": pd.Timestamp(first_us * 1000),
    }])


def streaming_dup_stats(captures: DataFrame, watermark: str = "2 hours",
                        ts_col: str = "ts") -> DataFrame:
    """(digest, n_seen, n_dups, first_record_id, first_ts), re-emitted per
    micro-batch with running totals — the incremental form of the per-class
    duplicate counters (A1/A2), keyed by digest."""
    from pyspark.sql import functions as F

    captures = captures.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        captures.withWatermark(ts_col, watermark)
        .groupBy("digest")
        .applyInPandasWithState(
            _update_digest_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------------------------------
# In-stream NEAR-dup dedup: band-keyed state, no static index
# --------------------------------------------------------------------------

NEARDUP_OUTPUT_SCHEMA = ("image_id string, ts timestamp, band int, key long, "
                         "ref_id string, hamming int")
NEARDUP_STATE_SCHEMA = "ids array<string>, hashes array<long>"


def _update_band_bucket(max_hamming: int, bucket_cap: int):
    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        band, bkey = key
        if state.hasTimedOut:
            state.remove()
            return
        ids, hashes = state.get if state.exists else ((), ())
        ids, hashes = list(ids), list(hashes)
        out = []
        frames = [p for p in pdfs if len(p)]
        if frames:
            # deterministic replay order inside the micro-batch (O10)
            pdf = pd.concat(frames).sort_values(["ts", "image_id"])
            for iid, ph, ts in zip(pdf["image_id"], pdf["phash"], pdf["ts"]):
                ref = ham = None
                for mid, mh in zip(ids, hashes):
                    h = bin(int(ph) ^ mh).count("1")
                    if h <= max_hamming:
                        ref, ham = mid, h  # first-inserted agreeing member
                        break
                if ref is None and len(ids) < bucket_cap:
                    ids.append(iid)
                    hashes.append(int(ph))
                out.append((iid, ts, band, bkey, ref, ham))
        state.update((ids, hashes))
        yield pd.DataFrame(
            out, columns=["image_id", "ts", "band", "key", "ref_id", "hamming"])

    return update


def streaming_neardup_dedup(images: DataFrame, cfg=None, bucket_cap: int = 64,
                            watermark: str = "2 hours",
                            ts_col: str = "ts") -> DataFrame:
    """In-stream NEAR-duplicate detection with NO static index: each arriving
    image is matched against images seen EARLIER IN THE SAME STREAM.

    The stateless streaming tiers (streaming/probe.py, caption_probe.py)
    join the stream against a frozen index — the reference's crawl-time
    shape. This operator covers the other production case (a firehose with
    no prior index: dedup-on-ingest for a training-data feed): the 64-bit
    pHash is split into the same 4 x 16-bit pigeonhole bands as the batch
    tier, the stream is keyed by (band, key), and applyInPandasWithState
    keeps each bucket's first-seen members (ids + hashes, deterministically
    capped at ``bucket_cap``). An arriving image emits one row per band:
    ref_id = the first-inserted member within Hamming <= max_hamming (NULL
    -> it becomes a member itself). A duplicate is any image with >= 1
    agreeing band (recall-1 for Hamming <= bands-1 by pigeonhole, same
    guarantee as the batch tier).

    Scale: state per (band, key) bucket is <= bucket_cap (id, hash) pairs,
    and the number of live buckets is bounded by the watermark horizon's
    distinct band keys — the same state bound as streaming_exact_dedup.
    The per-group inner loop is a bounded scan of <= bucket_cap stored
    hashes per arriving row, Arrow-batched per micro-batch.
    """
    from ..config import DEFAULT
    from ..functions.hashing import phash_band_keys
    from pyspark.sql import functions as F

    cfg = cfg or DEFAULT
    images = images.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    banded = images.select(
        "image_id", "phash", F.col(ts_col).alias("ts"),
        F.explode(phash_band_keys(F.col("phash"), cfg)).alias("bk"),
    ).select("image_id", "phash", "ts",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return (
        banded.withWatermark("ts", watermark)
        .groupBy("band", "key")
        .applyInPandasWithState(
            _update_band_bucket(cfg.phash_max_hamming, bucket_cap),
            outputStructType=NEARDUP_OUTPUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
