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
