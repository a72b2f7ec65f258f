"""Streaming winnow probe: the crawl-time probe path (DeDuplicator.java:
149-192, stream-vs-frozen-index) at PASSAGE granularity — completing the
streaming matrix next to the exact-digest probe (streaming/probe.py), the
near-image probe (probe_phash_stream), the caption probe (caption_probe.py)
and the ANN probe (ann_probe.py).

STATELESS stream-static join, so a firehose carries no state store:

  * each arriving document computes its distinct winnowing fingerprint
    ARRAY row-locally (operators/winnow.fp_array_expr — pure Column
    algebra, no shuffle on the stream side), explodes it, and equi-joins
    the static df-capped fingerprint postings;
  * a probe sharing s fingerprints with an indexed doc produces s join
    rows, and streams cannot window them away without state — so dedup is
    stateless, the same trick as the caption probe's first-agreeing-band:
    both sides carry their fingerprint arrays, every row computes the
    pair's shared set from them alone, and survives only if its own join
    fingerprint IS the minimum shared one — exactly one row per
    (probe, indexed doc) pair, deterministic;
  * the batch lifecycle's score gate applies per row:
    |shared| / |probe fingerprints| >= min_score.

The carried index array is the doc's CAPPED fingerprint set, so the shared
count equals the batch probe's (plans/winnow_index.probe_winnow counts on
capped postings). Emits HITS only (one 'overlap' row per pair): top-1 per
probe and novelty are negatives over the whole index that no stateless
per-row operator can decide — the batch probe reconciles them; see
probe_phash_stream for the same argument on images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.winnow import (
    capped_postings,
    winnow_fingerprints,
    winnow_fp_arrays,
)


def winnow_index_for_stream(index_docs: DataFrame, k: int = 8, w: int = 9,
                            df_cap: int = 16,
                            id_col: str = "doc_id",
                            text_col: str = "text"
                            ) -> tuple[DataFrame, DataFrame]:
    """Static side, TWO linear frames: df-capped fingerprint postings
    (fp, idx_id) and per-doc capped fingerprint arrays (idx_id, fps_i).
    Kept separate so the stored index is linear in fingerprint count — a
    single frame carrying each doc's array on every posting row would be
    QUADRATIC in per-doc fingerprints (a 2k-fingerprint doc would store
    4M longs); the probe join attaches the array once per matched pair
    instead. PERSIST (or write out) both frames before wiring them into a
    stream: the static side of a stream-static join re-evaluates every
    micro-batch, so an unmaterialized plan re-fingerprints the whole index
    corpus per trigger. At cluster scale store the postings bucketed by fp
    (plans/bucketed.py) so each micro-batch shuffles only the probe side."""
    fp = (winnow_fingerprints(index_docs, k, w, id_col, text_col)
          .select(F.col("id").alias("idx_id"), "fp").distinct())
    post = capped_postings(fp, df_cap)
    arrays = post.groupBy("idx_id").agg(
        F.sort_array(F.collect_set("fp")).alias("fps_i"))
    return post, arrays


def probe_winnow_stream(docs: DataFrame, index: tuple[DataFrame, DataFrame],
                        k: int = 8, w: int = 9,
                        min_score: float = 0.5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Probe a stream of (id, text) rows against winnow_index_for_stream's
    (postings, arrays) static frames. Returns one row per verified hit:
    (probe_id, verdict='overlap', refers_to, shared, n_probe, score)."""
    post, arrays = index
    p = (winnow_fp_arrays(docs, k, w, id_col, text_col)
         .select(F.col("id").alias("probe_id"),
                 F.col("fps").alias("fps_p"))
         .withColumn("fp", F.explode("fps_p")))
    j = p.join(post, "fp").join(arrays, "idx_id")
    shared_set = F.array_intersect("fps_p", "fps_i")
    return (
        j.withColumn("_shared_set", shared_set)
        .withColumn("shared", F.size("_shared_set"))
        .withColumn("n_probe", F.size("fps_p"))
        .withColumn("score", F.col("shared") / F.col("n_probe"))
        # one row per (probe, idx) pair: keep only the row whose join
        # fingerprint is the pair's minimum shared fingerprint
        .filter((F.col("fp") == F.array_min("_shared_set"))
                & (F.col("score") >= min_score))
        .select("probe_id", F.lit("overlap").alias("verdict"),
                F.col("idx_id").alias("refers_to"),
                F.col("shared").cast("long").alias("shared"),
                F.col("n_probe").cast("long").alias("n_probe"),
                F.round("score", 6).alias("score"))
    )
