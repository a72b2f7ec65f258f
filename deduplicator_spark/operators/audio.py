"""Audio near-duplicate detection: windowed subfingerprint alignment.

Completes the multimodal payload set (image tier: operators/simhash.py;
video tier: operators/video.py) with the audio analog: decode the opaque
binary column in Arrow batches (codecs.decode_audio — FAUD test container,
clearly-marked stub for real wav/mp3), compute Haitsma-Kalker-style
per-window subfingerprints (codecs.audio_subfingerprints), then find
near-duplicate PAIRS by exact-match joining subfingerprints across audios
and scoring each pair by its best OFFSET-CONSISTENT alignment — the same
clip shifted, trimmed, or re-mastered still lines up at one dominant window
offset, which unaligned frame-fraction scoring (the video tier's rule) would
under-count.

The scoring core (``near_audio_pairs_from_prints``) is factored off the
decode path so it runs on ANY (audio_id, win_idx, print) table — that layer
is what the DuckDB oracle proves (entry_queries ``near_audio_pairs``).

Reference analog: DeDuplicator.java:149-205 keys exact duplicate decisions
on a content digest; a subfingerprint is that digest at window granularity,
and the offset vote generalizes "same digest" to "same signal, shifted".

Scale notes (100 TB): the candidate join is an equi-join on the print value
— never all-pairs across audios. A near-silent window produces a print
shared by a huge fraction of the corpus (the audio analog of the black video
frame); prints whose GLOBAL occurrence exceeds ``print_cap`` are dropped
from matching entirely before the join, the same hot-posting drop rule as
the n-gram tier (entry_queries hot-shingle cap), applied IDENTICALLY in the
SQL oracle. The per-(pair, offset) vote is a groupBy with map-side partial
aggregation; the final best-offset pick is one window over the pair key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

AUDIO_PRINT_CAP = 64   # global-occurrence drop threshold for hot prints
AUDIO_MIN_SHARED = 0.5  # fraction of the sparser side's windows that must align


def audio_fingerprints(audios: DataFrame, id_col: str = "audio_id",
                       win: int = 1024, bands: int = 32) -> DataFrame:
    """(audio_id, bytes) -> one row per window: (audio_id, win_idx, print).
    Arrow-batched mapInPandas; everything numpy-vectorized per payload."""
    from ..codecs import audio_subfingerprints, decode_audio

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf["bytes"]):
                _, samples = decode_audio(bytes(payload))
                prints = audio_subfingerprints(samples, win, bands)
                rows.extend(
                    {id_col: aid, "win_idx": int(k), "print": int(p)}
                    for k, p in enumerate(prints))
            yield pd.DataFrame(rows, columns=[id_col, "win_idx", "print"])

    return audios.select(id_col, "bytes").mapInPandas(
        gen, schema=f"{id_col} string, win_idx int, print long")


def near_audio_pairs_from_prints(prints: DataFrame,
                                 min_shared_frac: float = AUDIO_MIN_SHARED,
                                 print_cap: int = AUDIO_PRINT_CAP,
                                 id_col: str = "audio_id") -> DataFrame:
    """Offset-consistent pair scoring over a (audio_id, win_idx, print)
    table: join on exact print value across audios, vote per (pair, offset =
    win_a - win_b), keep each pair's best offset (ties -> smallest offset),
    score = aligned-window count / min(window count of either side). Emits
    pairs with score >= min_shared_frac as (id_a, id_b, offset, n_matched,
    score). id ordering is lexicographic — zero-pad numeric ids."""
    # persisted: this frame feeds four consumers (window counts, the hot
    # list, and both join sides) — without it the decode UDF upstream of a
    # real fingerprint table would run once per consumer. Tiny (3 scalars
    # per window); Spark LRU-evicts after the caller's action.
    p = prints.select(F.col(id_col).alias("aid"), "win_idx", "print").persist()
    nwin = p.groupBy("aid").agg(F.count(F.lit(1)).cast("long").alias("n_win"))
    # hot-print drop: a print occurring > print_cap times corpus-wide (near
    # silence, test tones) would contribute O(df^2) join rows; drop it from
    # matching — mirrored exactly in the SQL oracle. The hot list is tiny by
    # construction (df > cap), so AQE turns this anti-join into a broadcast.
    hot = p.groupBy("print").agg(F.count(F.lit(1)).alias("pf")) \
        .filter(F.col("pf") > print_cap).select("print")
    p2 = p.join(hot, "print", "left_anti")
    a, b = p2.alias("a"), p2.alias("b")
    votes = (
        a.join(b, (F.col("a.print") == F.col("b.print"))
               & (F.col("a.aid") < F.col("b.aid")))
        .groupBy(F.col("a.aid").alias("id_a"), F.col("b.aid").alias("id_b"),
                 (F.col("a.win_idx") - F.col("b.win_idx")).alias("offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("n_matched").desc(), F.col("offset").asc())
    best = votes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        best
        .join(nwin.withColumnRenamed("aid", "id_a")
                  .withColumnRenamed("n_win", "n_a"), "id_a")
        .join(nwin.withColumnRenamed("aid", "id_b")
                  .withColumnRenamed("n_win", "n_b"), "id_b")
        .withColumn("score",
                    F.round(F.col("n_matched") / F.least("n_a", "n_b"), 6))
        .filter(F.col("score") >= min_shared_frac)
        .select("id_a", "id_b", F.col("offset").cast("long").alias("offset"),
                "n_matched", "score")
    )


def near_audio_pairs(audios: DataFrame, id_col: str = "audio_id",
                     min_shared_frac: float = AUDIO_MIN_SHARED,
                     print_cap: int = AUDIO_PRINT_CAP) -> DataFrame:
    """End-to-end audio tier: decode + fingerprint (Arrow UDF), then the
    oracle-proven alignment scorer."""
    return near_audio_pairs_from_prints(
        audio_fingerprints(audios, id_col), min_shared_frac, print_cap, id_col)
