"""Streaming audio fingerprint probe: stream-static subfingerprint join.

The audio analog of the streaming near-image probe (streaming/probe.py) and
ANN probe (streaming/ann_probe.py): the reference probes each arriving
record against a frozen index (DeDuplicator.java:149-192); here the
arriving record is one WINDOW of an arriving clip's fingerprint
(audio_id, win_idx, print — operators/audio.audio_fingerprints runs
unchanged on a stream, mapInPandas is streaming-capable) and the frozen
index is a corpus print table with hot prints dropped under the batch
tier's exact cap rule.

Statelessness argument: each row on either side carries exactly ONE print,
so a (probe window, index window) pair can agree on at most one join key —
the equi-join structurally emits at most one row per window pair. No
window, no distinct, no state store.

What streams and what doesn't: the per-window HIT (probe_id, idx_id,
offset) streams; the offset-consistent pair VOTE (near_audio_pairs'
best-offset scoring) is an aggregation over all of a pair's hits — run it
batch-side over the emitted hits, or as a watermarked streaming groupBy on
(probe_id, idx_id, offset) downstream; both consume exactly the rows this
probe emits.

At cluster scale write the static side bucketed by `print`
(plans/bucketed.py) so each micro-batch shuffles only the arriving windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.audio import AUDIO_PRINT_CAP


def print_index_for_stream(prints: DataFrame,
                           print_cap: int = AUDIO_PRINT_CAP,
                           id_col: str = "audio_id") -> DataFrame:
    """Static side: (idx_id, idx_win, print) with prints whose global
    occurrence exceeds print_cap dropped entirely — the same hot-print rule
    (and the same recall note) as the batch tier."""
    p = prints.select(F.col(id_col).alias("idx_id"),
                      F.col("win_idx").alias("idx_win"), "print")
    hot = (p.groupBy("print").agg(F.count(F.lit(1)).alias("pf"))
           .filter(F.col("pf") > print_cap).select("print"))
    return p.join(hot, "print", "left_anti")


def probe_audio_stream(stream_prints: DataFrame,
                       static_prints: DataFrame,
                       id_col: str = "audio_id") -> DataFrame:
    """Streaming window hits: arriving (audio_id, win_idx, print) rows
    equi-joined on the print value against the static index. Returns
    (probe_id, idx_id, probe_win, idx_win, offset) — one row per matching
    window pair; offset = probe_win - idx_win, constant across a pair's
    rows exactly when the clips align at one shift."""
    s = stream_prints.select(F.col(id_col).alias("probe_id"),
                             F.col("win_idx").alias("probe_win"), "print")
    return (
        s.join(static_prints, "print")
        .filter(F.col("probe_id") != F.col("idx_id"))
        .select("probe_id", "idx_id", "probe_win", "idx_win",
                (F.col("probe_win") - F.col("idx_win")).alias("offset"))
    )
