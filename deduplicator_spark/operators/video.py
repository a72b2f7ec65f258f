"""Video near-duplicate detection: frame-sampled perceptual matching.

Composes the multimodal plumbing (operators/media.sample_video_frames) into
a real dedup tier: sample every Nth frame, band each frame's 64-bit pHash
exactly like the image tier (pigeonhole recall-1 for Hamming <= 3), match
frames across videos via the (band, key) equi-join, then score a video PAIR
by the fraction of the sparser video's sampled frames that found a
near-identical partner. Everything after the decode UDF is Column algebra;
the frame join is equi-join shaped (never all-pairs across videos).

The scoring core (``near_video_pairs_from_frames``) is factored out of the
decode path so it runs on ANY (video_id, frame_idx, frame_phash) frame
table — that is the layer the DuckDB oracle proves (entry_queries
``near_video_pairs``: the banded join equals the exact Hamming self-join).

Scale notes: frames explode the corpus by ~frames/every_n per video, but
the join key space (band, 16-bit key) keeps candidates to colliding frames
only; a black/intro frame shared by millions of videos is a hot key —
bounded by the same per-key posting cap strategy as the containment tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig
from ..functions.hashing import hamming64, phash_band_keys
from .candidates import cap_per_key


def video_frame_phashes(videos: DataFrame, every_n: int = 2,
                        id_col: str = "video_id") -> DataFrame:
    """(video_id, frame_idx, frame_phash) via the Arrow frame-sample UDF."""
    from .media import sample_video_frames

    return sample_video_frames(videos, every_n, id_col).select(
        id_col, "frame_idx", "frame_phash")


def near_video_pairs_from_frames(frames: DataFrame, cfg: DedupConfig = DEFAULT,
                                 min_shared_frac: float = 0.5,
                                 posting_cap: int = 4096,
                                 id_col: str = "video_id") -> DataFrame:
    """Score video pairs from a (video_id, frame_idx, frame_phash) table.

    A pair qualifies when >= min_shared_frac of the SPARSER video's sampled
    frames have a partner frame within Hamming <= cfg.phash_max_hamming.
    Matched frames are counted distinct PER SIDE (n_a of id_a's frames,
    n_b of id_b's), and the reported fraction is the one of the side with
    fewer sampled frames — so one hot frame of a short video matched by many
    frames of a long one cannot overshoot, and the score is always <= 1.
    """
    frames = frames.persist()
    n_frames = frames.groupBy(id_col).agg(F.count("*").alias("nf"))

    banded = frames.select(
        id_col, "frame_idx", "frame_phash",
        F.explode(phash_band_keys(F.col("frame_phash"), cfg)).alias("bk"),
    ).select(id_col, "frame_idx", "frame_phash",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # hot-key cap (black frames / intro cards shared across huge numbers of
    # videos): deterministic smallest-(video, frame) kept per (band, key) —
    # applied to the TARGET side only. The probe side stays uncapped (the
    # containment/ANN strategy): a video whose frames all land beyond the
    # cap still probes INTO the retained postings, so no video is exempt
    # from matching; only target postings beyond the cap are sacrificed.
    target = cap_per_key(banded, ["band", "key"],
                         [F.col(id_col).asc(), F.col("frame_idx").asc()],
                         posting_cap)

    a = banded.select(F.col(id_col).alias("id_a"), F.col("frame_idx").alias("fa"),
                      F.col("frame_phash").alias("pa"), "band", "key")
    b = target.select(F.col(id_col).alias("id_b"), F.col("frame_idx").alias("fb"),
                      F.col("frame_phash").alias("pb"), "band", "key")
    swap = F.col("id_a") > F.col("id_b")
    frame_matches = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(hamming64(F.col("pa"), F.col("pb")) <= cfg.phash_max_hamming)
        # canonicalize AFTER the asymmetric join (probe x capped target
        # finds each orientation at least once; distinct folds repeats)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.when(swap, F.col("fb")).otherwise(F.col("fa")).alias("fa"),
            F.when(swap, F.col("fa")).otherwise(F.col("fb")).alias("fb"),
        )
        .distinct()  # one hit per (pair, frame_a, frame_b): bands can collide
    )
    scored = (
        frame_matches.groupBy("id_a", "id_b")
        .agg(F.countDistinct("fa").alias("n_a"),
             F.countDistinct("fb").alias("n_b"))
        .join(n_frames.select(F.col(id_col).alias("id_a"), F.col("nf").alias("nf_a")), "id_a")
        .join(n_frames.select(F.col(id_col).alias("id_b"), F.col("nf").alias("nf_b")), "id_b")
        .withColumn("score",
                    F.when(F.col("nf_a") <= F.col("nf_b"),
                           F.col("n_a") / F.col("nf_a"))
                    .otherwise(F.col("n_b") / F.col("nf_b")))
        .filter(F.col("score") >= min_shared_frac)
    )
    # frames stays persisted until the caller's action evaluates the result
    # (tiny: 3 scalars per sampled frame); Spark LRU-evicts it afterwards
    return scored.select("id_a", "id_b", F.lit("near_video").alias("tier"),
                         F.col("score").cast("double").alias("score"))


def near_video_pairs(videos: DataFrame, cfg: DedupConfig = DEFAULT,
                     every_n: int = 2, min_shared_frac: float = 0.5,
                     posting_cap: int = 4096,
                     id_col: str = "video_id") -> DataFrame:
    """(id_a, id_b, tier='near_video', score): decode + sample frames, then
    run the frame-table scoring core."""
    return near_video_pairs_from_frames(
        video_frame_phashes(videos, every_n, id_col), cfg,
        min_shared_frac, posting_cap, id_col)
