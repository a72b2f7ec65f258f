"""Streaming embedding similarity probe: stream-static LSH-bucketed cosine.

The embedding-space analog of the streaming near-image probe
(streaming/probe.py::probe_phash_stream): the reference probes each arriving
record against a frozen index (DeDuplicator.java:149-192); here the arriving
record is an embedding row and the frozen index is the corpus bucketed by
its hyperplane-LSH signature — the exact machinery of the batch ANN tier
(operators/ann.py::with_lsh_bucket / multiprobe_buckets / _cos), re-used on
a stream.

Statelessness argument (why no dedup state is needed, unlike the banded
pHash probe): each INDEX vector carries exactly ONE bucket key (its own
signature) and the PROBE side explodes into DISTINCT multiprobe variants
(XOR masks are distinct, so variant keys are distinct) — a (probe, index)
pair can therefore agree on at most one join key, and the stream-static
equi-join structurally emits at most one row per pair. No window, no
distinct, no state store.

Emits verified hits only (cos >= threshold). Per-probe TOP-K needs a
ranking window that streams cannot run statelessly — rank batch-side over
the emitted hits, or raise the threshold. Novelty ('no neighbor above t')
is a negative over all probed buckets — reconcile batch-side by anti-join
on the emitted probe ids, exactly as probe_phash_stream documents.

At cluster scale write the static side bucketed by `bucket`
(plans/bucketed.py) so each micro-batch shuffles only the probe side; the
per-bucket cap (deterministic smallest-ids-kept, operators/candidates.
cap_per_key) bounds the fan-out of boilerplate mega-buckets exactly as in
the batch tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ann import (
    ANN_BUCKET_CAP,
    ANN_PLANES,
    ANN_SEED,
    _cos,
    multiprobe_buckets,
    with_lsh_bucket,
)
from ..operators.candidates import cap_per_key


def lsh_index_for_stream(emb_index: DataFrame, dim: int,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         n_planes: int = ANN_PLANES,
                         bucket_cap: int = ANN_BUCKET_CAP,
                         seed: int = ANN_SEED) -> DataFrame:
    """Static side: one signature bucket per index vector (idx_id, idx_v,
    bucket), mega-buckets capped deterministically — the 'index
    pre-organized by key' Lucene analog for embeddings."""
    base = emb_index.select(
        F.col(id_col).alias("idx_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("idx_v"),
    )
    bucketed = with_lsh_bucket(base, dim, vec_col="idx_v",
                               n_planes=n_planes, seed=seed)
    return cap_per_key(bucketed, ["bucket"], [F.col("idx_id").asc()], bucket_cap)


def probe_ann_stream(probes: DataFrame, static_buckets: DataFrame, dim: int,
                     threshold: float = 0.95,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     n_planes: int = ANN_PLANES, probe_radius: int = 1,
                     seed: int = ANN_SEED) -> DataFrame:
    """Streaming ANN hits: arriving (id, embedding) rows signature-hashed in
    the SAME Arrow pass as the batch tier, exploded into Hamming<=radius
    multiprobe bucket keys, equi-joined against the static bucketed index,
    exact-cosine verified JVM-side. Returns (query_id, neighbor_id, cos)
    with exactly one row per verified (probe, index) pair."""
    q = with_lsh_bucket(
        probes.select(
            F.col(id_col).alias("query_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("qv"),
        ),
        dim, vec_col="qv", n_planes=n_planes, seed=seed,
    ).select(
        "query_id", "qv",
        F.explode(multiprobe_buckets(F.col("bucket"), n_planes,
                                     probe_radius)).alias("bucket"),
    )
    return (
        q.join(static_buckets, "bucket")
        .filter(F.col("query_id") != F.col("idx_id"))
        .withColumn("cos", _cos("qv", "idx_v"))
        .filter(F.col("cos") >= threshold)
        .select("query_id", F.col("idx_id").alias("neighbor_id"),
                F.round("cos", 6).alias("cos"))
    )
