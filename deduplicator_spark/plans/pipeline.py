"""End-to-end dedup pipeline: tiers -> verify -> cluster -> verdicts + metrics.

The distributed re-expression of the reference's per-URI processing chain
(DeDuplicator.innerProcessResult, DeDuplicator.java:149-192): where the
reference probes one record at a time against a frozen Lucene index, this runs
the whole corpus through four similarity tiers as set-oriented jobs, then
assigns every row a verdict + refers-to lineage in one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig
from ..operators.candidates import canonical_pairs
from ..operators.components import connected_components
from ..operators.containment import containment_pairs
from ..operators.exact import exact_pairs
from ..operators.minhash import near_caption_pairs
from ..operators.simhash import near_image_pairs
from ..operators.verify import verify_image_pairs

TIER_PRIORITY = {"exact": 1, "near_image": 2, "near_caption": 3, "containment": 4}


@dataclass
class DedupResult:
    pairs: DataFrame      # verified edges (id_a, id_b, tier, score)
    clusters: DataFrame   # (image_id, cluster_id)
    verdicts: DataFrame   # VERDICTS_SCHEMA
    metrics: DataFrame    # (stage, metric, value)


def candidate_edges(images: DataFrame, cfg: DedupConfig = DEFAULT,
                    tiers: tuple[str, ...] = ("exact", "near_image",
                                              "near_caption", "containment"),
                    verify_pixels: bool = True) -> DataFrame:
    """Union of verified duplicate edges across the enabled tiers."""
    parts = []
    prepared = None
    if "near_caption" in tiers or "containment" in tiers:
        # one Arrow pass over captions shared by tiers 2+3 (shingle hashes,
        # token counts, LSH band keys); cached — a few longs per row
        from ..operators.minhash import prepared_features

        prepared = prepared_features(images, cfg).persist()
    if "exact" in tiers:
        parts.append(exact_pairs(images))
    if "near_image" in tiers:
        ni = near_image_pairs(images, cfg)
        if verify_pixels:
            ni = verify_image_pairs(ni, images, cfg)
        parts.append(ni)
    if "near_caption" in tiers:
        parts.append(near_caption_pairs(images, cfg, prepared=prepared))
    if "containment" in tiers:
        parts.append(containment_pairs(images, cfg, prepared=prepared))
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    # one edge per pair: keep the highest-priority tier (exact beats near_*)
    prio = F.coalesce(
        *[F.when(F.col("tier") == t, F.lit(p)) for t, p in TIER_PRIORITY.items()]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a", "id_b").orderBy(prio.asc(), F.col("score").desc())
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def verdicts_from_clusters(images: DataFrame, clusters: DataFrame,
                           edges: DataFrame) -> DataFrame:
    """Reference verdict semantics, set-oriented:

    - cluster representative (min id) = the 'original capture' -> novel
      (deterministic total order replacing the reference's scan order, O10)
    - every other member -> duplicate, refers_to = representative (the K3
      revisit-profile lineage, LuceneIndexSearcher.java:298-310)
    - dup_class = highest-priority tier among the member's incident edges
      (the 3-way classification of DeDuplicator.java:194-205 generalized to
      4 tiers).
    """
    prio = F.coalesce(
        *[F.when(F.col("tier") == t, F.lit(p)) for t, p in TIER_PRIORITY.items()]
    )
    incident = (
        edges.select(F.col("id_a").alias("image_id"), "tier")
        .unionByName(edges.select(F.col("id_b").alias("image_id"), "tier"))
        .withColumn("_p", prio)
        .groupBy("image_id")
        .agg(F.min_by("tier", F.col("_p")).alias("dup_class"))
    )
    return (
        images.select("image_id")
        .join(clusters, "image_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("image_id")))
        .join(incident, "image_id", "left")
        .select(
            "image_id",
            F.when(F.col("image_id") == F.col("cluster_id"), F.lit("novel"))
            .otherwise(F.lit("duplicate"))
            .alias("verdict"),
            F.when(F.col("image_id") != F.col("cluster_id"), F.col("dup_class")).alias("dup_class"),
            "cluster_id",
            F.when(F.col("image_id") != F.col("cluster_id"), F.col("cluster_id")).alias("refers_to_id"),
        )
    )


def quarantine_ids(images: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """F9/P9 analog: rows whose payload doesn't decode, or whose stored phash
    is irreconcilable with the pixel-recomputed one, are quarantined instead
    of aborting the job (the reference hard-fails on digest mismatch,
    DeDuplicator.java:169-172, and on URL sanity, IndexBuilder.java:180-185;
    at web scale corrupt records are routine, so they route to a table).
    Full-corpus decode pass in bounded Arrow batches; output is the (tiny)
    bad-id set, broadcast-anti-joined against the input."""
    from ..operators.media import image_features

    feats = image_features(images, safe=True).select(
        "image_id", "decode_ok", "phash_recomputed"
    )
    joined = images.select("image_id", "phash").join(feats, "image_id")
    return joined.filter(
        (~F.col("decode_ok"))
        | (F.bit_count(F.col("phash").bitwiseXOR(F.col("phash_recomputed")))
           > cfg.phash_validate_max_hamming)
    ).select("image_id")


def run_pipeline(images: DataFrame, cfg: DedupConfig = DEFAULT,
                 tiers: tuple[str, ...] = ("exact", "near_image",
                                           "near_caption", "containment"),
                 verify_pixels: bool = True,
                 run_id: str = "run",
                 persist_input: bool = True,
                 validate_payloads: bool = True) -> DedupResult:
    """persist_input=True caches the full input (right for synthesized or
    expensive-to-recompute inputs at sandbox scale). For a parquet/Iceberg
    source pass False: each tier then scans only its pruned columns from
    storage (bytes are read exactly twice — exact digest + PSNR verify) —
    you cannot cache 100 TB of payload bytes, and the narrow caption/phash
    projections the other tiers need are cached separately anyway."""
    if persist_input:
        images = images.persist()
    n_quarantined = 0
    if validate_payloads:
        bad = quarantine_ids(images, cfg).persist()
        n_quarantined = bad.count()
        if n_quarantined:
            images = images.join(F.broadcast(bad), "image_id", "left_anti")
    edges = candidate_edges(images, cfg, tiers, verify_pixels).persist()
    clusters = connected_components(
        canonical_pairs(edges), nodes=images.select("image_id"), cfg=cfg
    )
    verdicts = verdicts_from_clusters(images, clusters, edges)

    spark = images.sparkSession
    tier_counts = {r["tier"]: r["n"] for r in
                   edges.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    m = [
        ("input", "rows", float(images.count())),  # cached input: trivial job
        ("input", "quarantined", float(n_quarantined)),
        ("candidates", "verified_pairs", float(sum(tier_counts.values()))),
    ]
    vstats = {r["verdict"]: r["n"] for r in
              verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    m += [("verdicts", k, float(v)) for k, v in sorted(vstats.items())]
    m += [("candidates", f"pairs_{t}", float(n)) for t, n in sorted(tier_counts.items())]
    metrics = spark.createDataFrame(
        [(run_id, s, k, v) for s, k, v in m],
        "run_id string, stage string, metric string, value double",
    )
    return DedupResult(pairs=edges, clusters=clusters, verdicts=verdicts, metrics=metrics)
