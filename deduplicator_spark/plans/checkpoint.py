"""Stage-level checkpointing: resumable pipeline + per-partition lineage.

North-rule requirement: "resumable from Iceberg-snapshot checkpoints with
per-partition lineage and metrics tables". In production each stage commits
an Iceberg snapshot (``df.writeTo(tbl).createOrReplace()`` + snapshot tag)
and resume reads the tagged snapshot. This container has no Iceberg jars, so
the same contract is implemented on plain parquet with an atomic JSON
manifest per stage:

    <root>/<stage>/data/*.parquet      stage output (atomic via tmp+rename of
                                       the manifest, which is written last)
    <root>/<stage>/manifest.json       row count, schema, config fingerprint
    <root>/_lineage/<stage>/*.parquet  per-partition lineage (partition id,
                                       rows, bytes-ish) captured at write time

Resume rule: a stage re-runs unless its manifest exists AND its config
fingerprint matches the current DedupConfig — a changed shingle size or band
count silently invalidates every downstream checkpoint (SURVEY.md §7.4 hard
part #4: config parity must be frozen, so stale checkpoints must never leak
across configs).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig


def config_fingerprint(cfg: DedupConfig) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class StageStore:
    """Parquet-backed stage checkpoint store (Iceberg-snapshot stand-in)."""

    def __init__(self, spark: SparkSession, root: str,
                 cfg: DedupConfig = DEFAULT, run_id: str = "run") -> None:
        self.spark = spark
        self.root = root
        self.cfg = cfg
        self.run_id = run_id
        self.fingerprint = config_fingerprint(cfg)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def has(self, stage: str) -> bool:
        """True iff the stage committed under the SAME config fingerprint."""
        try:
            with open(self._manifest(stage)) as f:
                m = json.load(f)
            return m.get("config_fingerprint") == self.fingerprint
        except (OSError, ValueError):
            return False

    def write(self, stage: str, df: DataFrame) -> DataFrame:
        """Commit a stage: data parquet, per-partition lineage, manifest last
        (the manifest's presence IS the commit — a kill mid-write leaves no
        manifest and the stage re-runs cleanly on resume)."""
        d = self._dir(stage)
        if os.path.exists(d):
            shutil.rmtree(d)
        data = os.path.join(d, "data")
        df.write.mode("overwrite").parquet(data)

        out = self.spark.read.parquet(data)
        lineage = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows",
            )
        )
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.root, "_lineage", stage)
        )
        n = out.count()
        manifest = {
            "stage": stage,
            "run_id": self.run_id,
            "rows": n,
            "schema": out.schema.simpleString(),
            "config_fingerprint": self.fingerprint,
        }
        tmp = self._manifest(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest(stage))
        return out

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def lineage(self) -> DataFrame:
        return self.spark.read.option("basePath", os.path.join(self.root, "_lineage")) \
            .parquet(os.path.join(self.root, "_lineage", "*"))


def run_pipeline_resumable(
    images: DataFrame,
    root: str,
    cfg: DedupConfig = DEFAULT,
    tiers: tuple[str, ...] = ("exact", "near_image", "near_caption", "containment"),
    verify_pixels: bool = True,
    run_id: str = "run",
    stop_after: str | None = None,
):
    """Checkpointed variant of plans.pipeline.run_pipeline.

    Stages: edges -> clusters -> verdicts -> metrics. Each commits to the
    StageStore; on restart, committed stages (same config fingerprint) are
    read back instead of recomputed. ``stop_after`` simulates a mid-job kill
    for resume tests (returns None after committing that stage).
    """
    from ..operators.candidates import canonical_pairs
    from ..operators.components import connected_components
    from .pipeline import DedupResult, candidate_edges, verdicts_from_clusters

    spark = images.sparkSession
    store = StageStore(spark, root, cfg, run_id)

    if store.has("edges"):
        edges = store.read("edges")
    else:
        edges = store.write("edges", candidate_edges(images, cfg, tiers, verify_pixels))
    if stop_after == "edges":
        return None

    if store.has("clusters"):
        clusters = store.read("clusters")
    else:
        clusters = store.write(
            "clusters",
            connected_components(canonical_pairs(edges),
                                 nodes=images.select("image_id"), cfg=cfg),
        )
    if stop_after == "clusters":
        return None

    if store.has("verdicts"):
        verdicts = store.read("verdicts")
    else:
        verdicts = store.write("verdicts", verdicts_from_clusters(images, clusters, edges))
    if stop_after == "verdicts":
        return None

    if store.has("metrics"):
        metrics = store.read("metrics")
    else:
        m = [("input", "rows", float(images.count())),
             ("candidates", "verified_pairs", float(edges.count()))]
        for row in edges.groupBy("tier").agg(F.count("*").alias("n")).collect():
            m.append(("candidates", f"pairs_{row['tier']}", float(row["n"])))
        for row in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect():
            m.append(("verdicts", row["verdict"], float(row["n"])))
        metrics = store.write(
            "metrics",
            spark.createDataFrame(
                [(run_id, s, k, v) for s, k, v in m],
                "run_id string, stage string, metric string, value double",
            ),
        )

    return DedupResult(pairs=edges, clusters=clusters, verdicts=verdicts, metrics=metrics)
