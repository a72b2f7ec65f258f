"""Winnowing fingerprint index + probe lifecycle — the reference's two-job
workflow (IndexingLauncher builds once, SURVEY §3.1; the DeDuplicator
processor probes each capture against it, §3.2 / DeDuplicator.java:149-192)
applied at PASSAGE granularity, completing the lifecycle matrix: crawl
records (plans/index_build + plans/probe), images (plans/image_index),
captions (plans/caption_index), passages (here).

Probe semantics per new document:
  1. shared winnowing fingerprints with an indexed doc, containment score
     (shared / probe's fingerprint count) >= min_score
        -> verdict 'overlap', refers_to = top-1 by (score desc, shared
           desc, index id asc) — deterministic, the reference's top-1
           preference rule (W1, LuceneIndexSearcher.java:285-296)
  2. else -> verdict 'novel'

Scale shape: the index stores each document's DISTINCT selected
fingerprints (~2n/(w+1) postings per doc, the winnowing density bound);
hot fingerprints shared by more than df_cap indexed docs are dropped from
the postings — the same bounded-join rule as every other tier, because one
boilerplate passage indexed a million times must not fan every probe out a
million ways. The probe join is a plain fp equi-join; per-probe aggregation
is one groupBy + one top-1 window on the probe key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.winnow import capped_postings, winnow_fingerprints


def build_winnow_index(docs: DataFrame, k: int = 8, w: int = 9,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, fp) — distinct winnowing fingerprints per indexed document."""
    return (winnow_fingerprints(docs, k, w, id_col, text_col)
            .select("id", "fp").distinct())


def probe_and_extend_winnow(probes: DataFrame, index: DataFrame,
                            k: int = 8, w: int = 9,
                            df_cap: int = 16, min_score: float = 0.5,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            probe_fps: DataFrame | None = None
                            ) -> tuple[DataFrame, DataFrame]:
    """APPEND indexing mode (reference K1: IndexingLauncher CREATE vs
    APPEND, IndexBuilder.java:94-104) at passage granularity: probe against
    the CURRENT index, then append the NOVEL probes' fingerprints so the
    next increment can resolve against them. Returns (verdicts,
    extended_index).

    ``probe_fps`` (probe_id, fp, distinct) lets a caller that fingerprinted
    a SUPERSET of the probes once (the chained-increments query) share that
    single pass — pass a slice per increment and manage its persistence at
    the call site.  When omitted, the pass runs (and persists) here; that
    persist lives until Spark's LRU evicts it — callers that chain many
    invocations in one session should supply probe_fps instead."""
    if probe_fps is not None:
        pf = probe_fps
    else:
        # ONE fingerprint pass serves both the probe and the novel append
        pf = (winnow_fingerprints(probes, k, w, id_col, text_col)
              .select(F.col("id").alias("probe_id"), "fp")
              .distinct().persist())
    v = probe_winnow(probes, index, k, w, df_cap, min_score,
                     id_col, text_col, probe_fps=pf)
    # Novelty for the APPEND does not need the ranked verdict — a probe is
    # novel iff NO indexed doc covers >= min_score of its fingerprints.
    # Deriving it as an anti-join keeps the top-1 window (one extra
    # shuffle+sort) OFF the chained-increments critical path: increment
    # t+1's probe only waits for this hit-set, while the windowed verdicts
    # of increment t materialize concurrently (measured ~8.5 s -> ~7.8 s
    # for the 3-increment query at sf0.1).  Identical to filtering v on
    # verdict='novel': probes absent from pf (len < k) have no rows to
    # append either way.
    n_probe = pf.groupBy("probe_id").agg(F.count("*").alias("n_probe"))
    post = capped_postings(index, df_cap)
    hit_ids = (
        pf.join(post, "fp")
        .groupBy("probe_id", F.col("id").alias("ref"))
        .agg(F.count("*").alias("shared"))
        .join(n_probe, "probe_id")
        .filter(F.col("shared") / F.col("n_probe") >= min_score)
        .select("probe_id").distinct())
    appended = (pf.join(hit_ids, "probe_id", "left_anti")
                .select(F.col("probe_id").alias("id"), "fp"))
    return v, index.unionByName(appended)


def probe_winnow(probes: DataFrame, index: DataFrame, k: int = 8, w: int = 9,
                 df_cap: int = 16, min_score: float = 0.5,
                 id_col: str = "doc_id",
                 text_col: str = "text",
                 probe_fps: DataFrame | None = None) -> DataFrame:
    """Probe (id, text) rows against a build_winnow_index frame. Returns
    one row per probe: (probe_id, verdict, refers_to, shared, n_probe,
    score). score = shared / n_probe (how much of the PROBE's fingerprint
    set the indexed doc covers); null refers_to/shared/score for novels.
    ``probe_fps`` (probe_id, fp) lets a caller that already fingerprinted
    the probes (the APPEND lifecycle) share the pass."""
    # the self-computed persist is reused by n_probe + hits within this one
    # probe; it is NOT unpersisted here (the returned frame still reads it)
    # — one-shot callers rely on LRU eviction, chained callers pass
    # probe_fps and own the lifecycle (see probe_and_extend_winnow)
    pf = probe_fps if probe_fps is not None else (
        winnow_fingerprints(probes, k, w, id_col, text_col)
        .select(F.col("id").alias("probe_id"), "fp").distinct().persist())
    n_probe = pf.groupBy("probe_id").agg(F.count("*").alias("n_probe"))
    post = capped_postings(index, df_cap)
    hits = (
        pf.join(post, "fp")
        .groupBy("probe_id", F.col("id").alias("ref"))
        .agg(F.count("*").alias("shared"))
        .join(n_probe, "probe_id")
        .withColumn("score", F.col("shared") / F.col("n_probe"))
        .filter(F.col("score") >= min_score)
    )
    top = (
        hits.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("probe_id")
                .orderBy(F.col("score").desc(), F.col("shared").desc(),
                         F.col("ref").asc())))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    all_probes = probes.select(F.col(id_col).alias("probe_id")) \
        .join(n_probe, "probe_id", "left")
    return (
        all_probes.join(top.drop("n_probe"), "probe_id", "left")
        .select(
            "probe_id",
            F.when(F.col("ref").isNotNull(), F.lit("overlap"))
            .otherwise(F.lit("novel")).alias("verdict"),
            F.col("ref").alias("refers_to"),
            "shared",
            F.coalesce("n_probe", F.lit(0)).cast("long").alias("n_probe"),
            F.round("score", 6).alias("score"),
        )
    )
