"""Stage-level timing breakdown of run_pipeline on a parquet corpus.

Works both in-process (python tools/profile_pipeline.py <dir> <cores>) and
through spark-submit (spark-submit --master local[C] --py-files dedup.zip
tools/profile_pipeline.py <dir> <cores>) so the two launch paths can be
compared stage by stage. Mirrors run_pipeline's structure but materializes
each stage with a noop write and a clock around it.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/submit_corpus"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from deduplicator_spark.config import DEFAULT
    from deduplicator_spark.operators.candidates import canonical_pairs
    from deduplicator_spark.operators.components import connected_components
    from deduplicator_spark.operators.containment import containment_pairs
    from deduplicator_spark.operators.exact import exact_pairs_from_digests
    from deduplicator_spark.operators.minhash import (
        near_caption_pairs,
        prepared_features,
    )
    from deduplicator_spark.operators.simhash import near_image_pairs
    from deduplicator_spark.operators.verify import verify_image_pairs
    from deduplicator_spark.plans.pipeline import (
        bad_ids_from_features,
        candidate_edges,
        validation_features,
        verdicts_from_clusters,
    )
    from deduplicator_spark.session import get_spark
    from deduplicator_spark.synth import synthesize_images

    spark = get_spark("profile", cores=cores)
    # untimed warmup, same as the bench legs
    warm = synthesize_images(spark, 2000, seed=43).persist()
    warm.count()
    from deduplicator_spark.plans.pipeline import run_pipeline

    noop(run_pipeline(warm).verdicts)
    warm.unpersist()

    images = spark.read.parquet(corpus)
    n = images.count()
    marks: list[tuple[str, float]] = []
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    feats = validation_features(images).persist()
    feats.count()
    marks.append(("validate+digest (Arrow pass)", time.perf_counter() - t0))

    bad = bad_ids_from_features(feats, DEFAULT)
    imgs = images.join(F.broadcast(bad), "image_id", "left_anti")
    digests = feats.join(F.broadcast(bad), "image_id", "left_anti") \
        .select("image_id", "digest")

    t0 = time.perf_counter()
    prep = prepared_features(imgs, DEFAULT).persist()
    prep.count()
    marks.append(("caption features (Arrow pass)", time.perf_counter() - t0))

    t0 = time.perf_counter()
    noop(exact_pairs_from_digests(digests))
    marks.append(("tier exact", time.perf_counter() - t0))

    t0 = time.perf_counter()
    ni = verify_image_pairs(near_image_pairs(imgs, DEFAULT), imgs, DEFAULT)
    noop(ni)
    marks.append(("tier near_image + PSNR", time.perf_counter() - t0))

    t0 = time.perf_counter()
    noop(near_caption_pairs(imgs, DEFAULT, prepared=prep))
    marks.append(("tier near_caption", time.perf_counter() - t0))

    t0 = time.perf_counter()
    noop(containment_pairs(imgs, DEFAULT, prepared=prep))
    marks.append(("tier containment", time.perf_counter() - t0))

    t0 = time.perf_counter()
    edges = candidate_edges(imgs, DEFAULT, verify_pixels=True,
                            digests=digests).persist()
    edges.count()
    marks.append(("all tiers union+priority (re-run, persisted)",
                  time.perf_counter() - t0))

    t0 = time.perf_counter()
    clusters = connected_components(
        canonical_pairs(edges), nodes=imgs.select("image_id"), cfg=DEFAULT)
    verdicts = verdicts_from_clusters(imgs, clusters, edges)
    noop(verdicts)
    marks.append(("CC + verdicts", time.perf_counter() - t0))

    total = time.perf_counter() - t_all
    print(f"corpus={corpus} n={n} cores={cores}")
    for name, sec in marks:
        print(f"  {sec:8.1f}s  {name}")
    print(f"  {total:8.1f}s  TOTAL (stage sum incl. double-counted tier re-run)")


if __name__ == "__main__":
    main()
