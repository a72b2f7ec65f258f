"""Time ONE run_pipeline(persist_input=False) + noop verdicts write on a
parquet corpus — the exact timed section of the scaling legs — printing the
same 'N images in Xs' line. Runnable in-process or via spark-submit for
launcher-path comparison.

Usage: [spark-submit ...] tools/time_pipeline_once.py <corpus> <cores> [warmup_n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/submit_corpus"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    warmup_n = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    from deduplicator_spark.plans.pipeline import run_pipeline
    from deduplicator_spark.session import get_spark
    from deduplicator_spark.synth import synthesize_images

    spark = get_spark("time-once", cores=cores)
    if warmup_n:
        warm = synthesize_images(spark, warmup_n, seed=43).persist()
        warm.count()
        run_pipeline(warm).verdicts.write.format("noop").mode("overwrite").save()
        warm.unpersist()

    images = spark.read.parquet(corpus)
    n = images.count()
    t0 = time.perf_counter()
    result = run_pipeline(images, persist_input=False)
    result.verdicts.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(f"{n} images in {sec:.1f}s ({n / sec:.1f} images/sec)")


if __name__ == "__main__":
    main()
