"""Benchmark harness (driver contract).

Runs every queries() entry plus the flagship end-to-end image dedup pipeline
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "pipeline": {"images": n, "sec": s, "images_per_sec": r}}

The pipeline input is synthesized deterministically (synth.py — pure function
of row id + seed, distributed via mapInPandas, no external data), sized
IMAGES_PER_SF * sf rows, then run through all four tiers + PSNR verification
+ connected-components clustering — the BASELINE.json "images/sec end-to-end
dedup throughput" metric at sandbox scale.

Usage: python bench.py [--queries-only|--pipeline-only]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IMAGES_PER_SF = 100_000  # sf0.1 -> 10k synthetic images end-to-end


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_df(df) -> None:
    # noop sink: full execution, no driver-side result materialization
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    mode = sys.argv[1] if len(sys.argv) > 1 else ""

    import __spark_entry__ as entry_mod
    from deduplicator_spark.plans.pipeline import run_pipeline
    from deduplicator_spark.session import get_spark
    from deduplicator_spark.synth import synthesize_images

    spark = get_spark("bench")

    timings: dict[str, float] = {}
    if mode != "--pipeline-only":
        for name, fn in entry_mod.queries().items():
            t0 = time.perf_counter()
            run_df(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)

    pipeline: dict[str, float] = {}
    if mode != "--queries-only":
        n = max(int(IMAGES_PER_SF * sf), 1000)
        images = synthesize_images(spark, n).persist()
        images.count()  # materialize input before the clock: synth is not dedup work
        t0 = time.perf_counter()
        result = run_pipeline(images)
        run_df(result.verdicts)
        sec = time.perf_counter() - t0
        pipeline = {
            "images": n,
            "sec": round(sec, 3),
            "images_per_sec": round(n / sec, 1),
        }
        timings["image_dedup_pipeline"] = round(sec, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total runtime: 33 driver-contract queries (32 DuckDB-oracled) + "
                  "end-to-end image dedup pipeline (fused validate/digest pass + "
                  "4-tier cascade + PSNR verify + CC clustering)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline": pipeline,
        "cores": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
