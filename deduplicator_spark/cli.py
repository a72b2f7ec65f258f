"""spark-submit entry point.

Cluster usage (north rule: "runs via spark-submit --py-files on a
multi-executor cluster"):

    zip -r dedup.zip deduplicator_spark
    spark-submit --py-files dedup.zip --master <cluster> \
        deduplicator_spark/cli.py run \
        --input /data/images.parquet --checkpoint-dir /ckpt --output /out

Sandbox usage (local[N] — same code path):

    python -m deduplicator_spark.cli synth --n 10000 --output /tmp/images
    python -m deduplicator_spark.cli run --synth 10000 --output /tmp/out
    python -m deduplicator_spark.cli run --input /tmp/images \
        --checkpoint-dir /tmp/ckpt --output /tmp/out --resume

Subcommands:
    synth   write a deterministic synthetic image+caption corpus
    run     end-to-end dedup: tiers -> verify -> cluster -> verdicts(+metrics)
            (--checkpoint-dir makes it resumable; --resume reuses committed
            stages from a previous, possibly killed, run)
"""

from __future__ import annotations

import argparse
import shutil
import sys
import time


def _spark(args):
    from .session import get_spark

    return get_spark("deduplicator-cli", cores=args.cores)


def cmd_synth(args) -> int:
    from .synth import synthesize_images

    spark = _spark(args)
    synthesize_images(spark, args.n, seed=args.seed).write.mode("overwrite") \
        .parquet(args.output)
    print(f"wrote {args.n} rows to {args.output}")
    return 0


def cmd_run(args) -> int:
    from .plans.checkpoint import run_pipeline_resumable
    from .plans.pipeline import run_pipeline
    from .synth import synthesize_images

    spark = _spark(args)
    if args.synth:
        images = synthesize_images(spark, args.synth, seed=args.seed)
    elif args.input:
        images = spark.read.parquet(args.input)
    else:
        print("one of --input / --synth is required", file=sys.stderr)
        return 2
    images = images.persist()
    images.count()

    tiers = tuple(args.tiers.split(","))
    t0 = time.perf_counter()
    if args.checkpoint_dir:
        if not args.resume:
            shutil.rmtree(args.checkpoint_dir, ignore_errors=True)
        result = run_pipeline_resumable(
            images, args.checkpoint_dir, tiers=tiers,
            verify_pixels=not args.no_verify, run_id=args.run_id,
        )
    else:
        result = run_pipeline(images, tiers=tiers, verify_pixels=not args.no_verify,
                              run_id=args.run_id)
    if args.output:
        result.verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
        result.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        result.metrics.write.mode("overwrite").parquet(f"{args.output}/metrics")
    sec = time.perf_counter() - t0
    n = images.count()
    print(f"{n} images in {sec:.1f}s ({n / sec:.1f} images/sec)")
    for r in result.metrics.orderBy("stage", "metric").collect():
        print(f"  {r['stage']:12s} {r['metric']:22s} {r['value']:.0f}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deduplicator-spark")
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] parallelism (default: $SPARK_GRAFT_CPUS or all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="write a synthetic image+caption corpus")
    ps.add_argument("--n", type=int, required=True)
    ps.add_argument("--seed", type=int, default=42)
    ps.add_argument("--output", required=True)
    ps.set_defaults(fn=cmd_synth)

    pr = sub.add_parser("run", help="end-to-end dedup pipeline")
    pr.add_argument("--input", help="parquet images table (input_hint schema)")
    pr.add_argument("--synth", type=int, help="synthesize N images instead of --input")
    pr.add_argument("--seed", type=int, default=42)
    pr.add_argument("--output", help="directory for verdicts/clusters/metrics parquet")
    pr.add_argument("--checkpoint-dir", help="stage checkpoint root (enables resume)")
    pr.add_argument("--resume", action="store_true",
                    help="reuse committed stages in --checkpoint-dir")
    pr.add_argument("--tiers", default="exact,near_image,near_caption,containment")
    pr.add_argument("--no-verify", action="store_true", help="skip pixel PSNR verification")
    pr.add_argument("--run-id", default="run")
    pr.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
