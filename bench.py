"""Benchmark harness (driver contract).

Runs every queries() entry plus the flagship end-to-end image dedup pipeline
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "pipeline": {"images": n, "sec": s, "images_per_sec": r},
     "runs": {name: [sec, ...]}, "load": {...}}

Regression detectability (this host carries heavy external neighbor load):
each query runs WARM_RUNS times and "queries" reports the best — a cold
single run on a noisy host can swing +/-50%, so round-over-round deltas on
cold numbers mean nothing. All raw runs are kept in "runs" and the 1-minute
load average is recorded before/after the suite and per run in "load", so a
reader can tell code regressions from ambient noise. "value" is the sum of
the per-query bests (plus the pipeline best), NOT wall-clock.

The pipeline input is synthesized deterministically (synth.py — pure function
of row id + seed, distributed via mapInPandas, no external data), sized
IMAGES_PER_SF * sf rows, then run through all four tiers + PSNR verification
+ connected-components clustering — the BASELINE.json "images/sec end-to-end
dedup throughput" metric at sandbox scale.

Usage: python bench.py [--queries-only|--pipeline-only] [--warm N]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IMAGES_PER_SF = 100_000  # sf0.1 -> 10k synthetic images end-to-end
WARM_RUNS = 2


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_df(df) -> None:
    # noop sink: full execution, no driver-side result materialization
    df.write.format("noop").mode("overwrite").save()


def load1() -> float:
    return round(os.getloadavg()[0], 2)


def primary_line(timings: dict[str, float], n_queries: int, n_oracled: int,
                 total: float, sf: float, pipeline: dict, cores: int,
                 warm: int, cap: int = 1900) -> str:
    """Build the single driver-facing JSON line, shrinking the per-query
    timing dict until the line fits the driver's 2,000-char output tail
    (round-3 lesson: an overgrown line parses as null). Pure so the cap is
    pytest-pinned against future query-count growth."""
    items = sorted(((k, round(v, 2)) for k, v in timings.items()),
                   key=lambda kv: (-kv[1], kv[0]))
    keep = len(items)
    while True:
        shown, rest = dict(items[:keep]), items[keep:]
        line = json.dumps({
            "metric": f"best-of-{warm}-warm total: {n_queries} queries "
                      f"({n_oracled} oracled) + e2e image dedup pipeline"
                      + (f"; {len(rest)} fastest queries aggregated, "
                         "full detail in BENCH/last_run.json" if rest else ""),
            "value": total,
            "unit": "sec",
            "queries": shown,
            **({"queries_aggregated": len(rest),
                "aggregated_total": round(sum(v for _, v in rest), 2)}
               if rest else {}),
            "sf": sf,
            "pipeline": pipeline,
            "cores": cores,
        }, separators=(",", ":"))
        if len(line) <= cap or keep == 0:
            break
        keep = max(keep - 5, 0)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    args = sys.argv[1:]
    mode = args[0] if args and args[0].startswith("--") and "warm" not in args[0] else ""
    warm = WARM_RUNS
    if "--warm" in args:
        warm = max(1, int(args[args.index("--warm") + 1]))

    import __spark_entry__ as entry_mod
    from deduplicator_spark.plans.pipeline import run_pipeline
    from deduplicator_spark.session import get_spark
    from deduplicator_spark.synth import synthesize_images

    spark = get_spark("bench")
    load_start = load1()

    qs = entry_mod.queries()
    n_oracled = len(set(entry_mod.oracle_sql()) & set(qs))

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    run_loads: dict[str, list[float]] = {}
    if mode != "--pipeline-only":
        for name, fn in qs.items():
            runs[name] = []
            run_loads[name] = []
            for _ in range(warm):
                run_loads[name].append(load1())
                t0 = time.perf_counter()
                run_df(fn(spark, sf_dir))
                runs[name].append(round(time.perf_counter() - t0, 3))
            timings[name] = min(runs[name])

    pipeline: dict[str, float] = {}
    if mode != "--queries-only":
        n = max(int(IMAGES_PER_SF * sf), 1000)
        images = synthesize_images(spark, n).persist()
        images.count()  # materialize input before the clock: synth is not dedup work
        name = "image_dedup_pipeline"
        runs[name] = []
        run_loads[name] = []
        for _ in range(warm):
            run_loads[name].append(load1())
            t0 = time.perf_counter()
            result = run_pipeline(images)
            run_df(result.verdicts)
            runs[name].append(round(time.perf_counter() - t0, 3))
        sec = min(runs[name])
        pipeline = {
            "images": n,
            "sec": sec,
            "images_per_sec": round(n / sec, 1),
        }
        timings[name] = sec

    total = round(sum(timings.values()), 3)
    # Raw per-run timings + load traces go to a sidecar: the driver records
    # only a 2,000-char output tail, so the primary line must stay compact
    # (round-3 lesson: the full-detail line outgrew the tail and parsed null).
    sidecar = {
        "timings": {k: round(v, 3) for k, v in timings.items()},
        "runs": runs,
        "load": {"start": load_start, "end": load1(), "per_run": run_loads},
        "warm_runs": warm,
        "n_queries": len(qs),
        "n_oracled": n_oracled,
        "sf": sf,
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "last_run.json"), "w") as fh:
        json.dump(sidecar, fh, indent=1)
    cores = spark.sparkContext.defaultParallelism
    # stop BEFORE printing: the driver keeps only a 2,000-char output TAIL,
    # so any Spark shutdown chatter after the JSON line would displace its
    # head and the line must be the last bytes the process emits
    spark.stop()
    sys.stdout.flush()
    # the queries dict outgrew the tail at 79 entries (2,173 chars), so the
    # primary line keeps only as many of the SLOWEST per-query timings as
    # fit in ~1,900 chars and rolls the rest into one aggregate; the full
    # per-query detail is always in the sidecar
    print(primary_line(timings, len(qs), n_oracled, total, sf, pipeline,
                       cores, warm))


if __name__ == "__main__":
    main()
