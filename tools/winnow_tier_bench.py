"""Winnow-tier marginal value + cost at 320k images (VERDICT r4 item #4).

The winnow tier (passage-level caption overlap via MOSS fingerprints) is OFF
in the default 4-tier flagship pipeline. This bench answers, with numbers,
whether it pays its way:

  Phase A (one local[32] context, warm):
    - raw per-tier edges (dedup_pairs=False) for the 5-tier set over the
      SAME corpus -> tier-signature histogram; the 'winnow'-only rows are
      pairs NO other tier finds (its marginal recall);
    - end-to-end run_pipeline wall, 4-tier vs 5-tier, best-of-WARM each ->
      its marginal cost.
  Phase B (fresh JVMs, interleaved): the north-rule N-vs-4N pair
    (local[2] vs local[8], best-of-REPEATS) for the 5-TIER shape, same
    protocol as tools/scaling_bench.py.

Writes BENCH/WINNOW_TIER.md and prints one JSON line.

Usage: python tools/winnow_tier_bench.py [n_images] [small] [big] [--skip-b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS_DIR = "/tmp/scaling_corpus"
WARM = 2
REPEATS = 3
TIERS4 = ("exact", "near_image", "near_caption", "containment")
TIERS5 = TIERS4 + ("winnow",)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_corpus(n: int) -> None:
    from deduplicator_spark.session import get_spark, stop_spark
    from deduplicator_spark.synth import write_images_parquet

    meta = os.path.join(CORPUS_DIR, "_n.txt")
    if os.path.isdir(CORPUS_DIR) and os.path.exists(meta) \
            and open(meta).read().strip() == str(n):
        return
    spark = get_spark("winnow-corpus")
    write_images_parquet(spark, n, CORPUS_DIR)
    stop_spark()
    with open(meta, "w") as f:
        f.write(str(n))


def phase_a(n: int) -> dict:
    from pyspark.sql import functions as F

    from deduplicator_spark.plans.pipeline import candidate_edges, run_pipeline
    from deduplicator_spark.session import get_spark, stop_spark

    spark = get_spark("winnow-tier-a", cores=32)
    images = spark.read.parquet(CORPUS_DIR)

    # tier-signature histogram over the raw 5-tier edge union
    raw = candidate_edges(images, tiers=TIERS5, verify_pixels=True,
                          dedup_pairs=False)
    sig = (raw.select("id_a", "id_b", "tier").distinct()
           .groupBy("id_a", "id_b")
           .agg(F.concat_ws("+", F.array_sort(F.collect_set("tier")))
                .alias("tiers"))
           .groupBy("tiers").agg(F.count("*").alias("n_pairs")))
    signature = {r["tiers"]: r["n_pairs"] for r in sig.collect()}
    winnow_total = sum(v for k, v in signature.items() if "winnow" in k)
    winnow_only = signature.get("winnow", 0)

    walls: dict[str, list[float]] = {"4-tier": [], "5-tier": []}
    loads: dict[str, list[float]] = {"4-tier": [], "5-tier": []}
    for _ in range(WARM):
        for label, tiers in (("4-tier", TIERS4), ("5-tier", TIERS5)):
            loads[label].append(round(os.getloadavg()[0], 1))
            t0 = time.perf_counter()
            _noop(run_pipeline(images, tiers=tiers, persist_input=False)
                  .verdicts)
            walls[label].append(round(time.perf_counter() - t0, 2))
    stop_spark()
    best = {k: min(v) for k, v in walls.items()}
    return {
        "signature": dict(sorted(signature.items())),
        "winnow_total_pairs": winnow_total,
        "winnow_only_pairs": winnow_only,
        "wall": {k: {"best": best[k], "runs": walls[k], "loads": loads[k]}
                 for k in walls},
        "marginal_cost_sec": round(best["5-tier"] - best["4-tier"], 2),
        "marginal_cost_pct": round(
            100 * (best["5-tier"] / best["4-tier"] - 1), 1),
    }


def phase_b(n: int, small: int, big: int) -> dict:
    from deduplicator_spark.plans.pipeline import run_pipeline
    from deduplicator_spark.session import get_spark, stop_spark
    from deduplicator_spark.synth import synthesize_images

    times: dict[int, list[float]] = {small: [], big: []}
    loads: dict[int, list[float]] = {small: [], big: []}
    pairs: dict[int, int] = {}
    for r in range(REPEATS):
        for cores in ((small, big) if r % 2 == 0 else (big, small)):
            spark = get_spark(f"winnow5-{cores}-r{r}", cores=cores)
            warm = synthesize_images(spark, 2000).persist()
            warm.count()
            _noop(run_pipeline(warm, tiers=TIERS5).verdicts)
            warm.unpersist()
            images = spark.read.parquet(CORPUS_DIR)
            loads[cores].append(round(os.getloadavg()[0], 1))
            t0 = time.perf_counter()
            res = run_pipeline(images, tiers=TIERS5, persist_input=False)
            _noop(res.verdicts)
            times[cores].append(round(time.perf_counter() - t0, 2))
            pairs[cores] = int(res.pairs.count())
            res.pairs.unpersist()
            stop_spark()
    best = {c: min(ts) for c, ts in times.items()}
    rate = {c: round(n / best[c], 1) for c in best}
    eff = (rate[big] / rate[small]) / (big / small)
    return {
        "small": {"cores": small, "sec": best[small],
                  "images_per_sec": rate[small], "runs": times[small],
                  "loads": loads[small]},
        "big": {"cores": big, "sec": best[big], "images_per_sec": rate[big],
                "runs": times[big], "loads": loads[big]},
        "scaling_efficiency": round(eff, 3),
        "pairs_identical": pairs[small] == pairs[big],
        "verified_pairs": pairs[small],
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 320000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    skip_b = "--skip-b" in sys.argv
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    _ensure_corpus(n)
    a = phase_a(n)
    b = None if skip_b else phase_b(n, small, big)
    out = {"n_images": n, "phase_a": a, "phase_b": b}
    print(json.dumps(out))

    sig_rows = "\n".join(f"| {k} | {v} |"
                         for k, v in a["signature"].items())
    b_md = "" if b is None else f"""
## Phase B — N vs 4N for the 5-tier shape (fresh JVMs, interleaved best-of-{REPEATS})

| parallelism | best wall (s) | images/sec | all runs (s) | load before |
|---|---|---|---|---|
| local[{small}] | {b['small']['sec']} | {b['small']['images_per_sec']} | {b['small']['runs']} | {b['small']['loads']} |
| local[{big}] | {b['big']['sec']} | {b['big']['images_per_sec']} | {b['big']['runs']} | {b['big']['loads']} |

**Scaling efficiency {b['scaling_efficiency']}** (north-rule criterion >= 0.8);
verified pair count identical across levels: {b['pairs_identical']}
({b['verified_pairs']} pairs).
"""
    with open("/root/repo/BENCH/WINNOW_TIER.md", "w") as f:
        f.write(f"""# Winnow tier: marginal value vs cost at {n} images

The winnow tier (passage-level caption overlap, operators/winnow.py) is OFF
in the default flagship pipeline. Measured here (VERDICT r4 item #4): what
turning it on adds (pairs no other tier finds) and costs (end-to-end wall),
plus the north-rule N-vs-4N pair for the 5-tier shape.

## Phase A — tier-signature histogram (raw edge union, dedup_pairs=False)

| tier signature | pairs |
|---|---|
{sig_rows}

Winnow appears in {a['winnow_total_pairs']} pair-signatures; found
EXCLUSIVELY by winnow: **{a['winnow_only_pairs']} pairs** — its whole
marginal recall at this corpus.

## Phase A — end-to-end cost (local[32], best-of-{WARM} warm)

| shape | best wall (s) | runs | loads before |
|---|---|---|---|
| 4-tier (default) | {a['wall']['4-tier']['best']} | {a['wall']['4-tier']['runs']} | {a['wall']['4-tier']['loads']} |
| 5-tier (+winnow) | {a['wall']['5-tier']['best']} | {a['wall']['5-tier']['runs']} | {a['wall']['5-tier']['loads']} |

Marginal cost: **{a['marginal_cost_sec']} s ({a['marginal_cost_pct']}%)**.
{b_md}
## Verdict

The synthetic caption corpus shares one house-style template, so passage
overlap the whole-set Jaccard tiers miss is rare by construction — read the
exclusive-pair count against the cost above. On a REAL crawl corpus
(boilerplate-heavy, quoted passages) the winnow-only signature is the line
to watch before enabling the tier by default; the cross-engine correctness
of the tier itself is gated by the `tier_overlap` / `winnow_*` oracle rows.
""")


if __name__ == "__main__":
    main()
