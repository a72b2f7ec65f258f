"""Measured evidence for the salted-key skew lever (north rule: "handles
band-key skew with salting and AQE skew-join hints").

candidate_pairs_from_bands collects small-bucket member lists with a salted
two-phase aggregation: phase 1 groups by (band, key, salt = hash(id) % S).
Without salting (S=1), ONE aggregation task owns a mega-hot band key and
must collect + sort every member before the cap slices it — the classic
straggler. With S=32 the hot key's state is split across 32 tasks and
phase 2 only merges 32 pre-capped fragments.

This tool plants that skew deterministically — half of all rows share ONE
(band, key); the rest spread uniformly over many small buckets — and times
the IDENTICAL pair computation at S=1 vs S=32, interleaved best-of-N with
the 1-min load recorded per leg (this host carries invisible neighbor
load; same protocol as scaling_bench.py). It also verifies both settings
emit the IDENTICAL pair set (the lever is pure performance, not semantics:
star edges cover every hot-bucket member either way).

Usage:
    python tools/skew_bench.py [n_rows] [repeats]
Writes BENCH/SKEW_LATEST.md (gitignored; merge into curated SKEW.md by hand)
and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.operators.candidates import (  # noqa: E402
    candidate_pairs_from_bands,
    collect_buckets,
)
from deduplicator_spark.session import get_spark  # noqa: E402


def banded_with_hot_key(spark, n_rows: int, hot_frac: float = 0.5,
                        small_bucket: int = 8):
    """(image_id, band, key): hot_frac of rows share (0, 0); the rest land in
    uniform buckets of ~small_bucket members (the all-pairs path)."""
    n_small_keys = max(1, int(n_rows * (1 - hot_frac)) // small_bucket)
    return (
        spark.range(n_rows)
        .select(
            F.format_string("%012d", "id").alias("image_id"),
            F.lit(0).alias("band"),
            # exact per-mille gate (int(1/hot_frac) mis-rounds non-1/k
            # fractions; recorded runs all used 0.5, where both forms
            # plant exactly half)
            F.when(F.pmod(F.col("id"), F.lit(1000))
                   < F.lit(int(round(hot_frac * 1000))), F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_small_keys)) + 1)
            .cast("long").alias("key"),
        )
    )


def run_leg(spark, banded, salt_buckets: int) -> tuple[float, int]:
    """Time the bucket COLLECTION (the salted two-phase aggregation — the
    lever under test) in isolation; downstream pair expansion is identical
    either way and only dilutes the ratio."""
    t0 = time.monotonic()
    b = collect_buckets(banded, salt_buckets=salt_buckets)
    try:
        # noop write materializes EVERY column — a bare count() would let
        # the optimizer prune the collect_list itself out of the plan
        b.write.format("noop").mode("overwrite").save()
    except Exception as e:  # the unsalted mega-key leg can OOM: that IS
        return float("nan"), f"FAILED: {type(e).__name__}"  # the finding
    sec = time.monotonic() - t0
    return sec, b.count()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    small_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hot_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    spark = get_spark("skew-bench", cores=8)
    banded = banded_with_hot_key(spark, n_rows, hot_frac=hot_frac,
                                 small_bucket=small_bucket).persist()
    banded.count()  # materialize once so both legs scan the same cache

    # semantic identity first (checksum, not count): one run per setting
    def checksum(s):
        return (candidate_pairs_from_bands(banded, salt_buckets=s)
                .agg(F.sum(F.pmod(F.xxhash64("id_a", "id_b"),
                                  F.lit(1_000_000_007))).alias("c"),
                     F.count("*").alias("n")).collect()[0])

    if os.environ.get("SKEW_SKIP_CHECK") == "1":
        # identity already established at smaller n (it is size-invariant:
        # same plan, same star-edge fallback); skip the expensive full
        # pair materialization and time only the aggregation legs
        identical, n_pairs = "not re-checked at this n", -1
    else:
        c1, c32 = checksum(1), checksum(32)
        identical = bool((c1["c"], c1["n"]) == (c32["c"], c32["n"]))
        n_pairs = int(c32["n"])

    only = os.environ.get("SKEW_ONLY_SALT")  # one leg per JVM: an unsalted
    # mega-key OOM kills the whole local-mode app, so A/B legs at the OOM
    # frontier must be separate processes
    settings = (int(only),) if only else (1, 32)
    times: dict[int, list[float]] = {s: [] for s in settings}
    loads: dict[int, list[float]] = {s: [] for s in settings}
    counts: dict[int, int] = {}
    for r in range(repeats):
        for s in (settings if r % 2 == 0 else settings[::-1]):
            loads[s].append(round(os.getloadavg()[0], 1))
            sec, n = run_leg(spark, banded, s)
            times[s].append(round(sec, 2) if sec == sec else "FAILED")
            counts[s] = n
            print(f"round {r} salt={s}: {sec:.1f}s ({n} buckets, "
                  f"load~{loads[s][-1]})", flush=True)

    best = {s: min([t for t in ts if isinstance(t, float)] or ["FAILED"])
            for s, ts in times.items()}
    if only:
        print(json.dumps({"n_rows": n_rows, "salt": int(only),
                          "best_sec": best[int(only)],
                          "all_runs": times[int(only)],
                          "loads": loads[int(only)]}))
        return
    summary = {
        "n_rows": n_rows,
        "hot_key_members": int(n_rows * hot_frac),
        "salt1_best_sec": best[1],
        "salt32_best_sec": best[32],
        "speedup": (round(best[1] / best[32], 2)
                    if isinstance(best[1], float) else "unsalted FAILED"),
        "pairs_identical": identical,
        "n_pairs": n_pairs,
        "n_buckets": counts[32],
        "all_runs": {str(s): times[s] for s in times},
        "loads": {str(s): loads[s] for s in loads},
    }
    print(json.dumps(summary))

    # _LATEST sidecar (gitignored) — the curated SKEW.md carries multiple
    # hand-merged sections (OOM frontier, AQE A/B); a single re-run must
    # not clobber them
    with open("/root/repo/BENCH/SKEW_LATEST.md", "w") as f:
        f.write(f"""# Salted-key skew handling — measured A/B

North rule: "handles band-key skew with salting and AQE skew-join hints".
The LSH candidate machinery (operators/candidates.py) collects small-bucket
member lists with a salted two-phase aggregation; this run plants a
deterministic mega-hot band key — {int(n_rows * hot_frac):,} of {n_rows:,} rows share
ONE (band, key); the rest spread over ~8-member buckets — and times the
identical computation unsalted (S=1: one task collects + sorts the whole
hot key before the cap) vs salted (S=32: state split 32 ways, phase 2
merges pre-capped fragments). local[8], in-process, interleaved
best-of-{repeats}, 1-min load recorded before each leg.

Timed leg = the bucket-collection aggregation alone (collect_buckets);
the downstream pair expansion is identical at any S and would only dilute
the measured ratio.

| setting | best wall (s) | all runs (s) | load before runs |
|---|---|---|---|
| salt_buckets=1 (unsalted) | {best[1]} | {times[1]} | {loads[1]} |
| salt_buckets=32 | {best[32]} | {times[32]} | {loads[32]} |

- salted speedup on the skewed aggregation: **{summary['speedup']}x**
- end-to-end pair sets identical across settings: **{identical}**
  ({summary['n_pairs']:,} pairs — salting is a pure performance lever;
  star edges cover every hot-bucket member at any S)

At 10^12-row scale the hot keys are boilerplate captions / near-identical
content shared by millions of rows; an unsalted collect over such a key is
a single-task straggler (and an OOM risk), while the salted form bounds
every aggregation task's state to one salt shard of one key. The big-bucket
STAR-EDGE path is separately skew-safe: it is an equi-join against the
bucket minimum, which AQE skew-join splitting spreads across tasks
(spark.sql.adaptive.skewJoin.enabled=true, session.py).

Reproduce: `python tools/skew_bench.py {n_rows} {repeats} {small_bucket}`
""")


if __name__ == "__main__":
    main()
