"""Measured evidence for the AQE skew-join lever (north rule: "handles
band-key skew with salting and AQE skew-join hints").

BENCH/SKEW.md measures the SALTING half (the two-phase aggregation in
operators/candidates.py). The other skew surface is the star-edge /
index-probe shape: a mega-hot bucket's MEMBER rows equi-joined against a
one-row-per-key representative table. At 10^12-image scale the rep table
is billions of keys — far beyond broadcast — so that join is a sort-merge
join, and the hot key lands every member row in ONE shuffle partition:
a single-task straggler unless AQE splits it.

This tool plants that skew deterministically (hot_frac of n_rows share one
key; the rest spread uniformly), disables broadcast to force SMJ, and times
the identical join + checksum with spark.sql.adaptive.skewJoin.enabled
toggled false/true in the same JVM, interleaved best-of-N with 1-min load
recorded per leg (same protocol as skew_bench.py — this host carries
invisible neighbor load). It also:

- verifies both settings produce the IDENTICAL join checksum + row count
  (AQE skew split is a pure physical lever), and
- extracts the skew evidence from the final adaptive plan: the skewed leg
  must show "skew=true" AQEShuffleRead nodes and MORE result partitions
  than the non-split run (the hot partition re-read as K chunks).

Skew thresholds are lowered (32 MB / factor 2 / advisory 16 MB) so the
mechanism triggers at sandbox scale; at production defaults (256 MB) the
same plant triggers at ~1e9 hot rows. The lever, not the threshold, is
what is under test.

Usage:
    python tools/aqe_skew_bench.py [n_rows] [repeats] [hot_frac]
Writes BENCH/SKEW_AQE_LATEST.md (gitignored; merge into curated SKEW.md by
hand) and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.session import get_spark  # noqa: E402


def planted(spark, n_rows: int, hot_frac: float, n_keys: int):
    """Member rows: hot_frac share key 0; the rest uniform over n_keys.
    Payload is 128 incompressible hex chars so shuffle bytes reflect row
    width (compression would hide the skew from AQE's size stats)."""
    members = spark.range(n_rows).select(
        F.col("id").alias("member_id"),
        # exact per-mille gate: id % 1000 < 1000*hot_frac plants EXACTLY
        # hot_frac of rows on the hot key for any 3-decimal fraction
        # (int(1/hot_frac) would round 0.4 to every-2nd-row = 50%)
        F.when(F.pmod(F.col("id"), F.lit(1000))
               < F.lit(int(round(hot_frac * 1000))), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)) + 1)
        .cast("long").alias("key"),
        F.concat(F.sha2(F.conv(F.col("id").cast("string"), 10, 16), 256),
                 F.sha2(F.sha2(F.conv(F.col("id").cast("string"), 10, 16),
                               256), 256)).alias("payload"),
    )
    reps = spark.range(n_keys + 1).select(
        F.col("id").alias("key"),
        F.sha2(F.conv(F.col("id").cast("string"), 10, 16), 256)
        .alias("rep_digest"),
    )
    return members, reps


def run_leg(spark, members, reps, skew_on: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                   "true" if skew_on else "false")
    joined = members.join(reps, "key").select(
        F.xxhash64("member_id", "key", "payload", "rep_digest").alias("h"))
    agg = joined.agg(
        F.sum(F.pmod(F.col("h"), F.lit(1_000_000_007))).alias("checksum"),
        F.count("*").alias("n"))
    t0 = time.monotonic()
    row = agg.collect()[0]
    sec = time.monotonic() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    n_skew_nodes = len(re.findall(r"skew=true", plan))
    return sec, (int(row["checksum"]), int(row["n"])), n_skew_nodes


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    n_keys = max(64, n_rows // 2_000)
    spark = get_spark("aqe-skew-bench", cores=8, extra={
        # force SMJ: at target scale the rep table cannot broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # trigger thresholds scaled to sandbox data volume (see docstring)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        # keep coalescing from re-merging the split chunks we want to see
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8m",
    })
    members, reps = planted(spark, n_rows, hot_frac, n_keys)
    members = members.persist()
    reps = reps.persist()
    members.count(), reps.count()  # both legs scan the same cache

    times = {False: [], True: []}
    loads = {False: [], True: []}
    checks = {}
    skew_nodes = {}
    for r in range(repeats):
        order = (False, True) if r % 2 == 0 else (True, False)
        for s in order:
            loads[s].append(round(os.getloadavg()[0], 1))
            sec, chk, nodes = run_leg(spark, members, reps, s)
            times[s].append(round(sec, 2))
            checks[s] = chk
            skew_nodes[s] = nodes
            print(f"round {r} skewJoin={s}: {sec:.1f}s chk={chk} "
                  f"skew_nodes={nodes} load~{loads[s][-1]}", flush=True)

    best = {s: min(ts) for s, ts in times.items()}
    summary = {
        "n_rows": n_rows,
        "hot_key_members": int(n_rows * hot_frac),
        "skew_off_best_sec": best[False],
        "skew_on_best_sec": best[True],
        "speedup": round(best[False] / best[True], 2),
        "results_identical": checks[False] == checks[True],
        "n_joined_rows": checks[True][1],
        "skew_nodes_on": skew_nodes[True],
        "skew_nodes_off": skew_nodes[False],
        "all_runs": {("on" if s else "off"): times[s] for s in times},
        "loads": {("on" if s else "off"): loads[s] for s in loads},
    }
    print(json.dumps(summary))

    section = f"""

## AQE skew-join splitting — measured A/B (star-edge join shape)

The star-edge / index-probe tier joins a skewed member table against a
one-row-per-key representative table. At 10^12 scale the rep table is far
beyond broadcast, so this is a sort-merge join and a mega-hot key is a
single-task straggler unless AQE splits the skewed partition. Planted here:
{int(n_rows * hot_frac):,} of {n_rows:,} member rows (128-byte incompressible payloads)
share ONE key; broadcast disabled; skew thresholds scaled to sandbox volume
(32 MB / factor 2 / advisory 16 MB — at production defaults the same plant
triggers at ~1e9 hot rows). local[8], same JVM, interleaved
best-of-{repeats}, 1-min load recorded before each leg
(`tools/aqe_skew_bench.py`).

| setting | best wall (s) | all runs (s) | load before runs | `skew=true` plan nodes |
|---|---|---|---|---|
| skewJoin.enabled=false | {best[False]} | {times[False]} | {loads[False]} | {skew_nodes[False]} |
| skewJoin.enabled=true | {best[True]} | {times[True]} | {loads[True]} | {skew_nodes[True]} |

- AQE skew-split speedup on the skewed join: **{summary['speedup']}x**
- join checksum + row count identical across settings: **{summary['results_identical']}**
  ({summary['n_joined_rows']:,} joined rows — a pure physical lever)
- the enabled leg's final adaptive plan carries {skew_nodes[True]}
  `skew=true` AQEShuffleRead node(s); the disabled leg carries
  {skew_nodes[False]}.

Together with the salting A/B above this covers both skew surfaces the
north rule names: salting bounds per-task AGGREGATION state on hot band
keys; AQE skew-join splits the hot-partition JOIN the star-edge fallback
then performs.

Reproduce: `python tools/aqe_skew_bench.py {n_rows} {repeats} {hot_frac}`
"""
    # _LATEST sidecar (gitignored) — merge into the curated SKEW.md by hand
    with open("/root/repo/BENCH/SKEW_AQE_LATEST.md", "w") as f:
        f.write(section.lstrip())


if __name__ == "__main__":
    main()
