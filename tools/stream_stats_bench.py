"""Ingest throughput for the stateful dup-stats operators, fine vs sharded.

Same protocol as tools/stream_e2e_bench.py (pre-written multi-file parquet
corpus, trigger(availableNow), fresh JVM per leg, noop sink), but for the
EXACT tier: a stream of (record_id, digest, ts) captures in planted
duplicate families of 4 (digest repeats 4x), driven through
streaming_dup_stats (one state group per digest) and
streaming_dup_stats_sharded (one group per digest shard). Emitted-row
equivalence between the two is pinned by tests/test_streaming.py; this
tool measures what sharding buys at ingest.

Usage: python tools/stream_stats_bench.py [n_arrivals] [width ...]
       (defaults: 400000 arrivals, width 8)
Writes BENCH/STREAM_STATS_LATEST.md (gitignored; merge by hand).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/stream_stats_corpus"
N_FILES = 16

LEG_CODE = r"""
import json, os, shutil, sys, time
sys.path.insert(0, "/root/repo")
from deduplicator_spark.session import get_spark
from deduplicator_spark.streaming import stateful

op_name = os.environ["STREAM_STATS_OP"]
op = (stateful.streaming_dup_stats_sharded if op_name == "sharded"
      else stateful.streaming_dup_stats)

corpus, width, run_id = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"stream-stats-{run_id}", cores=width)
spark.sparkContext.setLogLevel("ERROR")
schema = spark.read.parquet(corpus).schema
n = spark.read.parquet(corpus).count()   # warm page cache + JVM

ck = f"/tmp/stream_stats_ck_{run_id}"
shutil.rmtree(ck, ignore_errors=True)
stream = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(corpus))
out = op(stream, watermark="24 hours")
t0 = time.perf_counter()
q = (out.writeStream.format("noop")
     .option("checkpointLocation", ck)
     .outputMode("update")
     .trigger(availableNow=True).start())
q.awaitTermination()
wall = time.perf_counter() - t0
rows = sum(p["numInputRows"] for p in q.recentProgress)
print(json.dumps({"op": op_name, "width": width, "wall_s": round(wall, 2),
                  "arrivals": n, "source_rows": rows,
                  "arrivals_per_sec": round(n / wall, 1),
                  "batches": len([p for p in q.recentProgress
                                  if p["numInputRows"] > 0])}))
spark.stop()
"""


def write_corpus(n: int) -> None:
    import shutil

    from deduplicator_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("stream-stats-corpus")
    shutil.rmtree(CORPUS, ignore_errors=True)
    os.makedirs(CORPUS)
    per = n // N_FILES
    for f in range(N_FILES):
        df = (
            spark.range(f * per, (f + 1) * per)
            .select(
                F.format_string("rec%012d", F.col("id")).alias("record_id"),
                # families of 4 exact duplicates: digest repeats per id//4
                F.sha2(F.conv(F.xxhash64((F.col("id") / 4).cast("long"))
                              .cast("string"), 10, 16), 256).alias("digest"),
                F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            )
            .coalesce(1)
        )
        df.write.mode("overwrite").parquet(f"{CORPUS}/_f{f}")
        part = [p for p in os.listdir(f"{CORPUS}/_f{f}")
                if p.endswith(".parquet")][0]
        os.rename(f"{CORPUS}/_f{f}/{part}", f"{CORPUS}/file_{f:03d}.parquet")
        shutil.rmtree(f"{CORPUS}/_f{f}")
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    widths = [int(w) for w in sys.argv[2:]] or [8]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from stream_e2e_bench import _ensure_corpus

    _ensure_corpus(n, corpus=CORPUS, write=write_corpus,
                   plant="digest-families-of-4")
    legs = []
    for op in ("fine", "sharded"):
        for w in widths:
            before = os.getloadavg()[0]
            out = subprocess.run(
                [sys.executable, "-c", LEG_CODE, CORPUS, str(w), f"{op}_w{w}"],
                capture_output=True, text=True, timeout=3600,
                env=dict(os.environ, STREAM_STATS_OP=op),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise RuntimeError(f"leg op={op} width={w} failed")
            leg = json.loads(line[-1])
            leg["ext_load"] = round(max(before, os.getloadavg()[0] - w), 1)
            legs.append(leg)
            print(json.dumps(leg), flush=True)

    md = [
        "# Exact-tier streaming dup stats: fine vs sharded state ingest",
        "",
        "Stream of (record_id, digest, ts) captures in planted families of",
        f"4 exact duplicates, {legs[0]['arrivals']:,} arrivals over "
        f"{N_FILES} files,",
        "trigger(availableNow), micro-batch = 1 file, fresh JVM per leg,",
        "noop sink. Emitted-row equivalence between the operators is pinned",
        "by tests/test_streaming.py::test_stateful_dup_stats_sharded_",
        "equivalence; this measures what state sharding buys at ingest",
        "(one Python invocation per touched state GROUP per micro-batch:",
        "per distinct digest for fine, per digest shard for sharded).",
        "",
        "| operator | width | wall (s) | arrivals/sec | micro-batches | ext load |",
        "|---|---|---|---|---|---|",
    ]
    for leg in legs:
        md.append(
            f"| {leg['op']} | local[{leg['width']}] | {leg['wall_s']} | "
            f"{leg['arrivals_per_sec']} | {leg['batches']} | "
            f"{leg['ext_load']} |"
        )
    by = {(l["op"], l["width"]): l for l in legs}
    for w in widths:
        if ("fine", w) in by and ("sharded", w) in by:
            sp = by[("sharded", w)]["arrivals_per_sec"] / \
                by[("fine", w)]["arrivals_per_sec"]
            md.append("")
            md.append(f"- width {w}: sharded is **{sp:.1f}x** fine's ingest "
                      "throughput")
    md += [
        "",
        f"Reproduce: `python tools/stream_stats_bench.py "
        f"{legs[0]['arrivals']} {' '.join(str(w) for w in widths)}`",
    ]
    # _LATEST sidecar (gitignored) — merge into the curated doc by hand
    with open("/root/repo/BENCH/STREAM_STATS_LATEST.md", "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
