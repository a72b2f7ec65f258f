"""End-to-end ingest throughput for the stateful in-stream near-dup operator.

BENCH/STREAM_MATCH.md micro-benches the per-arrival match step; this tool
measures the whole streaming operator the way it runs in production: a file
stream of (image_id, phash, ts) arrivals -> 4-band explode -> shuffle by
(band, key) -> applyInPandasWithState bucket matching -> noop sink, driven
with trigger(availableNow) over a pre-written multi-file parquet corpus so
the run is bounded and the wall time IS the ingest time.

The corpus plants duplicate families of 4 (family base hash from
xxhash64, members flip 0/1/2/3 distinct bits -> every member is within
Hamming <= 3 of the base, so in-stream matching must find a ref for the
3 later members of each family while buckets stay under the cap).

Each leg runs in a FRESH interpreter/JVM (subprocess) at a given core
width, same protocol as the batch scaling tools; per-leg wall and rows/sec
are printed; run with two widths to get a streaming N-vs-4N point.
(Match correctness is pinned by tests/test_streaming, not re-derived here.)

Usage: python tools/stream_e2e_bench.py [n_arrivals] [width ...]
       (defaults: 400000 arrivals, widths 2 and 8)
Writes BENCH/STREAM_E2E*_LATEST.md (gitignored; merge into the curated
BENCH/STREAM_E2E*.md by hand).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/stream_e2e_corpus"
N_FILES = 16

LEG_CODE = r"""
import json, os, shutil, sys, time
sys.path.insert(0, "/root/repo")
from deduplicator_spark.session import get_spark
from deduplicator_spark.streaming import stateful

if os.environ.get("STREAM_E2E_OP", "fine") == "sharded":
    import functools
    streaming_neardup_dedup = functools.partial(
        stateful.streaming_neardup_dedup_sharded,
        n_shards=int(os.environ.get("STREAM_E2E_SHARDS", "256")))
else:
    streaming_neardup_dedup = stateful.streaming_neardup_dedup

corpus, width, run_id = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"stream-e2e-{run_id}", cores=width)
spark.sparkContext.setLogLevel("ERROR")
schema = spark.read.parquet(corpus).schema
n = spark.read.parquet(corpus).count()   # warm page cache + JVM

ck = f"/tmp/stream_e2e_ck_{run_id}"
shutil.rmtree(ck, ignore_errors=True)
stream = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(corpus))
out = streaming_neardup_dedup(stream, watermark="24 hours")
t0 = time.perf_counter()
q = (out.writeStream.format("noop")
     .option("checkpointLocation", ck)
     .trigger(availableNow=True).start())
q.awaitTermination()
wall = time.perf_counter() - t0
rows = sum(p["numInputRows"] for p in q.recentProgress)  # source rows
print(json.dumps({"width": width, "wall_s": round(wall, 2),
                  "arrivals": n, "source_rows": rows,
                  "arrivals_per_sec": round(n / wall, 1),
                  "batches": len([p for p in q.recentProgress
                                  if p["numInputRows"] > 0])}))
spark.stop()
"""


def write_corpus(n: int) -> None:
    from deduplicator_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("stream-e2e-corpus")
    import shutil

    shutil.rmtree(CORPUS, ignore_errors=True)
    os.makedirs(CORPUS)
    per = n // N_FILES
    for f in range(N_FILES):
        df = (
            spark.range(f * per, (f + 1) * per)
            .select(
                F.format_string("img%012d", F.col("id")).alias("image_id"),
                # family base; members flip 0/1/2/3 distinct low bits
                # (0b000/0b001/0b011/0b111 -> Hamming 0..3 from the base,
                # matching the documented plant and the equivalence tests)
                F.xxhash64((F.col("id") / 4).cast("long"))
                .bitwiseXOR(
                    F.element_at(
                        F.array(F.lit(0), F.lit(1), F.lit(3), F.lit(7)),
                        (F.col("id") % 4 + 1).cast("int"),
                    )
                )
                .alias("phash"),
                F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            )
            .coalesce(1)
        )
        df.write.mode("overwrite").parquet(f"{CORPUS}/_f{f}")
        # file source wants a flat dir of files
        part = [p for p in os.listdir(f"{CORPUS}/_f{f}") if p.endswith(".parquet")][0]
        os.rename(f"{CORPUS}/_f{f}/{part}", f"{CORPUS}/file_{f:03d}.parquet")
        shutil.rmtree(f"{CORPUS}/_f{f}")
    spark.stop()


def _ensure_corpus(n: int, corpus: str | None = None,
                   write=None, plant: str = "xor-0-1-3-7") -> None:
    """(Re)build the corpus when absent OR written for a different n —
    file_000's existence alone would silently benchmark a stale scale.
    The plant generation is recorded too, so corpora written by older
    generator versions rebuild rather than mis-describe the workload."""
    corpus = corpus or CORPUS
    write = write or write_corpus
    # beside, not inside, the corpus dir: the parquet file source would
    # choke on a stray .json in its listing
    meta_path = f"{corpus.rstrip('/')}.meta.json"
    want = {"n": n, "plant": plant}
    try:
        with open(meta_path) as f:
            if json.load(f) == want and os.path.exists(
                    f"{corpus}/file_000.parquet"):
                return
    except (OSError, ValueError):
        pass
    write(n)
    with open(meta_path, "w") as f:
        json.dump(want, f)


def main() -> None:
    op = os.environ.get("STREAM_E2E_OP", "fine")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    widths = [int(w) for w in sys.argv[2:]] or [2, 8]
    _ensure_corpus(n)
    legs = []
    for w in widths:
        before = os.getloadavg()[0]
        out = subprocess.run(
            [sys.executable, "-c", LEG_CODE, CORPUS, str(w), f"{op}_w{w}"],
            capture_output=True, text=True, timeout=3600,
            env=dict(os.environ, STREAM_E2E_OP=op),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise RuntimeError(f"leg width={w} failed")
        leg = json.loads(line[-1])
        leg["ext_load"] = round(max(before, os.getloadavg()[0] - w), 1)
        legs.append(leg)
        print(json.dumps(leg), flush=True)

    md = [
        "# In-stream near-dup: end-to-end ingest throughput",
        "",
        "Whole-operator measurement (file stream -> 4-band explode -> shuffle",
        "by (band,key) -> applyInPandasWithState vectorized bucket match ->",
        "noop sink), trigger(availableNow) over a pre-written "
        f"{N_FILES}-file parquet",
        f"corpus of {legs[0]['arrivals']:,} arrivals in planted duplicate "
        "families of 4",
        "(members within Hamming <= 3 of the family base). Fresh JVM per leg;",
        "micro-batch = 1 file. The per-arrival match-step micro-bench is in",
        "BENCH/STREAM_MATCH.md.",
        "",
        "| width | wall (s) | arrivals/sec | source rows | micro-batches | ext load |",
        "|---|---|---|---|---|---|",
    ]
    for leg in legs:
        md.append(
            f"| local[{leg['width']}] | {leg['wall_s']} | "
            f"{leg['arrivals_per_sec']} | {leg['source_rows']:,} | "
            f"{leg['batches']} | {leg['ext_load']} |"
        )
    if len(legs) >= 2 and legs[-1]["width"] > legs[0]["width"]:
        ratio = legs[-1]["width"] / legs[0]["width"]
        eff = (legs[-1]["arrivals_per_sec"] / legs[0]["arrivals_per_sec"]) / ratio
        md += [
            "",
            f"- width {legs[0]['width']} -> {legs[-1]['width']} "
            f"({ratio:.0f}x cores) speedup: "
            f"**{legs[-1]['arrivals_per_sec'] / legs[0]['arrivals_per_sec']:.2f}x**, "
            f"efficiency **{eff:.3f}**",
        ]
    md += [
        "",
        f"Reproduce: `STREAM_E2E_OP={op} python tools/stream_e2e_bench.py "
        f"{legs[0]['arrivals']} {' '.join(str(l['width']) for l in legs)}`",
    ]
    suffix = "" if op == "fine" else f"_{op.upper()}"
    if op == "sharded" and "STREAM_E2E_SHARDS" in os.environ:
        suffix += f"_{os.environ['STREAM_E2E_SHARDS']}"
    # _LATEST sidecar (gitignored), never the curated doc: single re-runs
    # would silently clobber the multi-width tables + analysis there —
    # merge by hand, as with SUBMIT_SCALING_LATEST.md
    with open(f"/root/repo/BENCH/STREAM_E2E{suffix}_LATEST.md", "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
