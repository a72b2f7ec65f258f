"""Audio-tier N-vs-4N scaling bench (per-modality point for the north rule).

Same measurement design as tools/scaling_bench.py (interleaved best-of-N,
per-context warm-up, pre-written + page-cache-warmed parquet corpus, load
sampled before every timed run), applied to the audio tier end-to-end:
FAUD decode -> windowed subfingerprints (Arrow mapInPandas) -> hot-print
drop -> exact-print equi-join -> offset-consistent alignment scoring
(operators/audio.near_audio_pairs).

Corpus: deterministic pure-function-of-id clips, synthesized DISTRIBUTED via
mapInPandas and written to parquet first (synthesis is input
materialization, not dedup work). Every odd clip is its even partner
trimmed by 4 windows (a re-master the tier must find at offset -4); odd
ids % 5 == 3 are independent novel clips (negative controls).

Usage: python tools/audio_scaling_bench.py [n_clips] [small] [big] [out_md]
Writes BENCH/AUDIO_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

WIN = 1024
N_WINDOWS = 30
TRIM = 4
REPEATS = 3
WARMUP_N = 400
CORPUS_DIR = "/tmp/audio_scaling_corpus"


def _clip(i: int) -> np.ndarray:
    base_id = i - (i % 2)
    rng = np.random.Generator(np.random.PCG64(base_id))
    w = rng.integers(-3000, 3000, size=N_WINDOWS * WIN).astype(np.int16)
    if i % 2 == 0:
        return w
    if i % 5 == 3:  # novel odd clip: independent waveform
        rng2 = np.random.Generator(np.random.PCG64(i * 1_000_003 + 7))
        return rng2.integers(-3000, 3000, size=N_WINDOWS * WIN).astype(np.int16)
    return w[TRIM * WIN:]  # trimmed re-master of the even partner


def _write_corpus(spark, n: int) -> None:
    import pandas as pd

    from deduplicator_spark.codecs import encode_audio

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "audio_id": [f"a-{int(i):09d}" for i in pdf["id"]],
                "bytes": [encode_audio(_clip(int(i))) for i in pdf["id"]],
            })

    (spark.range(n).repartition(64).mapInPandas(
        gen, schema="audio_id string, bytes binary")
     .write.mode("overwrite").parquet(CORPUS_DIR))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out_md = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/BENCH/AUDIO_SCALING.md"

    from deduplicator_spark.operators.audio import near_audio_pairs
    from deduplicator_spark.session import get_spark, stop_spark

    spark = get_spark("audio-corpus")
    _write_corpus(spark, n)
    stop_spark()
    for fn in os.listdir(CORPUS_DIR):
        with open(os.path.join(CORPUS_DIR, fn), "rb") as f:
            while f.read(1 << 24):
                pass

    times: dict[int, list[float]] = {small: [], big: []}
    loads: dict[int, list[float]] = {small: [], big: []}
    pairs: dict[int, int] = {}
    for r in range(REPEATS):
        for cores in ((small, big) if r % 2 == 0 else (big, small)):
            spark = get_spark(f"audio-scaling-{cores}-r{r}", cores=cores)
            warm = spark.read.parquet(CORPUS_DIR).limit(WARMUP_N)
            near_audio_pairs(warm).write.format("noop").mode("overwrite").save()
            audios = spark.read.parquet(CORPUS_DIR)
            loads[cores].append(round(os.getloadavg()[0], 1))
            t0 = time.perf_counter()
            res = near_audio_pairs(audios)
            res.write.format("noop").mode("overwrite").save()
            times[cores].append(round(time.perf_counter() - t0, 2))
            pairs[cores] = int(res.count())
            stop_spark()

    best = {c: min(ts) for c, ts in times.items()}
    rate = {c: round(n / best[c], 1) for c in best}
    eff = (rate[big] / rate[small]) / (big / small)
    # planted truth: every even/odd pair except the novel odds (odd ids with
    # i % 5 == 3, i.e. i % 10 == 3 -> n // 10 of all ids)
    planted = n // 2 - n // 10
    summary = {
        "n_clips": n,
        "planted_pairs": planted,
        "planted_recall": round(pairs[small] / planted, 4) if planted else None,
        "small": {"cores": small, "sec": best[small], "clips_per_sec": rate[small],
                  "all_runs_sec": times[small], "load_before_runs": loads[small]},
        "big": {"cores": big, "sec": best[big], "clips_per_sec": rate[big],
                "all_runs_sec": times[big], "load_before_runs": loads[big]},
        "speedup": round(rate[big] / rate[small], 2),
        "scaling_efficiency": round(eff, 3),
        "pairs_identical": pairs[small] == pairs[big],
        "verified_pairs": pairs[small],
    }
    print(json.dumps(summary))

    with open(out_md, "w") as f:
        f.write(f"""# Audio-tier scaling evidence — N vs 4N parallelism

The audio near-dup tier end-to-end (FAUD decode -> windowed subfingerprints
in Arrow batches -> hot-print drop -> exact-print equi-join ->
offset-consistent alignment scoring) on the SAME pre-written {n}-clip
parquet corpus ({N_WINDOWS} windows/clip; every odd non-novel clip a
trim-by-{TRIM} re-master of its even partner) at two parallelism levels,
interleaved best-of-{REPEATS} with per-context warm-up.

| parallelism | best wall (s) | clips/sec | all runs (s) | load avg before runs |
|---|---|---|---|---|
| local[{small}] | {best[small]} | {rate[small]} | {times[small]} | {loads[small]} |
| local[{big}] | {best[big]} | {rate[big]} | {times[big]} | {loads[big]} |

- speedup {small}->{big} cores ({big // small}x resources): **{summary['speedup']}x**
- scaling efficiency: **{summary['scaling_efficiency']}** (criterion: >= 0.8)
- verified pairs identical across levels: {summary['pairs_identical']}
  ({pairs[small]} pairs — parallelism-invariant output)
- planted-pair recall: **{summary['planted_recall']}** ({pairs[small]} of
  {planted} planted re-master pairs; criterion >= 0.99 — this line is what
  caught the 15-bit print-space saturation, see codecs.audio_subfingerprints)

Reproduce: `python tools/audio_scaling_bench.py {n} {small} {big}`
""")


if __name__ == "__main__":
    main()
