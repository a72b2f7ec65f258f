"""Detect whether this host is REALLY quiet (neighbor tenants included).

loadavg only counts local runnable tasks; on this box identical jobs swing
1.4-2.7x at loadavg ~0 (BENCH/LAUNCHER_AB.md), i.e. neighbor tenants steal
physical cores / memory bandwidth invisibly. This probe measures what the
scaling legs actually consume — multi-threaded numpy throughput — and
prints achieved GFLOP-ish score per width so a watcher can gate timed runs
on TRUE quiet, not loadavg quiet.

Usage: python tools/quiet_probe.py [width] [seconds]
Prints one JSON line: {"width": W, "score": ops/sec-ish, "load1": ...}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

# one BLAS thread per call, else OpenBLAS spreads each matmul over every
# core and the per-width score stops measuring width at all
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

import numpy as np  # noqa: E402


def _spin(stop: list, counter: list, idx: int) -> None:
    a = np.random.default_rng(idx).random((256, 256))
    n = 0
    while not stop:
        a = a @ a
        a /= np.abs(a).max() + 1.0  # keep finite
        n += 1
    counter[idx] = n


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    stop: list = []
    counter = [0] * width
    threads = [
        threading.Thread(target=_spin, args=(stop, counter, i), daemon=True)
        for i in range(width)
    ]
    # numpy matmul releases the GIL, so plain threads saturate `width` cores
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.append(True)
    for t in threads:
        t.join(timeout=5)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "width": width,
        "score": round(sum(counter) / dt, 1),
        "load1": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
