"""Build the --py-files archive for spark-submit.

Zips the `deduplicator_spark` package (sources only, no __pycache__) so a
cluster submit needs just this archive + jobs/submit.py:

    python tools/make_pyfiles.py [/tmp/dedup.zip]

Deterministic: fixed timestamps and sorted entries, so the archive hash only
changes when code changes (useful for cluster-side artifact caching).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "deduplicator_spark")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dedup.zip"
    path = build(out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
