"""Time the pipeline_verdicts DuckDB oracle leg-by-leg at a given sf dir.

The 10x gate run (BENCH/SF10X_GATE.md) saw the oracle side of
pipeline_verdicts grind past 35 minutes while every component oracle that
shares its CTE templates (minhash_lsh_pairs, phash_neardup_pairs,
dedup_clusters) passed at the same scale. Prime suspect: DuckDB inlines
non-recursive CTEs referenced more than once, so the shingle explosion is
recomputed per reference inside the combined query. This tool times each
tier CTE in isolation and then the full oracle, so the fix (MATERIALIZED
hints or restructuring) is measured, not guessed.

Usage: python tools/time_pipeline_oracle.py [sf_dir] [timeout_s]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from deduplicator_spark.entry_queries import ORACLES, _JACCARD_PAIRS_SQL  # noqa: E402

TABLES = ("documents", "embeddings")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    con = duckdb.connect()
    for t in TABLES:
        import os

        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    full = ORACLES["pipeline_verdicts"]
    # Carve out the component legs from the full oracle text so what we time
    # is exactly what the gate runs.
    body = full.split("WITH RECURSIVE", 1)[1]
    legs = {
        "exact (ex)": "WITH " + body.split(",\nph AS")[0] + " SELECT count(*) FROM ex",
        "phash banded (ni)": (
            "WITH "
            + "ph AS" + body.split(",\nph AS", 1)[1].split(",\njp AS")[0]
            + " SELECT count(*) FROM ni"
        ),
        "jaccard (jp)": f"WITH jp AS ({_JACCARD_PAIRS_SQL}) SELECT count(*) FROM jp",
    }
    for name, sql in legs.items():
        t0 = time.perf_counter()
        n = con.execute(sql).fetchone()[0]
        print(f"{name:24s} {time.perf_counter() - t0:8.1f}s  rows={n}", flush=True)

    t0 = time.perf_counter()
    n = len(con.execute(full).fetchall())
    print(f"{'FULL pipeline_verdicts':24s} {time.perf_counter() - t0:8.1f}s  rows={n}", flush=True)


if __name__ == "__main__":
    main()
