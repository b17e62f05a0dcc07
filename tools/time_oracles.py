#!/usr/bin/env python3
"""Time every catalog oracle's DuckDB side alone at a given tier.

Each oracle runs in a subprocess with a timeout so one intractable SQL
twin can't stall the sweep; the output ranks oracles by cost and flags
timeouts.  Used to pick the scale-tractable-oracle work list (VERDICT r6
ask #1) — the ENGINE side is benched separately (bench.py --sf sf1).

Usage: python tools/time_oracles.py [timeout_sec] [name ...]
Env:   SPARK_GRAFT_ORACLE_SF_DIR (default bench_data/sf1)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", str(REPO / "bench_data" / "sf1")
)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CHILD = r"""
import os, sys, time
import duckdb
sf = sys.argv[1]
con = duckdb.connect()
for t in %r:
    path = f"{sf}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
sql = sys.stdin.read()
t0 = time.time()
n = len(con.sql(sql).fetchall())
print(f"{time.time()-t0:.1f} {n}")
""" % (TABLES,)


def main() -> int:
    from door2door_etl_spark.queries.catalog import QUERIES

    argv = sys.argv[1:]
    timeout = float(argv[0]) if argv and argv[0].replace(".", "").isdigit() else 90.0
    names = argv[1:] if argv and argv[0].replace(".", "").isdigit() else argv
    targets = names or [n for n, q in QUERIES.items() if q.oracle is not None]

    rows = []
    for name in targets:
        q = QUERIES[name]
        if q.oracle is None:
            print(f"{'(rows-only)':>10s}  {name}")
            continue
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD, SF_DIR],
                input=q.oracle, text=True, capture_output=True,
                timeout=timeout,
            )
            if out.returncode != 0:
                err = (out.stderr or "").strip().splitlines()
                rows.append((float("inf"), name, f"ERROR {err[-1][:90] if err else '?'}"))
                print(f"{'ERROR':>10s}  {name}  {err[-1][:90] if err else ''}")
                continue
            dt, n = out.stdout.strip().splitlines()[-1].split()
            rows.append((float(dt), name, f"rows={n}"))
            print(f"{float(dt):9.1f}s  {name}  rows={n}")
        except subprocess.TimeoutExpired:
            rows.append((float("inf"), name, f"TIMEOUT>{timeout:.0f}s"))
            print(f"{'TIMEOUT':>10s}  {name}  (> {timeout:.0f}s)")
        sys.stdout.flush()

    print("\n== slowest ==")
    for dt, name, note in sorted(rows, reverse=True)[:25]:
        label = "TIMEOUT/ERR" if dt == float("inf") else f"{dt:.1f}s"
        print(f"{label:>12s}  {name}  {note}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
