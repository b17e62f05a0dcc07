#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness harness.

Runs every catalog query on Spark and its oracle on DuckDB at sf0.01,
comparing row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values normalized).  Exit 0 iff all
match.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Override with SPARK_GRAFT_ORACLE_SF_DIR to oracle-check another tier
# (e.g. the generated bench_data/sf1 — DuckDB handles 6M-row lineitem
# fine, giving correctness-at-scale evidence, not just sf0.01).
SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[col] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f").map(
                lambda v: "NULL" if not isinstance(v, str) else v
            )
        elif pd.api.types.is_float_dtype(s):
            df[col] = s.map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        else:
            df[col] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    return rows


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(names: list[str]) -> int:
    from door2door_etl_spark.queries.catalog import QUERIES
    from door2door_etl_spark.session import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):  # multi-file tables (the sf1 tier)
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    targets = names or list(QUERIES)
    failures = []
    for name in targets:
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL  {name:38s} spark error: {exc}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ROWS  {name:38s} rows={len(sdf)} (no oracle; rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception as exc:
            print(f"FAIL  {name:38s} oracle error: {exc}")
            failures.append(name)
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(normalize(sdf)), value_hash(normalize(odf))
            if hs != ho:
                problems.append(f"value-hash spark={hs} oracle={ho}")
                srows, orows = normalize(sdf), normalize(odf)
                diff = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                for a, b in diff:
                    problems.append(f"  spark={a}")
                    problems.append(f"  duck ={b}")
        if problems:
            print(f"FAIL  {name:38s} " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"OK    {name:38s} rows={len(sdf)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(targets) - len(failures)}/{len(targets)} matched")
    if failures:
        print("failed:", ", ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
