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
# Optional relative tolerance for FLOAT columns (e.g. "1e-7"): at the sf1
# tier, 10x rows reorder double summation and the driver's exact value
# hash over-rejects; with RTOL set, a hash mismatch falls back to a
# sorted pairwise numeric comparison and reports OK~ when every float
# agrees within tolerance and every non-float matches exactly.  The
# driver's sf0.01 gate stays exact — never set this there.
_rt = os.environ.get("SPARK_GRAFT_ORACLE_RTOL")
RTOL = float(_rt) if _rt else None


def _close_under_rtol(sdf: pd.DataFrame, odf: pd.DataFrame, rtol: float) -> bool:
    import numpy as np

    if len(sdf) != len(odf):
        return False
    s = sdf[sorted(sdf.columns)].copy()
    o = odf[sorted(odf.columns)].copy()
    float_cols = [c for c in s.columns if pd.api.types.is_float_dtype(s[c])]
    other = [c for c in s.columns if c not in float_cols]
    # Sort both sides by the exact-rendered non-float fields, breaking
    # ties by FULL-precision float values: rounding the tie-break would
    # mis-pair rows whose floats straddle a rounding boundary (one side
    # 0.10499, the other 0.10501), turning an in-tolerance query into a
    # spurious FAIL.  With full precision, mis-pairing needs two rows of
    # one key group closer to each other than the cross-engine error —
    # and then isclose still passes against either pairing.
    def keyed(df):
        k = df.copy()
        for c in float_cols:
            k[c] = k[c].astype(float)
        return df.loc[k.sort_values(other + float_cols, kind="mergesort").index]

    s, o = keyed(s).reset_index(drop=True), keyed(o).reset_index(drop=True)
    for c in other:
        if not (s[c].astype(str).values == o[c].astype(str).values).all():
            return False
    for c in float_cols:
        a = s[c].astype(float).to_numpy()
        b = o[c].astype(float).to_numpy()
        ok = np.isclose(a, b, rtol=rtol, atol=1e-9, equal_nan=True)
        if not ok.all():
            return False
    return True
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
        rtol_note = ""
        if not problems:
            hs, ho = value_hash(normalize(sdf)), value_hash(normalize(odf))
            if hs != ho and RTOL is not None and _close_under_rtol(
                sdf, odf, RTOL
            ):
                # Float-summation-order artifact (expected at the sf1
                # tier: 10x rows reorder double accumulation) — values
                # agree within the stated relative tolerance.
                rtol_note = f" (hash differs; values within rtol={RTOL})"
            elif hs != ho:
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
            tag = "OK~  " if rtol_note else "OK   "
            print(f"{tag} {name:38s} rows={len(sdf)}{rtol_note} "
                  f"[{time.time()-t0:.1f}s]")
        # Release operator-managed caches (two-phase scans, pair-join
        # relations) so a full sweep doesn't accumulate dozens of
        # input-scale cached frames across 150 queries.
        spark.catalog.clearCache()

    print(f"\n{len(targets) - len(failures)}/{len(targets)} matched")
    if failures:
        print("failed:", ", ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
