#!/usr/bin/env python3
"""Dump .explain("formatted") for catalog queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> <query> [<query> ...]

The plan is captured at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) —
the bench tier, so plan shape claims line up with the bench numbers.
Queries whose builder runs driver-side jobs (iterative operators) capture the
plan of the RETURNED DataFrame; the per-round plan shapes are pinned by
tests/test_plans.py instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from door2door_etl_spark.queries.catalog import QUERIES
    from door2door_etl_spark.session import build_session

    spark = build_session(app_name="capture-plans")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
