#!/usr/bin/env python3
"""Count Spark jobs per catalog query — the ambient-immune structural
twin of a wall-clock A/B.  Scheduler-latency-bound queries (the iterative
graph family) show their optimization as a job-count drop that no
co-tenant load can fake or mask.

Usage: python tools/job_counts.py <query> [...]   # sf from $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from door2door_etl_spark.queries.catalog import QUERIES
    from door2door_etl_spark.session import build_session

    names = sys.argv[1:]
    spark = build_session(app_name="job-counts")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, int] = {}
    for name in names:
        fn = QUERIES[name].fn
        sc.setJobGroup(name, name)
        df = fn(spark, sf_dir)
        df.agg(
            F.count(F.lit(1)), F.max(F.xxhash64(F.struct(*df.columns)))
        ).collect()
        sc.setJobGroup("idle", "idle")
        out[name] = len(tracker.getJobIdsForGroup(name))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
