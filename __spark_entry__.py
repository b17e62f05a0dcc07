"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` /``oracle_sql``
expose the full catalog (door2door_etl_spark.queries.catalog) for the
driver's DuckDB correctness harness.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from door2door_etl_spark.queries.catalog import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    return QUERIES["tpch_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query; non-SQL-expressible ops are omitted (driver
    records a rows-only check for those)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
