"""Incremental rollup maintenance: a partition-scoped materialized view.

The reference's warehouse serves analyst aggregates by rescanning base
tables per query (README.md:48-51).  At 100 TB the standing aggregates a
dashboard hits every minute must be *maintained*, not recomputed — this
module keeps an hour-grained rollup of a warehouse table current by
recomputing ONLY the hour partitions the latest merge batches touched,
extending the pipeline's watermark discipline (SURVEY.md §4 "incremental
computation") from ingest to derived tables.

Correctness model: the rollup is a pure function of each hour partition of
the base table, so partition-scoped overwrite after any upsert converges to
exactly the full recompute — idempotent, safe to re-run, and the refresh
cost scales with data *touched*, not data *stored*.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup_frame(base: DataFrame, ts_col: str, group_cols: list[str]) -> DataFrame:
    """The rollup definition: event counts + distinct keys per (hour, groups)."""
    return base.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour_start"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
    )


def refresh_hourly_rollup(
    spark: SparkSession,
    base_path: str,
    rollup_path: str,
    ts_col: str = "event_timestamp",
    group_cols: list[str] | None = None,
    touched_hours: list | None = None,
) -> int:
    """Bring the rollup at ``rollup_path`` up to date with ``base_path``.

    ``touched_hours``: the hour timestamps changed by recent merges (the
    pipeline knows them from its bookkeeping); only those partitions are
    recomputed and overwritten.  ``None`` means full rebuild (first run).
    Returns the number of hour partitions (re)written.

    Physical layout: the rollup is partitioned by ``hour_start`` date+hour
    directory (same dt=/hr= convention as bronze) so both the refresh
    overwrite and downstream reads prune to exact partitions.
    """
    group_cols = group_cols if group_cols is not None else ["organization_id"]
    base = spark.read.parquet(base_path)
    rollup_exists = Path(rollup_path).exists()

    if touched_hours is None or not rollup_exists:
        frame = hourly_rollup_frame(base, ts_col, group_cols)
        out = frame.withColumn("dt", F.date_format("hour_start", "yyyy-MM-dd")).withColumn(
            "hr", F.date_format("hour_start", "HH")
        )
        out.write.partitionBy("dt", "hr").mode("overwrite").parquet(rollup_path)
        return out.select("dt", "hr").distinct().count()

    n = 0
    for hour in sorted(set(touched_hours)):
        scoped = base.filter(F.date_trunc("hour", F.col(ts_col)) == F.lit(hour))
        frame = hourly_rollup_frame(scoped, ts_col, group_cols)
        part_dir = f"{rollup_path}/dt={hour:%Y-%m-%d}/hr={hour:%H}"
        frame.write.mode("overwrite").parquet(part_dir)
        n += 1
    return n


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Read the rollup with partition columns restored."""
    return spark.read.parquet(rollup_path).drop("dt", "hr")
