"""Ingestor step: hour-bucket scan -> bronze stage write -> bookkeeping.

Spark-first reimplementation of reference src/ingestor/ingestor.py:11-83
(lifecycle in SURVEY.md §3.2):

1. watermark -> fetch hour (+1h advance, cold-start default)
2. distributed JSONL scan of that hour with provenance + malformed-drop (S1)
3. UNION ALL of all files — implicit: one multi-path ``spark.read.json``
   replaces the reference's ``merge_jsons`` list concatenation (helper.py:11-27)
4. bronze stage write (K3) — parquet instead of a merged JSON blob: columnar,
   splittable, and the hour directory IS the staging identity
5. bookkeeping row with traceback-on-failure (K2); failed hours re-fetch
   because the watermark ignores rows with tracebacks
"""

from __future__ import annotations

import datetime as dt
import traceback as tb
from pathlib import Path

from pyspark.sql import SparkSession

from door2door_etl_spark.io.readers import read_jsonl_events
from door2door_etl_spark.pipeline.bookkeeping import Bookkeeping


def run_ingestor(
    spark: SparkSession,
    workflow_id: str,
    source_glob: str | list[str],
    bronze_root: str,
    bookkeeping: Bookkeeping,
    fetch_hour: dt.datetime | None = None,
) -> str | None:
    """Run one ingestor execution; returns the bronze path written (or None).

    ``source_glob`` is the raw-event landing location (local path or any
    Hadoop-FS URI — s3a:// in production).  The bronze layout is
    ``{bronze_root}/dt=YYYY-MM-DD/hr=HH`` so downstream reads get partition
    pruning for free (SURVEY.md §4 temporal pruning).
    """
    hour = fetch_hour or bookkeeping.next_fetch_hour()
    dest = f"{bronze_root}/dt={hour:%Y-%m-%d}/hr={hour:%H}"
    try:
        events = read_jsonl_events(spark, source_glob, hour=hour)
        # Spark's json reader already unioned every matching file (the
        # reference's merge_jsons step); count distinct source files for the
        # bookkeeping record.
        n_files = events.select("original_s3_file_path").distinct().count()
        if n_files > 0:
            events.write.mode("overwrite").parquet(dest)
        bookkeeping.record_ingestor(
            workflow_id=workflow_id,
            fetched_hour=hour,
            number_of_files_fetched=n_files,
            file_destination_path=dest if n_files > 0 else None,
        )
        return dest if n_files > 0 else None
    except Exception:
        bookkeeping.record_ingestor(
            workflow_id=workflow_id,
            fetched_hour=hour,
            number_of_files_fetched=0,
            file_destination_path=None,
            traceback=tb.format_exc(),
        )
        raise
