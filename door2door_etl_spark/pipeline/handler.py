"""Handler step: bronze -> entity split -> normalize -> MERGE upsert -> bookkeeping.

Spark-first reimplementation of reference src/handler/handler.py:13-113
(lifecycle in SURVEY.md §3.3): staged-path lookup (S4), entity split (P3),
schema normalization + surrogate key + dedup (P4/F3/F4/F5/A3), idempotent
key-based upsert (K1), per-entity failure isolation with traceback capture.

Unknown entity values are quarantined (counted, not crashed) — documented
divergence from the reference's KeyError (handler.py:72; SURVEY.md §7).
"""

from __future__ import annotations

import traceback as tb
import uuid
from typing import Callable

from pyspark.sql import SparkSession

from door2door_etl_spark.io.writers import MergeSink, ParquetMergeSink
from door2door_etl_spark.pipeline.bookkeeping import Bookkeeping
from door2door_etl_spark.schemas.normalize import normalize, split_entities
from door2door_etl_spark.schemas.registry import EntitySchema


def run_handler(
    spark: SparkSession,
    workflow_id: str,
    schemas: dict[str, EntitySchema],
    warehouse_root: str,
    bookkeeping: Bookkeeping,
    staged_path: str | None = None,
    sink_for: Callable[[str], MergeSink] | None = None,
) -> dict[str, int]:
    """Run one handler execution; returns ``{target_table: rows_merged}``.

    ``staged_path`` defaults to the bookkeeping lookup by workflow id
    (reference handler.py:61-63); pass explicitly for replay/backfill.

    ``sink_for`` maps a target table name to its :class:`MergeSink`;
    defaults to a :class:`ParquetMergeSink` under ``warehouse_root`` —
    inject :class:`~door2door_etl_spark.io.writers.JdbcMergeSink` (or a
    Delta-backed sink) to retarget the warehouse without touching pipeline
    code.
    """
    # Reference validates the workflow id is a UUID (handler.py:15-21).
    uuid.UUID(str(workflow_id))

    path = staged_path or bookkeeping.ingestor_output_path(workflow_id)
    if path is None:
        raise FileNotFoundError(
            f"no successful ingestor output for workflow {workflow_id}"
        )

    raw = spark.read.parquet(path)
    per_entity = split_entities(raw, list(schemas.keys()))
    results: dict[str, int] = {}
    first_error: Exception | None = None

    if sink_for is None:
        sink_for = lambda table: ParquetMergeSink(  # noqa: E731
            spark, f"{warehouse_root}/{table}"
        )

    for entity, schema in schemas.items():
        table = schema.target_table or entity
        try:
            silver = normalize(per_entity[entity], schema)
            merged = sink_for(table).merge(silver, key="event_generated_id")
            results[table] = merged
            bookkeeping.record_handler(
                workflow_id=workflow_id,
                file_fetch_path=path,
                destination_table=table,
                records_inserted=merged,
            )
        except Exception as exc:  # per-entity isolation (handler.py:91-95)
            first_error = first_error or exc
            bookkeeping.record_handler(
                workflow_id=workflow_id,
                file_fetch_path=path,
                destination_table=table,
                records_inserted=0,
                traceback=tb.format_exc(),
            )

    n_unknown = per_entity["__unknown__"].count()
    if n_unknown:
        bookkeeping.record_handler(
            workflow_id=workflow_id,
            file_fetch_path=path,
            destination_table="__quarantine__",
            records_inserted=n_unknown,
            traceback="unknown entity discriminator values quarantined",
        )
    if first_error is not None and not results:
        raise first_error
    return results
