from door2door_etl_spark.io.readers import load_table, read_jsonl_events
from door2door_etl_spark.io.writers import (
    append_rows,
    merge_upsert_parquet,
    write_parquet_table,
)

__all__ = [
    "load_table",
    "read_jsonl_events",
    "append_rows",
    "merge_upsert_parquet",
    "write_parquet_table",
]
