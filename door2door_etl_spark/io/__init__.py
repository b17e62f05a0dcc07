from door2door_etl_spark.io.readers import load_table, read_jsonl_events
from door2door_etl_spark.io.versioned import (
    ConcurrentWriteError,
    VersionedParquetTable,
    apply_changes,
    compact_versioned,
    delete_versioned,
    merge_versioned,
    read_version,
    resolve_table_path,
    table_changes,
)
from door2door_etl_spark.io.writers import (
    JdbcMergeSink,
    MergeSink,
    ParquetMergeSink,
    append_rows,
    merge_upsert_parquet,
    write_jdbc_upsert,
    write_parquet_table,
)

__all__ = [
    "load_table",
    "read_jsonl_events",
    "append_rows",
    "merge_upsert_parquet",
    "write_parquet_table",
    "MergeSink",
    "ParquetMergeSink",
    "JdbcMergeSink",
    "write_jdbc_upsert",
    "ConcurrentWriteError",
    "VersionedParquetTable",
    "resolve_table_path",
    "merge_versioned",
    "compact_versioned",
    "read_version",
    "table_changes",
    "delete_versioned",
    "apply_changes",
]
