from door2door_etl_spark.streaming.pipeline import (
    read_cms_state,
    stream_cms_maintenance,
    stream_dedup_by_key,
    stream_events,
    stream_heavy_hitters,
    stream_hll_maintenance,
    stream_hourly_counts,
    stream_manifest_lsh_admission,
    stream_replicate_manifest_table,
    stream_sessionize,
    stream_stream_interval_join,
    stream_upsert_to_warehouse,
)

__all__ = [
    "read_cms_state",
    "stream_cms_maintenance",
    "stream_dedup_by_key",
    "stream_events",
    "stream_heavy_hitters",
    "stream_hll_maintenance",
    "stream_hourly_counts",
    "stream_manifest_lsh_admission",
    "stream_replicate_manifest_table",
    "stream_sessionize",
    "stream_stream_interval_join",
    "stream_upsert_to_warehouse",
]
