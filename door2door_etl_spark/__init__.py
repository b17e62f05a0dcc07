"""door2door_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of the
MarcosPampuch/door2door-etl reference (see SURVEY.md), re-expressed Spark-first:

- declarative schema-driven normalization (``schemas/``) — the reference's
  YAML schema + pandas normalization (reference ``src/helper/helper.py:63-150``)
  becomes a compiled Catalyst ``select/cast/trim/alias`` plan;
- sources/sinks (``io/``) — provenance-tagged JSONL reading with corrupt-record
  policy (reference ``src/helper/s3.py:37-73``) and an idempotent key-based
  MERGE-style upsert sink (reference ``src/helper/postgres.py:157-189``);
- incremental pipeline runner (``pipeline/``) — watermark bookkeeping,
  ingestor/handler semantics (reference ``src/ingestor/ingestor.py``,
  ``src/handler/handler.py``);
- the analytics operator pack (``operators/``) — relational query surface plus
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale;
- a query catalog (``queries/``) wiring every operator to a DuckDB-checkable
  oracle query.

Everything is built on the public PySpark DataFrame API; there are no custom
Catalyst rules — the engine's "optimizer" is Catalyst + AQE, fed declarative
plans (SURVEY.md §4).
"""

__version__ = "0.1.0"
