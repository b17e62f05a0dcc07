"""The assembled query catalog consumed by ``__spark_entry__``.

``QUERIES`` maps name -> QueryDef (Spark fn + DuckDB oracle + SURVEY.md §2
coverage tag).  The driver's correctness harness runs both sides at sf0.01
and hash-compares; ``tools/check_oracle.py`` does the same locally.
"""

from __future__ import annotations

from door2door_etl_spark.queries.advanced_catalog import ADVANCED_QUERIES
from door2door_etl_spark.queries.analyst_catalog import ANALYST_QUERIES
from door2door_etl_spark.queries.defs import QueryDef
from door2door_etl_spark.queries.northstar_catalog import NORTHSTAR_QUERIES
from door2door_etl_spark.queries.relational_catalog import RELATIONAL_QUERIES

_ALL: list[QueryDef] = [
    *RELATIONAL_QUERIES,
    *ANALYST_QUERIES,
    *ADVANCED_QUERIES,
    *NORTHSTAR_QUERIES,
]

QUERIES: dict[str, QueryDef] = {q.name: q for q in _ALL}

if len(QUERIES) != len(_ALL):  # duplicate names are a packaging bug
    raise RuntimeError("duplicate query names in catalog")
