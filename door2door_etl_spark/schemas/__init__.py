from door2door_etl_spark.schemas.registry import (
    ColumnSpec,
    EntitySchema,
    builtin_door2door_schemas,
    load_schema_registry,
)
from door2door_etl_spark.schemas.normalize import normalize
from door2door_etl_spark.schemas.keys import surrogate_uuid_expr

__all__ = [
    "ColumnSpec",
    "EntitySchema",
    "builtin_door2door_schemas",
    "load_schema_registry",
    "normalize",
    "surrogate_uuid_expr",
]
