"""Declarative schema registry: source path -> (type, target name, key flag).

Replicates the reference's YAML schema model (reference
src/helper/schema_entities.yaml:1-57, loaded at src/handler/handler.py:53)
as plain dataclasses; :func:`load_schema_registry` accepts the same YAML file
layout (via a minimal parser so we need no yaml dependency) or a dict.

Type vocabulary and its Spark mapping follow SURVEY.md §1.2 (reference
src/helper/helper.py:74-87 ``source_to_pandas_type_mapping``); unknown types
raise at plan-build time, matching helper.py:134-137.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import types as T

#: YAML type name -> Spark type.  ``decimal`` intentionally degrades to
#: double to match reference semantics (helper.py:81 maps decimal->float64 —
#: noted divergence candidate in SURVEY.md §1.2).
SOURCE_TO_SPARK_TYPE: dict[str, T.DataType] = {
    "uuid": T.StringType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "smallint": T.ShortType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "decimal": T.DoubleType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "bit": T.BooleanType(),
    "bool": T.BooleanType(),
}

_STRING_LIKE = {"uuid", "varchar", "char", "string"}


@dataclass(frozen=True)
class ColumnSpec:
    """One schema entry: dotted source path -> typed, renamed target column."""

    source_path: str  # dotted path into the raw JSON, e.g. "data.location.lat"
    type_name: str  # YAML type vocabulary key
    target_name: str  # output column name
    is_key: bool = False  # unique_identifier flag (feeds surrogate key)

    @property
    def spark_type(self) -> T.DataType:
        try:
            return SOURCE_TO_SPARK_TYPE[self.type_name]
        except KeyError:
            # Matches reference helper.py:134-137 "No dataframe type equivalent".
            raise ValueError(
                f"No Spark type equivalent for declared type {self.type_name!r} "
                f"(column {self.source_path!r})"
            ) from None

    @property
    def is_string_like(self) -> bool:
        return self.type_name in _STRING_LIKE


@dataclass
class EntitySchema:
    """All declared columns of one entity, in YAML declaration order.

    Declaration order matters: the surrogate key concatenates key columns in
    this order (reference src/helper/helper.py:99-103).
    """

    entity: str
    columns: list[ColumnSpec] = field(default_factory=list)
    target_table: str | None = None

    @property
    def key_columns(self) -> list[ColumnSpec]:
        return [c for c in self.columns if c.is_key]


def builtin_door2door_schemas() -> dict[str, EntitySchema]:
    """The reference's two entities, transcribed from
    src/helper/schema_entities.yaml:1-57 (column order preserved)."""
    vehicle = EntitySchema(
        entity="vehicle",
        target_table="vehicle_location",
        columns=[
            ColumnSpec("data.id", "uuid", "vehicle_id", is_key=True),
            ColumnSpec("at", "timestamp", "event_timestamp", is_key=True),
            ColumnSpec("event", "string", "event_operation"),
            ColumnSpec("organization_id", "string", "organization_id"),
            ColumnSpec("data.location.lat", "float", "vehicle_latitude"),
            ColumnSpec("data.location.lng", "float", "vehicle_longitude"),
            ColumnSpec("data.location.at", "timestamp", "vehicle_location_timestamp"),
            ColumnSpec("original_s3_file_path", "string", "original_s3_file_path"),
        ],
    )
    operating_period = EntitySchema(
        entity="operating_period",
        target_table="operating_periods",
        columns=[
            ColumnSpec("data.id", "string", "operating_period_id", is_key=True),
            ColumnSpec("at", "timestamp", "event_timestamp", is_key=True),
            ColumnSpec("event", "string", "event_operation"),
            ColumnSpec("organization_id", "string", "organization_id"),
            ColumnSpec("data.start", "timestamp", "operation_start"),
            ColumnSpec("data.finish", "timestamp", "operation_finish"),
            ColumnSpec("original_s3_file_path", "string", "original_s3_file_path"),
        ],
    )
    return {"vehicle": vehicle, "operating_period": operating_period}


def load_schema_registry(source: str | Path | dict) -> dict[str, EntitySchema]:
    """Load a schema registry from a dict or a YAML file.

    Dict layout (mirrors the reference YAML,
    src/helper/schema_entities.yaml):

    .. code-block:: python

        {"vehicle": {"table": "vehicle_location",
                     "columns": [{"source": "data.id", "type": "uuid",
                                  "name": "vehicle_id",
                                  "unique_identifier": True}, ...]}}

    The YAML path accepts the same structure; a restricted single-purpose
    parser handles the subset of YAML the registry uses (mappings + lists of
    scalar mappings), avoiding an external dependency.
    """
    if isinstance(source, (str, Path)):
        data = _parse_restricted_yaml(Path(source).read_text())
    else:
        data = source

    registry: dict[str, EntitySchema] = {}
    for entity, spec in data.items():
        cols = [
            ColumnSpec(
                source_path=c["source"],
                type_name=str(c["type"]).lower(),
                target_name=c["name"],
                is_key=bool(c.get("unique_identifier", False)),
            )
            for c in spec["columns"]
        ]
        registry[entity] = EntitySchema(
            entity=entity, columns=cols, target_table=spec.get("table")
        )
    return registry


def _parse_restricted_yaml(text: str) -> dict:
    """Parse the registry subset of YAML: nested mappings, ``- key: value``
    list items (with continuation keys), scalar bools/strings."""
    lines = [
        (len(raw) - len(raw.lstrip()), raw.strip())
        for raw in text.splitlines()
        if raw.strip() and not raw.lstrip().startswith("#")
    ]
    value, rest = _parse_block(lines, 0, 0)
    if rest != len(lines):
        raise ValueError(f"trailing content at line index {rest}")
    return value


def _parse_block(lines, i: int, min_indent: int):
    """Parse a block starting at ``lines[i]`` whose items sit at one indent
    level >= min_indent; return (value, next_index)."""
    if i >= len(lines):
        return {}, i
    indent = lines[i][0]
    if indent < min_indent:
        return {}, i

    if lines[i][1].startswith("- "):
        items = []
        while i < len(lines) and lines[i][0] == indent and lines[i][1].startswith("- "):
            item: dict = {}
            key, _, val = lines[i][1][2:].partition(":")
            item[key.strip()] = _scalar(val)
            i += 1
            # Continuation keys of the same list item, indented deeper.
            while i < len(lines) and lines[i][0] > indent and not lines[i][1].startswith("- "):
                key, _, val = lines[i][1].partition(":")
                if val.strip() == "":
                    child, i = _parse_block(lines, i + 1, lines[i][0] + 1)
                    item[key.strip()] = child
                else:
                    item[key.strip()] = _scalar(val)
                    i += 1
            items.append(item)
        return items, i

    mapping: dict = {}
    while i < len(lines) and lines[i][0] == indent:
        line = lines[i][1]
        if line.startswith("- "):
            break
        key, _, val = line.partition(":")
        if val.strip() == "":
            child, i = _parse_block(lines, i + 1, indent + 1)
            mapping[key.strip()] = child
        else:
            mapping[key.strip()] = _scalar(val)
            i += 1
    return mapping, i


def _scalar(value: str):
    value = value.strip().strip("'\"")
    low = value.lower()
    if low in {"true", "yes"}:
        return True
    if low in {"false", "no"}:
        return False
    return value
