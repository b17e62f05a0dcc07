"""Schema-driven normalization: compiled select/cast/trim/alias plan.

The reference's ``df_columns_normalization`` (src/helper/helper.py:63-150) is
an eager pandas pipeline: copy schema-declared columns (implicit pruning) ->
cast with null-on-failure coercion -> strip whitespace on strings -> rename ->
derive surrogate key -> drop duplicate keys.  Here the same semantics compile
into ONE declarative DataFrame plan so Catalyst gets projection pruning and
whole-stage codegen for free (SURVEY.md §2.9, §4):

    normalize(df, schema) ==
        df.select(cast/trim/alias…)            # P4, F3, F4, P6
          .withColumn("event_generated_id", …) # F5
          .dropDuplicates(["event_generated_id"])  # A3

Null/coercion semantics (SURVEY.md §1.2): ``try_cast`` everywhere — a value
that fails to parse becomes NULL (pandas ``errors="coerce"``), never an error,
also keeping the plan ANSI-mode-proof on driver-owned sessions.  Missing
source paths resolve to NULL columns (json_normalize yields NaN for missing
paths; helper.py:105-122 keeps them as nulls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from door2door_etl_spark.schemas.keys import surrogate_uuid_expr
from door2door_etl_spark.schemas.registry import ColumnSpec, EntitySchema

KEY_COLUMN = "event_generated_id"


def _has_path(df: DataFrame, dotted: str) -> bool:
    """True if the dotted path resolves against the DataFrame schema."""
    parts = dotted.split(".")
    current: T.DataType = df.schema
    for part in parts:
        if isinstance(current, T.StructType) and part in current.fieldNames():
            current = current[part].dataType
        else:
            return False
    return True


def _typed_column(df: DataFrame, spec: ColumnSpec) -> Column:
    """Project + coerce-cast + trim one declared column."""
    if not _has_path(df, spec.source_path):
        # Missing path -> typed NULL column (json_normalize NaN semantics).
        return F.lit(None).cast(spec.spark_type).alias(spec.target_name)
    col = F.col(spec.source_path)
    target = spec.spark_type
    if isinstance(target, (T.TimestampType, T.DateType)):
        # pandas to_datetime(errors="coerce", tz strip) — try_cast yields NULL
        # on unparseable input; ISO-8601 'Z'/offset forms are parsed then
        # rendered in the session's UTC timezone (reference strips tz after
        # converting, helper.py:110-117).
        cast = F.expr(
            f"try_cast({_quote(spec.source_path)} AS {target.simpleString()})"
        )
    else:
        cast = col.try_cast(target)
    if spec.is_string_like:
        cast = F.trim(cast)  # helper.py:128-132 whitespace strip (P6/F4)
    return cast.alias(spec.target_name)


def _quote(dotted: str) -> str:
    return ".".join(f"`{p}`" for p in dotted.split("."))


def normalize(
    df: DataFrame,
    schema: EntitySchema,
    derive_key: bool = True,
    deduplicate: bool = True,
) -> DataFrame:
    """Apply the full declared-schema normalization plan to a raw frame.

    Column order in the output = YAML declaration order with the surrogate
    key first (matches the warehouse DDL, migrations/init.sql:29-51).
    """
    projected = df.select([_typed_column(df, spec) for spec in schema.columns])

    if not derive_key:
        return projected

    key_specs = schema.key_columns
    if not key_specs:
        raise ValueError(f"entity {schema.entity!r} declares no unique_identifier")
    key_expr = surrogate_uuid_expr(
        [F.col(s.target_name) for s in key_specs],
        [s.spark_type for s in key_specs],
    )
    out = projected.withColumn(KEY_COLUMN, key_expr).select(
        KEY_COLUMN, *[s.target_name for s in schema.columns]
    )
    if deduplicate:
        # First-occurrence-wins is order-undefined in a distributed engine;
        # the reference's pandas keep="first" (helper.py:148) is equally
        # arbitrary w.r.t. S3 listing order.  dropDuplicates keeps an
        # arbitrary row per key — callers needing stable picks should order
        # upstream (row_number pattern, see operators.relational).
        out = out.dropDuplicates([KEY_COLUMN])
    return out


def split_entities(df: DataFrame, entities: list[str], on_col: str = "on"):
    """Entity split (P3, reference src/handler/handler.py:70-72).

    Returns ``{entity: filtered DataFrame}`` plus a ``"__unknown__"`` frame
    for values not in ``entities`` (the reference KeyErrors on those —
    SURVEY.md §7 chooses quarantine-with-metrics instead).
    """
    out = {e: df.filter(F.col(on_col) == F.lit(e)) for e in entities}
    out["__unknown__"] = df.filter(
        ~F.col(on_col).isin(entities) | F.col(on_col).isNull()
    )
    return out
