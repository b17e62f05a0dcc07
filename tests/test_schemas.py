"""Unit tests: schema registry, normalization plan, surrogate-key derivation.

Known-answer vectors for the key derivation follow the reference scheme
(src/helper/helper.py:153-173): sha256 of concatenated canonical strings,
first 32 hex chars formatted as a UUID.
"""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from door2door_etl_spark.schemas.keys import surrogate_uuid_expr
from door2door_etl_spark.schemas.normalize import normalize, split_entities
from door2door_etl_spark.schemas.registry import (
    ColumnSpec,
    EntitySchema,
    builtin_door2door_schemas,
    load_schema_registry,
)


def expected_uuid(concat: str) -> str:
    h = hashlib.sha256(concat.encode()).hexdigest()[:32]
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


RAW_EVENTS = [
    {
        "event": "update",
        "on": "vehicle",
        "at": "2022-11-24T10:04:00.000Z",
        "organization_id": " org-x1 ",
        "data": {
            "id": "b4d2b3a0-0000-0000-0000-000000000001",
            "location": {"lat": 52.4567, "lng": 13.3207, "at": "2022-11-24T10:03:58Z"},
        },
    },
    {
        "event": "create",
        "on": "operating_period",
        "at": "2022-11-24T10:00:00.000Z",
        "organization_id": "org-x1",
        "data": {"id": "op_1", "start": "2022-11-24T08:00:00Z", "finish": "not-a-date"},
    },
    {
        "event": "update",
        "on": "mystery",
        "at": "2022-11-24T10:05:00.000Z",
        "organization_id": "org-x1",
        "data": {"id": "zzz"},
    },
]


@pytest.fixture(scope="module")
def raw_df(spark):
    import json

    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(e) for e in RAW_EVENTS])
    )


def test_surrogate_uuid_known_answer(spark):
    df = spark.createDataFrame([Row(a="veh-1", b="2022-11-24 10:04:00")])
    out = df.select(surrogate_uuid_expr([F.col("a"), F.col("b")]).alias("id")).first()
    assert out["id"] == expected_uuid("veh-12022-11-24 10:04:00")


def test_surrogate_uuid_null_token(spark):
    df = spark.createDataFrame([Row(a=None, b="x")], "a string, b string")
    out = df.select(surrogate_uuid_expr(["a", "b"]).alias("id")).first()
    assert out["id"] == expected_uuid("Nonex")


def test_surrogate_uuid_timestamp_canonical(spark):
    from pyspark.sql import types as T

    df = spark.sql(
        "SELECT cast('2022-11-24 10:04:00' as timestamp) ts, "
        "cast('2022-11-24 10:04:00.123456' as timestamp) ts_frac"
    )
    out = df.select(
        surrogate_uuid_expr([F.col("ts")], [T.TimestampType()]).alias("a"),
        surrogate_uuid_expr([F.col("ts_frac")], [T.TimestampType()]).alias("b"),
    ).first()
    assert out["a"] == expected_uuid("2022-11-24 10:04:00")
    assert out["b"] == expected_uuid("2022-11-24 10:04:00.123456")


def test_normalize_vehicle(spark, raw_df):
    schema = builtin_door2door_schemas()["vehicle"]
    veh = normalize(split_entities(raw_df, ["vehicle", "operating_period"])["vehicle"], schema)
    rows = veh.collect()
    assert len(rows) == 1
    row = rows[0].asDict()
    assert row["vehicle_id"] == "b4d2b3a0-0000-0000-0000-000000000001"
    assert row["organization_id"] == "org-x1"  # trimmed (P6)
    assert abs(row["vehicle_latitude"] - 52.4567) < 1e-9
    assert row["event_timestamp"].hour == 10
    assert row["event_generated_id"] == expected_uuid(
        "b4d2b3a0-0000-0000-0000-0000000000012022-11-24 10:04:00"
    )


def test_normalize_coerce_null_on_bad_timestamp(spark, raw_df):
    schema = builtin_door2door_schemas()["operating_period"]
    op = normalize(
        split_entities(raw_df, ["vehicle", "operating_period"])["operating_period"],
        schema,
    )
    row = op.first().asDict()
    assert row["operation_finish"] is None  # "not-a-date" coerced to NULL
    assert row["operation_start"] is not None


def test_split_entities_quarantine(spark, raw_df):
    parts = split_entities(raw_df, ["vehicle", "operating_period"])
    assert parts["__unknown__"].count() == 1
    assert parts["vehicle"].count() == 1


def test_normalize_missing_path_gives_null_column(spark):
    df = spark.createDataFrame([Row(a="x")])
    schema = EntitySchema(
        entity="e",
        columns=[
            ColumnSpec("a", "string", "a_out", is_key=True),
            ColumnSpec("missing.nested", "float", "m_out"),
        ],
    )
    row = normalize(df, schema).first().asDict()
    assert row["m_out"] is None
    assert row["a_out"] == "x"


def test_unknown_type_raises(spark):
    df = spark.createDataFrame([Row(a="x")])
    schema = EntitySchema(
        entity="e", columns=[ColumnSpec("a", "geometry", "a", is_key=True)]
    )
    with pytest.raises(ValueError, match="No Spark type equivalent"):
        normalize(df, schema)


def test_dedup_on_key(spark):
    df = spark.createDataFrame(
        [Row(a="k", b=1.0), Row(a="k", b=2.0), Row(a="j", b=3.0)]
    )
    schema = EntitySchema(
        entity="e",
        columns=[ColumnSpec("a", "string", "a", is_key=True), ColumnSpec("b", "float", "b")],
    )
    out = normalize(df, schema)
    assert out.count() == 2  # duplicate key collapsed (A3)


def test_yaml_registry_roundtrip(tmp_path):
    yaml_text = """\
vehicle:
  table: vehicle_location
  columns:
    - source: data.id
      type: uuid
      name: vehicle_id
      unique_identifier: true
    - source: at
      type: timestamp
      name: event_timestamp
      unique_identifier: true
    - source: event
      type: string
      name: event_operation
"""
    path = tmp_path / "schema.yaml"
    path.write_text(yaml_text)
    reg = load_schema_registry(path)
    schema = reg["vehicle"]
    assert schema.target_table == "vehicle_location"
    assert [c.target_name for c in schema.columns] == [
        "vehicle_id",
        "event_timestamp",
        "event_operation",
    ]
    assert [c.target_name for c in schema.key_columns] == [
        "vehicle_id",
        "event_timestamp",
    ]
