"""Read-only Iceberg interop: metadata discovery, snapshot resolution,
manifest replay, time travel, schema conversion, loud refusals — plus
the Avro codec the manifests ride on.

All fixtures are REAL Iceberg v2 metadata written by
IcebergFixtureWriter (JSON + Avro containers + parquet) — no iceberg or
avro library dependency."""

import json
import os

import pandas as pd
import pytest

from door2door_etl_spark.io.avro_codec import AvroError, avro_read, avro_write
from door2door_etl_spark.io.iceberg_reader import (
    IcebergFixtureWriter,
    IcebergProtocolError,
    IcebergUnsupportedError,
    iceberg_snapshot,
    iceberg_type_to_spark,
    read_iceberg,
)

FIELDS = [
    {"id": 1, "name": "k", "required": False, "type": "long"},
    {"id": 2, "name": "s", "required": False, "type": "string"},
    {"id": 3, "name": "x", "required": False, "type": "double"},
]


def _pdf(lo, hi):
    return pd.DataFrame(
        {
            "k": range(lo, hi),
            "s": [f"row-{i}" for i in range(lo, hi)],
            "x": [i * 0.5 for i in range(lo, hi)],
        }
    )


def test_avro_codec_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "FX", "size": 4}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "v", "type": ["null", "string"]}],
                },
            },
        ],
    }
    recs = [
        {
            "b": True, "i": -123, "l": 2**45, "f": 0.5, "d": -1.25,
            "s": "héllo", "by": b"\x00\xff", "u": None,
            "arr": ["a", "b"], "m": {"x": 1, "y": -(2**40)}, "e": "B",
            "fx": b"abcd", "nested": {"v": "deep"},
        },
        {
            "b": False, "i": 0, "l": -1, "f": -0.0, "d": 0.0, "s": "",
            "by": b"", "u": 7, "arr": [], "m": {}, "e": "A",
            "fx": b"wxyz", "nested": {"v": None},
        },
    ]
    for codec in ("null", "deflate"):
        s2, out = avro_read(avro_write(schema, recs, codec=codec))
        assert out == recs, codec
    # unsupported codec refuses by name
    data = bytearray(avro_write(schema, recs))
    idx = data.index(b"avro.codec")
    raw = bytes(data).replace(b"\x08null", b"\x0csnappy", 1)
    with pytest.raises(AvroError, match="snappy"):
        avro_read(raw)
    with pytest.raises(AvroError, match="magic"):
        avro_read(b"NOPE" + bytes(data)[4:])


def test_iceberg_type_conversion():
    from pyspark.sql.types import (
        ArrayType, BinaryType, DecimalType, LongType, MapType, StringType,
        StructType, TimestampNTZType, TimestampType,
    )

    assert iceberg_type_to_spark("long") == LongType()
    assert iceberg_type_to_spark("decimal(12, 2)") == DecimalType(12, 2)
    assert iceberg_type_to_spark("fixed[16]") == BinaryType()
    assert iceberg_type_to_spark("timestamp") == TimestampNTZType()
    assert iceberg_type_to_spark("timestamptz") == TimestampType()
    st = iceberg_type_to_spark(
        {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "a", "required": True, "type": "string"},
                {
                    "id": 2, "name": "tags", "required": False,
                    "type": {"type": "list", "element": "string"},
                },
                {
                    "id": 3, "name": "kv", "required": False,
                    "type": {"type": "map", "key": "string", "value": "long"},
                },
            ],
        }
    )
    assert isinstance(st, StructType)
    assert st["a"].dataType == StringType() and not st["a"].nullable
    assert isinstance(st["tags"].dataType, ArrayType)
    assert isinstance(st["kv"].dataType, MapType)
    with pytest.raises(IcebergUnsupportedError, match="not mapped"):
        iceberg_type_to_spark("variant")


def test_read_iceberg_snapshots_and_time_travel(spark, tmp_path):
    """Live set per snapshot: adds accumulate, removes drop; every
    retained snapshot is independently readable; the manifest replay
    marks carried files EXISTING and removed files DELETED."""
    root = str(tmp_path / "t")
    w = IcebergFixtureWriter(root, FIELDS)
    s1, rel1 = w.commit_add(_pdf(0, 5))
    s2, _ = w.commit_add(_pdf(5, 9))
    s3 = w.commit_remove([rel1])

    def keys(snapshot_id=None):
        return sorted(
            r.k for r in read_iceberg(spark, root, snapshot_id=snapshot_id).collect()
        )

    assert keys(s1) == list(range(0, 5))
    assert keys(s2) == list(range(0, 9))
    assert keys(s3) == list(range(5, 9))
    assert keys() == list(range(5, 9))  # current == s3
    out = read_iceberg(spark, root)
    assert out.columns == ["k", "s", "x"]
    got = {r.k: (r.s, r.x) for r in out.collect()}
    assert got[7] == ("row-7", 3.5)
    # unknown snapshot refuses
    with pytest.raises(IcebergProtocolError, match="not in retained"):
        read_iceberg(spark, root, snapshot_id=999)


def test_read_iceberg_relocated_table(spark, tmp_path):
    """Metadata paths carry the writer's absolute location; a MOVED
    table re-anchors manifest + data paths and still reads."""
    import shutil

    orig = str(tmp_path / "orig")
    w = IcebergFixtureWriter(orig, FIELDS)
    w.commit_add(_pdf(0, 4))
    moved = str(tmp_path / "moved")
    shutil.move(orig, moved)
    assert sorted(r.k for r in read_iceberg(spark, moved).collect()) == [0, 1, 2, 3]


def test_read_iceberg_loud_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    w = IcebergFixtureWriter(root, FIELDS)
    w.commit_add(_pdf(0, 3))
    meta_name = "v1.metadata.json"
    meta_path = os.path.join(root, "metadata", meta_name)
    meta = json.loads(open(meta_path).read())

    def write_meta(m, version=2):
        with open(os.path.join(root, "metadata", f"v{version}.metadata.json"), "w") as f:
            json.dump(m, f)

    # format-version 3
    m3 = dict(meta, **{"format-version": 3})
    write_meta(m3)
    with pytest.raises(IcebergUnsupportedError, match="format-version 3"):
        read_iceberg(spark, root)
    # column rename across retained schemas
    renamed = [dict(f) for f in FIELDS]
    renamed[1]["name"] = "s_renamed"
    m4 = dict(meta)
    m4["schemas"] = meta["schemas"] + [
        {"type": "struct", "schema-id": 1, "fields": renamed}
    ]
    m4["current-schema-id"] = 1
    write_meta(m4)
    with pytest.raises(IcebergUnsupportedError, match="rename"):
        read_iceberg(spark, root)
    # delete manifest (content=1) refuses
    from door2door_etl_spark.io.avro_codec import avro_read as ar, avro_write as aw
    from door2door_etl_spark.io.iceberg_reader import _MANIFEST_FILE_SCHEMA

    ml_path = meta["snapshots"][0]["manifest-list"]
    _, manifests = ar(open(ml_path, "rb").read())
    manifests[0]["content"] = 1
    with open(ml_path, "wb") as f:
        f.write(aw(_MANIFEST_FILE_SCHEMA, manifests))
    write_meta(meta)
    with pytest.raises(IcebergUnsupportedError, match="delete manifest"):
        read_iceberg(spark, root)
    # not a table at all
    with pytest.raises(IcebergProtocolError, match="not an Iceberg table"):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_read_iceberg_empty_table(spark, tmp_path):
    """A table whose current snapshot is empty (or that has no
    snapshot) returns an empty frame with the converted schema."""
    root = str(tmp_path / "t")
    w = IcebergFixtureWriter(root, FIELDS)
    _, rel = w.commit_add(_pdf(0, 2))
    w.commit_remove([rel])
    out = read_iceberg(spark, root)
    assert out.count() == 0
    assert out.columns == ["k", "s", "x"]
