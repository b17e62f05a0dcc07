"""Minimal Apache Avro object-container codec (read AND write), built
from the PUBLIC Avro 1.11 specification (avro.apache.org/docs/1.11.1/
specification) — no avro library ships in this environment, and Iceberg
metadata (manifest lists + manifests, :mod:`.iceberg_reader`) is Avro.

Scope and posture:

- Full binary-encoding coverage on READ: null, boolean, int, long
  (zigzag varints), float, double, bytes, string, record, enum, array,
  map, union, fixed — a generic decoder driven by the WRITER schema
  embedded in the container header, so manifests written by real
  Iceberg libraries decode without this module knowing their schema in
  advance.
- Container codecs: ``null`` and ``deflate`` (raw zlib, spec §
  "Required Codecs").  ``snappy``/``zstandard`` refuse loudly with the
  codec named (no compression lib here; wrong data is worse than none).
- WRITE exists for fixtures/tests (single block, null codec): the
  encoder is the decoder's mirror and is property-tested round-trip.
  It is NOT a general-purpose Avro writer (no schema resolution, no
  blocking of large arrays) — fixture-grade, same honesty posture as
  ``DeltaFixtureWriter``.

This module is driver-side metadata machinery: Avro payloads here are
manifest-scale (KBs), never data-scale.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Structurally invalid Avro container or value stream."""


# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    return (acc >> 1) ^ -(acc & 1)


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else ((-n) << 1) - 1


def _write_varint(out: bytearray, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise AvroError("negative byte length")
    data = buf.read(n)
    if len(data) != n:
        raise AvroError("truncated bytes")
    return data


# --------------------------------------------------------------------------
# schema-driven value decode / encode
# --------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO, names: dict):
    """Decode one value of ``schema`` (parsed JSON form) from ``buf``.
    ``names`` resolves named-type references (record/enum/fixed by
    full name)."""
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], buf, names)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            b = buf.read(1)
            if not b:
                raise AvroError("truncated boolean")
            return b != b"\x00"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise AvroError(f"unknown primitive type {t!r}")
    if isinstance(schema, list):  # union: long index then value
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t == "record":
        _register(schema, names)
        return {
            f["name"]: _decode(f["type"], buf, names)
            for f in schema["fields"]
        }
    if t == "enum":
        _register(schema, names)
        idx = _read_long(buf)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)  # block size in bytes, skippable
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    if t == "fixed":
        _register(schema, names)
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise AvroError("truncated fixed")
        return data
    # {"type": "string"} style wrapping of primitives / named refs
    return _decode(t, buf, names)


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if not name:
        return
    ns = schema.get("namespace")
    full = f"{ns}.{name}" if ns and "." not in name else name
    names.setdefault(full, schema)
    names.setdefault(name, schema)


def _prescan_names(schema, names: dict) -> None:
    """Register every named type up front so forward/backward name
    references resolve regardless of field order."""
    if isinstance(schema, list):
        for s in schema:
            _prescan_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        _register(schema, names)
    if t == "record":
        for f in schema.get("fields", []):
            _prescan_names(f["type"], names)
    elif t == "array":
        _prescan_names(schema.get("items"), names)
    elif t == "map":
        _prescan_names(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _prescan_names(t, names)


def _encode(schema, value, out: bytearray, names: dict) -> None:
    """Encoder mirror of :func:`_decode` (fixture writing)."""
    if isinstance(schema, str):
        if schema in names:
            return _encode(names[schema], value, out, names)
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if value else 0)
            return
        if t in ("int", "long"):
            _write_varint(out, int(value))
            return
        if t == "float":
            out.extend(struct.pack("<f", float(value)))
            return
        if t == "double":
            out.extend(struct.pack("<d", float(value)))
            return
        if t == "bytes":
            _write_varint(out, len(value))
            out.extend(value)
            return
        if t == "string":
            data = value.encode("utf-8")
            _write_varint(out, len(data))
            out.extend(data)
            return
        raise AvroError(f"unknown primitive type {t!r}")
    if isinstance(schema, list):  # union: pick the matching branch
        idx = _union_index(schema, value)
        _write_varint(out, idx)
        return _encode(schema[idx], value, out, names)
    t = schema["type"]
    if t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] not in value:
                raise AvroError(f"record missing field {f['name']!r}")
            _encode(f["type"], value[f["name"]], out, names)
        return
    if t == "enum":
        _register(schema, names)
        _write_varint(out, schema["symbols"].index(value))
        return
    if t == "array":
        if value:
            _write_varint(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, names)
        _write_varint(out, 0)
        return
    if t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                data = k.encode("utf-8")
                _write_varint(out, len(data))
                out.extend(data)
                _encode(schema["values"], v, out, names)
        _write_varint(out, 0)
        return
    if t == "fixed":
        _register(schema, names)
        if len(value) != schema["size"]:
            raise AvroError("fixed size mismatch")
        out.extend(value)
        return
    return _encode(t, value, out, names)


def _union_index(union: list, value) -> int:
    def kind(s):
        if isinstance(s, dict):
            return s["type"]
        return s

    for i, s in enumerate(union):
        k = kind(s)
        if value is None and k == "null":
            return i
        if value is not None and k != "null":
            return i
    raise AvroError(f"no union branch for {type(value).__name__}")


# --------------------------------------------------------------------------
# object container
# --------------------------------------------------------------------------


def avro_read(data: bytes) -> tuple[dict | list | str, list]:
    """Parse an Avro object-container file: returns (writer schema,
    records).  Codecs: null, deflate; anything else refuses loudly."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise AvroError("not an Avro object container (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    sync = buf.read(16)
    if len(sync) != 16:
        raise AvroError("truncated container header")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(
            f"unsupported Avro codec {codec!r} (null and deflate are "
            "implemented; refusing rather than misreading)"
        )
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    names: dict = {}
    _prescan_names(schema, names)
    return schema, _read_container_blocks(buf, codec, schema, names)


def _read_container_blocks(buf: io.BytesIO, codec: str, schema, names):
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise AvroError("truncated block")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        bbuf = io.BytesIO(payload)
        for _ in range(n):
            records.append(_decode(schema, bbuf, names))
        if len(buf.read(16)) != 16:
            raise AvroError("truncated block sync marker")
    return records


def avro_write(schema: dict, records: list, codec: str = "null") -> bytes:
    """Write an Avro object container (single block) — fixture-grade
    mirror of :func:`avro_read`."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    names: dict = {}
    _prescan_names(schema, names)
    body = bytearray()
    for r in records:
        _encode(schema, r, body, names)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    out = bytearray()
    out.extend(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    sync = b"spark-graft-sync"  # deterministic 16-byte marker
    out.extend(sync)
    if records:
        _write_varint(out, len(records))
        _write_varint(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)
