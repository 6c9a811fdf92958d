"""Pure-Python Avro *object container file* codec.

The reference's Avro layer (``AvroDatumUtils.scala:15-37``) serializes
a batch of records to container-file bytes — the self-describing form
where the writer schema travels with the data — and decodes bytes back
to ``(schema, records)``.  The ``spark-avro`` connector jar (raw-datum
``from_avro``/``to_avro``) is not bundled with pip pyspark, so this
module implements the container-file encoding from the public Avro
1.x specification directly:

* header: magic ``Obj\\x01`` + metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker;
* data blocks: record count (zigzag varint) + byte size + concatenated
  datums + sync marker;
* datums: zigzag-varint ints/longs, length-prefixed strings/bytes,
  little-endian IEEE floats/doubles, union-index-prefixed unions,
  fields-in-order records, count-block arrays and maps.

Supported schema subset: ``null boolean int long float double bytes
string``, records, arrays, maps, unions, and logical types carried on
those primitives (``timestamp-micros`` etc. — surfaced as their
underlying primitive).  ``codec`` is ``null`` (uncompressed); the sync
marker is derived deterministically from the schema so output is
byte-reproducible.

This codec runs inside Arrow-batched ``mapInPandas`` workers (see
:mod:`.avro`): one container blob per record batch, so the Python cost
is per-batch framing, not per-field dispatch on the JVM boundary.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any

MAGIC = b"Obj\x01"

# ----------------------------------------------------------- primitives


def write_long(buf: bytearray, n: int) -> None:
    n = int(n)
    z = (n << 1) ^ (n >> 63)  # zigzag (Python's >> is arithmetic)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    z = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1)


def _write_bytes(buf: bytearray, b: bytes) -> None:
    write_long(buf, len(b))
    buf.extend(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    return buf.read(n)


# ------------------------------------------------------------ datum I/O


def _base_type(schema: Any) -> Any:
    """Strip logical-type annotation: {'type': 'long', 'logicalType':
    'timestamp-micros'} encodes as its underlying primitive."""
    if isinstance(schema, dict) and schema.get("type") in (
        "null", "boolean", "int", "long", "float", "double", "bytes", "string"
    ) and "logicalType" in schema:
        return schema["type"]
    return schema


def write_datum(buf: bytearray, schema: Any, value: Any) -> None:
    schema = _base_type(schema)
    if isinstance(schema, list):  # union: index then branch datum
        idx = _union_index(schema, value)
        write_long(buf, idx)
        write_datum(buf, schema[idx], value)
        return
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            buf.append(1 if value else 0)
        elif schema in ("int", "long"):
            write_long(buf, value)
        elif schema == "float":
            buf.extend(struct.pack("<f", float(value)))
        elif schema == "double":
            buf.extend(struct.pack("<d", float(value)))
        elif schema == "bytes":
            _write_bytes(buf, bytes(value))
        elif schema == "string":
            _write_bytes(buf, str(value).encode("utf-8"))
        else:
            raise ValueError(f"unsupported avro type {schema!r}")
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            write_datum(buf, f["type"], value[f["name"]])
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                write_datum(buf, schema["items"], it)
        write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                write_datum(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _union_index(union: list, value: Any) -> int:
    """Pick the union branch for a Python value (null vs. the rest)."""
    is_null = value is None or value != value  # NaN → null
    for i, branch in enumerate(union):
        if (_base_type(branch) == "null") == is_null:
            return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


def read_datum(buf: io.BytesIO, schema: Any) -> Any:
    schema = _base_type(schema)
    if isinstance(schema, list):
        return read_datum(buf, schema[read_long(buf)])
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1)[0] == 1
        if schema in ("int", "long"):
            return read_long(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported avro type {schema!r}")
    t = schema["type"]
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                read_long(buf)
            out.extend(read_datum(buf, schema["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# -------------------------------------------------------- container I/O


def _sync_marker(schema_json: str) -> bytes:
    return hashlib.md5(schema_json.encode("utf-8")).digest()


def write_container(records: list[dict], schema: Any) -> bytes:
    """Encode records as one Avro object container file (one block)."""
    schema_json = json.dumps(schema) if not isinstance(schema, str) else schema
    sync = _sync_marker(schema_json)
    buf = bytearray()
    buf.extend(MAGIC)
    write_long(buf, 2)  # metadata map: one block of two entries
    _write_bytes(buf, b"avro.codec")
    _write_bytes(buf, b"null")
    _write_bytes(buf, b"avro.schema")
    _write_bytes(buf, schema_json.encode("utf-8"))
    write_long(buf, 0)  # end of map
    buf.extend(sync)
    parsed = json.loads(schema_json) if isinstance(schema, str) else schema
    payload = bytearray()
    for rec in records:
        write_datum(payload, parsed, rec)
    write_long(buf, len(records))
    write_long(buf, len(payload))
    buf.extend(payload)
    buf.extend(sync)
    return bytes(buf)


def _read_header(buf: io.BytesIO) -> tuple[Any, bytes]:
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(buf)  # skip block byte size
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    return schema, sync


def read_schema(data: bytes) -> Any:
    """Header-only parse: the embedded writer schema, without decoding
    any records (the cheap discovery pass)."""
    return _read_header(io.BytesIO(data))[0]


def read_container(data: bytes) -> tuple[Any, list[dict]]:
    """Decode an Avro object container file → (writer schema, records).

    This is the self-describing path: the schema is *discovered from
    the bytes*, mirroring the reference's dynamic-schema decode.
    """
    buf = io.BytesIO(data)
    schema, sync = _read_header(buf)
    records: list[dict] = []
    while True:
        try:
            n = read_long(buf)
        except EOFError:
            break
        read_long(buf)  # block byte size
        for _ in range(n):
            records.append(read_datum(buf, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
    return schema, records
