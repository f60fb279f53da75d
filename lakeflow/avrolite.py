"""Minimal clean-room Avro object-container-file codec (null codec).

Iceberg's manifest and manifest-list files are Avro object container
files (Avro 1.x spec, "Object Container Files"); no Avro library ships
in this environment, so :mod:`lakeflow.iceberg` carries its own
encoder/decoder, derived from the PUBLIC Avro specification only:

- container = magic ``Obj\\x01`` + file-metadata map (``avro.schema``
  JSON, ``avro.codec``) + 16-byte sync marker, then data blocks of
  (record count, byte size, records, sync marker);
- primitives: zigzag-varint ``int``/``long``, length-prefixed
  ``string``/``bytes``, 1-byte ``boolean``, IEEE little-endian
  ``float``/``double``, zero-byte ``null``;
- complex: ``record`` = fields in schema order, ``union`` = zigzag
  branch index + value, ``array``/``map`` = non-empty blocks terminated
  by a zero count, ``fixed`` = raw bytes.

Scope (everything the Iceberg metadata dialect needs, nothing more):
null codec only, schemas inlined (no named-type references), unions
matched null-first then by python type. The independent decoder in
``tools/iceberg_reader.py`` re-derives the same spec separately so the
conformance round-trip is not self-referential on this module.
"""

from __future__ import annotations

import io
import json
import struct
import uuid
from typing import Any

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


def _schema_type(schema: Any) -> Any:
    """Normalize: a schema node is a primitive name string, a union
    list, or a dict with a "type" key (possibly wrapping a primitive,
    e.g. {"type": "string"})."""
    if isinstance(schema, dict) and schema.get("type") in _PRIMITIVES:
        return schema["type"]
    return schema


def encode_value(buf: io.BytesIO, schema: Any, value: Any) -> None:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise ValueError(f"null schema got {value!r}")
            return
        if schema == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            _write_long(buf, int(value))
        elif schema == "float":
            buf.write(struct.pack("<f", float(value)))
        elif schema == "double":
            buf.write(struct.pack("<d", float(value)))
        elif schema == "bytes":
            _write_bytes(buf, bytes(value))
        elif schema == "string":
            _write_bytes(buf, str(value).encode("utf-8"))
        else:
            raise ValueError(f"unsupported primitive {schema!r}")
        return
    if isinstance(schema, list):  # union: null-first convention
        for idx, branch in enumerate(schema):
            if _schema_type(branch) == "null":
                if value is None:
                    _write_long(buf, idx)
                    return
            elif value is not None:
                _write_long(buf, idx)
                encode_value(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    kind = schema["type"]
    if kind == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                encode_value(buf, f["type"], f["default"])
            else:
                encode_value(buf, f["type"], value[f["name"]])
    elif kind == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for item in items:
                encode_value(buf, schema["items"], item)
        _write_long(buf, 0)
    elif kind == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                encode_value(buf, schema["values"], v)
        _write_long(buf, 0)
    elif kind == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(value))
    else:
        raise ValueError(f"unsupported schema kind {kind!r}")


def decode_value(buf: io.BytesIO, schema: Any) -> Any:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            raw = buf.read(1)
            if not raw:
                raise EOFError("truncated boolean")
            return raw == b"\x01"
        if schema in ("int", "long"):
            return _read_long(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported primitive {schema!r}")
    if isinstance(schema, list):
        idx = _read_long(buf)
        return decode_value(buf, schema[idx])
    kind = schema["type"]
    if kind == "record":
        return {f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]}
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (legal per spec)
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if kind == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
    if kind == "fixed":
        return buf.read(schema["size"])
    raise ValueError(f"unsupported schema kind {kind!r}")


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, bytes] | None = None,
) -> None:
    """Write an Avro object container file (null codec, one block)."""
    meta: dict[str, bytes] = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    sync = uuid.uuid4().bytes
    body = io.BytesIO()
    for rec in records:
        encode_value(body, schema, rec)
    with open(path, "wb") as f:
        head = io.BytesIO()
        head.write(MAGIC)
        _write_long(head, len(meta))
        for k, v in meta.items():
            _write_bytes(head, k.encode("utf-8"))
            _write_bytes(head, v)
        _write_long(head, 0)
        head.write(sync)
        f.write(head.getvalue())
        if records:
            block = io.BytesIO()
            _write_long(block, len(records))
            _write_long(block, len(body.getvalue()))
            block.write(body.getvalue())
            block.write(sync)
            f.write(block.getvalue())


def read_container(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Read an Avro object container file written with the null codec.
    Returns (schema, records, file-metadata)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise NotImplementedError(f"{path}: codec {codec!r} unsupported")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        try:
            count = _read_long(buf)
        except EOFError:
            break
        _read_long(buf)  # byte size (unused with null codec)
        for _ in range(count):
            records.append(decode_value(buf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records, meta
