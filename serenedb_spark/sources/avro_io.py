"""Pure-Python Avro Object Container File (OCF) reader/writer.

The reference ships an Avro scan extension (``.gitmodules`` duckdb_avro;
``tests/sqllogic`` avro scans). This environment has no Avro jars or
Python bindings, so the repo implements the PUBLISHED format directly
(Apache Avro spec, "Object Container Files" + "Binary Encoding" — spec
text only, no Avro code copied):

  magic "Obj\\x01" · file-metadata map (avro.schema JSON, avro.codec) ·
  16-byte sync marker · blocks of (row-count zigzag-varint, byte-size,
  payload, sync). Payload rows are schema-driven binary: zigzag varints
  for int/long, little-endian IEEE for float/double, length-prefixed
  bytes/string, field-ordered records, branch-indexed unions,
  block-encoded arrays/maps.

The reader is GENERIC — it decodes any OCF by its embedded writer
schema into plain dicts — so downstream consumers (the distributed scan
in sources/io.py, the Iceberg-lite manifest walk) navigate by field
name and survive schema evolution. Codecs: null + deflate (zlib).

The writer exists for fixtures and COPY TO parity (null codec, flat or
nested records); it emits spec-valid files the reader (or any Avro
implementation) can read.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    ln = _read_long(buf)
    return buf.read(ln)


# ---------------------------------------------------------------------------
# schema-driven row decode
# ---------------------------------------------------------------------------

def _decode(schema, buf: io.BytesIO, names: dict):
    if isinstance(schema, str):
        if schema in names:  # named-type reference
            return _decode(names[schema], buf, names)
        kind = schema
    elif isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    else:
        kind = schema["type"]

    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) != b"\x00"
    if kind in ("int", "long"):
        return _read_long(buf)
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "fixed":
        return buf.read(schema["size"])
    if kind == "enum":
        return schema["symbols"][_read_long(buf)]
    if kind == "record":
        if schema.get("name"):
            names.setdefault(schema["name"], schema)
        return {f["name"]: _decode(f["type"], buf, names)
                for f in schema["fields"]}
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
        return out
    if kind == "map":
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
    raise ValueError(f"unsupported Avro type: {schema!r}")


def _collect_names(schema, names: dict) -> None:
    """Pre-register named types so forward references resolve."""
    if isinstance(schema, dict):
        if schema.get("type") == "record" and schema.get("name"):
            names[schema["name"]] = schema
            for f in schema["fields"]:
                _collect_names(f["type"], names)
        elif schema.get("type") in ("fixed", "enum") and schema.get("name"):
            names[schema["name"]] = schema
        elif schema.get("type") == "array":
            _collect_names(schema["items"], names)
        elif schema.get("type") == "map":
            _collect_names(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)


def read_ocf(data: bytes) -> tuple[dict, list]:
    """(writer schema, rows-as-dicts) from OCF bytes."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
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
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    names: dict = {}
    _collect_names(schema, names)

    rows = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            rows.append(_decode(schema, block, names))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows


# ---------------------------------------------------------------------------
# writer (null codec; fixtures + COPY TO)
# ---------------------------------------------------------------------------

def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        if schema in names:
            _encode(names[schema], value, out, names)
            return
        kind = schema
    elif isinstance(schema, list):
        for i, branch in enumerate(schema):
            bk = branch if isinstance(branch, str) else branch["type"]
            if (bk == "null") == (value is None):
                _write_long(out, i)
                _encode(branch, value, out, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    else:
        kind = schema["type"]

    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if value else 0)
    elif kind in ("int", "long"):
        _write_long(out, int(value))
    elif kind == "float":
        out += struct.pack("<f", float(value))
    elif kind == "double":
        out += struct.pack("<d", float(value))
    elif kind == "bytes":
        _write_long(out, len(value))
        out += value
    elif kind == "string":
        b = value.encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif kind == "fixed":
        out += value
    elif kind == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif kind == "record":
        if schema.get("name"):
            names.setdefault(schema["name"], schema)
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out, names)
    elif kind == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, names)
        _write_long(out, 0)
    elif kind == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                _write_long(out, len(kb))
                out += kb
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type: {schema!r}")


def write_ocf(path: str, schema: dict, rows: list) -> None:
    """Write an OCF (null codec, one block) — spec-valid output."""
    names: dict = {}
    _collect_names(schema, names)
    body = bytearray()
    for row in rows:
        _encode(schema, row, body, names)

    out = bytearray()
    out += MAGIC
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    sync = bytes(range(16))
    out += sync
    _write_long(out, len(rows))
    _write_long(out, len(body))
    out += body
    out += sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))
