"""Minimal pure-Python Avro Object Container File (OCF) codec.

Why this exists: the external ``spark-avro`` jar is not shipped in this
environment (SURVEY.md format-matrix note), but Avro is a mainstream wire
format a user of the reference's ecosystem would expect, and its container
format is simple enough to implement exactly from the public spec
(https://avro.apache.org/docs/current/specification/ — "Object Container
Files"): magic ``Obj\\x01``, a file-metadata map carrying the writer schema
JSON and codec, a 16-byte sync marker, then data blocks of
``(row_count, byte_size, rows..., sync)`` with longs in zigzag-varint
encoding. Only the ``null`` codec and the scalar types the engine's text
wires already use (long / double / string, nullable via the standard
``["null", T]`` union) are implemented — enough for a lossless,
cross-implementation-readable roundtrip, not a general Avro library.

The encode/decode functions are plain bytes<->rows transforms so the Spark
side can run them inside ``mapInPandas`` over Arrow batches: encoding is a
per-partition streaming write (one OCF file per partition, the same layout
``spark-avro`` produces), decoding rides the ``binaryFile`` reader. No
driver-side row handling anywhere.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"
#: Deterministic sync marker: the roundtrip is content-addressed and
#: repeatable; real writers randomize this, readers only require the
#: in-file consistency the spec asks for.
SYNC = bytes(range(16))


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_value(typ: str, v, out: bytearray) -> None:
    if typ == "long":
        out += _zigzag_encode(int(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    else:  # pragma: no cover - schema is engine-controlled
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(typ: str, buf: io.BytesIO):
    if typ == "long":
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    raise ValueError(f"unsupported avro type {typ!r}")  # pragma: no cover


def record_schema(name: str, fields: list[tuple[str, str]]) -> dict:
    """Avro record schema over nullable scalars: each field is the
    standard ``["null", T]`` union (branch index 0 = null, 1 = value)."""
    return {
        "type": "record",
        "name": name,
        "fields": [{"name": f, "type": ["null", t]} for f, t in fields],
    }


def write_ocf(rows, schema: dict) -> bytes:
    """Encode an iterable of dict-rows as one OCF byte blob (null codec,
    single data block — a partition's worth; real files append blocks)."""
    body = bytearray()
    n = 0
    fields = [(f["name"], f["type"][1]) for f in schema["fields"]]
    for row in rows:
        for name, typ in fields:
            v = row[name]
            if v is None:
                body += _zigzag_encode(0)  # union branch: null
            else:
                body += _zigzag_encode(1)  # union branch: value
                _encode_value(typ, v, body)
        n += 1
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        out += _zigzag_encode(len(kb))
        out += kb
        out += _zigzag_encode(len(v))
        out += v
    out += _zigzag_encode(0)  # end of metadata map
    out += SYNC
    if n:
        out += _zigzag_encode(n)
        out += _zigzag_encode(len(body))
        out += body
        out += SYNC
    return bytes(out)


def read_ocf(blob: bytes) -> tuple[dict, list[dict]]:
    """Decode an OCF blob -> (writer schema, rows). Validates magic,
    metadata codec, and the per-block sync marker."""
    buf = io.BytesIO(blob)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n_entries = _zigzag_decode(buf)
        if n_entries == 0:
            break
        if n_entries < 0:
            # spec: a negative block count is followed by the block's
            # byte size (a fast-skip aid); consume it, then |count|
            # entries
            _zigzag_decode(buf)
            n_entries = -n_entries
        for _ in range(n_entries):
            klen = _zigzag_decode(buf)
            k = buf.read(klen).decode("utf-8")
            vlen = _zigzag_decode(buf)
            meta[k] = buf.read(vlen)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":  # pragma: no cover - we only write null
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields = [(f["name"], f["type"][1]) for f in schema["fields"]]
    sync = buf.read(16)
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _zigzag_decode(buf)
        _size = _zigzag_decode(buf)
        for _ in range(n):
            row = {}
            for name, typ in fields:
                branch = _zigzag_decode(buf)
                row[name] = None if branch == 0 else _decode_value(typ, buf)
            rows.append(row)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows
