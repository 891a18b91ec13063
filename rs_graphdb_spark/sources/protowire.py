"""Minimal proto3 wire codec for the reference's gRPC surface.

The reference serves three RPCs over tonic
(`/root/reference/proto/graphdb.proto:59-64`, `src/grpc/mod.rs:1-50`).
Every RPC is a thin wrapper over the same engine calls the HTTP server
makes, so the engine gap was zero — but the WIRE format had no analog.
This module closes it: a dependency-free proto3 encoder/decoder for
exactly the messages in `graphdb.proto` (Value oneof, Node,
Relationship, the three request/response pairs), served by
`sources/http_server.py` under ``POST /grpc/<Method>`` with
``application/x-protobuf`` bodies — protobuf-over-HTTP, the
grpc-web/Connect unary shape.

Wire format implemented from the public protobuf encoding spec:
varints (wire type 0), 64-bit little-endian doubles (wire type 1),
length-delimited strings/messages/maps (wire type 2). proto3 map fields
are repeated entries with key=1, value=2.
"""

from __future__ import annotations

import struct
from typing import Iterator

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _write_varint(n: int) -> bytes:
    if n < 0:  # proto int64: 10-byte two's-complement varint
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _tag(field: int, wire: int) -> bytes:
    return _write_varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (strings, sub-messages, map entries)."""
    return _tag(field, 2) + _write_varint(len(payload)) + payload


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_number, wire_type, raw_value) over a message body."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            if len(val) != 8:
                raise ValueError("truncated fixed64")
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _i64(v: int) -> int:
    """uint64 varint → signed int64 (two's complement)."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# Value oneof (graphdb.proto:6-13): int=1, bool=2, text=3, float=4
# ---------------------------------------------------------------------------


def encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(2, 0) + _write_varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(1, 0) + _write_varint(v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        return _ld(3, v.encode("utf-8"))
    raise TypeError(f"unsupported Value type {type(v).__name__}")


def decode_value(buf: bytes):
    out = None
    for field, _wire, raw in _fields(buf):
        if field == 1:
            out = _i64(raw)
        elif field == 2:
            out = bool(raw)
        elif field == 3:
            out = raw.decode("utf-8")
        elif field == 4:
            out = struct.unpack("<d", raw)[0]
    return out


def _encode_props(field: int, props: dict) -> bytes:
    """map<string, Value> — repeated entry messages {1: key, 2: Value}.
    Sorted keys for deterministic bytes (protobuf maps are unordered;
    determinism helps tests and caching)."""
    out = bytearray()
    for k in sorted(props):
        entry = _ld(1, k.encode("utf-8")) + _ld(2, encode_value(props[k]))
        out += _ld(field, entry)
    return bytes(out)


def _decode_prop_entry(buf: bytes) -> tuple[str, object]:
    key, val = "", None
    for field, _wire, raw in _fields(buf):
        if field == 1:
            key = raw.decode("utf-8")
        elif field == 2:
            val = decode_value(raw)
    return key, val


# ---------------------------------------------------------------------------
# messages
# ---------------------------------------------------------------------------


def encode_node(node_id: int, labels: list[str], props: dict) -> bytes:
    out = _tag(1, 0) + _write_varint(node_id)
    for lb in labels:
        out += _ld(2, lb.encode("utf-8"))
    return out + _encode_props(3, props)


def decode_node(buf: bytes) -> dict:
    out = {"id": 0, "labels": [], "properties": {}}
    for field, _wire, raw in _fields(buf):
        if field == 1:
            out["id"] = raw
        elif field == 2:
            out["labels"].append(raw.decode("utf-8"))
        elif field == 3:
            k, v = _decode_prop_entry(raw)
            out["properties"][k] = v
    return out


def encode_relationship(rel_id: int, start: int, end: int,
                        rel_type: str, props: dict) -> bytes:
    return (
        _tag(1, 0) + _write_varint(rel_id)
        + _tag(2, 0) + _write_varint(start)
        + _tag(3, 0) + _write_varint(end)
        + _ld(4, rel_type.encode("utf-8"))
        + _encode_props(5, props)
    )


def decode_relationship(buf: bytes) -> dict:
    out = {"id": 0, "start": 0, "end": 0, "rel_type": "", "properties": {}}
    for field, _wire, raw in _fields(buf):
        if field == 1:
            out["id"] = raw
        elif field == 2:
            out["start"] = raw
        elif field == 3:
            out["end"] = raw
        elif field == 4:
            out["rel_type"] = raw.decode("utf-8")
        elif field == 5:
            k, v = _decode_prop_entry(raw)
            out["properties"][k] = v
    return out


def encode_create_node_request(labels: list[str], props: dict) -> bytes:
    out = b""
    for lb in labels:
        out += _ld(1, lb.encode("utf-8"))
    return out + _encode_props(2, props)


def decode_create_node_request(buf: bytes) -> dict:
    out = {"labels": [], "properties": {}}
    for field, _wire, raw in _fields(buf):
        if field == 1:
            out["labels"].append(raw.decode("utf-8"))
        elif field == 2:
            k, v = _decode_prop_entry(raw)
            out["properties"][k] = v
    return out


def encode_create_rel_request(start: int, end: int, rel_type: str,
                              props: dict) -> bytes:
    return (
        _tag(1, 0) + _write_varint(start)
        + _tag(2, 0) + _write_varint(end)
        + _ld(3, rel_type.encode("utf-8"))
        + _encode_props(4, props)
    )


def decode_create_rel_request(buf: bytes) -> dict:
    out = {"start": 0, "end": 0, "rel_type": "", "properties": {}}
    for field, _wire, raw in _fields(buf):
        if field == 1:
            out["start"] = raw
        elif field == 2:
            out["end"] = raw
        elif field == 3:
            out["rel_type"] = raw.decode("utf-8")
        elif field == 4:
            k, v = _decode_prop_entry(raw)
            out["properties"][k] = v
    return out


def encode_cypher_request(query: str) -> bytes:
    return _ld(1, query.encode("utf-8"))


def decode_cypher_request(buf: bytes) -> str:
    for field, _wire, raw in _fields(buf):
        if field == 1:
            return raw.decode("utf-8")
    return ""


def encode_cypher_response(rows: list[dict]) -> bytes:
    out = bytearray()
    for row in rows:
        out += _ld(1, _encode_props(1, {
            k: v for k, v in row.items() if v is not None
        }))
    return bytes(out)


def decode_cypher_response(buf: bytes) -> list[dict]:
    rows = []
    for field, _wire, raw in _fields(buf):
        if field == 1:
            row = {}
            for f2, _w2, raw2 in _fields(raw):
                if f2 == 1:
                    k, v = _decode_prop_entry(raw2)
                    row[k] = v
            rows.append(row)
    return rows
