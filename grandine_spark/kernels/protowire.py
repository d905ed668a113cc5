"""Minimal protobuf wire-format encode/decode helpers (no protobuf dep).

Used by the MVT encoder (kernels/mvt.py) and the Spaten codec
(sources/spaten.py). Only the wire features those schemas need: varint,
zigzag, length-delimited, packed varints, 64-bit fields.
"""

from __future__ import annotations

import struct


def varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v, s = 0, 0
    while True:
        b = buf[i]
        v |= (b & 0x7F) << s
        s += 7
        i += 1
        if not b & 0x80:
            return v, i


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def ld(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + varint(len(payload)) + payload


def packed_varints(field: int, values) -> bytes:
    return ld(field, b"".join(varint(int(v)) for v in values))


def f64(field: int, value: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", value)


def zigzag32(i: int) -> int:
    return ((i << 1) ^ (i >> 31)) & 0xFFFFFFFF


def zigzag64(i: int) -> int:
    return ((i << 1) ^ (i >> 63)) & 0xFFFFFFFFFFFFFFFF


def unzigzag(v: int) -> int:
    """Inverse of zigzag32/zigzag64 (width-independent on the int domain)."""
    return (v >> 1) ^ -(v & 1)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer.
    value: int for varint(0), bytes for LD(2), 8-byte buf for 64-bit(1),
    4-byte buf for 32-bit(5)."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, i = read_varint(buf, i)
        elif wire == 2:
            ln, i = read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 1:
            v = buf[i : i + 8]
            i += 8
        elif wire == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v
