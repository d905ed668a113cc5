"""Spaten codec — the reference's own binary container format, for fixture
interchange (SURVEY.md S1/S2/S3; the engine's production store is parquet).

Format (lib/spaten/lowlevel.go + fileformat/fileformat.proto):
- file header: ``SPAT`` + uint32-LE version (0) — 8 bytes, regression golden
  hex ``5350415400000000`` (lib/spaten/lowlevel_test.go:17-25);
- blocks: uint32-LE body length, uint16-LE flags(0), byte compression(0),
  byte message-type(0), then a protobuf ``Body``:
    Body{meta=1: Meta{tags=1 repeated}, feature=2 repeated}
    Feature{geomtype=1, geomserial=2(WKB=0), geom=3 bytes,
            left=4 right=5 top=6 bottom=7 double, tags=8 repeated}
    Tag{key=1 string, value=2 bytes, type=3: STRING=0|INT=1|DOUBLE=2}
  (int64/float64 tag values little-endian, transform.go:12-61);
- blocks hold up to 1000 features (lib/spaten/codec.go:14).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from ..kernels import protowire as pw

COOKIE = b"SPAT"
VERSION = 0
BLOCK_SIZE = 1000  # lib/spaten/codec.go:14


def file_header() -> bytes:
    return COOKIE + struct.pack("<I", VERSION)


def _encode_tag(key: str, value) -> bytes:
    if isinstance(value, str):
        body = pw.ld(1, key.encode()) + pw.ld(2, value.encode()) + pw.tag(3, 0) + pw.varint(0)
    elif isinstance(value, bool):
        raise ValueError("unsupported tag type: bool")  # transform.go errors on unknown
    elif isinstance(value, int):
        body = (
            pw.ld(1, key.encode())
            + pw.ld(2, struct.pack("<q", value))
            + pw.tag(3, 0)
            + pw.varint(1)
        )
    elif isinstance(value, float):
        body = (
            pw.ld(1, key.encode())
            + pw.ld(2, struct.pack("<d", value))
            + pw.tag(3, 0)
            + pw.varint(2)
        )
    else:
        raise ValueError(f"unsupported tag type: {type(value)}")
    return body


def _decode_tag(buf: bytes):
    key, raw, typ = "", b"", 0
    for field, _, v in pw.iter_fields(buf):
        if field == 1:
            key = v.decode()
        elif field == 2:
            raw = v
        elif field == 3:
            typ = v
    if typ == 0:
        return key, raw.decode()
    if typ == 1:
        return key, struct.unpack("<q", raw)[0]
    if typ == 2:
        return key, struct.unpack("<d", raw)[0]
    raise ValueError(f"unknown tag type {typ}")


def encode_feature(geom_type: int, wkb: bytes, bbox, props: dict) -> bytes:
    out = bytearray()
    out += pw.tag(1, 0) + pw.varint(geom_type)
    out += pw.tag(2, 0) + pw.varint(0)  # WKB
    out += pw.ld(3, wkb)
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        out += pw.f64(4, minx) + pw.f64(5, maxx) + pw.f64(6, maxy) + pw.f64(7, miny)
    for k in sorted(props):
        out += pw.ld(8, _encode_tag(k, props[k]))
    return bytes(out)


def encode_block(features: list[dict], meta: dict | None = None) -> bytes:
    """One block (8-byte block header + body) holding the given features —
    the unit ``write_blocks`` emits per BLOCK_SIZE chunk. Exposed separately
    so distributed writers can encode blocks executor-side and only stream
    finished block bytes through the driver."""
    body = bytearray()
    meta_body = b"".join(
        pw.ld(1, _encode_tag(k, v)) for k, v in sorted((meta or {}).items())
    )
    body += pw.ld(1, meta_body)
    for ft in features:
        body += pw.ld(
            2,
            encode_feature(
                ft["geom_type"], ft["wkb"], ft.get("bbox"), ft.get("props", {})
            ),
        )
    return struct.pack("<IHBB", len(body), 0, 0, 0) + bytes(body)


def write_blocks(features: list[dict], meta: dict | None = None) -> bytes:
    """features: dicts {geom_type, wkb, bbox, props}. Returns full file bytes."""
    out = bytearray(file_header())
    for off in range(0, max(len(features), 1), BLOCK_SIZE):
        chunk = features[off : off + BLOCK_SIZE]
        if not chunk and off > 0:
            break
        out += encode_block(chunk, meta)
    return bytes(out)


def read_blocks(buf: bytes) -> Iterator[tuple[dict, list[dict]]]:
    """Yields (block_meta, features) per block; validates header/cookie with
    the reference's error behavior (invalid cookie / future version rejected,
    lowlevel.go:42-63)."""
    if len(buf) < 8 or buf[:4] != COOKIE:
        raise ValueError("invalid cookie")
    version = struct.unpack("<I", buf[4:8])[0]
    if version > VERSION:
        raise ValueError("invalid file version")
    i = 8
    while i < len(buf):
        if i + 8 > len(buf):
            raise ValueError("truncated block header")
        body_len, flags, comp, mtype = struct.unpack("<IHBB", buf[i : i + 8])
        if comp != 0:
            raise ValueError("only uncompressed blocks supported")
        if mtype != 0:
            raise ValueError("unknown message type")
        i += 8
        if i + body_len > len(buf):
            raise ValueError("truncated block body")
        body = buf[i : i + body_len]
        i += body_len

        meta: dict = {}
        feats: list[dict] = []
        for field, _, v in pw.iter_fields(body):
            if field == 1:  # Meta
                for f2, _, t in pw.iter_fields(v):
                    if f2 == 1:
                        k, val = _decode_tag(t)
                        meta[k] = val
            elif field == 2:  # Feature
                ft = {"geom_type": 0, "wkb": b"", "props": {}}
                bbox = [None, None, None, None]
                for f2, _, fv in pw.iter_fields(v):
                    if f2 == 1:
                        ft["geom_type"] = fv
                    elif f2 == 3:
                        ft["wkb"] = bytes(fv)
                    elif f2 in (4, 5, 6, 7):
                        bbox[f2 - 4] = struct.unpack("<d", fv)[0]
                    elif f2 == 8:
                        k, val = _decode_tag(fv)
                        ft["props"][k] = val
                if all(b is not None for b in bbox):
                    left, right, top, bottom = bbox
                    ft["bbox"] = (left, bottom, right, top)
                # the reference decodes geometry eagerly (lowlevel.go:226-235)
                # → malformed WKB must fail the read, not pass through
                from ..kernels.wkb import from_wkb

                from_wkb(ft["wkb"])
                feats.append(ft)
        yield meta, feats


def read_features(buf: bytes) -> list[dict]:
    out = []
    for _, feats in read_blocks(buf):
        out.extend(feats)
    return out
