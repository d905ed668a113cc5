"""TWKB codec (E2) — reference-compatible semantics, write bug fixed.

Ports lib/spatial/twkb.go: 2-byte header (type in bits 1-4, precision in
5-8 — the reference stores precision RAW, not zigzagged as the official
TWKB spec does; we match the reference so its bytes decode), metadata bits
in byte 2, zigzag-varint delta-coded coordinates scaled by 10^precision.

DIVERGENCE (intentional, documented): the reference's line writer truncates
the point-count uvarint by one byte (`buf[:bWritten-1]`,
lib/spatial/twkb.go:142-145) — its own writer/reader pair cannot round-trip
a linestring, which is why no reference pipeline uses the codec. This
implementation writes the full uvarint; the reference's READ-side goldens
(twkb_test.go:13-67) all pass unchanged.

Polygon framing (uvarint ring count, rings as delta point runs continuing
the previous ring's last point) follows the TWKB spec; the reference never
implemented the polygon level.
"""

from __future__ import annotations

# zigzag semantics match lib/spatial/twkb.go:66-71 — identical to the
# protobuf wire coding, so the shared kernel helpers apply
from .protowire import (
    read_varint,
    unzigzag as _unzigzag,
    varint,
    zigzag64 as _zigzag,
)


class _Reader:
    def __init__(self, buf: bytes, i: int = 0):
        self.buf, self.i = buf, i

    def uvarint(self) -> int:
        v, self.i = read_varint(self.buf, self.i)
        return v

    def svarint(self) -> int:
        return _unzigzag(self.uvarint())


def write_header(gt: int, precision: int, meta: int = 0) -> bytes:
    """lib/spatial/twkb.go:9-14 (+ the metadata byte its reader expects)."""
    return bytes([((precision << 4) ^ gt) & 0xFF, meta & 0xFF])


def read_header(buf: bytes) -> dict:
    """lib/spatial/twkb.go:73-96: type/precision nibbles + metadata bits."""
    b0, b1 = buf[0], buf[1]
    return {
        "type": b0 & 15,
        "precision": b0 >> 4,
        "bbox": b1 & 1 == 1,
        "size": b1 & 2 == 2,
        "id_list": b1 & 4 == 4,
        "extended_precision": b1 & 8 == 8,
        "empty_geom": b1 & 16 == 16,
    }


def _write_point(x: float, y: float, px: float, py: float, precision: int) -> bytes:
    scale = 10**precision
    dx = int(x * scale) - int(px * scale)
    dy = int(y * scale) - int(py * scale)
    return varint(_zigzag(dx)) + varint(_zigzag(dy))


def _read_point(r: _Reader, px: float, py: float, precision: int):
    scale = 10.0**precision
    return (r.svarint() / scale + px, r.svarint() / scale + py)


def encode(gt: int, coords, precision: int = 5) -> bytes:
    """(geom_type, coords) → TWKB bytes. gt: 1=point (x,y), 2=line
    [[x,y],...], 3=polygon [ring, ...]."""
    out = bytearray(write_header(gt, precision))
    if gt == 1:
        out += _write_point(coords[0], coords[1], 0.0, 0.0, precision)
    elif gt == 2:
        out += varint(len(coords))
        px = py = 0.0
        for x, y in coords:
            out += _write_point(float(x), float(y), px, py, precision)
            px, py = float(x), float(y)
    elif gt == 3:
        out += varint(len(coords))
        px = py = 0.0
        for ring in coords:
            out += varint(len(ring))
            for x, y in ring:
                out += _write_point(float(x), float(y), px, py, precision)
                px, py = float(x), float(y)
    else:
        raise ValueError(f"unsupported geom_type {gt}")
    return bytes(out)


def decode(buf: bytes):
    """TWKB bytes → (geom_type, coords); inverse of ``encode``."""
    hd = read_header(buf)
    gt, precision = hd["type"], hd["precision"]
    r = _Reader(buf, 2)
    if gt == 1:
        return 1, _read_point(r, 0.0, 0.0, precision)
    if gt == 2:
        n = r.uvarint()
        pts, px, py = [], 0.0, 0.0
        for _ in range(n):
            px, py = _read_point(r, px, py, precision)
            pts.append([px, py])
        return 2, pts
    if gt == 3:
        nrings = r.uvarint()
        rings, px, py = [], 0.0, 0.0
        for _ in range(nrings):
            n = r.uvarint()
            ring = []
            for _ in range(n):
                px, py = _read_point(r, px, py, precision)
                ring.append([px, py])
            rings.append(ring)
        return 3, rings
    raise ValueError(f"unsupported geom_type {gt}")
