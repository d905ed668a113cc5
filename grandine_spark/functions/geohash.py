"""Geohash codec as pure Catalyst expressions (no Python, no UDF).

Geohash (public domain, Niemeyer 2008): interleave the binary refinements
of lon (even bit positions, MSB first) and lat (odd positions), then
base32-encode 5 bits per character with the alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``. The bisection construction is
equivalent to fixed-point quantization: for ``5p`` total bits, lon gets
``ceil(5p/2)`` bits and lat ``floor(5p/2)``, and the cell index along each
axis is ``floor((x - lo) / span * 2^nbits)`` — so the whole encode is
integer shifts/masks over two quantized longs, which stays inside
whole-stage codegen and has an exact ANSI-SQL twin (``geohash_sql``).

The decode inverse returns the cell bbox (not a point): fixed substring
positions + ``strpos`` against the alphabet, unrolled per character —
still no Python.

This is the geo-API surface users expect next to the slippy z/x/y cell id
(functions/tile_exprs.py); both are equi-joinable prefixes — a geohash
prefix of length k is exactly a coarser cell, like cell_parent for tiles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _nbits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon, lat


def _quant(v: Column, lo: float, span: float, nbits: int) -> Column:
    q = F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(float(1 << nbits))).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit((1 << nbits) - 1))


def geohash_encode(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Geohash string of ``precision`` characters, fully JVM-native.

    Built per character (each char's 5-bit index accumulates its own bit
    terms) rather than through one shared interleaved word: Catalyst
    inlines shared subexpressions per use, so a ``5p``-bit shared word
    re-expanded per character makes the tree quadratic in ``p`` — at p=7
    the analyzer visibly stalls. The per-char form keeps it linear."""
    nlon, nlat = _nbits(precision)
    lon_q = _quant(lon, -180.0, 360.0, nlon)
    lat_q = _quant(lat, -90.0, 180.0, nlat)
    chars = F.array(*[F.lit(c) for c in ALPHABET])
    out = None
    for j in range(precision):
        idx = F.lit(0).cast("long")
        for k in range(5):
            b = 5 * j + k  # global bit position, 0 = MSB
            if b % 2 == 0:
                src, pos = lon_q, nlon - 1 - b // 2
            else:
                src, pos = lat_q, nlat - 1 - (b - 1) // 2
            idx = idx + (F.shiftright(src, pos) % 2) * F.lit(1 << (4 - k))
        ch = F.element_at(chars, (idx + 1).cast("int"))
        out = ch if out is None else F.concat(out, ch)
    return out


def geohash_decode_bbox(gh: Column, precision: int) -> dict[str, Column]:
    """Inverse: the cell bbox of a geohash of known ``precision`` —
    {'minx','miny','maxx','maxy'} Columns. Per-char bit accumulation (see
    geohash_encode for why); no Python."""
    nlon, nlat = _nbits(precision)
    vals = [
        (F.instr(F.lit(ALPHABET), F.substring(gh, j + 1, 1)) - 1).cast("long")
        for j in range(precision)
    ]
    lon_q = F.lit(0).cast("long")
    lat_q = F.lit(0).cast("long")
    for j in range(precision):
        for k in range(5):
            b = 5 * j + k
            bit = F.shiftright(vals[j], 4 - k) % 2
            if b % 2 == 0:
                lon_q = lon_q + bit * F.lit(1 << (nlon - 1 - b // 2))
            else:
                lat_q = lat_q + bit * F.lit(1 << (nlat - 1 - (b - 1) // 2))
    lon_span = 360.0 / (1 << nlon)
    lat_span = 180.0 / (1 << nlat)
    return {
        "minx": lon_q * F.lit(lon_span) - F.lit(180.0),
        "miny": lat_q * F.lit(lat_span) - F.lit(90.0),
        "maxx": (lon_q + 1) * F.lit(lon_span) - F.lit(180.0),
        "maxy": (lat_q + 1) * F.lit(lat_span) - F.lit(90.0),
    }


def geohash_sql_parts(lon: str, lat: str, precision: int = 6) -> tuple[str, str, str, str]:
    """The exact DuckDB twin of ``geohash_encode``, as staged expressions for
    CTE composition (same quantization, bit placement, and alphabet):
    returns (lon_q_expr, lat_q_expr, inter_expr, chars_expr) where
    inter_expr references columns named ``lon_q``/``lat_q`` and chars_expr
    references a column named ``inter``."""
    nlon, nlat = _nbits(precision)
    total = 5 * precision
    lon_q = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon} + 180.0) / 360.0 * {1 << nlon}.0) "
        f"AS BIGINT), 0), {(1 << nlon) - 1})"
    )
    lat_q = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {1 << nlat}.0) "
        f"AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    terms = []
    for b in range(total):
        if b % 2 == 0:
            src, pos = "lon_q", nlon - 1 - b // 2
        else:
            src, pos = "lat_q", nlat - 1 - (b - 1) // 2
        terms.append(f"(({src} >> {pos}) & 1) * {1 << (total - 1 - b)}")
    inter = " + ".join(terms)
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST((inter >> {5 * (precision - 1 - j)}) % 32 "
        f"AS INTEGER) + 1, 1)"
        for j in range(precision)
    )
    return lon_q, lat_q, inter, chars
