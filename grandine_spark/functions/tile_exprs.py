"""Slippy-map tile math as NATIVE Spark Column expressions.

Same formulas as ``grandine_spark.kernels.tilemath`` (reference:
lib/tile/tile.go:37-49, lib/tile/bbox.go:5-21), expressed with builtin
``pyspark.sql.functions`` so the cell indexer runs inside WholeStageCodegen —
no Python boundary on the 100 TB hot path. The pandas-UDF variant exists only
for golden cross-checks.

Operation order matches Go exactly (e.g. ``(lat * π) / 180``) so the JVM,
numpy, and DuckDB oracle paths agree bitwise on the same input doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

WGS84_LAT_MAX = 85.0511287  # lib/tile/tile.go:10-13
_XY_BITS = 29


def _clamp(v: Column, lo: Column, hi: Column) -> Column:
    return F.greatest(F.least(v, hi), lo)


def tile_x(lon: Column | str, zoom: int) -> Column:
    """lon → tile x at ``zoom`` (lib/tile/tile.go:42-43), bigint.

    A ``str`` argument (column name / SQL fragment) builds the identical
    expression through ONE ``F.expr`` parse instead of ~40 py4j round-trips
    of Column operators — plan construction for a multi-zoom coverage union
    was >1s of driver wall purely in socket hops. Literals are embedded via
    ``repr`` (round-trips doubles exactly), so both paths parse to the same
    Catalyst tree and stay bitwise-identical (golden cross-checked)."""
    n = float(2.0**zoom)
    m = int(2**zoom) - 1
    if isinstance(lon, str):
        return F.expr(
            f"CAST(greatest(least(floor((({lon}) + 180.0D) / 360.0D * "
            f"{n!r}D), {m}L), 0L) AS BIGINT)"
        )
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return _clamp(x, F.lit(0), F.lit(m)).cast("bigint")


def tile_y(lat: Column | str, zoom: int) -> Column:
    """lat → tile y at ``zoom`` (lib/tile/tile.go:44-45), bigint.

    ``str`` argument: see :func:`tile_x` — one ``F.expr`` parse, same tree."""
    n = float(2.0**zoom)
    m = int(2**zoom) - 1
    if isinstance(lat, str):
        pi = repr(math.pi)
        r = (
            f"greatest(least({lat}, {WGS84_LAT_MAX!r}D), -{WGS84_LAT_MAX!r}D)"
            f" * {pi}D / 180.0D"
        )
        return F.expr(
            f"CAST(greatest(least(floor((1.0D - ln(tan({r}) + 1.0D / "
            f"cos({r})) / {pi}D) / 2.0D * {n!r}D), {m}L), 0L) AS BIGINT)"
        )
    lat_rad = (
        _clamp(lat, F.lit(-WGS84_LAT_MAX), F.lit(WGS84_LAT_MAX)) * F.lit(math.pi)
    ) / F.lit(180.0)
    y = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(math.pi)
        )
        / F.lit(2.0)
        * F.lit(n)
    )
    return _clamp(y, F.lit(0), F.lit(m)).cast("bigint")


def pack_cell(x: Column, y: Column, zoom: int) -> Column:
    """(x, y, z) → packed bigint cell id with the prefix property."""
    return (
        F.shiftleft(F.lit(zoom).cast("bigint"), 2 * _XY_BITS)
        .bitwiseOR(F.shiftleft(x, _XY_BITS))
        .bitwiseOR(y)
    )


def cell_parent(cid: Column, z: int, parent_z: int) -> Column:
    """Packed cell → packed parent cell at lower zoom (cell-prefix join key)."""
    d = z - parent_z
    x = F.shiftrightunsigned(cid, _XY_BITS).bitwiseAND(F.lit((1 << _XY_BITS) - 1))
    y = cid.bitwiseAND(F.lit((1 << _XY_BITS) - 1))
    return pack_cell(F.shiftright(x, d), F.shiftright(y, d), parent_z)


def coverage_xy(
    minx: Column | str,
    miny: Column | str,
    maxx: Column | str,
    maxy: Column | str,
    zoom: int,
) -> tuple[Column, Column, Column, Column]:
    """BBox → covering tile ranges (x1..x2, y1..y2), NW→SE
    (lib/tile/bbox.go:5-21). Use with ``explode(sequence(...))``.
    ``str`` arguments take the one-parse ``F.expr`` path (see tile_x)."""
    return (
        tile_x(minx, zoom),
        tile_y(maxy, zoom),  # top-left y comes from the NORTH edge
        tile_x(maxx, zoom),
        tile_y(miny, zoom),  # bottom-right y from the SOUTH edge
    )


def explode_coverage(df, zoom: int, minx="minx", miny="miny", maxx="maxx", maxy="maxy"):
    """Explode each row into its covering (tile_x, tile_y) cells at ``zoom`` —
    the multi-cell replication step of the cell join (SURVEY.md J2/J4),
    entirely JVM-side via sequence+explode."""
    x1, y1, x2, y2 = coverage_xy(minx, miny, maxx, maxy, zoom)
    return (
        df.withColumn("tile_x", F.explode(F.sequence(x1, x2)))
        .withColumn("tile_y", F.explode(F.sequence(y1, y2)))
        .withColumn("tile_z", F.lit(zoom))
    )


def bbox_overlaps(
    aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy
) -> Column:
    """Standard interval-overlap bbox predicate. NOTE: the reference's
    BBox.Overlaps (lib/spatial/bbox.go:15-17) is corner-containment-based and
    misses cross overlaps; we use the correct superset (SURVEY.md F2) — the
    coarse phase may only ADD candidates, the PIP refinement removes them."""
    return (
        (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    )


def point_in_bbox(px, py, minx, miny, maxx, maxy) -> Column:
    """Point.InBBox (lib/spatial/point.go:18-21) — pushdown-friendly."""
    return (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)


def bbox_fully_in(
    aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy
) -> Column:
    """BBox.FullyIn — a ⊆ b (lib/spatial/bbox.go:19-21), native predicate."""
    return (
        (aminx >= bminx) & (amaxx <= bmaxx) & (aminy >= bminy) & (amaxy <= bmaxy)
    )


def haversine_m(lon1, lat1, lon2, lat2) -> Column:
    """Haversine meters, R=6371000 (lib/spatial/point.go:107-123), native."""
    rl1 = F.radians(lat1)
    rl2 = F.radians(lat2)
    dlat = rl2 - rl1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a)) * F.lit(6371000.0)


# --- geocoding (pages → points) ------------------------------------------

GEOTAG_RE = r"coords:\s*(-?\d+\.\d+),\s*(-?\d+\.\d+)"


def geocode_text(text: Column) -> tuple[Column, Column]:
    """Extract (lon, lat) from the deterministic geotag embedded in page text
    (``coords: {lat}, {lon}``, FIXTURES.md §1). Returns NULLs when absent —
    the geocoder drops those rows. Pure regexp_extract: JVM-side."""
    lat = F.regexp_extract(text, GEOTAG_RE, 1)
    lon = F.regexp_extract(text, GEOTAG_RE, 2)
    return (
        F.when(lon != "", lon.cast("double")),
        F.when(lat != "", lat.cast("double")),
    )


def zoom_renderable(props: Column, zoom: int) -> Column:
    """@zoom:min <= z <= @zoom:max with defaults 0/99
    (cmd/tiler/tiler.go:230-248); props is map<string,string>."""
    # try_cast: a non-numeric user-supplied zoom prop degrades to the
    # default (reference behavior) instead of throwing under ANSI mode
    zmin = F.coalesce(props.getItem("@zoom:min").try_cast("double"), F.lit(0.0))
    zmax = F.coalesce(props.getItem("@zoom:max").try_cast("double"), F.lit(99.0))
    return (F.lit(float(zoom)) >= zmin) & (F.lit(float(zoom)) <= zmax)


def layer_route(props: Column) -> Column:
    """props['@layer'] else 'default' (cmd/tiler/tiler.go:300-312)."""
    return F.coalesce(props.getItem("@layer"), F.lit("default"))


def tile_x_dyn(lon: Column, zoom: Column) -> Column:
    """lon → tile x where ``zoom`` is a COLUMN (multi-resolution joins)."""
    n = F.pow(F.lit(2.0), zoom.cast("double"))
    m = (F.pow(F.lit(2.0), zoom.cast("double")) - F.lit(1.0)).cast("bigint")
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    return _clamp(x, F.lit(0), m).cast("bigint")


def tile_y_dyn(lat: Column, zoom: Column) -> Column:
    """lat → tile y where ``zoom`` is a COLUMN (multi-resolution joins)."""
    n = F.pow(F.lit(2.0), zoom.cast("double"))
    m = (F.pow(F.lit(2.0), zoom.cast("double")) - F.lit(1.0)).cast("bigint")
    lat_rad = (
        _clamp(lat, F.lit(-WGS84_LAT_MAX), F.lit(WGS84_LAT_MAX)) * F.lit(math.pi)
    ) / F.lit(180.0)
    y = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(math.pi)
        )
        / F.lit(2.0)
        * n
    )
    return _clamp(y, F.lit(0), m).cast("bigint")


def quadkey(x: Column, y: Column, zoom: int) -> Column:
    """Bing-maps quadkey of a z/x/y cell: ``zoom`` base-4 digits, digit k
    = 2·y_bit + x_bit at level k (MSB first). A quadkey PREFIX of length
    k is exactly the zoom-k ancestor cell — the string-keyed sibling of
    ``cell_parent``, JVM-native per character like the geohash encode."""
    out = None
    for k in range(zoom, 0, -1):
        d = (F.shiftright(y, k - 1) % 2) * 2 + F.shiftright(x, k - 1) % 2
        ch = F.element_at(
            F.array(F.lit("0"), F.lit("1"), F.lit("2"), F.lit("3")),
            (d + 1).cast("int"),
        )
        out = ch if out is None else F.concat(out, ch)
    # zoom 0: the world tile's quadkey is the empty string, not None
    return F.lit("") if out is None else out


def quadkey_to_xy(qk: Column, zoom: int) -> tuple[Column, Column]:
    """Inverse: (x, y) of a quadkey of known ``zoom`` — per-char digit
    accumulation, no Python."""
    x = F.lit(0).cast("bigint")
    y = F.lit(0).cast("bigint")
    for k in range(zoom):
        d = (F.instr(F.lit("0123"), F.substring(qk, k + 1, 1)) - 1).cast("bigint")
        x = x + (d % 2) * F.lit(1 << (zoom - 1 - k))
        y = y + F.shiftright(d, 1) * F.lit(1 << (zoom - 1 - k))
    return x, y


def quadkey_sql(x: str, y: str, zoom: int) -> str:
    """DuckDB twin of ``quadkey`` (same digit order and placement)."""
    parts = [
        f"substr('0123', CAST((({y} >> {k - 1}) & 1) * 2"
        f" + (({x} >> {k - 1}) & 1) AS INTEGER) + 1, 1)"
        for k in range(zoom, 0, -1)
    ]
    return " || ".join(parts)
