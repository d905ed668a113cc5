"""Geohash codec: native-expression encode/decode vs the bisection reference."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from grandine_spark.functions.geohash import (
    ALPHABET,
    geohash_decode_bbox,
    geohash_encode,
)


def ref_encode(lon, lat, p):
    """Classic bisection construction (Niemeyer) — the public definition."""
    lo, la = [-180.0, 180.0], [-90.0, 90.0]
    bits, even = [], True
    while len(bits) < 5 * p:
        rng = lo if even else la
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    return "".join(
        ALPHABET[int("".join(map(str, bits[5 * i : 5 * i + 5])), 2)] for i in range(p)
    )


KNOWN = [
    ((-5.6, 42.6), 5, "ezs42"),          # the canonical wikipedia vector
    ((13.361389, 38.115556), 6, "sqc8b4"),
    ((-180.0, -90.0), 6, "000000"),
    ((179.999, 89.999), 6, "zzzzzz"),
]


def test_known_vectors(spark):
    for (lon, lat), p, want in KNOWN:
        df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
        got = df.select(geohash_encode(F.col("lon"), F.col("lat"), p).alias("g")).first().g
        assert got == want == ref_encode(lon, lat, p)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=-180_000_000, max_value=179_999_999),
    st.integers(min_value=-90_000_000, max_value=89_999_999),
    st.integers(min_value=1, max_value=8),
)
def test_encode_matches_bisection_reference(lon_u, lat_u, p):
    # quantization form == bisection form, pure python check of the same
    # arithmetic the Column expression unrolls. Coordinates at 6-decimal
    # granularity (the georeference norm): the two forms can legitimately
    # differ only for inputs within ~1 ulp of a cell boundary (float
    # rounding in (x+off)/span picks the adjacent cell), which 1e-6
    # granularity at p<=8 cannot produce.
    lon, lat = lon_u / 1e6, lat_u / 1e6
    from grandine_spark.functions.geohash import _nbits

    nlon, nlat = _nbits(p)
    lon_q = min(max(int((lon + 180.0) / 360.0 * (1 << nlon)), 0), (1 << nlon) - 1)
    lat_q = min(max(int((lat + 90.0) / 180.0 * (1 << nlat)), 0), (1 << nlat) - 1)
    total = 5 * p
    inter = 0
    for b in range(total):
        if b % 2 == 0:
            bit = (lon_q >> (nlon - 1 - b // 2)) & 1
        else:
            bit = (lat_q >> (nlat - 1 - (b - 1) // 2)) & 1
        inter |= bit << (total - 1 - b)
    got = "".join(ALPHABET[(inter >> (5 * (p - 1 - j))) % 32] for j in range(p))
    assert got == ref_encode(lon, lat, p)


def test_decode_roundtrip_containment(spark):
    pts = [(i, float((i * 77) % 360 - 180) + 0.31, float((i * 31) % 170 - 85) + 0.17)
           for i in range(60)]
    df = spark.createDataFrame(pts, "i long, lon double, lat double")
    gh = geohash_encode(F.col("lon"), F.col("lat"), 7)
    dec = geohash_decode_bbox(gh, 7)
    rows = df.select("lon", "lat", *[v.alias(k) for k, v in dec.items()]).collect()
    for r in rows:
        assert r.minx <= r.lon < r.maxx
        assert r.miny <= r.lat < r.maxy


def test_prefix_is_coarser_cell(spark):
    """A precision-k prefix equals encoding at precision k directly."""
    pts = [(float(i * 13 % 360 - 180) + 0.5, float(i * 7 % 170 - 85) + 0.5) for i in range(40)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(
        geohash_encode(F.col("lon"), F.col("lat"), 6).alias("g6"),
        geohash_encode(F.col("lon"), F.col("lat"), 3).alias("g3"),
    ).collect()
    for r in out:
        assert r.g6[:3] == r.g3


def ref_quadkey(x, y, z):
    """Published Bing construction: per-level digit from the two bits."""
    out = []
    for k in range(z, 0, -1):
        digit = ((y >> (k - 1)) & 1) * 2 + ((x >> (k - 1)) & 1)
        out.append(str(digit))
    return "".join(out)


def test_quadkey_matches_reference_and_inverts(spark):
    import random

    from grandine_spark.functions.tile_exprs import quadkey, quadkey_to_xy

    rnd = random.Random(5)
    z = 12
    rows = [
        (i, rnd.randrange(1 << z), rnd.randrange(1 << z)) for i in range(300)
    ] + [(300, 0, 0), (301, (1 << z) - 1, (1 << z) - 1)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    qk = quadkey(F.col("x"), F.col("y"), z)
    bx, by = quadkey_to_xy(qk, z)
    got = df.select("id", "x", "y", qk.alias("qk"), bx.alias("bx"), by.alias("by")).collect()
    for r in got:
        assert r.qk == ref_quadkey(r.x, r.y, z)
        assert (r.bx, r.by) == (r.x, r.y)  # decode inverts encode
        # prefix property: first 5 chars = quadkey of the z5 ancestor
        assert r.qk[:5] == ref_quadkey(r.x >> 7, r.y >> 7, 5)

    # zoom 0: the world tile's quadkey is the EMPTY STRING (a Column, not
    # None — a None return crashes .alias on the caller side)
    z0 = df.limit(1).select(quadkey(F.col("x"), F.col("y"), 0).alias("qk")).collect()
    assert z0[0].qk == ""
