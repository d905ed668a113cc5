"""WKB + MVT goldens ported from /root/reference/lib/spatial/geom_test.go and
/root/reference/lib/mvt/{codec,project}_test.go."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grandine_spark.kernels.mvt import (
    EXTENT,
    TileParams,
    encode_geometry,
    encode_tile,
    gzip_tile,
    proj_4326_to_3857,
    tile_point_np,
)
from grandine_spark.kernels.rounding import round8
from grandine_spark.kernels.wkb import from_wkb, geom_bbox, to_wkb


def test_wkb_point_roundtrip():
    buf = to_wkb(1, (1.5, -2.25))
    t, c = from_wkb(buf)
    assert t == 1 and c == (1.5, -2.25)
    # standard WKB layout: LE marker + type 1 + 16 bytes
    assert buf[0] == 1 and len(buf) == 21


def test_wkb_line_roundtrip():
    line = np.array([[1, 2], [3, 4], [5, 6]], float)
    t, c = from_wkb(to_wkb(2, line))
    assert t == 2 and c.tolist() == line.tolist()


def test_wkb_polygon_roundtrip_ring_closing():
    # rings are closed on the wire, unclosed in memory (wkb.go:105,167)
    poly = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
        np.array([[2, 2], [2, 4], [4, 4], [4, 2]], float),
    ]
    buf = to_wkb(3, poly)
    t, c = from_wkb(buf)
    assert t == 3 and len(c) == 2
    assert c[0].tolist() == poly[0].tolist()
    assert c[1].tolist() == poly[1].tolist()
    # wire ring has n+1 points: 2 rings * ((4+1)*16 + 4) + 1 + 4 + 4
    assert len(buf) == 1 + 4 + 4 + 2 * (4 + 5 * 16)


def test_wkb_against_duckdb_spatial_format():
    """Cross-validate against a third-party implementation (the reference
    cross-validates against twpayne/go-geom, geom_test.go:16-36); here we
    check the canonical WKB hex for POINT(1 2)."""
    assert to_wkb(1, (1.0, 2.0)).hex() == (
        "0101000000000000000000f03f0000000000000040"
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-180, 180, allow_nan=False),
            st.floats(-85, 85, allow_nan=False),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_wkb_line_roundtrip_property(pts):
    line = np.array(pts, float)
    t, c = from_wkb(to_wkb(2, line))
    assert t == 2 and np.array_equal(c, line)


def test_geom_bbox():
    assert geom_bbox(1, (3.0, 4.0)) == (3.0, 4.0, 3.0, 4.0)
    assert geom_bbox(2, np.array([[5, 4], [2, 9], [5, 4], [-25, 4]], float)) == (
        -25.0,
        4.0,
        5.0,
        9.0,
    )


# --- MVT ---------------------------------------------------------------


def test_proj_4326_to_3857_goldens():
    # lib/mvt/project_test.go:34-37
    x, y = proj_4326_to_3857(41.1, 20.1)
    assert (round8(x), round8(y)) == (4.57523107160354e06, 2.28488107006733e06)
    x, y = proj_4326_to_3857(41.1, -20.1)
    assert (round8(x), round8(y)) == (4.57523107160354e06, -2.28488107006733e06)


def test_tile_scale_point_goldens():
    # lib/mvt/project_test.go:11-32 — bbox (50,10)-(52,12), extent 4096
    tp = TileParams.from_bbox(50, 10, 52, 12, 4096)
    x, y = tile_point_np(np.array([50.0]), np.array([10.0]), tp)
    assert (int(x[0]), int(y[0])) == (0, 4096)
    x, y = tile_point_np(np.array([51.0]), np.array([10.0]), tp)
    assert (int(x[0]), int(y[0])) == (2048, 4096)
    x, y = tile_point_np(np.array([52.0]), np.array([12.0]), tp)
    assert (int(x[0]), int(y[0])) == (4096, 0)


def test_encode_geometry_point_goldens():
    # lib/mvt/codec_test.go:15-48
    assert encode_geometry([(1, (1.0, 1.0))]) == [9, 2, 2]
    assert encode_geometry([(1, (25.0, 17.0))]) == [9, 50, 34]


def test_encode_geometry_line():
    line = np.array([[0, 0], [10, 0], [10, 10]], float)
    cmds = encode_geometry([(2, line)])
    # MoveTo(1) 0,0; LineTo(2) +10,0 +0,+10
    assert cmds == [9, 0, 0, 18, 20, 0, 0, 20]


def test_encode_geometry_polygon_closepath():
    ring = np.array([[0, 0], [10, 0], [10, 10]], float)
    cmds = encode_geometry([(3, [ring])])
    assert cmds[-1] == 15  # ClosePath(1) = (7&0x7)|(1<<3)


def test_encode_tile_smoke_and_determinism():
    feats = {
        "poi": [
            {"geom_type": 1, "coords": (13.73630, 51.05377), "props": {"name": "x"}},
            {"geom_type": 1, "coords": (13.73631, 51.05378), "props": {"@layer": "poi"}},
        ],
        "roads": [
            {
                "geom_type": 2,
                "coords": np.array(
                    [[13.7, 51.0], [13.75, 51.06], [13.8, 51.1]], float
                ),
                "props": {"class": "primary"},
            }
        ],
    }
    t1 = encode_tile(feats, 8817, 5481, 14)
    t2 = encode_tile(feats, 8817, 5481, 14)
    assert t1 is not None and t1 == t2  # canonical → deterministic
    assert t1[0] == 0x1A  # Tile.layers field 3, length-delimited
    gz = gzip_tile(t1)
    assert gz[:2] == b"\x1f\x8b" and gzip_tile(t1) == gz


def test_encode_tile_empty():
    # all features outside the tile → no layers → None (codec.go:61-63)
    feats = {"poi": [{"geom_type": 1, "coords": (100.0, 0.0), "props": {}}]}
    assert encode_tile(feats, 0, 0, 14) is None


def test_mvt_parses_with_external_decoder():
    """Decode our bytes with a minimal independent protobuf reader to verify
    wire structure (layer name/version/extent, feature command ints)."""
    feats = {"poi": [{"geom_type": 1, "coords": (13.73630, 51.05377), "props": {"a": "b"}}]}
    buf = encode_tile(feats, 8817, 5481, 14)

    def read_varint(b, i):
        v, s = 0, 0
        while True:
            v |= (b[i] & 0x7F) << s
            s += 7
            i += 1
            if not b[i - 1] & 0x80:
                return v, i

    tag, i = read_varint(buf, 0)
    assert tag == (3 << 3) | 2  # Tile.layers
    ln, i = read_varint(buf, i)
    layer = buf[i : i + ln]
    tag, j = read_varint(layer, 0)
    assert tag == (1 << 3) | 2  # Layer.name
    nln, j = read_varint(layer, j)
    assert layer[j : j + nln] == b"poi"
