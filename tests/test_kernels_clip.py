"""Clipping goldens ported from /root/reference/lib/spatial/{line,polygon,clip_golang}_test.go."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from grandine_spark.kernels.clip import (
    clip_geom,
    clip_line,
    clip_point,
    clip_polygon,
    clip_segment,
)


def test_clip_point():
    # lib/spatial/point.go:23-29 semantics (inclusive bounds)
    assert clip_point(0.5, 0.5, (0, 0, 1, 1))
    assert clip_point(0, 0, (0, 0, 1, 1))
    assert not clip_point(1.5, 0.5, (0, 0, 1, 1))


def test_clip_segment_half_cut():
    # lib/spatial/line_test.go:83-97: segment (0,0)-(1,0) against bbox (0,0)-(0.5,1)
    out = clip_segment(((0.0, 0.0), (1.0, 0.0)), (0.0, 0.0, 0.5, 1.0))
    assert out == [((0.0, 0.0), (0.5, 0.0))]


def test_clip_line_goldens():
    # lib/spatial/line_test.go:176-232
    ls1 = np.array([[1, 1], [1, 2], [2, 2], [3, 3]], float)
    # completely inside
    out = clip_line(ls1, (0, 0, 3, 3))
    assert len(out) == 1 and out[0].tolist() == ls1.tolist()
    # completely outside
    assert clip_line(ls1, (5, 5, 12, 10)) == []
    assert clip_line(ls1, (-5, -5, 0, 0)) == []

    # split into two sublines
    ls2 = np.array([[1, 1], [3, 3], [5, 1]], float)
    out = clip_line(ls2, (1, 1, 5, 2))
    assert len(out) == 2
    assert out[0].tolist() == [[1, 1], [2, 2]]
    assert out[1].tolist() == [[4, 2], [5, 1]]

    # cut linestring
    ls3 = np.array([[1, 1], [1, 2], [1, 5]], float)
    out = clip_line(ls3, (0, 0, 3, 3))
    assert len(out) == 1 and out[0].tolist() == [[1, 1], [1, 2], [1, 3]]


def test_clip_polygon_short_circuits():
    # lib/spatial/polygon_test.go:131-159
    p = [np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)]
    out = clip_polygon(p, (0, 0, 3, 3))  # completely inside bbox
    assert len(out) == 1 and out[0][0].tolist() == p[0].tolist()

    p2 = [np.array([[0, 0], [3, 0], [3, 3], [0, 3]], float)]
    out = clip_polygon(p2, (1, 1, 2, 2))  # bbox fully inside polygon
    assert len(out) == 1
    assert out[0][0].tolist() == [[1, 1], [2, 1], [2, 2], [1, 2]]


def test_clip_polygon_single_ring_cut():
    # lib/spatial/clip_golang_test.go:32-43: unit square cut at x=0.5
    poly1 = [np.array([[0, 1], [0, 0], [1, 0], [1, 1]], float)]
    out = clip_polygon(poly1, (0, 0, 0.5, 1))
    assert len(out) == 1
    ring = out[0][0]
    assert sorted(map(tuple, ring.tolist())) == [
        (0.0, 0.0),
        (0.0, 1.0),
        (0.5, 0.0),
        (0.5, 1.0),
    ]


def test_clip_polygon_fully_outside():
    poly = [np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)]
    assert clip_polygon(poly, (5, 5, 6, 6)) == []


def test_clip_geom_dispatch():
    assert clip_geom(1, (0.5, 0.5), (0, 0, 1, 1)) == [(1, (0.5, 0.5))]
    assert clip_geom(1, (2, 2), (0, 0, 1, 1)) == []
    out = clip_geom(2, np.array([[0, 0], [2, 0]], float), (0, 0, 1, 1))
    assert len(out) == 1 and out[0][0] == 2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-10, 10, allow_nan=False, width=32),
            st.floats(-10, 10, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_clip_line_output_within_bbox(pts):
    """Property: every clipped output coordinate lies within the bbox
    (up to the 8-decimal rounding the reference applies to intersections)."""
    bbox = (-3.0, -3.0, 3.0, 3.0)
    line = np.array(pts, float)
    eps = 1e-8
    for out in clip_line(line, bbox):
        assert (out[:, 0] >= bbox[0] - eps).all()
        assert (out[:, 0] <= bbox[2] + eps).all()
        assert (out[:, 1] >= bbox[1] - eps).all()
        assert (out[:, 1] <= bbox[3] + eps).all()
