"""TWKB goldens ported from /root/reference/lib/spatial/twkb_test.go:13-67,
plus round-trips the reference's own writer could not do (its line writer
truncates the count uvarint — the documented E2 bug, twkb.go:142-145)."""

from grandine_spark.kernels.twkb import decode, encode, read_header, write_header


def test_read_header_golden():
    # twkb_test.go:13-20: "24FF" → bbox set, precision 2, type 4
    hd = read_header(bytes.fromhex("24FF"))
    assert hd["bbox"] and hd["precision"] == 2 and hd["type"] == 4


def test_write_header_roundtrip():
    # twkb_test.go:22-30: LineString(2), precision 4
    hd = read_header(write_header(2, 4))
    assert hd["type"] == 2 and hd["precision"] == 4
    assert not any(
        hd[k] for k in ("bbox", "size", "id_list", "extended_precision", "empty_geom")
    )


def test_read_point_golden():
    # twkb_test.go:44-54: "01000204" → Point{1, 2}
    gt, pt = decode(bytes.fromhex("01000204"))
    assert gt == 1 and pt == (1.0, 2.0)


def test_read_line_golden():
    # twkb_test.go:56-67: "02000202020808" → [{1,1},{5,5}]
    gt, pts = decode(bytes.fromhex("02000202020808"))
    assert gt == 2 and pts == [[1.0, 1.0], [5.0, 5.0]]


def test_write_point_roundtrip_reference_case():
    # twkb_test.go:32-42: precision 6, Point{-212, 12.3} (float truncation
    # agrees between Go's int() and Python's int() on identical IEEE doubles)
    gt, pt = decode(encode(1, (-212.0, 12.3), precision=6))
    assert gt == 1 and pt == (-212.0, 12.3)


def test_line_roundtrip_fixed_writer():
    """The case the reference's own writer corrupts: full uvarint count."""
    line = [[13.37, 52.52], [13.41, 52.49], [-71.06, 42.36]]
    gt, pts = decode(encode(2, line, precision=5))
    assert gt == 2
    for (gx, gy), (wx, wy) in zip(pts, line):
        assert abs(gx - wx) < 1e-5 and abs(gy - wy) < 1e-5


def test_line_bytes_match_reference_reader_golden():
    """Our encoder reproduces the exact bytes the reference READER golden
    expects (count byte included — which its writer would have dropped)."""
    assert encode(2, [[1.0, 1.0], [5.0, 5.0]], precision=0) == bytes.fromhex(
        "02000202020808"
    )


def test_polygon_roundtrip():
    poly = [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]],
        [[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0]],
    ]
    gt, rings = decode(encode(3, poly, precision=3))
    assert gt == 3 and rings == poly


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-180, 180, allow_nan=False, width=32),
            st.floats(-90, 90, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=20,
    ),
    st.integers(0, 7),
)
def test_twkb_line_roundtrip_property(pts, precision):
    """Property: encode→decode recovers every coordinate to the grid step
    (delta coding must not accumulate error beyond quantization)."""
    gt, out = decode(encode(2, [list(p) for p in pts], precision=precision))
    assert gt == 2 and len(out) == len(pts)
    # reference quantization TRUNCATES toward zero (int()), so the error
    # bound is a full grid step, not half
    step = 10.0 ** (-precision)
    for (gx, gy), (wx, wy) in zip(out, pts):
        assert abs(gx - wx) <= 1.01 * step and abs(gy - wy) <= 1.01 * step
