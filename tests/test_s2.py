"""S2 cell codec: Hilbert/face properties, layout anchors, Spark parity.

The kernel is validated three independent ways: (1) intrinsic properties
(center round-trip, parent prefix, Hilbert continuity/bijection, equal
face shares), (2) external layout anchors of the published cell-id
format (face tokens 1,3,5,7,9,b; the (0°,0°) cell's token), (3) the
oracle gate's pure-SQL re-derivation (scripts/check_oracles.py,
`s2_cells`). A bug in the shared tables would have to fool all three.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from grandine_spark.kernels import s2


def test_layout_anchors():
    # the six level-0 face cells and the face-0 center leaf-adjacent cell
    lat = np.array([0.0, 0.0, 89.99, 0.0, 0.0, -89.99])
    lng = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    assert s2.tokens(lat, lng, 0) == ["1", "3", "5", "7", "9", "b"]
    # (0,0) sits at the exact center of face 0: pos = 2 << 2(level-1)
    assert s2.tokens(np.array([0.0]), np.array([0.0]), 29) == [
        "1000000000000004"
    ]
    for level in (1, 4, 17):
        (c,) = s2.cell_ids(np.array([0.0]), np.array([0.0]), level)
        assert c == (2 << (2 * (level - 1)))  # face 0, first bit-pair '10'


def test_center_roundtrip_and_parent_prefix():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89.9, 89.9, 20000)
    lng = rng.uniform(-180.0, 180.0, 20000)
    for level in (1, 5, 12, 22, 29):
        c = s2.cell_ids(lat, lng, level)
        assert (c >= 0).all()  # packed ids stay in signed-64 range
        clat, clng = s2.cell_center(c, level)
        assert (s2.cell_ids(clat, clng, level) == c).all()
        up = max(level - 4, 0)
        assert (s2.cell_parent(c, level - up) == s2.cell_ids(lat, lng, up)).all()


def test_hilbert_continuity_and_bijection():
    level = 7
    pos = np.arange((1 << (2 * level)) - 1)
    for face in (0, 3):  # one swapped, one unswapped starting orientation
        f = np.full_like(pos, face)
        i1, j1 = s2.hilbert_ij(f, pos, level)
        i2, j2 = s2.hilbert_ij(f, pos + 1, level)
        step = np.abs(i1 - i2) + np.abs(j1 - j2)
        assert (step == 1).all()  # the curve moves one grid cell at a time
        assert len(set(zip(i1.tolist(), j1.tolist()))) == len(pos)
        back = s2.hilbert_pos(f, i1, j1, level)
        assert (back == pos).all()


def test_chunked_hilbert_equals_per_level_walk():
    """The table-chunked hilbert_pos is exactly the one-level state
    machine at every level, including levels not divisible by the chunk
    width (remainder chunks) and level 0."""

    def ref_pos(face, i, j, level):
        orient = face & 1
        pos = np.zeros(np.shape(i), np.int64)
        for k in range(level - 1, -1, -1):
            ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
            p = s2.IJ_TO_POS[orient, ij]
            pos = (pos << 2) | p
            orient = orient ^ s2.POS_TO_ORIENT[p]
        return pos

    rng = np.random.default_rng(7)
    for level in (0, 1, 2, 3, 4, 5, 8, 12, 13, 29):
        face = rng.integers(0, 6, 2000)
        hi = max(1 << level, 1)
        i = rng.integers(0, hi, 2000)
        j = rng.integers(0, hi, 2000)
        got = s2.hilbert_pos(face, i, j, level)
        assert np.array_equal(got, ref_pos(face, i, j, level)), level


def test_face_shares_equal_area():
    # uniform-on-sphere sample → ~1/6 of points per face (quadratic ST)
    rng = np.random.RandomState(3)
    z = rng.uniform(-1.0, 1.0, 120000)
    lng = rng.uniform(-180.0, 180.0, 120000)
    lat = np.degrees(np.arcsin(z))
    c = s2.cell_ids(lat, lng, 5)
    faces, counts = np.unique(c >> 10, return_counts=True)
    assert list(faces) == [0, 1, 2, 3, 4, 5]
    assert (np.abs(counts / 120000.0 - 1 / 6) < 0.01).all()


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(-89.999, 89.999),
    lng=st.floats(-180.0, 180.0),
    level=st.integers(0, s2.MAX_LEVEL),
)
def test_range_contains_descendants(lat, lng, level):
    down = min(level + 3, s2.MAX_LEVEL)
    c = int(s2.cell_ids(np.array([lat]), np.array([lng]), level)[0])
    d = int(s2.cell_ids(np.array([lat]), np.array([lng]), down)[0])
    lo, hi = s2.cell_range(c, down - level)
    assert lo <= d < hi


def test_spark_udf_matches_kernel_and_native_parent(spark):
    from grandine_spark.functions.s2_index import s2_cell, s2_parent

    rng = np.random.RandomState(11)
    rows = [
        (int(i), float(la), float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-89.9, 89.9, 3000), rng.uniform(-180, 180, 3000))
        )
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    c12 = s2_cell(F.col("lat"), F.col("lon"), 12)
    got = (
        df.select("id", c12.alias("c12"), s2_parent(c12, 7).alias("c5"))
        .orderBy("id")
        .collect()
    )
    lat = np.array([r[1] for r in rows])
    lng = np.array([r[2] for r in rows])
    want12 = s2.cell_ids(lat, lng, 12)
    want5 = s2.cell_ids(lat, lng, 5)
    assert [r.c12 for r in got] == want12.tolist()
    assert [r.c5 for r in got] == want5.tolist()


def test_s2_cell_equi_join_colocates_nearby_points(spark):
    """The packed id is a working join key: points inside one level-10
    cell's bbox-ish neighborhood land in the same cell and equi-join."""
    from grandine_spark.functions.s2_index import s2_cell

    base = (48.85, 2.35)  # a dense cluster + far-away distractors
    near = [(i, base[0] + i * 1e-5, base[1] + i * 1e-5) for i in range(50)]
    far = [(100 + i, -33.9 + i, 151.2) for i in range(5)]
    df = spark.createDataFrame(near + far, "id long, lat double, lon double")
    cells = df.select("id", s2_cell(F.col("lat"), F.col("lon"), 8).alias("cell"))
    probe = spark.createDataFrame(
        [(float(base[0]), float(base[1]))], "lat double, lon double"
    ).select(s2_cell(F.col("lat"), F.col("lon"), 8).alias("cell"))
    joined = cells.join(F.broadcast(probe), "cell").count()
    assert joined == 50  # the cluster, none of the distractors


def test_level_bounds():
    with pytest.raises(ValueError):
        s2.cell_ids(np.array([0.0]), np.array([0.0]), 30)
