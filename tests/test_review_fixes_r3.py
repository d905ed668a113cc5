"""Round-3 review regression tests: each test pins a bug found by the
high-effort kernel review (RDP recursion blowup, NULL-text dedup clustering,
unparseable-URL key collision, S2 scalar indexing, kNN non-long query ids,
PIP/dist chunked memory bound, WARC mid-archive resync + error surfacing)."""

import gzip
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

import grandine_spark.kernels.geometry as G
from grandine_spark.kernels.geometry import (
    dist_points_to_line_np,
    point_in_polygon,
    points_in_polygon_np,
    simplify_rdp,
)


# ---------------------------------------------------------------- RDP


def test_rdp_adversarial_depth_no_recursion_error():
    # decreasing-amplitude zigzag: the split point is always index 1, so the
    # old recursive form nested O(n) deep and died at a few thousand points
    n = 5000
    x = np.arange(n, dtype=float)
    y = np.where(x % 2 == 0, 0.0, 10.0 / (x + 1))
    pts = np.column_stack([x, y])
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(200)
    try:
        out = simplify_rdp(pts, 0.5)
    finally:
        sys.setrecursionlimit(old)
    assert len(out) >= 2
    assert out[0].tolist() == [0.0, 0.0] and out[-1].tolist() == pts[-1].tolist()


def test_rdp_matches_reference_recursion():
    import math

    def dseg(sx1, sy1, sx2, sy2, px, py):
        a, b = px - sx1, py - sy1
        c, d = sx2 - sx1, sy2 - sy1
        dot, ll = a * c + b * d, c * c + d * d
        param = dot / ll if ll else -1.0
        if param < 0:
            xx, yy = sx1, sy1
        elif param > 1:
            xx, yy = sx2, sy2
        else:
            xx, yy = sx1 + param * c, sy1 + param * d
        return math.hypot(px - xx, py - yy)

    def rdp_rec(pts, eps):
        if len(pts) < 3:
            return pts.copy()
        sx1, sy1 = pts[0]
        sx2, sy2 = pts[-1]
        md, idx = 0.0, 0
        for i in range(1, len(pts) - 1):
            d = dseg(sx1, sy1, sx2, sy2, *pts[i])
            if d > md:
                md, idx = d, i
        if md > eps:
            lf, rt = rdp_rec(pts[: idx + 1], eps), rdp_rec(pts[idx:], eps)
            return np.concatenate([lf[:-1], rt])
        return np.array([[sx1, sy1], [sx2, sy2]])

    rng = np.random.default_rng(7)
    for _ in range(100):
        p = rng.random((int(rng.integers(2, 60)), 2)) * 100
        eps = float(rng.random() * 5)
        a, b = simplify_rdp(p, eps), rdp_rec(p, eps)
        assert a.shape == b.shape and np.allclose(a, b)


# ------------------------------------------------------- PIP chunking


def test_pip_chunked_matches_scalar_any_chunk(monkeypatch):
    rng = np.random.default_rng(3)
    ang = np.sort(rng.random(40) * 2 * np.pi)
    outer = np.column_stack(
        [np.cos(ang) * (0.5 + rng.random(40)), np.sin(ang) * (0.5 + rng.random(40))]
    )
    hole = np.column_stack([np.cos(ang[:12]) * 0.2, np.sin(ang[:12]) * 0.2])
    poly = [outer, hole]
    px = rng.random(800) * 3 - 1.5
    py = rng.random(800) * 3 - 1.5
    ref = np.array([point_in_polygon(float(x), float(y), poly) for x, y in zip(px, py)])
    assert (points_in_polygon_np(px, py, poly) == ref).all()
    # force many small chunks: identical output
    monkeypatch.setattr(G, "_PIP_CHUNK_ELEMS", 64)
    assert (points_in_polygon_np(px, py, poly) == ref).all()


def test_dist_to_line_chunked_matches(monkeypatch):
    rng = np.random.default_rng(5)
    line = np.cumsum(rng.random((50, 2)) - 0.5, axis=0)
    px, py = rng.random(300) * 4 - 2, rng.random(300) * 4 - 2
    full = dist_points_to_line_np(px, py, line)
    monkeypatch.setattr(G, "_PIP_CHUNK_ELEMS", 16)
    assert np.allclose(dist_points_to_line_np(px, py, line), full)


# ------------------------------------------------------ dedup + NULLs


def test_dedup_null_text_not_clustered(spark):
    from grandine_spark.operators.dedup import dedup_exact, dedup_exact_pairs

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "uniq")],
        "doc_id long, text string",
    )
    groups = {r.keeper_id: r.n_docs for r in dedup_exact(df).collect()}
    # NULL-text docs are singleton groups, never one giant duplicate class
    assert groups == {1: 2, 3: 1, 4: 1, 5: 1}
    pairs = {(r.dup_id, r.keeper_id) for r in dedup_exact_pairs(df).collect()}
    assert pairs == {(2, 1)}  # no NULL-text doc ever pairs


def test_line_dedup_null_text_not_dropped(spark):
    from grandine_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    assert set(out) == {1, 2}  # the NULL doc comes back, not dropped
    assert out[2].text == "" and out[2].n_lines_total == 1


# ------------------------------------------------------------ URL key


def test_url_unparseable_fallback_no_collision(spark):
    from grandine_spark.functions.url import url_normalize, url_sql_parts

    raw = ["example.com/a", "other.org/b", "not a url at all", "http://ok.com/x"]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    got = dict(
        (r.url, r.n)
        for r in df.select("url", url_normalize(F.col("url")).alias("n")).collect()
    )
    # unparseable inputs keep their raw bytes as the key — no ':///' merge
    assert got["example.com/a"] == "example.com/a"
    assert got["other.org/b"] == "other.org/b"
    assert got["not a url at all"] == "not a url at all"
    assert got["http://ok.com/x"] == "http://ok.com/x"
    assert len(set(got.values())) == 4

    duckdb = pytest.importorskip("duckdb")
    norm = url_sql_parts("url")["norm_url"]
    con = duckdb.connect()
    for u in raw:
        (dv,) = con.execute(f"SELECT {norm} FROM (SELECT ? AS url)", [u]).fetchone()
        assert dv == got[u], u


# ------------------------------------------------------------- S2


def test_s2_scalar_inputs():
    from grandine_spark.kernels import s2

    cid = s2.cell_ids(10.0, 20.0, 12)
    assert np.ndim(cid) == 0
    arr = s2.cell_ids(np.array([10.0]), np.array([20.0]), 12)
    assert int(cid) == int(arr[0])
    lat, lng = s2.cell_center(int(cid), 12)
    assert abs(float(lat) - 10.0) < 0.1 and abs(float(lng) - 20.0) < 0.1


# ------------------------------------------------------------- kNN


def test_knn_string_query_id(spark):
    from grandine_spark.operators.knn import knn

    pts = spark.createDataFrame(
        [(i, float(i), float(i) / 2) for i in range(40)],
        "pid long, lon double, lat double",
    )
    qs = spark.createDataFrame(
        [("query-a", 3.0, 1.5), ("query-b", 20.0, 10.0)],
        "q_id string, lon double, lat double",
    )
    got = knn(pts, qs, k=3, zoom=4, point_id="pid")
    rows = got.collect()
    assert {r.q_id for r in rows} == {"query-a", "query-b"}
    assert dict(got.dtypes)["q_id"] == "string"
    top = {r.q_id: r.pid for r in rows if r.rank == 1}
    assert top == {"query-a": 3, "query-b": 20}


# ------------------------------------------------------------- WARC


def _one_member(url: str, body: bytes) -> bytes:
    from grandine_spark.sources.warc import build_warc

    return build_warc(
        [{"url": url, "warc_ts": "2024-01-01T00:00:00Z", "payload": body,
          "http_status": 200}]
    )


def test_warc_mid_archive_garbage_resyncs():
    from grandine_spark.sources.warc import parse_warc

    m1 = _one_member("http://a.com/", b"AAA")
    m2 = _one_member("http://b.com/", b"BBB")
    # garbage between two members: both records survive, error counted
    recs, errs = parse_warc(m1 + b"\x00GARBAGE-NOT-GZIP\x01" + m2)
    assert [r["url"] for r in recs] == ["http://a.com/", "http://b.com/"]
    assert errs >= 1

    # corrupt the SECOND member's header: first + third still decode
    m2_bad = bytearray(m2)
    m2_bad[3] ^= 0xFF
    recs2, errs2 = parse_warc(m1 + bytes(m2_bad) + _one_member("http://c.com/", b"C"))
    urls = [r["url"] for r in recs2]
    assert "http://a.com/" in urls and "http://c.com/" in urls
    assert errs2 >= 1


def test_warc_error_count_surfaces_in_dataframe(spark, tmp_path):
    from grandine_spark.sources.warc import read_warc

    m1 = _one_member("http://a.com/", b"AAA")
    (tmp_path / "ok.warc.gz").write_bytes(m1)
    (tmp_path / "bad.warc.gz").write_bytes(m1 + b"\xffJUNK" + b"\x99" * 40)
    # truncated single member: an error with ZERO parseable records
    (tmp_path / "allbad.warc.gz").write_bytes(gzip.compress(b"x" * 300)[:-12])
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    per_file = {
        r.src_file.rsplit("/", 1)[-1]: r.errs
        for r in df.groupBy("src_file").agg(F.max("n_errors").alias("errs")).collect()
    }
    assert per_file["ok.warc.gz"] == 0
    assert per_file["bad.warc.gz"] >= 1
    # a file with zero parseable records still surfaces (as __parse_error__)
    rows = df.filter(F.col("record_type") == "__parse_error__").collect()
    assert any(r.src_file.endswith("allbad.warc.gz") for r in rows)
