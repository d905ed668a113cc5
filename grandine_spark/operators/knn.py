"""kNN via cell-ring expansion (BASELINE.json extension; grounded on the
reference's grid arithmetic J1 + haversine J7 — SURVEY.md §2.4 note).

Shape: points are BIG (distributed, cell-indexed once and cached); queries
are SMALL (a query set, broadcastable). Each round joins the unresolved
queries' covering cell-disk (Chebyshev radius r, doubling) against the
indexed points, takes the per-query top-k by haversine, and retains a query
only when its k-th distance is provably inside the covered disk (exact
lower-bound distances to the disk boundary: R·Δlat to the parallels,
R·asin(|sinΔlon|·cosφ) to the meridians; grid-edge sides are unbounded-safe).
Unresolved queries fall back to a brute-force join (exact).

Query bookkeeping is driver-side (queries ≪ points): no growing anti-join
lineage chains; per-round results are collected (≤ |queries|·k rows).
The heavy work — the cell join and haversine top-k — stays distributed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tile_exprs as TX


def knn(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 6,
    max_radius: int = 8,
    point_id: str = "url",
    query_id: str = "q_id",
) -> DataFrame:
    """For each query (q_id, lon, lat): the k nearest points by haversine.
    Returns (q_id, point_id, rank). Exact (equals brute force)."""
    spark = points.sparkSession
    n = 1 << zoom

    pts = (
        points.withColumn("p_cx", TX.tile_x(F.col("lon"), zoom))
        .withColumn("p_cy", TX.tile_y(F.col("lat"), zoom))
        .select(
            F.col(point_id).alias("_pid"),
            F.col("lon").alias("p_lon"),
            F.col("lat").alias("p_lat"),
            "p_cx",
            "p_cy",
        )
        .cache()
    )
    pts.count()  # materialize once; reused every round

    qrows = queries.select(
        F.col(query_id).alias("_qid"), F.col("lon"), F.col("lat")
    ).collect()
    qmeta = {
        r._qid: (
            float(r.lon),
            float(r.lat),
            *_cell_of(float(r.lon), float(r.lat), zoom),
        )
        for r in qrows
    }

    resolved_rows: list[tuple] = []  # (_qid, _pid, rank)
    unresolved = set(qmeta)
    radius = 1
    while unresolved and radius <= max_radius:
        probe = spark.createDataFrame(
            [
                (qid, qmeta[qid][0], qmeta[qid][1], (qmeta[qid][2] + dx) % n, qmeta[qid][3] + dy)
                for qid in unresolved
                for dx in range(-radius, radius + 1)
                for dy in range(-radius, radius + 1)
                if 0 <= qmeta[qid][3] + dy < n
            ],
            "_qid long, q_lon double, q_lat double, p_cx long, p_cy long",
        )
        cand = probe.join(pts, ["p_cx", "p_cy"]).select(
            "_qid",
            "_pid",
            TX.haversine_m(
                F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat")
            ).alias("dist_m"),
        )
        w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_pid").asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        )
        by_q: dict = {}
        for r in topk:
            by_q.setdefault(r._qid, []).append(r)
        for qid, rows in by_q.items():
            if len(rows) < k:
                continue
            kth = max(r.dist_m for r in rows)
            if kth <= _safe_m(qmeta[qid], radius, zoom):
                resolved_rows += [(qid, r._pid, r.rank) for r in rows]
                unresolved.discard(qid)
        radius *= 2

    if unresolved:
        qdf = spark.createDataFrame(
            [(qid, qmeta[qid][0], qmeta[qid][1]) for qid in unresolved],
            "_qid long, q_lon double, q_lat double",
        )
        cand = pts.crossJoin(F.broadcast(qdf)).select(
            "_qid",
            "_pid",
            TX.haversine_m(
                F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat")
            ).alias("dist_m"),
        )
        w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_pid").asc())
        rest = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        )
        resolved_rows += [(r._qid, r._pid, r.rank) for r in rest]

    pts.unpersist()
    # preserve the caller's id column types exactly
    qid_type = dict(queries.dtypes)[query_id]
    pid_type = dict(points.dtypes)[point_id]
    schema = f"`{query_id}` {qid_type}, `{point_id}` {pid_type}, rank int"
    return spark.createDataFrame(resolved_rows, schema)


def _cell_of(lon: float, lat: float, zoom: int) -> tuple[int, int]:
    from ..kernels.tilemath import tile_name

    x, y, _ = tile_name(lon, lat, zoom)
    return x, y


def _safe_m(qm, radius: int, zoom: int) -> float:
    """Exact lower bound on the distance from the query point to anything
    outside the covered cell disk."""
    R = 6371000.0
    lon, lat, cx, cy = qm
    n = 1 << zoom
    if 2 * radius + 1 >= n:
        d_w = d_e = float("inf")
    else:
        west = (cx - radius) / n * 360.0 - 180.0
        east = (cx + radius + 1) / n * 360.0 - 180.0
        cosl = math.cos(math.radians(lat))
        d_w = R * math.asin(min(1.0, abs(math.sin(math.radians(lon - west))) * cosl))
        d_e = R * math.asin(min(1.0, abs(math.sin(math.radians(east - lon))) * cosl))
    y_lo, y_hi = cy - radius, cy + radius + 1
    if y_lo <= 0:
        d_n = float("inf")
    else:
        lat_n = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y_lo / n))))
        d_n = R * math.radians(lat_n - lat)
    if y_hi >= n:
        d_s = float("inf")
    else:
        lat_s = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y_hi / n))))
        d_s = R * math.radians(lat - lat_s)
    return min(d_n, d_s, d_w, d_e)
