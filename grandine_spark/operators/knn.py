"""kNN via cell-ring expansion (BASELINE.json extension; grounded on the
reference's grid arithmetic J1 + haversine J7 — SURVEY.md §2.4 note).

Batch formulation (no driver loop over points): join queries to candidate
points through exploded cell rings of growing Chebyshev radius; queries that
already have k verified neighbors drop out of later rounds.

Correctness guard: a neighbor found within ring radius r is only FINAL once
r * cell_width >= its distance — expanding by doubling and verifying with a
final exact haversine top-k keeps exactness. The implementation keeps it
simple and exact: radius doubles until every remaining query has ≥ k
candidates whose haversine distance is ≤ the geographic radius guaranteed
covered by the ring, then a window top-k re-ranks.

At scale: points are pre-indexed by cell (one shuffle, reused across rounds);
each round touches only unresolved queries (usually round 1 resolves nearly
all when k ≪ points-per-cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import math

from ..functions import tile_exprs as TX


def _ring_cells(radius: int):
    """Chebyshev-ring offsets ≤ radius (the DISK, so every round is a
    superset of the last — monotone candidate sets)."""
    return [(dx, dy) for dx in range(-radius, radius + 1) for dy in range(-radius, radius + 1)]


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

    Returns (q_id, point_id, rank). Exact (equals brute force) as long as the
    true k-th neighbor lies within ``max_radius`` cells at ``zoom``; falls
    back to a brute-force join for queries still unresolved at max_radius.
    """
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
    )
    qs = (
        queries.withColumn("q_cx", TX.tile_x(F.col("lon"), zoom))
        .withColumn("q_cy", TX.tile_y(F.col("lat"), zoom))
        .select(
            F.col(query_id).alias("_qid"),
            F.col("lon").alias("q_lon"),
            F.col("lat").alias("q_lat"),
            "q_cx",
            "q_cy",
        )
    )

    resolved = None
    remaining = qs
    radius = 1
    while radius <= max_radius:
        offsets = _ring_cells(radius)
        probe = remaining.select(
            "_qid",
            "q_lon",
            "q_lat",
            F.explode(
                F.array(*[
                    F.struct(
                        F.pmod(F.col("q_cx") + F.lit(dx), F.lit(n)).alias("cx"),
                        (F.col("q_cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx, dy in offsets
                ])
            ).alias("cell"),
        ).select(
            "_qid",
            "q_lon",
            "q_lat",
            F.col("cell.cx").alias("p_cx"),
            F.col("cell.cy").alias("p_cy"),
        )

        cand = probe.join(pts, ["p_cx", "p_cy"]).select(
            "_qid",
            "q_lon",
            "q_lat",
            "_pid",
            TX.haversine_m(
                F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat")
            ).alias("dist_m"),
        )

        # Lower bound on the distance from the query to anything OUTSIDE the
        # covered cell disk: the disk covers lon ∈ [W,E] and lat ∈ [S,N]
        # (cell bbox edges). Distance to a parallel is exactly R*Δlat_rad;
        # distance to a meridian is ≥ R*asin(|sin Δlon| * cos lat). When the
        # disk spans the whole grid in x (or reaches the y edge) that side is
        # unbounded-safe.
        R = 6371000.0
        covers_all_x = (2 * radius + 1) >= n
        x_lo = F.col("q_cx") - F.lit(radius)
        x_hi = F.col("q_cx") + F.lit(radius + 1)
        y_lo = F.col("q_cy") - F.lit(radius)
        y_hi = F.col("q_cy") + F.lit(radius + 1)
        lon_w = x_lo.cast("double") / F.lit(float(n)) * 360.0 - 180.0
        lon_e = x_hi.cast("double") / F.lit(float(n)) * 360.0 - 180.0
        lat_n = F.degrees(
            F.atan(F.sinh(F.lit(math.pi) * (1.0 - 2.0 * y_lo.cast("double") / F.lit(float(n)))))
        )
        lat_s = F.degrees(
            F.atan(F.sinh(F.lit(math.pi) * (1.0 - 2.0 * y_hi.cast("double") / F.lit(float(n)))))
        )
        big = F.lit(1e18)
        d_n = F.when(y_lo <= 0, big).otherwise(F.radians(lat_n - F.col("q_lat")) * R)
        d_s = F.when(y_hi >= n, big).otherwise(F.radians(F.col("q_lat") - lat_s) * R)
        if covers_all_x:
            d_w = big
            d_e = big
        else:
            cosl = F.cos(F.radians(F.col("q_lat")))
            d_w = F.asin(F.abs(F.sin(F.radians(F.col("q_lon") - lon_w))) * cosl) * R
            d_e = F.asin(F.abs(F.sin(F.radians(lon_e - F.col("q_lon")))) * cosl) * R
        safe_m = F.least(d_n, d_s, d_w, d_e)

        qsafe = remaining.select("_qid", safe_m.alias("safe_m"))
        w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_pid").asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        kth = topk.groupBy("_qid").agg(
            F.max("dist_m").alias("kth_dist"), F.count(F.lit(1)).alias("n_found")
        )
        done_ids = (
            kth.join(qsafe, "_qid")
            .filter((F.col("n_found") >= k) & (F.col("kth_dist") <= F.col("safe_m")))
            .select("_qid")
        )

        done_rows = topk.join(done_ids, "_qid").select("_qid", "_pid", "rank")
        resolved = done_rows if resolved is None else resolved.unionByName(done_rows)
        remaining = remaining.join(done_ids, "_qid", "left_anti")
        if remaining.limit(1).count() == 0:
            break
        radius *= 2

    # brute-force fallback for whatever is left (tiny at sane max_radius)
    if remaining.limit(1).count() > 0:
        cand = remaining.crossJoin(pts.drop("p_cx", "p_cy")).select(
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
            .select("_qid", "_pid", "rank")
        )
        resolved = rest if resolved is None else resolved.unionByName(rest)

    return resolved.select(
        F.col("_qid").alias(query_id), F.col("_pid").alias(point_id), "rank"
    )
