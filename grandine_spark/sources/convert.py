"""The converter pipeline (cmd/converter, SURVEY.md §3.3): N inputs →
codec-guess by extension → optional tag mapping (filter+transform) →
one output. In Spark: read → unionByName → apply_mapping → write.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.mapping import MappingRule, apply_mapping
from ..kernels.wkb import from_wkb
from . import spaten as spaten_codec
from .geojson import read_geocsv, read_geojson, read_geojsonseq


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """guessCodec by extension (cmd/converter/converter.go:220-230)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".geojson", ".json"):
        return read_geojson(spark, path)
    if ext == ".geojsonseq":
        return read_geojsonseq(spark, path)
    if ext == ".csv":
        return read_geocsv(spark, path)
    if ext == ".spaten":
        with open(path, "rb") as f:
            feats = spaten_codec.read_features(f.read())
        rows = []
        for ft in feats:
            bb = ft.get("bbox")
            if bb is None:
                from ..kernels.wkb import geom_bbox

                bb = geom_bbox(*from_wkb(ft["wkb"]))
            rows.append(
                (
                    ft["props"].get("@layer"),
                    int(ft["geom_type"]),
                    bytes(ft["wkb"]),
                    *[float(x) for x in bb],
                    {str(k): str(v) for k, v in ft["props"].items()},
                )
            )
        from .geojson import _ROW_SCHEMA

        return spark.createDataFrame(rows, _ROW_SCHEMA)
    if ext == ".parquet":
        return spark.read.parquet(path)
    raise ValueError(f"file type of {path} is not supported")


def convert(
    spark: SparkSession,
    in_paths: list[str],
    out_path: str,
    rules: list[MappingRule] | None = None,
) -> int:
    """Multi-input concat + mapping + single-output write. Returns feature
    count. Output codec by extension: .parquet (engine-native), .geojsonseq
    (distributed), .geojson / .spaten (driver-side assemble — bulk encoders,
    like the reference's non-chunked path)."""
    dfs = [read_any(spark, p) for p in in_paths]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d, allowMissingColumns=True)
    if rules:
        df = apply_mapping(df, rules)

    ext = os.path.splitext(out_path)[1].lower()
    if ext == ".parquet":
        df.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path).count()
    if ext == ".geojsonseq":
        out = features_to_geojson(df)
        rows = out.select("geojson").rdd.map(lambda r: "\x1e" + r.geojson).collect()
        with open(out_path, "w") as f:
            f.writelines(x + "\n" for x in rows)
        return len(rows)
    if ext == ".geojson":
        rows = features_to_geojson(df).select("geojson").collect()
        fc = {
            "type": "FeatureCollection",
            "features": [json.loads(r.geojson) for r in rows],
        }
        with open(out_path, "w") as f:
            json.dump(fc, f)
        return len(rows)
    if ext == ".spaten":
        feats = [
            {
                "geom_type": int(r.geom_type),
                "wkb": bytes(r.wkb),
                "bbox": (r.minx, r.miny, r.maxx, r.maxy),
                "props": dict(r.props or {}),
            }
            for r in df.collect()
        ]
        with open(out_path, "wb") as f:
            f.write(spaten_codec.write_blocks(feats, meta={"@srid": "4326"}))
        return len(feats)
    raise ValueError(f"output type {ext} not supported")


def inspect_features(df: DataFrame, n: int = 20) -> str:
    """Pretty-print features like grandine-inspect (cmd/inspect/inspect.go:
    40-97): geometry type, coordinate preview, properties."""
    names = {1: "Point", 2: "LineString", 3: "Polygon"}
    lines = []
    for r in df.limit(n).collect():
        gt, coords = from_wkb(bytes(r.wkb))
        if gt == 1:
            preview = f"({coords[0]:.6f}, {coords[1]:.6f})"
        elif gt == 2:
            preview = f"{len(coords)} pts, start ({coords[0][0]:.6f}, {coords[0][1]:.6f})"
        else:
            preview = f"{len(coords)} rings, {sum(len(x) for x in coords)} pts"
        props = dict(r.props or {})
        lines.append(f"{names.get(gt, '?'):12s} {preview}  {props}")
    return "\n".join(lines)


def features_to_geojson(df: DataFrame) -> DataFrame:
    """Feature rows → GeoJSON strings (S5 encode: rings re-closed, polygons
    re-wound at encode, lib/geojson/codec.go:32-45 + geom.go:152-195)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from ..kernels.geometry import fix_winding

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                gt, coords = from_wkb(bytes(r["wkb"]))
                if gt == 1:
                    geom = {"type": "Point", "coordinates": list(coords)}
                elif gt == 2:
                    geom = {"type": "LineString", "coordinates": np.asarray(coords).tolist()}
                else:
                    rings = fix_winding(coords)
                    cc = []
                    for ring in rings:
                        pts = np.asarray(ring).tolist()
                        pts.append(pts[0])  # re-close ring on encode
                        cc.append(pts)
                    geom = {"type": "Polygon", "coordinates": cc}
                props = dict(r["props"] or {})
                out.append(
                    json.dumps(
                        {"type": "Feature", "geometry": geom, "properties": props},
                        sort_keys=True,
                    )
                )
            yield pd.DataFrame({"geojson": out})

    return df.mapInPandas(run, T.StructType([T.StructField("geojson", T.StringType())]))
