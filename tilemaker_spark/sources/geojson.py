"""GeoJSON source -> packed-ring feature rows.

The reference reads FeatureCollection or newline-delimited GeoJSON with
parallel newline-chunked JSONL (/root/reference/src/geojson_processor.cpp:
17-77).  Spark's ``spark.read.json`` IS that chunked-parallel JSONL read;
this module just maps GeoJSON geometry to the engine's packed-ring
schema with column expressions + one Arrow UDF for ring packing.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geom as G

PACKED_SCHEMA = ("kind tinyint, coords array<double>, ring_sizes array<int>,"
                 " poly_ring_counts array<int>")


def _pack_geometry(gtype: str, coords) -> tuple:
    if gtype == "Point":
        return (G.POINT, [float(coords[0]), float(coords[1])], [1], [])
    if gtype == "MultiPoint":
        flat = [float(v) for pt in coords for v in pt[:2]]
        return (G.POINT, flat, [len(coords)], [])
    if gtype == "LineString":
        flat = [float(v) for pt in coords for v in pt[:2]]
        return (G.LINESTRING, flat, [len(coords)], [])
    if gtype == "MultiLineString":
        flat = [float(v) for line in coords for pt in line for v in pt[:2]]
        return (G.MULTILINESTRING, flat, [len(l) for l in coords], [])
    if gtype == "Polygon":
        mp = [coords]
    elif gtype == "MultiPolygon":
        mp = coords
    else:
        raise ValueError(f"unsupported geometry {gtype}")
    flat, sizes, counts = [], [], []
    for poly in mp:
        counts.append(len(poly))
        for ring in poly:
            sizes.append(len(ring))
            flat.extend(float(v) for pt in ring for v in pt[:2])
    return (G.POLYGON, flat, sizes, counts)


def read_geojson(spark: SparkSession, path: str, layer: str = "geojson",
                 minzoom: int = 0, attribute_function=None) -> DataFrame:
    """JSONL (one Feature per line) or FeatureCollection file -> features
    DataFrame in the engine's schema.  JSONL path is fully distributed
    (spark.read.text per-line parse); FeatureCollection falls back to a
    driver-side parse (it is one JSON document by construction).

    ``attribute_function(attrs, layer) -> dict`` remaps each feature's
    properties (reference src/shp_processor.cpp:47-84 — same hook as the
    shapefile source); a returned ``_minzoom`` key sets the feature's
    minzoom.  In the JSONL path the callable ships to the workers, so it
    must be picklable."""
    from .remap import apply_attribute_function

    head = spark.read.text(path).limit(1).collect()
    first = head[0]["value"].lstrip() if head else ""
    if first.startswith("{") and '"FeatureCollection"' in first:
        with open(path) as f:
            doc = json.load(f)
        feats = doc.get("features", [])
        rows = []
        for i, ft in enumerate(feats):
            kind, flat, sizes, counts = _pack_geometry(
                ft["geometry"]["type"], ft["geometry"]["coordinates"])
            props, fmz = apply_attribute_function(
                ft.get("properties") or {}, layer, minzoom,
                attribute_function)
            rows.append((i, layer, kind, fmz, 0, props, flat, sizes,
                         counts))
        from ..operators.tiling import FEATURE_SCHEMA
        return spark.createDataFrame(rows, FEATURE_SCHEMA)

    # the id fallback must be unique ACROSS partitions — a per-batch
    # counter would collide between chunks of a big file, so ship a
    # globally-unique line id (partition-offset encoded) with each line
    lines = spark.read.text(path).withColumn(
        "__lid", F.monotonically_increasing_id())

    def parse(batches):
        from ..operators.tiling import FEATURE_SCHEMA  # noqa: F401
        for pdf in batches:
            out = {k: [] for k in ("feature_id", "layer", "kind", "minzoom",
                                   "zorder", "attrs", "coords", "ring_sizes",
                                   "poly_ring_counts")}
            for line, lid in zip(pdf["value"], pdf["__lid"]):
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]"):
                    continue
                ft = json.loads(line)
                if ft.get("type") != "Feature":
                    continue
                kind, flat, sizes, counts = _pack_geometry(
                    ft["geometry"]["type"], ft["geometry"]["coordinates"])
                props, fmz = apply_attribute_function(
                    ft.get("properties") or {}, layer, minzoom,
                    attribute_function)
                out["feature_id"].append(int(ft.get("id", lid)))
                out["layer"].append(layer)
                out["kind"].append(kind)
                out["minzoom"].append(fmz)
                out["zorder"].append(0)
                out["attrs"].append(props)
                out["coords"].append(flat)
                out["ring_sizes"].append(sizes)
                out["poly_ring_counts"].append(counts)
            if out["feature_id"]:
                yield pd.DataFrame(out)

    from ..operators.tiling import FEATURE_SCHEMA
    return lines.mapInPandas(parse, schema=FEATURE_SCHEMA)


def write_geojson(features: DataFrame, path: str) -> None:
    """Debug writer (reference include/geojson_writer.h): features ->
    JSONL of GeoJSON Features (driver-side; debugging tool)."""
    with open(path, "w") as f:
        for r in features.toLocalIterator():
            mp = G.unpack_multipolygon(
                np.asarray(r["coords"]), np.asarray(r["ring_sizes"]),
                np.asarray(r["poly_ring_counts"])) if r["kind"] == G.POLYGON \
                else None
            if r["kind"] == G.POINT:
                geom = {"type": "Point", "coordinates": list(r["coords"][:2])}
            elif r["kind"] in (G.LINESTRING, G.MULTILINESTRING):
                lines = G.unpack_lines(np.asarray(r["coords"]),
                                       np.asarray(r["ring_sizes"]))
                if len(lines) == 1:
                    geom = {"type": "LineString",
                            "coordinates": lines[0].tolist()}
                else:
                    geom = {"type": "MultiLineString",
                            "coordinates": [l.tolist() for l in lines]}
            else:
                geom = {"type": "MultiPolygon",
                        "coordinates": [[rg.tolist() for rg in poly]
                                        for poly in mp]}
            f.write(json.dumps({
                "type": "Feature", "id": r["feature_id"],
                "properties": dict(r["attrs"] or {}), "geometry": geom,
            }) + "\n")
