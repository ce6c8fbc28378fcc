"""Raster tile assembly: vector features -> PNG z/x/y tiles and back.

The BASELINE north star lists "raster<->vector tile assembly" as part of
the engine; the reference emits vector (MVT) tiles only, so this is the
graft half.  Spark shape mirrors the MVT pipeline exactly (same
cover -> shuffle-on-tile -> per-tile worker plan, operators/tiling.py):

- ``render_raster_tiles``: features (FEATURE_SCHEMA) -> (z, x, y, png).
  One ``cover_features`` pass assigns features to tiles (identical
  partitioning to the vector path, so at 100 TB both sinks share the
  same shuffle), then one applyInPandas renders each tile group with
  the numpy scanline kernels (kernels/raster.py) and encodes with the
  repo's own PNG codec.  Write with
  ``sinks.mbtiles.write_mbtiles(tiles.withColumnRenamed('png','tile'),
  path, metadata={'format': 'png'})``.
- ``raster_to_features``: (z, x, y, png) -> polygon features traced from
  the raster (marching-squares boundary chaining), geometry back in
  lon/lat — the inverse path, verified by round-trip area in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom as G
from ..kernels import png as PNG
from ..kernels import proj as P
from ..kernels import raster as R
from .tiling import FEATURE_SCHEMA, cover_features, expand_coarse


def _pixel_coords(flat: np.ndarray, z: int, x: int, y: int,
                  size: int) -> np.ndarray:
    """lon/lat flat pairs -> (n, 2) tile-local pixel coords (y down)."""
    pts = np.asarray(flat, np.float64).reshape(-1, 2)
    px = (P.lon2tilexf(pts[:, 0], z) - x) * size
    py = (P.latp2tileyf(P.lat2latp(pts[:, 1]), z) - y) * size
    return np.column_stack([px, py])


def render_raster_tiles(features: DataFrame, zoom: int,
                        size: int = 256,
                        clip_bbox: tuple | None = None) -> DataFrame:
    """Render FEATURE_SCHEMA features to (z int, x long, y long,
    png binary) raster tiles at one zoom.

    Same distributed shape as the MVT path: covering-tile explode (dual
    small/large path included), shuffle on (bx, by), one Python worker
    call per tile.  Geometry outside the canvas never smears: polygon
    spans are clamped by the scanline fill, lines are Liang-Barsky
    clipped to the canvas first, points are filtered.

    ``clip_bbox`` (minlon, minlat, maxlon, maxlat) prunes cover rows to
    tiles intersecting the box BEFORE the shuffle — the raster twin of
    build_tiles' cfg.clip_bbox pruning, so --bbox runs emit clipped
    raster tiles too."""
    covered = cover_features(features, base_zoom=zoom)
    if clip_bbox is not None:
        minlon, minlat, maxlon, maxlat = clip_bbox
        m = (1 << zoom) - 1
        x0 = max(0, min(m, int(P.lon2tilexf(minlon, zoom))))
        x1 = max(0, min(m, int(P.lon2tilexf(maxlon, zoom))))
        y0 = max(0, min(m, int(P.lat2tileyf(maxlat, zoom))))
        y1 = max(0, min(m, int(P.lat2tileyf(minlat, zoom))))
        exact_ok = (F.col("bx").between(x0, x1)
                    & F.col("by").between(y0, y1))
        if "coarse" in covered.columns:
            # coarse rows sit at a z6 anchor covering a 2^dz-wide block
            width = 1 << max(0, zoom - 6)
            coarse_ok = ((F.col("bx") <= x1)
                         & (F.col("bx") + width - 1 >= x0)
                         & (F.col("by") <= y1)
                         & (F.col("by") + width - 1 >= y0))
            covered = covered.filter(
                F.when(F.col("coarse"), coarse_ok).otherwise(exact_ok))
        else:
            covered = covered.filter(exact_ok)
    covered = expand_coarse(covered, zoom)
    if clip_bbox is not None:
        # exact post-expand prune (coarse blocks may overhang the box)
        covered = covered.filter(F.col("bx").between(x0, x1)
                                 & F.col("by").between(y0, y1))

    def render_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = int(pdf["bx"].iloc[0])
        y = int(pdf["by"].iloc[0])
        rows = []
        for i in range(len(pdf)):
            kind = int(pdf["kind"].iloc[i])
            layer = pdf["layer"].iloc[i]
            pix = _pixel_coords(pdf["coords"].iloc[i], zoom, x, y, size)
            if kind == 3:
                mp = G.unpack_multipolygon(
                    np.asarray(pdf["coords"].iloc[i], np.float64),
                    np.asarray(pdf["ring_sizes"].iloc[i], np.int64),
                    np.asarray(pdf["poly_ring_counts"].iloc[i], np.int64))
                k = 0
                pix_mp = []
                for poly in mp:
                    pix_poly = []
                    for ring in poly:
                        n = len(ring)
                        pix_poly.append(pix[k:k + n])
                        k += n
                    pix_mp.append(pix_poly)
                rows.append((layer, 3, pix_mp))
            elif kind == 1:
                parts = G.clip_line_to_box(pix, 0.0, 0.0,
                                           float(size), float(size))
                if parts:
                    rows.append((layer, 1, parts))
            else:
                inside = ((pix[:, 0] >= 0) & (pix[:, 0] < size)
                          & (pix[:, 1] >= 0) & (pix[:, 1] < size))
                if inside.any():
                    rows.append((layer, 0, pix[inside]))
        canvas = R.render_features(rows, size=size)
        return pd.DataFrame({
            "z": [zoom], "x": [x], "y": [y],
            "png": [PNG.encode_png(canvas)],
        })

    return (covered.groupBy("bx", "by")
            .applyInPandas(render_group,
                           "z int, x long, y long, png binary"))


def raster_to_features(tiles: DataFrame,
                       layer: str = "traced") -> DataFrame:
    """(z, x, y, png) -> traced polygon FEATURE_SCHEMA rows in lon/lat.

    Any non-background pixel counts as filled; rings come from the
    boundary tracer and are grouped into polygons with holes.  Linear in
    tiles (mapInPandas, no shuffle); feature_id = packed tile id so the
    output is deterministic."""
    out_schema = "z int, x long, y long, " + FEATURE_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("z", "x", "y", "feature_id", "layer",
                                   "kind", "minzoom", "zorder", "attrs",
                                   "coords", "ring_sizes",
                                   "poly_ring_counts")}
            for i in range(len(pdf)):
                z = int(pdf["z"].iloc[i])
                x = int(pdf["x"].iloc[i])
                y = int(pdf["y"].iloc[i])
                pixels = PNG.decode_png(bytes(pdf["png"].iloc[i]))
                mask = pixels.any(axis=2)
                ph, pw = mask.shape    # tile size comes from the PNG
                polys = R.rings_to_multipolygon(R.trace_mask(mask))
                if not polys:
                    continue
                flat, rs, pc = [], [], []
                signed_px = 0.0
                for poly in polys:
                    pc.append(len(poly))
                    for ring in poly:
                        # traced-ring shoelace in PIXEL coords: equals
                        # the filled pixel count (rings are rectilinear
                        # on cell edges; outers negative in y-down
                        # coords, holes positive)
                        signed_px += G.signed_ring_area_planar(ring)
                        lon = P.tilex2lon(x + ring[:, 0] / pw, z)
                        lat = P.latp2lat(P.tiley2latp(y + ring[:, 1] / ph,
                                                      z))
                        flat.extend(np.column_stack([lon, lat])
                                    .reshape(-1).tolist())
                        rs.append(len(ring))
                out["z"].append(z)
                out["x"].append(x)
                out["y"].append(y)
                out["feature_id"].append((z << 58) | (x << 29) | y)
                out["layer"].append(layer)
                out["kind"].append(3)
                out["minzoom"].append(0)
                out["zorder"].append(0)
                # traced area is exposed for oracle checks: for
                # axis-aligned inputs it has a closed-form SQL twin
                out["attrs"].append(
                    {"area_px": str(int(round(-signed_px)))})
                out["coords"].append(flat)
                out["ring_sizes"].append(rs)
                out["poly_ring_counts"].append(pc)
            yield pd.DataFrame(out)

    return tiles.mapInPandas(gen, out_schema)
