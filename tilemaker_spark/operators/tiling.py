"""Tile assembly: features table -> (z, x, y, tile bytes).

The reference's tile phase (/root/reference/src/tilemaker.cpp:388-540,
src/tile_worker.cpp) re-expressed as two DataFrame jobs:

1. **cover** — every feature explodes to its base-zoom covering tiles
   (point: 1 tile; line: supercover; polygon: boundary + fill — the
   object->tile fan-out of src/tile_data.cpp:495-608).  Pure shuffle-free
   ``mapInPandas`` producing (bx, by, feature) rows keyed by the z6
   ancestor cell (CLUSTER_ZOOM, include/tile_data_base.h:10-12).

2. **build** — group by z6 subtree; one Arrow batch holds all of a
   subtree's features, and the pandas worker materializes every tile for
   zooms 6..basezoom top-down (the clip-pyramid locality the reference
   gets from its tile iteration order, src/tile_sorting.cpp:98-152).
   Zooms 0..5 come from a second, much smaller pass grouped at z0 (the
   reference's separate low-zoom object list, include/tile_data.h:115-147).

Per-tile semantics mirror tile_worker.cpp: layer zoom-range + per-feature
minzoom filters, z-order sort (+ feature_limit top-k), combine of
compatible points/lines, zoom-scaled simplification, box clip with 0.5%
margin, area filter, MVT encode, gzip.

Feature schema (the engine's OutputObject analogue):
  feature_id long, layer string, kind tinyint (0 pt / 1 line / 3 poly),
  minzoom int, zorder long, attrs map<string,string>,
  coords array<double>, ring_sizes array<int>, poly_ring_counts array<int>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Config, LayerDef
from ..kernels import geom as G
from ..kernels import mvt as M
from ..kernels import proj as P

FEATURE_SCHEMA = (
    "feature_id long, layer string, kind tinyint, minzoom int, zorder long, "
    "attrs map<string,string>, coords array<double>, ring_sizes array<int>, "
    "poly_ring_counts array<int>"
)

CLUSTER_ZOOM = 6  # reference include/tile_data_base.h:10-12


# ---------------------------------------------------------------------------
# stage 1: cover
# ---------------------------------------------------------------------------

def cover_features(features: DataFrame, base_zoom: int = 14) -> DataFrame:
    """Explode features to base-zoom covering tiles. Adds bx, by columns."""
    cols = features.columns
    out_schema = FEATURE_SCHEMA + ", bx long, by long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps, bxs, bys = [], [], []
            for i in range(len(pdf)):
                kind = pdf["kind"].iloc[i]
                coords = np.asarray(pdf["coords"].iloc[i], np.float64)
                pts = coords.reshape(-1, 2)
                if kind == G.POINT:
                    # multipoint: cover every point's tile (not just pts[0])
                    cells = np.unique(np.concatenate([
                        G.covering_tiles_point(p[0], p[1], base_zoom)
                        for p in pts
                    ]), axis=0) if len(pts) > 1 else G.covering_tiles_point(
                        pts[0, 0], pts[0, 1], base_zoom)
                elif kind in (G.LINESTRING, G.MULTILINESTRING):
                    lines = G.unpack_lines(
                        coords, np.asarray(pdf["ring_sizes"].iloc[i],
                                           np.int64))
                    cells = np.unique(np.concatenate([
                        G.covering_tiles_line(l, base_zoom) for l in lines
                    ]), axis=0)
                else:
                    mp = G.unpack_multipolygon(
                        coords,
                        np.asarray(pdf["ring_sizes"].iloc[i], np.int64),
                        np.asarray(pdf["poly_ring_counts"].iloc[i], np.int64))
                    cells = G.covering_tiles_polygon(mp, base_zoom)
                reps.append(len(cells))
                bxs.append(cells[:, 0])
                bys.append(cells[:, 1])
            out = pdf.loc[pdf.index.repeat(reps)].reset_index(drop=True)
            out["bx"] = np.concatenate(bxs) if bxs else np.zeros(0, np.int64)
            out["by"] = np.concatenate(bys) if bys else np.zeros(0, np.int64)
            yield out[cols + ["bx", "by"]]

    return features.mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# stage 2: per-subtree tile builder
# ---------------------------------------------------------------------------

def _tile_bbox(z: int, x: int, y: int, margin: float = 0.005):
    """Tile lon/latp-degree box with 0.5% margin (reference TileBbox,
    src/coordinates_geom.cpp:9-31). Returns (minlon, minlatp, maxlon,
    maxlatp, spanlon, spanlatp) — y axis in latp, flipped later."""
    span = 360.0 / (1 << z)
    minlon = x * span - 180.0
    maxlatp = 180.0 - y * span
    m = span * margin
    return minlon - m, maxlatp - span - m, minlon + span + m, maxlatp + m


def _to_tile_frac(pts: np.ndarray, z: int, x: int, y: int) -> np.ndarray:
    """lon/lat -> tile-local fractional coords (x right, y down)."""
    fx = P.lon2tilexf(pts[:, 0], z) - x
    fy = P.latp2tileyf(P.lat2latp(pts[:, 1]), z) - y
    return np.column_stack([fx, fy])


def _simplify_tolerance(ld: LayerDef, z: int) -> float:
    """Zoom-scaled simplify tolerance in degrees (reference
    src/tile_worker.cpp:476-487: level * ratio^(simplify_below-1-z))."""
    if ld.simplify_below <= 0 or z >= ld.simplify_below:
        return 0.0
    return ld.simplify_level * (ld.simplify_ratio ** (ld.simplify_below - 1 - z))


def _area_threshold(ld: LayerDef, z: int) -> float:
    """Area filter threshold in squared degrees (reference
    src/tile_worker.cpp:488-490: filterArea * 2^(filter_below-1-z))."""
    if ld.filter_below <= 0 or z >= ld.filter_below:
        return 0.0
    # filter_area is in squared pixels at 256px/tile; convert to deg^2
    tile_deg = 360.0 / (1 << z)
    px_deg = tile_deg / 256.0
    return ld.filter_area * (px_deg * px_deg) * (2.0 ** (ld.filter_below - 1 - z))


def _merge_lines(lines: list[np.ndarray], cap: int = 6000) -> list[np.ndarray]:
    """Chain same-attribute linestrings end-to-start with a point cap
    (reference ReorderMultiLinestring, src/tile_worker.cpp:29-77)."""
    segs = [l for l in lines if len(l) >= 2]
    used = [False] * len(segs)
    out = []
    for i in range(len(segs)):
        if used[i]:
            continue
        used[i] = True
        chain = [segs[i]]
        npts = len(segs[i])
        end = tuple(segs[i][-1])
        start = tuple(segs[i][0])
        grew = True
        while grew and npts < cap:
            grew = False
            for j in range(len(segs)):
                if used[j]:
                    continue
                s = segs[j]
                if tuple(s[0]) == end:
                    chain.append(s[1:]); end = tuple(s[-1])
                elif tuple(s[-1]) == end:
                    chain.append(s[::-1][1:]); end = tuple(s[0])
                elif tuple(s[-1]) == start:
                    chain.insert(0, s[:-1]); start = tuple(s[0])
                elif tuple(s[0]) == start:
                    chain.insert(0, s[::-1][:-1]); start = tuple(s[-1])
                else:
                    continue
                used[j] = True
                npts += len(s) - 1
                grew = True
                break
        out.append(np.vstack(chain))
    return out


def _build_one_tile(group: pd.DataFrame, z: int, x: int, y: int,
                    cfg: Config) -> bytes | None:
    """All features already known to touch (z,x,y) -> MVT tile bytes."""
    minlon, minlatp, maxlon, maxlatp = _tile_bbox(z, x, y)
    minlat = float(P.latp2lat(minlatp))
    maxlat = float(P.latp2lat(maxlatp))
    builders: dict[str, M.LayerBuilder] = {}

    # z-order sort within layer (reference src/tile_sorting.cpp:76-96)
    for layer_name in cfg.layer_order():
        sub = group[group["_target"] == layer_name]
        if len(sub) == 0:
            continue
        ld0 = cfg.layers.get(layer_name, LayerDef(layer_name))
        asc = ld0.z_order_ascending
        sub = sub.sort_values(
            ["zorder", "kind", "feature_id"],
            ascending=[asc, True, True], kind="mergesort")
        # zoom-visibility filter BEFORE feature_limit truncation (reference
        # filters the per-tile object list by zoom before featureLimit) —
        # invisible features must not consume limit slots
        vis = np.fromiter(
            ((cfg.layers.get(sub["layer"].iloc[i], ld0).minzoom <= z
              <= cfg.layers.get(sub["layer"].iloc[i], ld0).maxzoom)
             and sub["minzoom"].iloc[i] <= z
             for i in range(len(sub))), dtype=bool, count=len(sub))
        sub = sub[vis]
        if len(sub) == 0:
            continue
        if ld0.feature_limit > 0 and (ld0.feature_limit_below <= 0
                                      or z < ld0.feature_limit_below):
            sub = sub.iloc[: ld0.feature_limit]

        lb = builders.setdefault(
            layer_name, M.LayerBuilder(layer_name, extent=cfg.extent))

        # combine compatible features (same attrs+kind), reference
        # tile_worker.cpp:323-404
        tol_cache: dict[str, float] = {}
        point_groups: dict = {}
        line_groups: dict = {}
        for i in range(len(sub)):
            row = sub.iloc[i]
            ld = cfg.layers.get(row["layer"], ld0)
            if not (ld.minzoom <= z <= ld.maxzoom):
                continue
            if row["minzoom"] > z:
                continue
            attrs = dict(row["attrs"]) if row["attrs"] is not None else {}
            akey = (row["kind"], tuple(sorted(attrs.items())), row["zorder"])
            coords = np.asarray(row["coords"], np.float64).reshape(-1, 2)
            kind = row["kind"]
            if kind == G.POINT:
                # multipoint-aware: keep every point (geojson can emit
                # kind=POINT with N>1 points)
                if ld.combine_points:
                    point_groups.setdefault(akey, ([], attrs, row))[0].extend(
                        coords)
                else:
                    point_groups.setdefault(
                        (akey, i), ([], attrs, row))[0].extend(coords)
            elif kind in (G.LINESTRING, G.MULTILINESTRING):
                lines = G.unpack_lines(
                    coords.reshape(-1),
                    np.asarray(row["ring_sizes"], np.int64))
                parts = []
                for l in lines:
                    parts.extend(G.clip_line_to_box(
                        l, minlon, minlat, maxlon, maxlat))
                if not parts:
                    continue
                tol = tol_cache.setdefault(
                    row["layer"], _simplify_tolerance(ld, z))
                if tol > 0:
                    parts = [
                        (G.douglas_peucker(p, tol)
                         if ld.simplify_algorithm != "visvalingam"
                         else G.visvalingam(p, tol * tol))
                        for p in parts
                    ]
                if ld.combine_lines_below > 0 and z < ld.combine_lines_below:
                    line_groups.setdefault(akey, ([], attrs, row))[0].extend(
                        parts)
                else:
                    frac = [_to_tile_frac(p, z, x, y) for p in parts]
                    cmds = M.encode_line_geom(frac, cfg.extent)
                    lb.add_feature(
                        M.GEOM_LINESTRING, cmds, attrs,
                        feature_id=int(row["feature_id"])
                        if cfg.include_ids else None)
            else:  # polygon
                mp = G.unpack_multipolygon(
                    coords.reshape(-1),
                    np.asarray(row["ring_sizes"], np.int64),
                    np.asarray(row["poly_ring_counts"], np.int64))
                clipped = G.clip_multipolygon_to_box(
                    mp, minlon, minlat, maxlon, maxlat)
                if not clipped:
                    continue
                tol = tol_cache.setdefault(
                    row["layer"], _simplify_tolerance(ld, z))
                if tol > 0:
                    mp2 = []
                    for poly in clipped:
                        outer = G.simplify_ring(poly[0], tol,
                                                ld.simplify_algorithm)
                        if len(outer) < 4:
                            continue
                        rings = [outer]
                        for hole in poly[1:]:
                            hh = G.simplify_ring(hole, tol,
                                                 ld.simplify_algorithm)
                            if len(hh) >= 4:
                                rings.append(hh)
                        mp2.append(rings)
                    clipped = mp2
                athr = _area_threshold(ld, z)
                if athr > 0:
                    clipped = [
                        poly for poly in clipped
                        if abs(G.signed_ring_area_planar(poly[0])) >= athr
                    ]
                if not clipped:
                    continue
                frac_mp = [
                    [_to_tile_frac(r, z, x, y) for r in poly]
                    for poly in clipped
                ]
                cmds = M.encode_polygon_geom(frac_mp, cfg.extent)
                lb.add_feature(
                    M.GEOM_POLYGON, cmds, attrs,
                    feature_id=int(row["feature_id"])
                    if cfg.include_ids else None)

        for (key, (pts, attrs, row)) in point_groups.items():
            arr = np.asarray(pts)
            inside = (
                (arr[:, 0] >= minlon) & (arr[:, 0] <= maxlon)
                & (arr[:, 1] >= minlat) & (arr[:, 1] <= maxlat))
            arr = arr[inside]
            if len(arr) == 0:
                continue
            frac = _to_tile_frac(arr, z, x, y)
            cmds = M.encode_point_geom(frac, cfg.extent)
            lb.add_feature(
                M.GEOM_POINT, cmds, attrs,
                feature_id=int(row["feature_id"]) if cfg.include_ids else None)
        for (key, (parts, attrs, row)) in line_groups.items():
            merged = _merge_lines(parts)
            frac = [_to_tile_frac(p, z, x, y) for p in merged]
            cmds = M.encode_line_geom(frac, cfg.extent)
            lb.add_feature(
                M.GEOM_LINESTRING, cmds, attrs,
                feature_id=int(row["feature_id"]) if cfg.include_ids else None)

    live = [lb for lb in builders.values() if lb.features]
    if not live:
        return None
    return M.build_tile(live, compress=cfg.compress)


def build_tiles(covered: DataFrame, cfg: Config,
                base_zoom: int = 14) -> DataFrame:
    """Covered features -> (z, x, y, tile binary) for zooms
    [cfg.minzoom, base_zoom], grouped by z6 subtree (clip-pyramid reuse)."""
    dz = base_zoom - CLUSTER_ZOOM
    with_cell = covered.withColumn(
        "_cx", F.shiftright(F.col("bx"), dz)
    ).withColumn("_cy", F.shiftright(F.col("by"), dz))

    lo = max(cfg.minzoom, CLUSTER_ZOOM)
    layer_targets = {
        name: (ld.write_to or name) for name, ld in cfg.layers.items()
    }

    def build_subtree(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["_target"] = pdf["layer"].map(
            lambda n: layer_targets.get(n, n))
        pdf = pdf.drop_duplicates(subset=["feature_id", "layer", "bx", "by"])
        out_z, out_x, out_y, out_b = [], [], [], []
        for z in range(lo, base_zoom + 1):
            shift = base_zoom - z
            tx = pdf["bx"].to_numpy() >> shift
            ty = pdf["by"].to_numpy() >> shift
            key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
            pdf["_tkey"] = key
            for tkey, group in pdf.groupby("_tkey"):
                x = int(tkey >> 32)
                y = int(tkey & 0xFFFFFFFF)
                g = group.drop_duplicates(subset=["feature_id", "layer"])
                blob = _build_one_tile(g, z, x, y, cfg)
                if blob is not None:
                    out_z.append(z); out_x.append(x); out_y.append(y)
                    out_b.append(blob)
        return pd.DataFrame({"z": out_z, "x": out_x, "y": out_y,
                             "tile": out_b})

    high = (
        with_cell.groupBy("_cx", "_cy")
        .applyInPandas(build_subtree, schema="z int, x int, y int, tile binary")
    )

    if cfg.minzoom >= CLUSTER_ZOOM:
        return high

    # low-zoom pass: only features visible below CLUSTER_ZOOM (per-layer
    # and per-feature minzoom), pre-deduped to z5 tile granularity BEFORE
    # the single-group collapse — the full base-zoom fanout never moves
    low_visible_layers = [
        name for name, ld in cfg.layers.items() if ld.minzoom < CLUSTER_ZOOM
    ]

    def build_low(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["_target"] = pdf["layer"].map(lambda n: layer_targets.get(n, n))
        pdf = pdf.drop_duplicates(subset=["feature_id", "layer", "bx", "by"])
        out_z, out_x, out_y, out_b = [], [], [], []
        for z in range(cfg.minzoom, min(CLUSTER_ZOOM, base_zoom + 1)):
            shift = base_zoom - z
            tx = pdf["bx"].to_numpy() >> shift
            ty = pdf["by"].to_numpy() >> shift
            key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
            pdf["_tkey"] = key
            for tkey, group in pdf.groupby("_tkey"):
                x = int(tkey >> 32)
                y = int(tkey & 0xFFFFFFFF)
                g = group.drop_duplicates(subset=["feature_id", "layer"])
                blob = _build_one_tile(g, z, x, y, cfg)
                if blob is not None:
                    out_z.append(z); out_x.append(x); out_y.append(y)
                    out_b.append(blob)
        return pd.DataFrame({"z": out_z, "x": out_x, "y": out_y,
                             "tile": out_b})

    dz5 = base_zoom - (CLUSTER_ZOOM - 1)
    low_in = (
        with_cell
        .filter(F.col("layer").isin(low_visible_layers)
                if low_visible_layers else F.lit(False))
        .filter(F.col("minzoom") < CLUSTER_ZOOM)
        # dedupe to z5 granularity before collapsing to one group: the
        # per-(feature, z5-tile) width is what z<6 tiles actually need
        .withColumn("_p5x", F.shiftright(F.col("bx"), dz5))
        .withColumn("_p5y", F.shiftright(F.col("by"), dz5))
        .dropDuplicates(["feature_id", "layer", "_p5x", "_p5y"])
        .drop("_p5x", "_p5y")
    )
    low = (
        low_in.withColumn("_one", F.lit(1))
        .groupBy("_one")
        .applyInPandas(build_low, schema="z int, x int, y int, tile binary")
    )
    return high.unionByName(low)


def generate_tiles(features: DataFrame, cfg: Config) -> DataFrame:
    """features -> (z, x, y, tile) end to end."""
    covered = cover_features(features, base_zoom=cfg.basezoom)
    return build_tiles(covered, cfg, base_zoom=cfg.basezoom)


def tile_assignments(covered: DataFrame, cfg: Config,
                     base_zoom: int = 14) -> DataFrame:
    """Per-tile feature assignment counts across all zooms — the parity
    table of FIXTURES.md §5 (expected_tile_assignments): roll the base-zoom
    cover up the pyramid with explode(sequence) + distinct, all JVM-side."""
    zs = F.sequence(F.lit(cfg.minzoom), F.lit(base_zoom))
    per_zoom = (
        covered.select("feature_id", "layer", "kind", "bx", "by",
                       F.explode(zs).alias("z"))
        .withColumn("x", F.expr(f"shiftright(bx, {base_zoom} - z)"))
        .withColumn("y", F.expr(f"shiftright(by, {base_zoom} - z)"))
        .dropDuplicates(["feature_id", "layer", "z", "x", "y"])
    )
    return per_zoom.groupBy("z", "x", "y", "layer").agg(
        F.count("*").alias("n_features"))
