"""Point-in-polygon / intersects joins — the engine's core spatial op.

Reimplements the reference's ``Intersects``/``FindIntersecting``/
``CoveredBy`` semantics (/root/reference/src/osm_lua_processing.cpp:409-502)
with its filter-refine strategy (z15 candidate pre-filter then exact test,
src/shp_mem_tiles.cpp:58-127) as two Spark plans:

* **broadcast path** (small polygon layer, the R-tree analogue): polygons
  are collected, bucketed into a WebMercator cell grid on the driver, and
  broadcast; points probe it inside ``mapInPandas`` — one vectorized
  ray-cast per (bucket, polygon), zero shuffles of the big side.

* **cell path** (large polygon layer): polygons explode to their covering
  cells at ``index_zoom`` (exactly the reference's spatialIndexZoom bitmap
  turned into a join key), points compute one cell each, an equi-join
  produces candidates, and a grouped vectorized ray-cast refines.  Skewed
  hot cells are handled by optional salting + AQE skew-join.

Polygon DataFrame contract (the packed-ring geometry schema, see
``kernels.geom``): ``poly_id``, ``coords array<double>``,
``ring_sizes array<int>``, ``poly_ring_counts array<int>`` and optionally
precomputed ``minlon/minlat/maxlon/maxlat``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom as G
from ..kernels import proj as P
from ..sql import tile_exprs as TE


def _poly_rows_to_index(rows, index_zoom: int):
    """Build {cell_key: [(poly_id, mp, extra)]} grid index from poly rows."""
    index: dict[int, list] = {}
    polys = {}
    for r in rows:
        mp = G.unpack_multipolygon(
            np.asarray(r["coords"], np.float64),
            np.asarray(r["ring_sizes"], np.int64),
            np.asarray(r["poly_ring_counts"], np.int64),
        )
        polys[r["poly_id"]] = mp
        cells = G.covering_tiles_polygon(mp, index_zoom)
        keys = P.tile_id(index_zoom, cells[:, 0], cells[:, 1])
        for key in keys.tolist():
            index.setdefault(key, []).append(r["poly_id"])
    return index, polys


def pip_join_broadcast(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    index_zoom: int = 7,
    how: str = "inner",
    poly_cols: tuple = ("poly_id",),
) -> DataFrame:
    """Broadcast filter-refine PIP join for small polygon layers.

    Returns points columns + matched ``poly_cols``.  ``how='inner'`` keeps
    matches only (reference FindIntersecting), ``'left'`` keeps all points
    with null poly columns (boolean Intersects is then ``poly_id IS NOT
    NULL``).  One output row per (point, matching polygon).
    """
    spark = points.sparkSession
    rows = [r.asDict() for r in polygons.collect()]
    index, polys = _poly_rows_to_index(rows, index_zoom)
    extras = {
        r["poly_id"]: {c: r[c] for c in poly_cols if c != "poly_id"}
        for r in rows
    }
    b = spark.sparkContext.broadcast((index, polys, extras))

    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in points.schema.fields]
    poly_schema = {f.name: f.dataType.simpleString()
                   for f in polygons.schema.fields}
    for c in poly_cols:
        out_fields.append(f"{c} {poly_schema[c]}")
    out_schema = ", ".join(out_fields)
    pt_names = [f.name for f in points.schema.fields]
    inner = how == "inner"
    iz = index_zoom

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index, polys, extras = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = np.clip(pdf[lat_col].to_numpy(np.float64), -P.MAX_LAT, P.MAX_LAT)
            n = 1 << iz
            cx = np.clip(P.lon2tilex(lon, iz), 0, n - 1)
            cy = np.clip(P.lat2tiley(lat, iz), 0, n - 1)
            keys = P.tile_id(iz, cx, cy)
            order = np.argsort(keys, kind="stable")
            match_pt: list[np.ndarray] = []
            match_poly: list = []
            uniq, starts = np.unique(keys[order], return_index=True)
            bounds = np.append(starts, len(order))
            for ui, key in enumerate(uniq.tolist()):
                cand = index.get(key)
                if not cand:
                    continue
                sel = order[bounds[ui]:bounds[ui + 1]]
                px, py = lon[sel], lat[sel]
                for pid in cand:
                    hit = G.points_in_multipolygon(px, py, polys[pid])
                    if hit.any():
                        match_pt.append(sel[hit])
                        match_poly.append(pid)
            if match_pt:
                idx = np.concatenate(match_pt)
                pids = np.concatenate([
                    np.full(len(m), pid, dtype=object)
                    for m, pid in zip(match_pt, match_poly)
                ])
            else:
                idx = np.zeros(0, np.int64)
                pids = np.zeros(0, object)
            matched = pdf.iloc[idx][pt_names].reset_index(drop=True)
            matched["poly_id"] = pids
            for c in poly_cols:
                if c != "poly_id":
                    matched[c] = [extras[p][c] for p in pids]
            if not inner:
                unmatched_mask = np.ones(len(pdf), bool)
                unmatched_mask[np.unique(idx)] = False
                un = pdf.loc[unmatched_mask, pt_names].reset_index(drop=True)
                for c in poly_cols:
                    un[c] = None
                matched = pd.concat([matched, un], ignore_index=True)
            yield matched

    return points.mapInPandas(probe, schema=out_schema)


def pip_join_cell(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    index_zoom: int = 7,
    n_salts: int = 1,
    poly_cols: tuple = ("poly_id",),
) -> DataFrame:
    """Cell-keyed shuffle PIP join for large polygon layers.

    Plan: polygons explode to covering-cell keys (pandas UDF over packed
    rings), points compute one cell key (pure Catalyst expression), an
    equi-join on (cell[, salt]) builds candidates, and a ray-cast refine
    grouped by polygon keeps true hits.  All shuffles are on the compact
    cell key; AQE skew-join splits hot urban cells.
    """
    iz = index_zoom

    @F.pandas_udf("array<long>")
    def poly_cells(coords: pd.Series, ring_sizes: pd.Series,
                   poly_counts: pd.Series) -> pd.Series:
        out = []
        for c, rs, pc in zip(coords, ring_sizes, poly_counts):
            mp = G.unpack_multipolygon(
                np.asarray(c, np.float64), np.asarray(rs, np.int64),
                np.asarray(pc, np.int64))
            cells = G.covering_tiles_polygon(mp, iz)
            out.append(P.tile_id(iz, cells[:, 0], cells[:, 1]).tolist())
        return pd.Series(out)

    poly_exploded = (
        polygons.withColumn(
            "_cell", F.explode(poly_cells("coords", "ring_sizes",
                                          "poly_ring_counts")))
    )
    pts = points.withColumn(
        "_cell", TE.cell_id(F.col(lon_col), F.col(lat_col), iz))

    if n_salts > 1:
        # replicate each polygon-cell row across salts; points pick one salt
        poly_exploded = poly_exploded.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
        pts = pts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in (lon_col, lat_col)]),
                   F.lit(n_salts)).cast("int"),
        )
        join_keys = ["_cell", "_salt"]
    else:
        join_keys = ["_cell"]

    cand = pts.join(poly_exploded, on=join_keys, how="inner")

    # refine: group candidates by polygon, one vectorized ray-cast per poly
    pt_fields = [f for f in points.schema.fields]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in pt_fields]
        + [f"{c} {dict((f.name, f.dataType.simpleString()) for f in polygons.schema.fields)[c]}"
           for c in poly_cols]
    )
    pt_names = [f.name for f in pt_fields]

    def refine(key, pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        mp = G.unpack_multipolygon(
            np.asarray(first["coords"], np.float64),
            np.asarray(first["ring_sizes"], np.int64),
            np.asarray(first["poly_ring_counts"], np.int64))
        lon = pdf[lon_col].to_numpy(np.float64)
        lat = pdf[lat_col].to_numpy(np.float64)
        hit = G.points_in_multipolygon(lon, lat, mp)
        out = pdf.loc[hit, pt_names + [c for c in poly_cols]]
        return out.drop_duplicates(subset=pt_names + ["poly_id"])

    # dedup candidates (a point meets a polygon in one cell only, but salting
    # and multipolygon covers can duplicate) then refine per polygon
    cand = cand.dropDuplicates(pt_names + ["poly_id"])
    return cand.groupBy("poly_id").applyInPandas(refine, schema=out_schema)


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    strategy: str = "auto",
    broadcast_threshold: int = 10000,
    **kw,
) -> DataFrame:
    """Strategy dispatcher (reference small/large dual-index analogue,
    src/tile_data.cpp:524-540)."""
    if strategy == "auto":
        n = polygons.limit(broadcast_threshold + 1).count()
        strategy = "broadcast" if n <= broadcast_threshold else "cell"
    if strategy == "broadcast":
        return pip_join_broadcast(points, polygons, **kw)
    return pip_join_cell(points, polygons, **kw)
