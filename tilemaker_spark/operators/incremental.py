"""Incremental tile maintenance: snapshot delta -> dirty tile set.

The reference engine always rebuilds the full archive (`tilemaker
--input planet.osm.pbf` has no update mode); at 10^12 rows a full
rebuild per data drop is the single biggest avoidable cost, so the
Spark engine adds the standard incremental pattern: diff two committed
snapshots of a point table (the image+caption table between lineage
snapshots — see lineage.py time travel), find every row that was
added, removed, or moved, and emit the DISTINCT set of tiles whose
content changed.  Downstream, only those tiles re-run the clip /
simplify / encode stage — everything else is carried forward from the
previous archive (the mbtiles --merge path, kernels/mvt.py:232).

Scale shape: ONE full-outer join co-partitioned on the feature id +
one distinct on the (small) dirty-tile set.  No driver-side diffing,
no full-table recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sql import tile_exprs as TE


def changed_point_tiles(old: DataFrame, new: DataFrame, zoom: int,
                        id_col: str = "image_id", lon_col: str = "lon",
                        lat_col: str = "lat") -> DataFrame:
    """Distinct (x, y) tiles at ``zoom`` whose point content differs
    between ``old`` and ``new``: tiles of removed rows, tiles of added
    rows, and BOTH tiles of moved rows (the old location must be
    re-rendered without the point, the new one with it)."""
    o = old.select(F.col(id_col).alias("_id"),
                   F.col(lon_col).alias("_olon"),
                   F.col(lat_col).alias("_olat"))
    n = new.select(F.col(id_col).alias("_id"),
                   F.col(lon_col).alias("_nlon"),
                   F.col(lat_col).alias("_nlat"))
    j = o.join(n, on="_id", how="full")
    # null-SAFE inequality: a plain != evaluates to SQL-null when one
    # side is null, so a coordinate changing to/from NULL on a row
    # present in both snapshots would silently never be marked dirty
    changed = j.filter(
        ~F.col("_olon").eqNullSafe(F.col("_nlon"))
        | ~F.col("_olat").eqNullSafe(F.col("_nlat")))
    # only locatable sides produce a tile (both coords present)
    sides = changed.select(F.explode(F.array(
        F.when(F.col("_olon").isNotNull() & F.col("_olat").isNotNull(),
               F.struct(
                   TE.lon2tilex(F.col("_olon"), zoom).alias("x"),
                   TE.lat2tiley(F.col("_olat"), zoom).alias("y"))),
        F.when(F.col("_nlon").isNotNull() & F.col("_nlat").isNotNull(),
               F.struct(
                   TE.lon2tilex(F.col("_nlon"), zoom).alias("x"),
                   TE.lat2tiley(F.col("_nlat"), zoom).alias("y"))),
    )).alias("t")).filter(F.col("t").isNotNull())
    return (sides.select(F.col("t.x").alias("x"), F.col("t.y").alias("y"))
            .distinct())
