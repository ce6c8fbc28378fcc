"""Adaptive quadtree cell binning — load-bounded spatial partitioning.

The reference sizes tile work batches by a per-zoom cost model
(`/root/reference/src/tilemaker.cpp:463-481`) because urban tiles carry
orders of magnitude more features than ocean tiles; the BASELINE input
spec makes the same point with "explicit salting for skewed urban
tiles".  This operator is the declarative form of that idea: split
every cell until it holds at most ``cap`` points (or ``z_max`` is
reached), yielding a variable-depth tile set whose per-cell load is
bounded — the partitioning a skew-free distributed spatial join or
rollup actually wants to key on.

The classic formulation is iterative (split hot cells, recount,
repeat), but cell counts are MONOTONE up the tree (an ancestor's count
>= any descendant's), so the fixpoint has a closed form:

    leaf level of a point = the smallest z in [z_coarse, z_max] whose
    enclosing cell count is <= cap, else z_max.

That needs the data only ONCE — one shuffle to count points at the
FINEST level — and everything else operates on the counts table:
coarser-level counts are rollups of the fine counts (tiny aggs), the
ancestor-count lookups are equi-joins of counts tables (the coarser
sides are broadcast — at planet scale the z10 counts table is ~10^6
rows and shrinks 4x per level down), and the leaf assignment is a
CASE over the joined counts.  No iteration, no point ever shuffles
twice, partitioning-independent output.

Invariants (tested):
* leaves partition the input: sum of leaf counts == total points;
* a leaf coarser than z_max holds <= cap points;
* a leaf deeper than z_coarse has a parent holding > cap points
  (i.e. every split was forced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sql import tile_exprs as TE


def _fine_to_leaf(pts: DataFrame, lon_col: str, lat_col: str,
                  z_coarse: int, z_max: int, cap: int) -> DataFrame:
    """Internal: one row per non-empty FINEST-level cell with its count
    and the (z, x, y) of the leaf that owns it."""
    if not 0 <= z_coarse < z_max <= 22:
        raise ValueError(f"bad zoom range [{z_coarse}, {z_max}]")
    if cap < 1:
        raise ValueError(f"cap={cap} must be >= 1")

    lon, lat = F.col(lon_col), F.col(lat_col)
    # drop null coordinates up front: a (NULL, NULL) fine cell would
    # survive the groupBy but fail every ancestor-join equality and
    # silently vanish, breaking the leaves-partition-the-input
    # invariant — excluding unlocatable points is explicit instead
    fine = (pts.where(lon.isNotNull() & lat.isNotNull()).select(
        TE.lon2tilex(lon, z_max).alias("fx"),
        TE.lat2tiley(lat, z_max).alias("fy"))
        .groupBy("fx", "fy").agg(F.count(F.lit(1)).alias("n"))
        # the fine counts table feeds every coarser rollup AND the
        # final leaf assignment; without the (lazy) checkpoint Catalyst
        # re-plans the scan+count once per level and the "data only
        # once" contract breaks (7 scans at z_max-z_coarse=6)
        .localCheckpoint(eager=False))

    # counts at every coarser level, joined back onto the fine cells by
    # ancestor key; each c_z is a rollup OF THE COUNTS TABLE (the data
    # never re-shuffles) and broadcasts
    joined = fine
    for z in range(z_coarse, z_max):
        dz = z_max - z
        cz = (fine.groupBy(
            F.shiftright("fx", dz).alias(f"x{z}"),
            F.shiftright("fy", dz).alias(f"y{z}"))
            .agg(F.sum("n").alias(f"n{z}")))
        joined = joined.join(
            F.broadcast(cz),
            (F.shiftright(joined["fx"], dz) == cz[f"x{z}"])
            & (F.shiftright(joined["fy"], dz) == cz[f"y{z}"]))

    # smallest z whose enclosing count clears the cap; else z_max
    leaf_z = F.lit(z_max)
    for z in range(z_max - 1, z_coarse - 1, -1):
        leaf_z = F.when(F.col(f"n{z}") <= cap, F.lit(z)).otherwise(leaf_z)
    labeled = (joined.select(leaf_z.alias("z"), "fx", "fy", "n")
               .select("z", "fx", "fy",
                       F.expr(f"shiftright(fx, {z_max} - z)").alias("x"),
                       F.expr(f"shiftright(fy, {z_max} - z)").alias("y"),
                       "n"))
    return labeled


def adaptive_cells(pts: DataFrame, lon_col: str = "lon",
                   lat_col: str = "lat", z_coarse: int = 3,
                   z_max: int = 9, cap: int = 1000) -> DataFrame:
    """Variable-depth quadtree leaves over the points: one row per
    non-empty leaf cell, columns (z, x, y, n) with n <= cap whenever
    z < z_max."""
    leaves = _fine_to_leaf(pts, lon_col, lat_col, z_coarse, z_max, cap)
    return leaves.groupBy("z", "x", "y").agg(F.sum("n").alias("n"))


def assign_adaptive(pts: DataFrame, lon_col: str = "lon",
                    lat_col: str = "lat", z_coarse: int = 3,
                    z_max: int = 9, cap: int = 1000) -> DataFrame:
    """The partitioner in action: every input row plus the (z, x, y)
    of its adaptive leaf cell — the load-bounded key downstream joins
    and rollups group on.  The fine-cell -> leaf mapping is counts-
    table sized, so it BROADCASTS; the data itself takes one count
    shuffle (inside the mapping build) and one map-side broadcast
    join — no skewed exchange ever sees the rows.  Rows with NULL
    lon/lat are excluded (unlocatable; same contract as
    _fine_to_leaf's count table, so assigned rows == locatable
    rows)."""
    mapping = _fine_to_leaf(pts, lon_col, lat_col, z_coarse, z_max,
                            cap).select("fx", "fy", "z", "x", "y")
    keyed = pts.withColumn(
        "__fx", TE.lon2tilex(F.col(lon_col), z_max)).withColumn(
        "__fy", TE.lat2tiley(F.col(lat_col), z_max))
    return (keyed.join(F.broadcast(mapping),
                       (keyed["__fx"] == mapping["fx"])
                       & (keyed["__fy"] == mapping["fy"]))
            .drop("__fx", "__fy", "fx", "fy"))


def adaptive_cells_oracle_sql(source: str, lon_expr: str, lat_expr: str,
                              z_coarse: int = 3, z_max: int = 9,
                              cap: int = 1000) -> str:
    """DuckDB twin of :func:`adaptive_cells`: identical fine-level tile
    math, window-sum ancestor counts, identical CASE leaf choice."""
    xe = TE.lon2tilex_sql(lon_expr, z_max)
    ye = TE.lat2tiley_sql(lat_expr, z_max)
    anc = ",\n         ".join(
        f"sum(n) OVER (PARTITION BY fx // {1 << (z_max - z)}, "
        f"fy // {1 << (z_max - z)}) AS n{z}"
        for z in range(z_coarse, z_max))
    case = "CASE " + " ".join(
        f"WHEN n{z} <= {cap} THEN {z}"
        for z in range(z_coarse, z_max)) + f" ELSE {z_max} END"
    return f"""
WITH fine AS (
  SELECT {xe} AS fx, {ye} AS fy, count(*) AS n
  FROM {source} GROUP BY 1, 2
), anc AS (
  SELECT fx, fy, n,
         {anc}
  FROM fine
), leaf AS (
  SELECT ({case}) AS z, fx, fy, n FROM anc
)
SELECT z, fx // (1 << ({z_max} - z)) AS x,
       fy // (1 << ({z_max} - z)) AS y, CAST(sum(n) AS BIGINT) AS n
FROM leaf GROUP BY 1, 2, 3
"""


def assign_adaptive_oracle_ctes(source: str, lon_expr: str, lat_expr: str,
                                z_coarse: int = 3, z_max: int = 9,
                                cap: int = 1000) -> str:
    """DuckDB twin of :func:`assign_adaptive` as a CTE chain ending in
    ``assigned`` (all source columns + z, x, y)."""
    xe = TE.lon2tilex_sql(lon_expr, z_max)
    ye = TE.lat2tiley_sql(lat_expr, z_max)
    anc = ",\n         ".join(
        f"sum(n) OVER (PARTITION BY fx // {1 << (z_max - z)}, "
        f"fy // {1 << (z_max - z)}) AS n{z}"
        for z in range(z_coarse, z_max))
    case = "CASE " + " ".join(
        f"WHEN n{z} <= {cap} THEN {z}"
        for z in range(z_coarse, z_max)) + f" ELSE {z_max} END"
    return f"""qsrc AS (
  SELECT *, {xe} AS qfx, {ye} AS qfy FROM {source}
), fine AS (
  SELECT qfx AS fx, qfy AS fy, count(*) AS n FROM qsrc GROUP BY 1, 2
), anc AS (
  SELECT fx, fy, n,
         {anc}
  FROM fine
), leafmap AS (
  SELECT ({case}) AS z, fx, fy FROM anc
), assigned AS (
  SELECT qsrc.*, leafmap.z,
         qsrc.qfx // (1 << ({z_max} - leafmap.z)) AS x,
         qsrc.qfy // (1 << ({z_max} - leafmap.z)) AS y
  FROM qsrc JOIN leafmap
    ON qsrc.qfx = leafmap.fx AND qsrc.qfy = leafmap.fy
)"""
