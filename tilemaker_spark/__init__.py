"""tilemaker_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
systemed/tilemaker (reference at /root/reference, studied for behavior only):
OSM entity tables -> geometry assembly -> per-layer feature transform ->
spatial joins (point-in-polygon, covered-by, kNN) -> z/x/y tile assembly
(clip, simplify, combine, MVT encode) -> mbtiles / pmtiles / file-tree sinks.

Architecture is Spark-first: DataFrame/SQL plans with Catalyst-optimizable
column expressions for all tile math (see ``tilemaker_spark.sql.tile_exprs``),
Arrow-vectorized pandas UDFs only for genuinely non-relational kernels
(ring stitching, clipping, MVT encode). Zero per-row Python anywhere.
"""

__version__ = "0.1.0"
