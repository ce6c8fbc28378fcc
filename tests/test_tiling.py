"""Tiling pipeline tests: cover -> build -> sinks, MVT round-trips."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import Config, LayerDef
from tilemaker_spark.kernels import mvt, proj
from tilemaker_spark.operators import tiling
from tilemaker_spark.sinks import filetree, mbtiles


@pytest.fixture(scope="module")
def features(spark):
    # one point, one line crossing tiles, one polygon
    rows = [
        (1, "poi", 0, 14, 0, {"name": "pt"}, [7.42, 43.73], [1], []),
        (2, "roads", 1, 0, 5, {"class": "primary"},
         [7.40, 43.72, 7.44, 43.75], [2], []),
        (3, "land", 3, 0, 0, {"class": "park"},
         [7.41, 43.72, 7.44, 43.72, 7.44, 43.745, 7.41, 43.745, 7.41, 43.72],
         [5], [1]),
    ]
    return spark.createDataFrame(rows, tiling.FEATURE_SCHEMA).cache()


@pytest.fixture(scope="module")
def cfg():
    return Config(layers={
        "poi": LayerDef("poi", minzoom=10, maxzoom=14),
        "roads": LayerDef("roads", minzoom=6, maxzoom=14),
        "land": LayerDef("land", minzoom=6, maxzoom=14),
    }, minzoom=6, maxzoom=14, include_ids=True)


@pytest.fixture(scope="module")
def tiles(spark, features, cfg):
    return tiling.generate_tiles(features, cfg).cache()


def test_cover_point_single_tile(spark, features):
    cov = tiling.cover_features(features.filter(F.col("kind") == 0), 14)
    rows = cov.collect()
    assert len(rows) == 1
    assert (rows[0]["bx"], rows[0]["by"]) == (8529, 5974)


def test_cover_polygon_fills(spark, features):
    cov = tiling.cover_features(features.filter(F.col("feature_id") == 3), 14)
    cells = {(r["bx"], r["by"]) for r in cov.collect()}
    xs = {c[0] for c in cells}
    ys = {c[1] for c in cells}
    # convex box -> full rectangle of tiles covered
    assert len(cells) == len(xs) * len(ys)


def test_tiles_exist_across_zooms(tiles):
    zs = {r["z"] for r in tiles.select("z").distinct().collect()}
    assert 14 in zs and 6 in zs
    assert zs == set(range(6, 15))


def test_tile_decodes_with_layers(tiles, cfg):
    row = tiles.filter((F.col("z") == 14)).orderBy("x", "y").first()
    dec = mvt.decode_tile(bytes(row["tile"]))
    assert set(dec) <= {"poi", "roads", "land"}
    assert "roads" in dec or "land" in dec
    for layer in dec.values():
        for f in layer["features"]:
            assert f["cmds"], "feature with empty geometry encoded"


def test_point_minzoom_respected(tiles):
    # poi minzoom=10 (layer) and feature minzoom 0 -> absent below z10
    for row in tiles.collect():
        dec = mvt.decode_tile(bytes(row["tile"]))
        if row["z"] < 10:
            assert "poi" not in dec


def test_feature_ids_included(tiles):
    row = tiles.filter(F.col("z") == 14).first()
    dec = mvt.decode_tile(bytes(row["tile"]))
    ids = {f["id"] for layer in dec.values() for f in layer["features"]}
    assert ids <= {1, 2, 3} and ids


def test_mbtiles_roundtrip(tiles, tmp_path):
    path = str(tmp_path / "t.mbtiles")
    n = mbtiles.write_mbtiles(tiles, path, {"minzoom": "6", "maxzoom": "14"})
    stats = mbtiles.mbtiles_stats(path)
    assert stats["total"] == n == tiles.count()
    row = tiles.filter(F.col("z") == 14).first()
    blob = mbtiles.read_mbtiles_tile(path, 14, row["x"], row["y"])
    assert blob == bytes(row["tile"])


def test_filetree_roundtrip(tiles, tmp_path):
    out = str(tmp_path / "tree")
    filetree.write_filetree(tiles, out)
    row = tiles.filter(F.col("z") == 14).first()
    blob = filetree.read_filetree_tile(out, 14, row["x"], row["y"])
    assert blob == bytes(row["tile"])
    assert os.path.exists(os.path.join(out, "metadata.json"))


def test_tile_assignments_rollup(spark, features, cfg):
    cov = tiling.cover_features(features, 14)
    assign = tiling.tile_assignments(cov, cfg, 14)
    rows = assign.collect()
    # every (z, x, y) is the ancestor of some base tile; per-zoom counts
    # weakly decrease toward z0 for a single connected extent
    per_z = {}
    for r in rows:
        per_z.setdefault(r["z"], 0)
        per_z[r["z"]] += r["n_features"]
    assert per_z[cfg.minzoom] >= 1 and per_z[14] >= 1
    assert all(r["n_features"] >= 1 for r in rows)


def test_zorder_feature_limit(spark):
    # 5 same-tile points, feature_limit 2 -> only 2 highest-zorder survive
    rows = [
        (i, "poi", 0, 0, i * 10, {"n": str(i)}, [7.42, 43.73], [1], [])
        for i in range(5)
    ]
    feats = spark.createDataFrame(rows, tiling.FEATURE_SCHEMA)
    cfg = Config(layers={
        "poi": LayerDef("poi", minzoom=14, maxzoom=14, feature_limit=2,
                        feature_limit_below=15, combine_points=False,
                        z_order_ascending=False)},
        minzoom=14, maxzoom=14)
    tiles = tiling.generate_tiles(feats, cfg).collect()
    assert len(tiles) == 1
    dec = mvt.decode_tile(bytes(tiles[0]["tile"]))
    feats_out = dec["poi"]["features"]
    assert len(feats_out) == 2
    names = {f["attrs"]["n"] for f in feats_out}
    assert names == {"4", "3"}  # top-2 by zorder desc


def test_feature_limit_after_zoom_filter(spark):
    """Features invisible at this zoom must not consume feature_limit
    slots (reference zoom-filters the object list before featureLimit)."""
    # 2 high-zorder points only visible at z14 (minzoom=14), 2 low-zorder
    # visible from z13.  At z13 with feature_limit=2 the visible pair must
    # render, not be evicted by the invisible high-zorder pair.
    rows = [
        (1, "poi", 0, 14, 100, {"n": "inv1"}, [7.42, 43.73], [1], []),
        (2, "poi", 0, 14, 99, {"n": "inv2"}, [7.421, 43.731], [1], []),
        (3, "poi", 0, 13, 1, {"n": "vis1"}, [7.422, 43.732], [1], []),
        (4, "poi", 0, 13, 2, {"n": "vis2"}, [7.423, 43.733], [1], []),
    ]
    feats = spark.createDataFrame(rows, tiling.FEATURE_SCHEMA)
    cfg13 = Config(layers={
        "poi": LayerDef("poi", minzoom=13, maxzoom=14, feature_limit=2,
                        feature_limit_below=15, combine_points=False,
                        z_order_ascending=False),
    }, minzoom=13, maxzoom=14, include_ids=True)
    tiles_df = tiling.generate_tiles(feats, cfg13)
    z13 = [r for r in tiles_df.collect() if r["z"] == 13]
    assert len(z13) == 1
    dec = mvt.decode_tile(bytes(z13[0]["tile"]))
    ids = {f["id"] for f in dec["poi"]["features"]}
    assert ids == {3, 4}


def test_multipoint_preserved(spark):
    """kind=POINT with N>1 points (multipoint) keeps every point through
    cover + build, including points landing in different tiles."""
    # two points in different z14 tiles, one feature
    rows = [(1, "poi", 0, 14, 0, {"n": "mp"},
             [7.42, 43.73, 7.46, 43.75], [2], [])]
    feats = spark.createDataFrame(rows, tiling.FEATURE_SCHEMA)
    cov = tiling.cover_features(feats, 14)
    cells = {(r["bx"], r["by"]) for r in cov.collect()}
    assert len(cells) == 2  # both points' tiles covered
    cfgp = Config(layers={
        "poi": LayerDef("poi", minzoom=14, maxzoom=14, combine_points=False),
    }, minzoom=14, maxzoom=14, include_ids=True)
    tiles_df = tiling.generate_tiles(feats, cfgp)
    rows_out = tiles_df.collect()
    assert len(rows_out) == 2
    total_pts = 0
    for r in rows_out:
        dec = mvt.decode_tile(bytes(r["tile"]))
        for f in dec["poi"]["features"]:
            # count MoveTo point count from the first command
            total_pts += f["cmds"][0] >> 3
    assert total_pts == 2
