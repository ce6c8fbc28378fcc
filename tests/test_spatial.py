"""Spatial join + kNN tests: both execution paths must agree with each
other and with a numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.kernels import geom as G
from tilemaker_spark.operators import knn, spatial_join
from tilemaker_spark.sources import synth


@pytest.fixture(scope="module")
def pts(spark):
    img = synth.images_df(spark, 500, with_bytes=False)
    return img.select("image_id", "lon", "lat").cache()


@pytest.fixture(scope="module")
def grid(spark):
    return synth.grid_polygons_df(spark, nx=18, ny=9).cache()


def _ground_truth_pip(pts_rows, grid_rows):
    out = set()
    for g in grid_rows:
        mp = G.unpack_multipolygon(
            np.asarray(g["coords"]), np.asarray(g["ring_sizes"]),
            np.asarray(g["poly_ring_counts"]))
        lon = np.asarray([p["lon"] for p in pts_rows])
        lat = np.asarray([p["lat"] for p in pts_rows])
        hit = G.points_in_multipolygon(lon, lat, mp)
        for i in np.nonzero(hit)[0]:
            out.add((pts_rows[int(i)]["image_id"], g["poly_id"]))
    return out


def test_pip_paths_agree_and_match_ground_truth(spark, pts, grid):
    b = spatial_join.pip_join_broadcast(pts, grid, poly_cols=("poly_id",))
    c = spatial_join.pip_join_cell(pts, grid, poly_cols=("poly_id",))
    sb = {(r["image_id"], r["poly_id"]) for r in b.collect()}
    sc = {(r["image_id"], r["poly_id"]) for r in c.collect()}
    assert sb == sc
    truth = _ground_truth_pip(pts.collect(), grid.collect())
    assert sb == truth


def test_pip_cell_with_salting(spark, pts, grid):
    c1 = spatial_join.pip_join_cell(pts, grid, poly_cols=("poly_id",))
    c2 = spatial_join.pip_join_cell(pts, grid, poly_cols=("poly_id",),
                                    n_salts=4)
    s1 = {(r["image_id"], r["poly_id"]) for r in c1.collect()}
    s2 = {(r["image_id"], r["poly_id"]) for r in c2.collect()}
    assert s1 == s2


def test_pip_left_join_marks_nonmatches(spark, grid):
    # a point outside every grid polygon (lat > 85 band edge)
    pts = spark.createDataFrame(
        [("in", 10.0, 10.0), ("out", 0.0, 89.9)],
        "image_id string, lon double, lat double")
    j = spatial_join.pip_join_broadcast(
        pts, grid, poly_cols=("poly_id",), how="left")
    rows = {r["image_id"]: r["poly_id"] for r in j.collect()}
    assert rows["in"] is not None
    assert rows["out"] is None


def test_knn_cell_matches_bruteforce_on_cluster(spark):
    # dense cluster so the kth neighbor is well within one cell ring
    img = synth.images_df(spark, 400, with_bytes=False)
    clustered = img.filter(
        (F.col("lon") > -30) & (F.col("lon") < 30)
        & (F.col("lat") > -30) & (F.col("lat") < 30))
    q = clustered.limit(5).select(
        F.col("image_id").alias("query_id"), "lon", "lat")
    c = clustered.select(F.col("image_id").alias("cand_id"), "lon", "lat")
    a = knn.knn_join_broadcast(q, c, k=3)
    b = knn.knn_join_cell(q, c, k=3, cell_zoom=2)
    ra = {(r["query_id"], r["rank"], r["cand_id"]) for r in a.collect()}
    rb = {(r["query_id"], r["rank"], r["cand_id"]) for r in b.collect()}
    assert ra == rb


def test_knn_deterministic_tiebreak(spark):
    q = spark.createDataFrame([("q", 0.0, 0.0)],
                              "query_id string, lon double, lat double")
    # two candidates equidistant -> lower id wins rank 1
    c = spark.createDataFrame(
        [("a", 1.0, 0.0), ("b", -1.0, 0.0)],
        "cand_id string, lon double, lat double")
    out = knn.knn_join_broadcast(q, c, k=2).collect()
    by_rank = {r["rank"]: r["cand_id"] for r in out}
    assert by_rank == {1: "a", 2: "b"}
