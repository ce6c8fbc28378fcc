"""Hexagonal cell index (sql/tile_exprs.py hex_cell_id) — the H3-style
analogue.  Ground truth is an independent pure-Python axial/cube-round
implementation; also checks hex-center round-trips, neighbor adjacency,
and the packed-id unpack inverse.
"""

import math
import random

from pyspark.sql import functions as F

from tilemaker_spark.sql import tile_exprs as TE

SQRT3 = math.sqrt(3.0)
OFF = 1 << 20


def _latp(lat):
    lat = min(max(lat, -85.06), 85.06)
    return math.degrees(math.log(math.tan(math.radians((lat + 90.0) / 2.0))))


def _latp_inv(latp):
    return math.degrees(2.0 * math.atan(math.exp(math.radians(latp)))) - 90.0


def _hex_py(lon, lat, res=6):
    size = 360.0 / (1 << res)
    x, y = lon, _latp(lat)
    q = (SQRT3 / 3.0 * x - y / 3.0) / size
    r = y * 2.0 / 3.0 / size
    cy = -q - r
    rx, ry, rz = (math.floor(v + 0.5) for v in (q, cy, r))
    dx, dy, dz = abs(rx - q), abs(ry - cy), abs(rz - r)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return (int(rx) + OFF) * (2 * OFF) + (int(rz) + OFF)


def _hex_center(q, r, res=6):
    size = 360.0 / (1 << res)
    x = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    y = size * 1.5 * r
    return x, _latp_inv(y)


def _spark_ids(spark, pts, res=6):
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(TE.hex_cell_id(F.col("lon"), F.col("lat"), res)
                    .alias("cell")).collect()
    return [r["cell"] for r in out]


def test_hex_matches_python_reference(spark):
    rng = random.Random(7)
    pts = [(rng.uniform(-180, 180), rng.uniform(-85, 85)) for _ in range(400)]
    got = _spark_ids(spark, pts)
    want = [_hex_py(lon, lat) for lon, lat in pts]
    assert got == want


def test_hex_center_roundtrip_and_unpack(spark):
    cells = [(q, r) for q in (-5, 0, 3, 11) for r in (-4, 0, 2, 9)]
    pts = [_hex_center(q, r) for q, r in cells]
    ids = _spark_ids(spark, pts)
    assert ids == [(q + OFF) * 2 * OFF + (r + OFF) for q, r in cells]
    df = spark.createDataFrame([(i,) for i in ids], "cell long")
    uq, ur = TE.hex_cell_unpack(F.col("cell"))
    got = [(r["q"], r["r"]) for r in
           df.select(uq.alias("q"), ur.alias("r")).collect()]
    assert got == cells


def test_hex_neighbors_are_adjacent(spark):
    # points slightly off a center land in that cell or one of its 6
    # axial neighbors — never anything farther
    q0, r0 = 2, -1
    lon0, lat0 = _hex_center(q0, r0)
    size = 360.0 / (1 << 6)
    rng = random.Random(3)
    pts = [(lon0 + rng.uniform(-size, size), lat0 + rng.uniform(-1, 1))
           for _ in range(100)]
    allowed = {(q0, r0), (q0 + 1, r0), (q0 - 1, r0), (q0, r0 + 1),
               (q0, r0 - 1), (q0 + 1, r0 - 1), (q0 - 1, r0 + 1)}
    for cell in _spark_ids(spark, pts):
        q, r = cell // (2 * OFF) - OFF, cell % (2 * OFF) - OFF
        assert (q, r) in allowed
