"""Adaptive quadtree binning (operators/quadtree.py)."""

import random

import pytest

from tilemaker_spark.operators.quadtree import adaptive_cells

ZC, ZM, CAP = 2, 7, 40


def _pts(spark):
    rng = random.Random(11)
    # one dense urban cluster + sparse global noise
    pts = [(8.54 + rng.uniform(-0.02, 0.02),
            47.37 + rng.uniform(-0.02, 0.02)) for _ in range(600)]
    pts += [(rng.uniform(-179, 179), rng.uniform(-80, 80))
            for _ in range(300)]
    return spark.createDataFrame(pts, "lon double, lat double"), pts


def test_invariants(spark):
    df, pts = _pts(spark)
    leaves = adaptive_cells(df, z_coarse=ZC, z_max=ZM, cap=CAP).collect()
    # partition: every point counted exactly once
    assert sum(r["n"] for r in leaves) == len(pts)
    # load bound: any leaf above the floor respects the cap
    assert all(r["n"] <= CAP for r in leaves if r["z"] < ZM)
    # depth spread: the urban cluster forces splits, the ocean doesn't
    zs = {r["z"] for r in leaves}
    assert ZC in zs and max(zs) > ZC
    # forced splits: a leaf deeper than z_coarse has a parent > cap
    by_level = {}
    for r in leaves:
        by_level.setdefault(r["z"], {})[(r["x"], r["y"])] = r["n"]

    def subtree_n(z, x, y):
        # count of points in cell (z,x,y) = sum of leaves under it
        tot = 0
        for lz, cells in by_level.items():
            if lz < z:
                continue
            for (lx, ly), n in cells.items():
                if lx >> (lz - z) == x and ly >> (lz - z) == y:
                    tot += n
        return tot

    for r in leaves:
        if r["z"] > ZC:
            pz, px, py = r["z"] - 1, r["x"] >> 1, r["y"] >> 1
            assert subtree_n(pz, px, py) > CAP


def test_partition_independent(spark):
    df, _ = _pts(spark)
    a = sorted(map(tuple, adaptive_cells(
        df.coalesce(1), z_coarse=ZC, z_max=ZM, cap=CAP).collect()))
    b = sorted(map(tuple, adaptive_cells(
        df.repartition(13), z_coarse=ZC, z_max=ZM, cap=CAP).collect()))
    assert a == b


def test_duckdb_twin(spark):
    import duckdb
    from tilemaker_spark.operators.quadtree import adaptive_cells_oracle_sql
    df, pts = _pts(spark)
    got = sorted(map(tuple, adaptive_cells(
        df, z_coarse=ZC, z_max=ZM, cap=CAP).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    want = sorted(map(tuple, con.execute(adaptive_cells_oracle_sql(
        "p", "lon", "lat", z_coarse=ZC, z_max=ZM, cap=CAP)).fetchall()))
    assert got == want


def test_bad_params(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        adaptive_cells(df, z_coarse=5, z_max=5)
    with pytest.raises(ValueError):
        adaptive_cells(df, cap=0)


def test_assign_adaptive_consistent_with_leaves(spark):
    from tilemaker_spark.operators.quadtree import assign_adaptive
    df, pts = _pts(spark)
    a = assign_adaptive(df, z_coarse=ZC, z_max=ZM, cap=CAP)
    rows = a.collect()
    # row-preserving: every point labeled exactly once
    assert len(rows) == len(pts)
    # grouping the assignment reproduces adaptive_cells exactly
    from collections import Counter
    got = Counter((r["z"], r["x"], r["y"]) for r in rows)
    leaves = {(r["z"], r["x"], r["y"]): r["n"] for r in adaptive_cells(
        df, z_coarse=ZC, z_max=ZM, cap=CAP).collect()}
    assert dict(got) == leaves


def test_closed_form_equals_iterative_fixpoint_property():
    """Property (hypothesis): the closed-form leaf rule (smallest z
    whose enclosing count <= cap) equals the classic ITERATIVE
    split-recount fixpoint, for any point multiset — the monotonicity
    argument adaptive_cells stakes its one-shuffle plan on.  Pure
    integer grid coordinates: the claim is about the count math, not
    the projection."""
    from collections import Counter
    from hypothesis import given, settings, strategies as st

    ZC_, ZM_ = 1, 5
    coord = st.integers(min_value=0, max_value=(1 << ZM_) - 1)

    @settings(max_examples=150, deadline=None)
    @given(pts=st.lists(st.tuples(coord, coord), min_size=1,
                        max_size=120),
           cap=st.integers(min_value=1, max_value=20))
    def check(pts, cap):
        # closed form
        fine = Counter(pts)

        def cnt(z, x, y):
            dz = ZM_ - z
            return sum(n for (fx, fy), n in fine.items()
                       if fx >> dz == x and fy >> dz == y)

        closed = Counter()
        for (fx, fy), n in fine.items():
            leaf = ZM_
            for z in range(ZC_, ZM_):
                if cnt(z, fx >> (ZM_ - z), fy >> (ZM_ - z)) <= cap:
                    leaf = z
                    break
            closed[(leaf, fx >> (ZM_ - leaf), fy >> (ZM_ - leaf))] += n

        # iterative reference: start at ZC_, split any cell > cap
        iterative = Counter()
        frontier = Counter()
        for (fx, fy), n in fine.items():
            frontier[(ZC_, fx >> (ZM_ - ZC_), fy >> (ZM_ - ZC_))] += n
        while frontier:
            nxt = Counter()
            for (z, x, y), n in frontier.items():
                if n <= cap or z == ZM_:
                    iterative[(z, x, y)] += n
                else:
                    for (fx, fy), m in fine.items():
                        if fx >> (ZM_ - z) == x and fy >> (ZM_ - z) == y:
                            nxt[(z + 1, fx >> (ZM_ - z - 1),
                                 fy >> (ZM_ - z - 1))] += m
            frontier = nxt
        assert closed == iterative

    check()


def test_adaptive_leaves_exclude_null_coords_explicitly(spark):
    """NULL lon/lat rows are dropped up front — previously the
    (NULL, NULL) fine cell silently vanished in the ancestor joins,
    breaking the leaves-partition-the-input invariant."""
    from pyspark.sql import functions as F
    from tilemaker_spark.operators.quadtree import (adaptive_cells,
                                                    assign_adaptive)
    pts = spark.createDataFrame(
        [(7.42, 43.73)] * 50 + [(None, 43.73), (7.42, None),
                                (None, None)],
        "lon double, lat double")
    leaves = adaptive_cells(pts, z_coarse=2, z_max=6, cap=10)
    assert leaves.agg(F.sum("n")).collect()[0][0] == 50
    assigned = assign_adaptive(pts, z_coarse=2, z_max=6, cap=10)
    assert assigned.count() == 50
