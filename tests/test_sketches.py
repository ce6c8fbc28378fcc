"""KMV distinct-count sketch (operators/sketches.py).

The operator's whole claim is merge-safety: the k smallest distinct
hashes of a union equal the k smallest of the per-partition k-smallest,
so the estimate must be BIT-IDENTICAL under any repartitioning — that
(not closeness) is what the cross-engine oracle hashes.
"""

import pytest

from tilemaker_spark.operators import sketches

K = 32


def _rows(spark, groups):
    rows = [(g, f"u{g}_{i % nd}")
            for g, nd in groups.items()
            for i in range(nd * 2)]  # duplicates: 2x each key
    return spark.createDataFrame(rows, "grp string, user string")


def test_exact_below_k(spark):
    df = _rows(spark, {"small": 7})
    out = sketches.kmv_distinct(df, "user", ["grp"], k=K, salt=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.est_distinct == 7 and r.sketch_size == 7


def test_estimate_above_k_is_close(spark):
    nd = 2000
    df = _rows(spark, {"big": nd})
    r = sketches.kmv_distinct(df, "user", ["grp"], k=64, salt=1).collect()[0]
    assert r.sketch_size == 64
    # KMV std error ~ 1/sqrt(k-1) ~ 12.6%; 40% is a deterministic-safe
    # bound for one fixed hash seed
    assert nd * 0.6 <= r.est_distinct <= nd * 1.4


def test_partition_independence_bit_exact(spark):
    df = _rows(spark, {"a": 500, "b": 20, "c": 1})
    base = sketches.kmv_distinct(
        df.coalesce(1), "user", ["grp"], k=K, salt=3)
    wide = sketches.kmv_distinct(
        df.repartition(7, "user"), "user", ["grp"], k=K, salt=3)
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, wide.collect()))


def test_bad_k_rejected(spark):
    df = _rows(spark, {"a": 3})
    with pytest.raises(ValueError):
        sketches.kmv_distinct(df, "user", ["grp"], k=1)
