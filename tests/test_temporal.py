"""asof_join / interval_join vs independent references.

The as-of reference is pandas.merge_asof (backward, inclusive — the
same contract as DuckDB ASOF JOIN, which the driver oracle uses); the
interval reference is a brute-force O(n*m) containment scan.  Both are
exercised on seeded-random data with ties, NULL payloads, keyless and
keyed forms, and bin-boundary-straddling intervals.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.operators import temporal

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return EPOCH + dt.timedelta(seconds=float(seconds))


def _random_frames(seed, n_left=400, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": [_ts(s) for s in rng.integers(0, 5000, n_left)],
        "lid": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": [_ts(s) for s in rng.integers(0, 5000, n_right)],
        "payload": rng.normal(size=n_right),
    })
    # asof requires right unique per (key, ts)
    right = right.groupby(["k", "ts"], as_index=False).agg(
        payload=("payload", "max"))
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_pandas_merge_asof(spark, seed):
    left, right = _random_frames(seed)
    got = (temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], left_ts="ts", right_ts="ts")
        .toPandas().sort_values("lid").reset_index(drop=True))
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_r")).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["payload"], exp["payload"], check_names=False)
    # matched_ts agrees wherever a match exists
    m = got["payload"].notna()
    assert got.loc[m, "matched_ts"].notna().all()
    assert got.loc[~m, "matched_ts"].isna().all()


def test_asof_tie_is_inclusive_and_null_payload_matches(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [_ts(100), _ts(200)],
                      "lid": [0, 1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [_ts(100), _ts(150)],
                      "v": [5.0, None]}))
    out = (temporal.asof_join(left, right, keys=["k"])
           .orderBy("lid").collect())
    # tie at ts=100 matches (inclusive)
    assert out[0]["v"] == 5.0 and out[0]["matched_ts"] == _ts(100)
    # the ts=150 right row has a NULL payload but is still the match:
    # the struct carrier must not skip past it to ts=100
    assert out[1]["v"] is None and out[1]["matched_ts"] == _ts(150)


def test_asof_tolerance(spark):
    left, right = _random_frames(9)
    tol = 300.0
    got = (temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], tolerance_seconds=tol)
        .toPandas().sort_values("lid").reset_index(drop=True))
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
        tolerance=pd.Timedelta(seconds=tol), allow_exact_matches=True,
        suffixes=("", "_r")).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["payload"], exp["payload"], check_names=False)
    m = got["payload"].isna()
    assert got.loc[m, "matched_ts"].isna().all()


def test_asof_no_prior_right_row_is_null(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [_ts(50)], "lid": [0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [_ts(60)], "v": [1.0]}))
    row = temporal.asof_join(left, right, keys=["k"]).collect()[0]
    assert row["v"] is None and row["matched_ts"] is None


def test_asof_one_shuffle(spark):
    left, right = _random_frames(3)
    plan = (temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"])._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 1


def _brute_interval(points, intervals, keys):
    rows = []
    for _, p in points.iterrows():
        for _, iv in intervals.iterrows():
            if all(p[k] == iv[k] for k in keys) and \
                    iv["iv_start"] <= p["ts"] <= iv["iv_end"]:
                rows.append((p["pid"], iv["ivid"]))
    return sorted(rows)


@pytest.mark.parametrize("seed,keys,bin_s", [
    (0, [], 600), (1, ["k"], 600), (2, ["k"], 3600), (3, [], 97)])
def test_interval_join_matches_bruteforce(spark, seed, keys, bin_s):
    rng = np.random.default_rng(seed)
    points = pd.DataFrame({
        "k": rng.integers(0, 4, 300),
        "ts": [_ts(s) for s in rng.integers(0, 20000, 300)],
        "pid": np.arange(300, dtype=np.int64)})
    starts = rng.integers(0, 20000, 40)
    intervals = pd.DataFrame({
        "k": rng.integers(0, 4, 40),
        "iv_start": [_ts(s) for s in starts],
        "iv_end": [_ts(s + d) for s, d in
                   zip(starts, rng.integers(0, 4000, 40))],
        "ivid": np.arange(40, dtype=np.int64)})
    if not keys:
        points = points.drop(columns=["k"])
        intervals = intervals.drop(columns=["k"])
    got = (temporal.interval_join(
        spark.createDataFrame(points), spark.createDataFrame(intervals),
        keys=keys or None, bin_seconds=bin_s)
        .select("pid", "ivid").collect())
    assert sorted((r["pid"], r["ivid"]) for r in got) == \
        _brute_interval(points, intervals, keys)


def test_interval_join_boundaries_inclusive(spark):
    points = spark.createDataFrame(pd.DataFrame({
        "ts": [_ts(100), _ts(200), _ts(99), _ts(201)],
        "pid": [0, 1, 2, 3]}))
    intervals = spark.createDataFrame(pd.DataFrame({
        "iv_start": [_ts(100)], "iv_end": [_ts(200)], "ivid": [0]}))
    got = sorted(r["pid"] for r in temporal.interval_join(
        points, intervals, bin_seconds=50).select("pid").collect())
    assert got == [0, 1]


def test_interval_join_no_duplicate_pairs_across_bins(spark):
    # interval spans many bins; each contained point matches exactly once
    points = spark.createDataFrame(pd.DataFrame({
        "ts": [_ts(s) for s in range(0, 1000, 100)],
        "pid": list(range(10))}))
    intervals = spark.createDataFrame(pd.DataFrame({
        "iv_start": [_ts(0)], "iv_end": [_ts(950)], "ivid": [0]}))
    got = temporal.interval_join(points, intervals,
                                 bin_seconds=60).collect()
    assert len(got) == 10


def test_column_collision_raises(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "k": [1], "ts": [_ts(0)], "v": [1.0]}))
    with pytest.raises(ValueError):
        temporal.asof_join(df, df, keys=["k"])


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------

def _scd2_log(spark):
    rows = [
        # user 1: x, x (no-op), y, x — 3 versions
        (1, 1, "x", _ts(10)), (2, 1, "x", _ts(20)),
        (3, 1, "y", _ts(30)), (4, 1, "x", _ts(40)),
        # user 2: single row — 1 current version
        (5, 2, "z", _ts(15)),
        # user 3: same-timestamp tie broken by event_id
        (6, 3, "a", _ts(50)), (7, 3, "b", _ts(50)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")


def test_scd2_collapses_noop_changes(spark):
    out = (temporal.scd2_history(_scd2_log(spark))
           .orderBy("user_id", "version").collect())
    u1 = [r for r in out if r.user_id == 1]
    assert [r.event_type for r in u1] == ["x", "y", "x"]
    assert [r.version for r in u1] == [1, 2, 3]
    # intervals chain exactly: valid_to == next version's valid_from
    assert u1[0].valid_to_us == u1[1].valid_from_us
    assert u1[1].valid_to_us == u1[2].valid_from_us
    assert u1[2].valid_to_us is None and u1[2].is_current
    assert not u1[0].is_current and not u1[1].is_current
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].version == 1
    # tie at the same timestamp resolves by event_id: a then b
    u3 = [r for r in out if r.user_id == 3]
    assert [r.event_type for r in u3] == ["a", "b"]
    assert u3[0].valid_to_us == u3[1].valid_from_us


def test_scd2_random_matches_pandas(spark):
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n),
        "event_type": rng.choice(list("pqr"), n),
        "ts": [_ts(s) for s in rng.integers(0, 3000, n)],
    })
    out = temporal.scd2_history(
        spark.createDataFrame(pdf)).toPandas()
    # pandas reference: sort, drop consecutive dups per user, shift
    ref_rows = []
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        vals = g["event_type"].tolist()
        ts_us = (g["ts"].astype("int64") // 1000).tolist()
        kept = [i for i in range(len(vals))
                if i == 0 or vals[i] != vals[i - 1]]
        for v, i in enumerate(kept):
            nxt = ts_us[kept[v + 1]] if v + 1 < len(kept) else None
            ref_rows.append((uid, vals[i], ts_us[i], nxt, v + 1))
    ref = pd.DataFrame(ref_rows, columns=[
        "user_id", "event_type", "valid_from_us", "valid_to_us", "version"])
    got = (out.sort_values(["user_id", "version"])
           .reset_index(drop=True)[ref.columns])
    ref = ref.sort_values(["user_id", "version"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"valid_to_us": "float64"}),
        ref.astype({"valid_to_us": "float64"}), check_dtype=False)
