"""North-rule packaging check: the pipeline runs via
``spark-submit --py-files dist/tilemaker_spark.zip`` as a fresh driver
process whose executors import the package from the shipped zip (no
repo on sys.path), producing a valid mbtiles from the monaco fixture."""

import os
import sqlite3
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MONACO = "/root/reference/test/monaco.pbf"


@pytest.mark.skipif(not os.path.exists(MONACO), reason="no monaco fixture")
def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build
    zip_path = build(str(tmp_path / "tilemaker_spark.zip"))

    spark_home = os.environ.get("SPARK_HOME")
    if not spark_home:
        import pyspark
        spark_home = os.path.dirname(pyspark.__file__)
    submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(submit):
        pytest.skip("no spark-submit binary")

    out = str(tmp_path / "monaco.mbtiles")
    # cwd=tmp_path so the job CANNOT import tilemaker_spark from the
    # repo checkout — only from the --py-files zip
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [submit, "--master", "local[8]", "--py-files", zip_path,
         os.path.join(REPO, "jobs", "build_tiles_job.py"),
         "--input", MONACO, "--output", out, "--maxzoom", "10"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "wrote" in r.stdout

    conn = sqlite3.connect(out)
    n = conn.execute("SELECT count(*) FROM tiles").fetchone()[0]
    meta = dict(conn.execute("SELECT name, value FROM metadata"))
    conn.close()
    assert n >= 5  # pyramid zooms 4..10 over Monaco
    assert meta["format"] == "pbf"


def test_job_checkpoint_resume(spark, tmp_path):
    """--checkpoint resumes idempotently: a second identical run skips
    every committed z6-subtree key (no data file is rewritten) and the
    exported mbtiles is byte-count identical."""
    import glob
    import sys as _sys
    _sys.path.insert(0, os.path.join(REPO, "jobs"))
    import build_tiles_job as J

    # tiny FEATURE_SCHEMA input: 30 points spread across the world
    rows = [(i, "poi", 0, 0, 0, {},
             [float(-150 + i * 10), float(-60 + (i % 13) * 9)], [1], [])
            for i in range(30)]
    feats = spark.createDataFrame(
        rows,
        "feature_id long, layer string, kind tinyint, minzoom int, "
        "zorder long, attrs map<string,string>, coords array<double>, "
        "ring_sizes array<int>, poly_ring_counts array<int>")
    src = str(tmp_path / "feats.parquet")
    feats.write.parquet(src)

    out1 = str(tmp_path / "a.mbtiles")
    out2 = str(tmp_path / "b.mbtiles")
    ckpt = str(tmp_path / "ckpt")
    J.main(["--input", src, "--output", out1, "--maxzoom", "8",
            "--checkpoint", ckpt])
    data_files = sorted(glob.glob(os.path.join(ckpt, "data", "**", "*"),
                                  recursive=True))
    mtimes = {f: os.path.getmtime(f) for f in data_files}
    manifests1 = sorted(os.listdir(os.path.join(ckpt, "_manifest")))

    J.main(["--input", src, "--output", out2, "--maxzoom", "8",
            "--checkpoint", ckpt])
    # no data file rewritten, no new snapshot -> keys were skipped
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"rewritten: {f}"
    assert sorted(os.listdir(os.path.join(ckpt, "_manifest"))) == manifests1

    def tile_count(p):
        conn = sqlite3.connect(p)
        n = conn.execute("SELECT count(*) FROM tiles").fetchone()[0]
        conn.close()
        return n

    assert tile_count(out1) == tile_count(out2) > 0

    # lineage table records one row per committed subtree key
    from tilemaker_spark.lineage import CheckpointedSink
    sink = CheckpointedSink(ckpt)
    lin = sink.lineage(spark)
    assert lin.count() == len(sink.committed_keys())


def test_job_raster_sink_clips_and_resumes(spark, tmp_path):
    """--raster-zoom honors --bbox (no world-spanning raster tiles) and
    routes through the checkpoint sink (second run rewrites nothing)."""
    import glob
    import sys as _sys
    _sys.path.insert(0, os.path.join(REPO, "jobs"))
    import build_tiles_job as J

    rows = [(i, "poi", 0, 0, 0, {},
             [float(-150 + i * 10), float(-60 + (i % 13) * 9)], [1], [])
            for i in range(30)]
    feats = spark.createDataFrame(
        rows,
        "feature_id long, layer string, kind tinyint, minzoom int, "
        "zorder long, attrs map<string,string>, coords array<double>, "
        "ring_sizes array<int>, poly_ring_counts array<int>")
    src = str(tmp_path / "feats.parquet")
    feats.write.parquet(src)

    out = str(tmp_path / "a.mbtiles")
    ckpt = str(tmp_path / "ckpt")
    bbox = "--bbox=-60,-30,60,30"
    J.main(["--input", src, "--output", out, "--maxzoom", "6",
            bbox, "--raster-zoom", "4", "--checkpoint", ckpt])
    rpath = str(tmp_path / "a.raster.mbtiles")
    conn = sqlite3.connect(rpath)
    # mbtiles rows are TMS-flipped: tile_row = 2^z - 1 - y
    tiles = conn.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles").fetchall()
    conn.close()
    assert tiles
    # bbox lon [-60, 60] at z4 -> x in [5, 10]; lat [-30, 30] -> y in
    # [6, 9] (web mercator), i.e. tms rows [6, 9]
    for z, x, row in tiles:
        y = (1 << z) - 1 - row
        assert 5 <= x <= 10, f"raster tile outside bbox: {(z, x, y)}"
        assert 6 <= y <= 9, f"raster tile outside bbox: {(z, x, y)}"

    rdata = sorted(glob.glob(os.path.join(ckpt, "raster", "data", "**",
                                          "*"), recursive=True))
    assert rdata, "raster tiles not checkpointed"
    mtimes = {f: os.path.getmtime(f) for f in rdata}
    out2 = str(tmp_path / "b.mbtiles")
    J.main(["--input", src, "--output", out2, "--maxzoom", "6",
            bbox, "--raster-zoom", "4", "--checkpoint", ckpt])
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"raster rewritten: {f}"
