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
