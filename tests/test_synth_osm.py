"""PBF encoder round-trip + country-scale synthetic extract e2e.

The BASELINE evidence plan calls for an end-to-end run at ~20x the monaco
fixture (Liechtenstein-extract scale: ~1M nodes / ~100k ways).  The
sandbox has no network for a real Geofabrik file, so
sources/synth_osm.py synthesizes a deterministic extract and
kernels/pbf_write.py serializes it as a real .osm.pbf.  Default-suite
tests cover the encoder round-trip and a scaled-down (identical
structure) end-to-end job; the full 1M-node job is gated behind
SPARK_GRAFT_SLOW=1 (runs several minutes) and locks tile-count goldens.
"""

import os
import sqlite3
import subprocess
import sys

import numpy as np
import pytest

from tilemaker_spark.kernels import pbf, pbf_write as W

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_varint_pack_roundtrip():
    rng = np.random.default_rng(7)
    edge_u = np.array([0, 1, 127, 128, 300, 2**32, 2**56 + 5, 2**63],
                      dtype=np.uint64)
    rand_u = rng.integers(0, 2**62, 500).astype(np.uint64)
    for arr in (edge_u, rand_u):
        assert pbf._packed_varints(W.pack_uvarints(arr)) == arr.tolist()
    edge_s = np.array([0, -1, 1, -64, 64, -(2**40), 2**40, -(2**62)],
                      dtype=np.int64)
    rand_s = rng.integers(-2**40, 2**40, 500).astype(np.int64)
    for arr in (edge_s, rand_s):
        assert pbf._packed_varints(W.pack_svarints(arr),
                                   signed=True) == arr.tolist()


def test_pbf_write_roundtrip(tmp_path):
    nodes = [(1, 7.42, 43.73, {"amenity": "cafe", "name": "x"}),
             (5, 7.4201, 43.7301, None),
             (9, -0.1, 51.5, {"place": "city"})]
    ways = [(10, [1, 5, 9], {"highway": "primary"}),
            (11, [9, 5, 1, 9], {"building": "yes"})]
    rels = [(20, [(1, 10, "outer"), (1, 11, "inner"), (0, 5, "label")],
             {"type": "multipolygon"})]
    p = str(tmp_path / "rt.pbf")
    info = W.write_pbf(p, nodes, ways, rels, (-0.1, 43.73, 7.4201, 51.5))
    assert info == {"blobs": 4, "nodes": 3, "ways": 2, "relations": 1}

    hdr, ents = pbf.decode_file(p)
    assert hdr["bbox"] == pytest.approx((-0.1, 43.73, 7.4201, 51.5))
    assert "Sort.Type_then_ID" in hdr["features"]
    got = ents.nodes
    assert [n[0] for n in got] == [1, 5, 9]
    for (nid, lon, lat, tags), exp in zip(got, nodes):
        assert lon == pytest.approx(exp[1], abs=1e-7)
        assert lat == pytest.approx(exp[2], abs=1e-7)
        assert tags == (exp[3] or {})
    assert ents.ways == [(10, [1, 5, 9], {"highway": "primary"}),
                         (11, [9, 5, 1, 9], {"building": "yes"})]
    assert ents.relations == [
        (20, [(1, 10, "outer"), (1, 11, "inner"), (0, 5, "label")],
         {"type": "multipolygon"})]

    # type-sorted file -> blob pruning index present
    from tilemaker_spark.sources.pbf import blob_type_ranges
    assert blob_type_ranges(p) is not None


@pytest.fixture(scope="module")
def synth_small(tmp_path_factory):
    from tilemaker_spark.sources.synth_osm import write_synth_pbf
    p = str(tmp_path_factory.mktemp("synth") / "country.pbf")
    info = write_synth_pbf(p, seed=42, scale=0.02)
    return p, info


def test_synth_country_structure(synth_small):
    path, info = synth_small
    # deterministic generator: same seed -> same entity counts
    assert info["nodes"] == 20005 and info["ways"] == 1920
    assert info["relations"] == 24

    hdr, ents = pbf.decode_file(path)
    assert hdr["bbox"] == pytest.approx((9.47, 47.05, 9.64, 47.27))
    assert len(ents.nodes) == info["nodes"]
    assert len(ents.ways) == info["ways"]
    assert len(ents.relations) == info["relations"]

    node_ids = {n[0] for n in ents.nodes}
    way_ids = {w[0] for w in ents.ways}
    closed = 0
    for _, refs, tags in ents.ways:
        assert set(refs) <= node_ids           # referential integrity
        if refs[0] == refs[-1]:
            closed += 1
        if tags and "building" in tags:
            assert len(refs) == 5 and refs[0] == refs[-1]
    assert closed > len(ents.ways) * 0.5       # buildings + areas closed

    mps = [r for r in ents.relations
           if r[2].get("type") == "multipolygon"]
    assert mps
    for _, members, _ in mps:
        roles = {role for _, _, role in members}
        assert roles == {"outer", "inner"}
        assert all(t == 1 and ref in way_ids for t, ref, _ in members)

    # ~25% of nodes are untagged dead weight for the used-closure to prune
    tagged = sum(1 for n in ents.nodes if n[3])
    assert 0.03 < tagged / len(ents.nodes) < 0.12

    # skew: the top z14 tile holds far more than the uniform share
    from tilemaker_spark.kernels.proj import lon2tilex, lat2tiley
    xs = np.array([lon2tilex(n[1], 14) for n in ents.nodes])
    ys = np.array([lat2tiley(n[2], 14) for n in ents.nodes])
    _, counts = np.unique(xs * 100000 + ys, return_counts=True)
    assert counts.max() > 3 * counts.mean()


def test_synth_small_job_e2e(spark, synth_small, tmp_path):
    """Full job surface on the scaled-down extract: decode -> assemble ->
    profile -> tiles -> mbtiles, every layer of the openmaptiles-lite
    profile populated."""
    path, _ = synth_small
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import build_tiles_job as J
    from tilemaker_spark.operators.tiling import generate_tiles
    from tilemaker_spark.sinks import mbtiles as MB

    features, cfg = J.read_features(spark, path)
    by_layer = {r["layer"]: r["count"]
                for r in features.groupBy("layer").count().collect()}
    for layer in ("transportation", "building", "landuse", "water", "poi",
                  "place"):
        assert by_layer.get(layer, 0) > 0, f"layer {layer} empty"

    cfg.minzoom, cfg.maxzoom, cfg.basezoom = 0, 12, 12
    tiles = generate_tiles(features, cfg)
    out = str(tmp_path / "country.mbtiles")
    n = MB.write_mbtiles(tiles, out)
    assert n == 24  # deterministic golden (seed 42, scale 0.02, z<=12)

    conn = sqlite3.connect(out)
    zooms = [z for (z,) in conn.execute(
        "SELECT DISTINCT zoom_level FROM tiles ORDER BY 1")]
    conn.close()
    assert zooms[-1] == 12 and len(zooms) >= 4

    # one z12 tile decodes back with multiple layers present
    from tilemaker_spark.kernels import mvt
    row = [r for r in tiles.filter("z = 12").limit(1).collect()][0]
    import gzip
    layers = mvt.decode_tile(gzip.decompress(bytes(row["tile"])))
    assert len(layers) >= 2


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_SLOW"),
                    reason="several-minute 1M-node run; set "
                           "SPARK_GRAFT_SLOW=1 to enable")
def test_liechtenstein_scale_job_e2e(tmp_path):
    """The evidence-plan run: ~1,000,200 nodes / 96,000 ways / 1,200
    relations (20x monaco) through the real spark-submit job entry,
    locked tile-count goldens — proves assembly + tiling at extract
    scale without plan changes."""
    import time
    from tilemaker_spark.sources.synth_osm import write_synth_pbf
    p = str(tmp_path / "liech.pbf")
    info = write_synth_pbf(p, seed=42, scale=1.0)
    assert info["nodes"] == 1000200 and info["ways"] == 96000

    out = str(tmp_path / "liech.mbtiles")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_tiles_job.py"),
         "--input", p, "--output", out, "--maxzoom", "14"],
        capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    assert r.returncode == 0, r.stderr[-3000:]

    conn = sqlite3.connect(out)
    n = conn.execute("SELECT count(*) FROM tiles").fetchone()[0]
    n14 = conn.execute("SELECT count(*) FROM tiles WHERE zoom_level=14"
                       ).fetchone()[0]
    conn.close()
    assert n == 208 and n14 == 144   # deterministic goldens (seed 42)
    # runtime lock: generous bound to catch quadratic regressions, not
    # shared-host noise (observed ~8 min on a busy local[32])
    assert wall < 1500
