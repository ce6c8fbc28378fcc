"""MVT encoder round-trip tests (public Mapbox Vector Tile 2.1 spec;
encode rules mirror /root/reference/src/tile_worker.cpp:98-301)."""

import numpy as np

from tilemaker_spark.kernels import mvt


def test_point_roundtrip():
    lb = mvt.LayerBuilder("poi")
    cmds = mvt.encode_point_geom(np.array([[0.5, 0.5]]), 4096)
    assert lb.add_feature(mvt.GEOM_POINT, cmds, {"name": "x"}, feature_id=1)
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    f = dec["poi"]["features"][0]
    assert f["type"] == mvt.GEOM_POINT
    assert f["attrs"] == {"name": "x"}
    # MoveTo(1), zigzag(2048), zigzag(2048)
    assert f["cmds"][0] == (1 << 3) | 1
    assert f["cmds"][1] == f["cmds"][2] == 2048 * 2


def test_line_skips_degenerate():
    # zero-length after quantization -> dropped (line needs >=2 grid pts)
    cmds = mvt.encode_line_geom([np.array([[0.5, 0.5], [0.50001, 0.50001]])], 4096)
    assert cmds == []


def test_polygon_winding_and_rings():
    outer = np.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9], [0.1, 0.1]])
    inner = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6], [0.4, 0.4]])
    cmds = mvt.encode_polygon_geom([[outer, inner]], 4096)
    lb = mvt.LayerBuilder("landuse")
    lb.add_feature(mvt.GEOM_POLYGON, cmds)
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    f = dec["landuse"]["features"][0]
    # two rings: 2x (MoveTo + LineTo + ClosePath)
    close_cmds = [c for c in f["cmds"] if (c & 7) == 7]
    assert len(close_cmds) == 2


def test_small_ring_dropped():
    # a ring that quantizes to <3 distinct points vanishes (reference rule)
    tiny = np.array([[0.5, 0.5], [0.50005, 0.5], [0.5, 0.50005], [0.5, 0.5]])
    assert mvt.encode_polygon_geom([[tiny]], 4096) == []


def test_value_types():
    lb = mvt.LayerBuilder("t")
    cmds = mvt.encode_point_geom(np.array([[0.5, 0.5]]), 4096)
    lb.add_feature(mvt.GEOM_POINT, cmds,
                   {"s": "str", "i": 42, "f": 1.5, "b": True})
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    attrs = dec["t"]["features"][0]["attrs"]
    assert attrs == {"s": "str", "i": 42, "f": 1.5, "b": True}


def test_shared_value_dictionary():
    lb = mvt.LayerBuilder("t")
    for i in range(5):
        cmds = mvt.encode_point_geom(np.array([[0.1 * (i + 1), 0.5]]), 4096)
        lb.add_feature(mvt.GEOM_POINT, cmds, {"class": "poi"})
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    assert len(dec["t"]["values"]) == 1  # "poi" interned once
    assert len(dec["t"]["features"]) == 5


def test_compression_modes():
    lb = mvt.LayerBuilder("t")
    lb.add_feature(mvt.GEOM_POINT,
                   mvt.encode_point_geom(np.array([[0.5, 0.5]]), 4096))
    gz = mvt.build_tile([lb], compress="gzip")
    assert gz[:2] == b"\x1f\x8b"
    raw = mvt.build_tile([lb], compress="none")
    assert mvt.decode_tile(gz) == mvt.decode_tile(raw)


def test_extent_8192():
    # high_resolution mode (reference src/coordinates_geom.cpp:22-31)
    lb = mvt.LayerBuilder("t", extent=8192)
    lb.add_feature(mvt.GEOM_POINT,
                   mvt.encode_point_geom(np.array([[0.5, 0.5]]), 8192))
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    assert dec["t"]["extent"] == 8192
    assert dec["t"]["features"][0]["cmds"][1] == 4096 * 2


def _unzig(v):
    return (v >> 1) ^ -(v & 1)


def _rings_from_cmds(cmds):
    """Decode MVT geometry commands into absolute-integer-coordinate rings."""
    rings, cur = [], []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        c = cmds[i]
        op, n = c & 7, c >> 3
        i += 1
        if op == mvt.MOVETO:
            for _ in range(n):
                cx += _unzig(cmds[i]); cy += _unzig(cmds[i + 1]); i += 2
                cur = [(cx, cy)]
        elif op == mvt.LINETO:
            for _ in range(n):
                cx += _unzig(cmds[i]); cy += _unzig(cmds[i + 1]); i += 2
                cur.append((cx, cy))
        else:  # CLOSEPATH
            rings.append(cur)
            cur = []
    return rings


def _shoelace2(ring):
    s = 0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:] + ring[:1]):
        s += x0 * y1 - x1 * y0
    return s


def test_polygon_winding_sign():
    """MVT 2.1 4.3.3.3: exterior ring CW in screen space (y down) =>
    positive shoelace sum over emitted integer coords; holes negative."""
    outer = np.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9],
                      [0.1, 0.1]])
    inner = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6],
                      [0.4, 0.4]])
    cmds = mvt.encode_polygon_geom([[outer, inner]], 4096)
    rings = _rings_from_cmds(cmds)
    assert len(rings) == 2
    assert _shoelace2(rings[0]) > 0  # exterior: screen-CW
    assert _shoelace2(rings[1]) < 0  # hole: screen-CCW
    # same holds regardless of input orientation (encoder must fix it)
    cmds2 = mvt.encode_polygon_geom([[outer[::-1], inner[::-1]]], 4096)
    rings2 = _rings_from_cmds(cmds2)
    assert _shoelace2(rings2[0]) > 0
    assert _shoelace2(rings2[1]) < 0


def test_merge_rescales_extent_mismatch():
    """merge_tile_blobs with old=8192-extent and new=4096-extent layers:
    old features must be rescaled to the merged layer's extent, not
    re-encoded verbatim (which would double their coordinates)."""
    old_lb = mvt.LayerBuilder("t", extent=8192)
    old_lb.add_feature(
        mvt.GEOM_POINT, mvt.encode_point_geom(np.array([[0.5, 0.25]]), 8192),
        {"src": "old"})
    new_lb = mvt.LayerBuilder("t", extent=4096)
    new_lb.add_feature(
        mvt.GEOM_POINT, mvt.encode_point_geom(np.array([[0.75, 0.5]]), 4096),
        {"src": "new"})
    merged = mvt.merge_tile_blobs(
        mvt.build_tile([old_lb]), mvt.build_tile([new_lb]))
    dec = mvt.decode_tile(merged)["t"]
    assert dec["extent"] == 4096
    pts = {f["attrs"]["src"]: (_unzig(f["cmds"][1]), _unzig(f["cmds"][2]))
           for f in dec["features"]}
    assert pts["new"] == (3072, 2048)
    assert pts["old"] == (2048, 1024)  # 0.5, 0.25 of a 4096 grid


def test_merge_rescales_polygon_rings():
    outer = np.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9],
                      [0.1, 0.1]])
    old_lb = mvt.LayerBuilder("lu", extent=8192)
    old_lb.add_feature(mvt.GEOM_POLYGON,
                       mvt.encode_polygon_geom([[outer]], 8192))
    new_lb = mvt.LayerBuilder("lu", extent=4096)
    new_lb.add_feature(mvt.GEOM_POLYGON,
                       mvt.encode_polygon_geom([[outer]], 4096))
    merged = mvt.merge_tile_blobs(
        mvt.build_tile([old_lb]), mvt.build_tile([new_lb]))
    feats = mvt.decode_tile(merged)["lu"]["features"]
    # after rescale both encodings of the same ring agree to within the
    # 1-grid-unit quantization difference of encoding at either extent
    r_old = np.array(_rings_from_cmds(feats[0]["cmds"])[0])
    r_new = np.array(_rings_from_cmds(feats[1]["cmds"])[0])
    assert r_old.shape == r_new.shape
    assert np.abs(r_old - r_new).max() <= 1
