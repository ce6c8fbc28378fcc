"""Profile-tier features: significant-tag filters, typed attributes,
attribute minzoom, LayerAsCentroid."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.config import Config, LayerDef
from tilemaker_spark.kernels import mvt
from tilemaker_spark.operators import tiling
from tilemaker_spark.plans import profile as prof


@pytest.fixture(scope="module")
def tagged(spark):
    rows = [
        (1, {"building": "yes"}),
        (2, {"highway": "primary"}),
        (3, {"building": "yes", "name": "x"}),
        (4, {"highway": "motorway", "name": "a1"}),
        (5, {"natural": "water"}),
    ]
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def test_significant_tags_accept(spark, tagged):
    """Accept mode: entity passes if any tag matches (reference
    src/significant_tags.cpp:60-69)."""
    got = {r["id"] for r in tagged.filter(
        prof.significant_tags(["highway", "natural"])).collect()}
    assert got == {2, 4, 5}
    # value-qualified filter
    got = {r["id"] for r in tagged.filter(
        prof.significant_tags(["highway=motorway"])).collect()}
    assert got == {4}


def test_significant_tags_reject(spark, tagged):
    """Reject mode (~): passes if at least one tag is NOT matched —
    ~building drops building-ONLY entities (reference :72-90)."""
    got = {r["id"] for r in tagged.filter(
        prof.significant_tags(["~building"])).collect()}
    assert got == {2, 3, 4, 5}   # 1 is building-only; 3 also has name
    with pytest.raises(ValueError):
        prof.significant_tags(["~building", "highway"])


def _tiles_for(spark, rows, cfg):
    feats = spark.createDataFrame(rows, tiling.FEATURE_SCHEMA)
    return {(r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in tiling.generate_tiles(feats, cfg).collect()}


def test_typed_attributes_and_attr_minzoom(spark):
    rows = [(1, "poi", 0, 13, 0,
             {"name": "cafe", "lanes": "3", "open": "true", "ele": "12.5"},
             [7.42, 43.73], [1], [])]
    cfg = Config(layers={
        "poi": LayerDef(
            "poi", minzoom=13, maxzoom=14, combine_points=False,
            attr_types={"lanes": "Integer", "open": "Boolean",
                        "ele": "Number"},
            attr_minzoom={"name": 14}),
    }, minzoom=13, maxzoom=14)
    tiles = _tiles_for(spark, rows, cfg)
    z13 = [mvt.decode_tile(b) for (z, _, _), b in tiles.items() if z == 13]
    z14 = [mvt.decode_tile(b) for (z, _, _), b in tiles.items() if z == 14]
    a13 = z13[0]["poi"]["features"][0]["attrs"]
    a14 = z14[0]["poi"]["features"][0]["attrs"]
    assert "name" not in a13          # attr minzoom 14 filters it at z13
    assert a14["name"] == "cafe"      # present at z14
    assert a14["lanes"] == 3 and isinstance(a14["lanes"], int)
    assert a14["open"] is True
    assert a14["ele"] == 12.5


def test_layer_as_centroid(spark):
    """LayerAsCentroid: polygon rule emits a label point inside the
    polygon (reference src/osm_lua_processing.cpp:749-863)."""
    way_geoms = spark.createDataFrame(
        [(1, {"place": "islet", "name": "I"},
          [7.40, 43.70, 7.44, 43.70, 7.44, 43.74, 7.40, 43.74, 7.40, 43.70],
          True)],
        "id long, tags map<string,string>, coords array<double>, "
        "is_closed boolean")
    rules = [prof.LayerRule(
        layer="place", source="way_area",
        match=lambda: prof.holds("place"),
        attrs={"name": lambda: prof.find("name")},
        as_centroid=True)]
    feats = prof.Profile(rules).apply(way_geoms=way_geoms).collect()
    assert len(feats) == 1
    f = feats[0]
    assert f["kind"] == 0  # POINT
    x, y = f["coords"]
    assert 7.40 < x < 7.44 and 43.70 < y < 43.74
    # label point of a rectangle = its center (pole of inaccessibility)
    assert x == pytest.approx(7.42, abs=1e-3)
    assert y == pytest.approx(43.72, abs=1e-3)


def test_used_closure_prunes_nodes(spark):
    """usedNodes/usedWays (reference include/osm_store.h:270-300): nodes
    are kept iff referenced by a used way, listed by an accepted
    relation's member way, or passing node_keys."""
    from tilemaker_spark.sources import pbf as pbf_src
    nodes, ways, rels = pbf_src.read_pbf(
        spark, "/root/reference/test/monaco.pbf")
    n_all = nodes.count()
    nu, wu = prof.used_closure(
        nodes, ways,
        way_filter=prof.significant_tags(["highway"]),
        node_filter=prof.significant_tags(["place"]))
    n_used, w_used = nu.count(), wu.count()
    assert w_used < ways.count()
    assert n_used < n_all
    # every used way's refs are present in the pruned node set (minus
    # extract-boundary missing nodes, which the pbf itself lacks)
    ref_ids = wu.select(F.explode("refs").alias("id")).distinct()
    present = ref_ids.join(nodes, "id", "left_semi").count()
    kept = ref_ids.join(nu, "id", "left_semi").count()
    assert kept == present
    # relation closure pulls member ways in even when way_keys reject them
    nu2, wu2 = prof.used_closure(
        nodes, ways, relations=rels,
        way_filter=prof.significant_tags(["highway"]),
        relation_pred=F.col("tags")["boundary"] == "administrative")
    assert wu2.count() > w_used


def test_modify_id(spark):
    way_geoms = spark.createDataFrame(
        [(7, {"highway": "path"}, [0.0, 0.0, 1.0, 1.0], False)],
        "id long, tags map<string,string>, coords array<double>, "
        "is_closed boolean")
    rules = [prof.LayerRule(
        layer="t", source="way_line", match=lambda: prof.holds("highway"),
        feature_id=lambda: F.col("id") * 2 + 1)]
    out = prof.Profile(rules).apply(way_geoms=way_geoms).collect()
    assert out[0]["feature_id"] == 15
