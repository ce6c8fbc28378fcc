"""Per-feature attribute remap hook for external sources.

The reference lets profiles register an ``attribute_function(attr,
layer)`` Lua callback that rewrites each shapefile/GeoJSON feature's
attribute table before it enters the engine, with the special returned
key ``_minzoom`` setting that FEATURE's minimum zoom instead of becoming
an attribute (/root/reference/src/shp_processor.cpp:47-84 and
docs/config.md) — OpenMapTiles-style profiles use it to derive e.g.
landcover classes and per-feature zoom gates from raw column values.

Spark twin: ``attribute_function`` is a plain Python callable
``(attrs: dict[str, str], layer: str) -> dict`` applied per feature at
source-read time (driver-side for shapefile/FeatureCollection, inside
the Arrow batch for distributed JSONL).  Returned values are
stringified into the engine's ``map<string,string>`` attrs column,
mirroring how the reference coerces Lua values into typed attribute
sets; ``_minzoom`` (int) overrides the feature's minzoom and is honored
by the tile builder's zoom filter (operators/tiling.py).
"""

from __future__ import annotations


def apply_attribute_function(attrs: dict, layer: str, minzoom: int,
                             attribute_function=None) -> tuple[dict, int]:
    """Run the remap hook for one feature.  Returns (attrs, minzoom)."""
    if attribute_function is None:
        return {str(k): str(v) for k, v in attrs.items()}, minzoom
    out = attribute_function(dict(attrs), layer)
    if out is None:
        out = {}
    mz = minzoom
    if "_minzoom" in out:
        mz = int(out.pop("_minzoom"))
    return {str(k): str(v) for k, v in out.items()}, mz
