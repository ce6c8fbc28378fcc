"""Shapefile source, pure Python (public ESRI shapefile spec).

The reference reads .shp/.dbf via shapelib, assembles polygons by ring
winding (CW = outer) and clips to bbox (/root/reference/
src/shp_processor.cpp:109-278).  No shapelib here, so a minimal spec
decoder: shape types Point(1), PolyLine(3), Polygon(5) + their M/Z
variants' XY parts; attributes from the .dbf (dBASE III) selected by
``source_columns``.  Small external layers by design (the reference's
use case: ocean/landcover), so parsing happens on the driver and the
result enters Spark as a DataFrame — the broadcast side of the PIP join.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..kernels import geom as G


def _read_shp(path: str):
    """-> list of (shape_type, parts) where parts = [(N,2) arrays]."""
    shapes = []
    with open(path, "rb") as f:
        header = f.read(100)
        assert struct.unpack(">i", header[:4])[0] == 9994, "not a shapefile"
        while True:
            rec = f.read(8)
            if len(rec) < 8:
                break
            (_, length) = struct.unpack(">ii", rec)
            body = f.read(length * 2)
            stype = struct.unpack("<i", body[:4])[0]
            base = stype % 10  # M/Z variants share the XY layout prefix
            if base == 0:
                shapes.append((0, []))
            elif base == 1:
                x, y = struct.unpack("<dd", body[4:20])
                shapes.append((1, [np.asarray([[x, y]])]))
            elif base in (3, 5):
                nparts, npoints = struct.unpack("<ii", body[36:44])
                part_idx = struct.unpack(
                    f"<{nparts}i", body[44:44 + 4 * nparts])
                pts = np.frombuffer(
                    body, np.float64, npoints * 2, 44 + 4 * nparts
                ).reshape(-1, 2)
                bounds = list(part_idx) + [npoints]
                parts = [pts[bounds[i]:bounds[i + 1]]
                         for i in range(nparts)]
                shapes.append((base, parts))
            else:
                shapes.append((base, []))
    return shapes


def _read_dbf(path: str):
    """dBASE III .dbf -> (field_names, rows as list[dict[str,str]])."""
    with open(path, "rb") as f:
        header = f.read(32)
        n_records = struct.unpack("<I", header[4:8])[0]
        header_size, record_size = struct.unpack("<HH", header[8:12])
        fields = []
        while True:
            fd = f.read(32)
            if fd[0:1] == b"\r" or len(fd) < 32:
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii", "replace")
            flen = fd[16]
            fields.append((name, flen))
            if 32 + len(fields) * 32 >= header_size:
                break
        f.seek(header_size)
        rows = []
        for _ in range(n_records):
            rec = f.read(record_size)
            if len(rec) < record_size or rec[0:1] == b"\x1a":
                break
            pos = 1  # skip deletion flag
            row = {}
            for name, flen in fields:
                row[name] = rec[pos:pos + flen].decode(
                    "latin-1").strip()
                pos += flen
            rows.append(row)
    return [f[0] for f in fields], rows


def read_shapefile(spark: SparkSession, shp_path: str,
                   layer: str = "shp", source_columns: list | None = None,
                   minzoom: int = 0,
                   attribute_function=None) -> DataFrame:
    """.shp (+.dbf) -> features DataFrame in the engine's packed schema.

    Polygon ring assembly follows the reference semantics: clockwise
    (negative planar signed area in lon/lat axes) = outer ring; counter-
    clockwise rings are holes assigned to the containing outer.

    ``attribute_function(attrs, layer) -> dict`` remaps each feature's
    attributes (reference src/shp_processor.cpp:47-84); a returned
    ``_minzoom`` key sets the feature's minzoom (see sources/remap.py).
    """
    from .remap import apply_attribute_function

    shapes = _read_shp(shp_path)
    dbf_path = shp_path[:-4] + ".dbf"
    try:
        _, attr_rows = _read_dbf(dbf_path)
    except FileNotFoundError:
        attr_rows = [{} for _ in shapes]
    rows = []
    for i, (stype, parts) in enumerate(shapes):
        attrs = attr_rows[i] if i < len(attr_rows) else {}
        if source_columns:
            attrs = {k: v for k, v in attrs.items() if k in source_columns}
        attrs, fmz = apply_attribute_function(
            attrs, layer, minzoom, attribute_function)
        if stype == 1 and parts:
            rows.append((i, layer, G.POINT, fmz, 0, attrs,
                         parts[0].reshape(-1).tolist(), [1], []))
        elif stype == 3 and parts:
            flat, sizes = G.pack_lines(parts)
            rows.append((i, layer, G.LINESTRING, fmz, 0, attrs,
                         flat.tolist(), sizes.tolist(), []))
        elif stype == 5 and parts:
            outers, holes = [], []
            for ring in parts:
                if len(ring) < 4:
                    continue
                # shapefile spec: outer rings are clockwise
                if G.signed_ring_area_planar(ring) < 0:
                    outers.append(ring)
                else:
                    holes.append(ring)
            if not outers:  # degenerate: treat all as outers
                outers, holes = holes, []
            from ..operators.assembly import assign_holes
            polys = assign_holes(outers, holes)
            flat, sizes, counts = G.pack_multipolygon(polys)
            rows.append((i, layer, G.POLYGON, fmz, 0, attrs,
                         flat.tolist(), sizes.tolist(), counts.tolist()))
    from ..operators.tiling import FEATURE_SCHEMA
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
