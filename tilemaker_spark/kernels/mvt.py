"""Mapbox Vector Tile (MVT 2.1) encoder, pure Python.

Implements the public vector-tile spec (protobuf wire format written by
hand — no protobuf lib needed).  Mirrors the reference engine's encode
rules (src/tile_worker.cpp:98-301 via vtzero): integer grid of
``extent`` (4096, or 8192 "high resolution"), zigzag deltas, skip
zero-length segments, a ring needs >=4 points and a line >=2, inner rings
immediately follow their outer, per-layer shared key/value dictionaries.

Geometry input is in *tile-local fractional coordinates* in [0, 1] (plus
clip margins); quantization to the integer grid happens here, collapsing
consecutive duplicate grid points (reference src/coordinates_geom.cpp:28-57).
"""

from __future__ import annotations

import gzip
import struct
import zlib
from typing import Any

import numpy as np

MOVETO, LINETO, CLOSEPATH = 1, 2, 7
GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3


# ---------------- protobuf wire primitives ----------------

def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _field_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _field_str(field: int, s: str) -> bytes:
    return _field_bytes(field, s.encode("utf-8"))


def encode_value(v: Any) -> bytes:
    """MVT Value message: string=1, float=2, double=3, int=4, bool=7.

    The reference supports exactly String/Float/Bool/Int attribute types
    (include/attribute_store.h:45-175); we write double for floats.
    """
    if isinstance(v, bool):
        return _field_varint(7, 1 if v else 0)
    if isinstance(v, (int, np.integer)):
        return _field_varint(4, int(v) & ((1 << 64) - 1))
    if isinstance(v, (float, np.floating)):
        return _tag(3, 1) + struct.pack("<d", float(v))
    return _field_str(1, str(v))


# ---------------- geometry command encoding ----------------

def _quantize(coords: np.ndarray, extent: int) -> np.ndarray:
    """Fractional tile coords -> integer grid, dropping consecutive dups."""
    g = np.floor(np.asarray(coords, np.float64) * extent).astype(np.int64)
    if len(g) > 1:
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]).any(axis=1)
        g = g[keep]
    return g


def encode_point_geom(points: np.ndarray, extent: int) -> list[int]:
    g = _quantize(points, extent)
    g = np.unique(g, axis=0)
    if len(g) == 0:
        return []
    cmds = [(MOVETO) | (len(g) << 3)]
    cx = cy = 0
    for x, y in g:
        cmds.append(_zigzag(int(x - cx)))
        cmds.append(_zigzag(int(y - cy)))
        cx, cy = x, y
    return cmds


def encode_line_geom(lines: list[np.ndarray], extent: int) -> list[int]:
    cmds: list[int] = []
    cx = cy = 0
    for line in lines:
        g = _quantize(line, extent)
        if len(g) < 2:
            continue
        cmds.append(MOVETO | (1 << 3))
        cmds.append(_zigzag(int(g[0, 0] - cx)))
        cmds.append(_zigzag(int(g[0, 1] - cy)))
        cx, cy = int(g[0, 0]), int(g[0, 1])
        cmds.append(LINETO | ((len(g) - 1) << 3))
        for x, y in g[1:]:
            cmds.append(_zigzag(int(x - cx)))
            cmds.append(_zigzag(int(y - cy)))
            cx, cy = int(x), int(y)
    return cmds


def encode_polygon_geom(mp: list[list[np.ndarray]], extent: int) -> list[int]:
    """Multipolygon -> commands; inner rings follow their outer (reference
    rule).  MVT winding: outer CW, inner CCW in screen space (y down)."""
    cmds: list[int] = []
    cx = cy = 0
    for poly in mp:
        for ri, ring in enumerate(poly):
            g = _quantize(ring, extent)
            if len(g) >= 2 and (g[0] == g[-1]).all():
                g = g[:-1]
            if len(g) < 3:
                if ri == 0:
                    break  # degenerate outer -> whole polygon vanishes
                continue
            # screen-space shoelace (y grows down): CW outer => positive
            x, y = g[:, 0].astype(float), g[:, 1].astype(float)
            area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
            want_cw = ri == 0
            is_cw = area2 > 0  # screen-CW ring (y down) has positive shoelace sum
            if want_cw != is_cw:
                g = g[::-1]
            cmds.append(MOVETO | (1 << 3))
            cmds.append(_zigzag(int(g[0, 0] - cx)))
            cmds.append(_zigzag(int(g[0, 1] - cy)))
            cx, cy = int(g[0, 0]), int(g[0, 1])
            cmds.append(LINETO | ((len(g) - 1) << 3))
            for px, py in g[1:]:
                cmds.append(_zigzag(int(px - cx)))
                cmds.append(_zigzag(int(py - cy)))
                cx, cy = int(px), int(py)
            cmds.append(CLOSEPATH | (1 << 3))
    return cmds


# ---------------- layer / tile assembly ----------------

class LayerBuilder:
    """Accumulates features for one MVT layer with shared k/v dictionaries."""

    def __init__(self, name: str, extent: int = 4096):
        self.name = name
        self.extent = extent
        self.keys: list[str] = []
        self.values: list[bytes] = []
        self._key_ix: dict[str, int] = {}
        self._val_ix: dict[bytes, int] = {}
        self.features: list[bytes] = []

    def _key(self, k: str) -> int:
        if k not in self._key_ix:
            self._key_ix[k] = len(self.keys)
            self.keys.append(k)
        return self._key_ix[k]

    def _value(self, v: Any) -> int:
        enc = encode_value(v)
        if enc not in self._val_ix:
            self._val_ix[enc] = len(self.values)
            self.values.append(enc)
        return self._val_ix[enc]

    def add_feature(self, geom_type: int, cmds: list[int],
                    attrs: dict[str, Any] | None = None,
                    feature_id: int | None = None) -> bool:
        if not cmds:
            return False
        body = b""
        if feature_id is not None:
            body += _field_varint(1, int(feature_id))
        if attrs:
            tag_ints: list[int] = []
            for k, v in attrs.items():
                if v is None:
                    continue
                tag_ints.append(self._key(k))
                tag_ints.append(self._value(v))
            if tag_ints:
                body += _field_bytes(2, b"".join(_varint(t) for t in tag_ints))
        body += _field_varint(3, geom_type)
        body += _field_bytes(4, b"".join(_varint(c) for c in cmds))
        self.features.append(body)
        return True

    def build(self) -> bytes:
        out = _field_varint(15, 2)          # version
        out += _field_str(1, self.name)
        for f in self.features:
            out += _field_bytes(2, f)
        for k in self.keys:
            out += _field_str(3, k)
        for v in self.values:
            out += _field_bytes(4, v)
        out += _field_varint(5, self.extent)
        return out


def build_tile(layers: list[LayerBuilder], compress: str = "gzip") -> bytes:
    raw = b"".join(_field_bytes(3, lb.build()) for lb in layers if lb.features)
    if compress == "gzip":
        return gzip.compress(raw, 6, mtime=0)
    if compress == "deflate":
        return zlib.compress(raw, 6)
    return raw


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _rescale_cmds(cmds: list[int], num: int, den: int) -> list[int]:
    """Rescale MVT geometry commands from extent ``den`` to ``num``:
    decode zigzag deltas to absolute grid coords, scale with rounding on
    ABSOLUTE positions (no delta drift), re-encode deltas."""
    out: list[int] = []
    cx = cy = 0   # cursor in the old grid
    ox = oy = 0   # last emitted point in the new grid
    i = 0
    n = len(cmds)
    while i < n:
        cmd = cmds[i]
        i += 1
        out.append(cmd)
        op, count = cmd & 7, cmd >> 3
        if op == 7:  # ClosePath carries no params
            continue
        for _ in range(count):
            cx += _unzigzag(cmds[i])
            cy += _unzigzag(cmds[i + 1])
            i += 2
            nx = round(cx * num / den)
            ny = round(cy * num / den)
            out.append(_zigzag(nx - ox))
            out.append(_zigzag(ny - oy))
            ox, oy = nx, ny
    return out


def merge_tile_blobs(old_blob: bytes, new_blob: bytes,
                     compress: str = "gzip") -> bytes:
    """Feature-level tile merge (reference --merge semantics,
    src/tile_worker.cpp:452-465: the existing tile's features are decoded
    and concatenated with the new tile's, per layer).  MVT geometry
    commands are per-feature self-contained (cursor resets per feature),
    so same-extent features re-encode verbatim; when the two runs encoded
    a layer at different extents (e.g. 8192 high_resolution vs 4096) the
    old features are rescaled to the new extent."""
    old = decode_tile(old_blob)
    new = decode_tile(new_blob)
    builders: list[LayerBuilder] = []
    names = list(old.keys()) + [n for n in new.keys() if n not in old]
    for name in names:
        extent = (new.get(name) or old.get(name))["extent"]
        lb = LayerBuilder(name, extent=extent)
        for src in (old.get(name), new.get(name)):
            if not src:
                continue
            for f in src["features"]:
                cmds = f["cmds"]
                if src["extent"] != extent:
                    cmds = _rescale_cmds(cmds, extent, src["extent"])
                lb.add_feature(f["type"], cmds, f["attrs"],
                               feature_id=f["id"])
        builders.append(lb)
    return build_tile(builders, compress=compress)


# ---------------- decoder (for tests / parity checks) ----------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def decode_tile(blob: bytes) -> dict[str, dict]:
    """Minimal MVT decoder: returns {layer: {extent, features:[{type, id,
    attrs, geometry_cmds}], keys, values}} for round-trip tests."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    elif blob[:1] == b"\x78":
        blob = zlib.decompress(blob)
    out: dict[str, dict] = {}
    i = 0
    while i < len(blob):
        tag, i = _read_varint(blob, i)
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            raise ValueError("unexpected wire type at tile level")
        ln, i = _read_varint(blob, i)
        payload = blob[i:i + ln]
        i += ln
        if field != 3:
            continue
        layer = _decode_layer(payload)
        out[layer["name"]] = layer
    return out


def _decode_value(buf: bytes) -> Any:
    i = 0
    tag, i = _read_varint(buf, i)
    field, wire = tag >> 3, tag & 7
    if field == 1:
        ln, i = _read_varint(buf, i)
        return buf[i:i + ln].decode("utf-8")
    if field == 3:
        return struct.unpack("<d", buf[i:i + 8])[0]
    if field in (4, 5):
        v, i = _read_varint(buf, i)
        return v
    if field == 6:
        v, i = _read_varint(buf, i)
        return (v >> 1) ^ -(v & 1)
    if field == 7:
        v, i = _read_varint(buf, i)
        return bool(v)
    raise ValueError(f"value field {field}")


def _decode_layer(buf: bytes) -> dict:
    name = ""
    extent = 4096
    keys: list[str] = []
    values: list[Any] = []
    raw_features: list[bytes] = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            if field == 5:
                extent = v
            continue
        ln, i = _read_varint(buf, i)
        payload = buf[i:i + ln]
        i += ln
        if field == 1:
            name = payload.decode("utf-8")
        elif field == 2:
            raw_features.append(payload)
        elif field == 3:
            keys.append(payload.decode("utf-8"))
        elif field == 4:
            values.append(_decode_value(payload))
    feats = []
    for fb in raw_features:
        f: dict = {"id": None, "attrs": {}, "type": 0, "cmds": []}
        j = 0
        while j < len(fb):
            tag, j = _read_varint(fb, j)
            field, wire = tag >> 3, tag & 7
            if wire == 0:
                v, j = _read_varint(fb, j)
                if field == 1:
                    f["id"] = v
                elif field == 3:
                    f["type"] = v
            else:
                ln, j = _read_varint(fb, j)
                payload = fb[j:j + ln]
                j += ln
                if field == 2:
                    k = 0
                    ints = []
                    while k < len(payload):
                        v, k = _read_varint(payload, k)
                        ints.append(v)
                    for a in range(0, len(ints), 2):
                        f["attrs"][keys[ints[a]]] = values[ints[a + 1]]
                elif field == 4:
                    k = 0
                    while k < len(payload):
                        v, k = _read_varint(payload, k)
                        f["cmds"].append(v)
        feats.append(f)
    return {"name": name, "extent": extent, "keys": keys,
            "values": values, "features": feats}
