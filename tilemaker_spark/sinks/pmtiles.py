"""PMTiles v3 sink (single-writer), from the public PMTiles specification.

Mirrors the reference's pmtiles writer role (/root/reference/
src/pmtiles.cpp:16-173): Hilbert-ordered tile ids, varint-encoded
directories (delta tile ids, run-lengths, lengths, offsets), gzip
internal compression, root directory (+ leaf directories when the entry
count is large).  Like mbtiles, this is a single-writer format: tiles are
computed distributed and streamed to the writer ordered by tile id
(``ORDER BY`` replaces the reference's sort).
"""

from __future__ import annotations

import gzip
import json
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"PMTiles"
HEADER_SIZE = 127
ROOT_DIR_SPACE = 16384 - HEADER_SIZE


def _rotate(n, x, y, rx, ry):
    if ry == 0:
        if rx == 1:
            x, y = n - 1 - x, n - 1 - y
        x, y = y, x
    return x, y


def hilbert_d(z: int, x: int, y: int) -> int:
    """(z, x, y) -> position on the z-level Hilbert curve (public
    algorithm)."""
    n = 1 << z
    rx = ry = 0
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rotate(n, x, y, rx, ry)
        s >>= 1
    return d


def tile_id(z: int, x: int, y: int) -> int:
    """PMTiles tile id: cumulative count of tiles above + Hilbert index."""
    base = ((1 << (2 * z)) - 1) // 3  # sum of 4^i for i < z
    return base + hilbert_d(z, x, y)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_directory(entries) -> bytes:
    """entries: sorted [(tile_id, offset, length, run_length)] -> serialized
    dir.  run_length=1 for tile entries, run_length=0 marks a leaf-directory
    pointer (PMTiles v3 spec; reference pmtiles.hpp leaf root entries)."""
    out = bytearray()
    out += _varint(len(entries))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)  # contiguous
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _decode_directory(buf: bytes):
    pos = 0

    def rv():
        nonlocal pos
        shift = v = 0
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    n = rv()
    tids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        last += rv()
        tids.append(last)
    for _ in range(n):
        runs.append(rv())
    for _ in range(n):
        lens.append(rv())
    prev_off = prev_len = 0
    for i in range(n):
        v = rv()
        if v == 0:
            offs.append(prev_off + prev_len)
        else:
            offs.append(v - 1)
        prev_off, prev_len = offs[-1], lens[i]
    return list(zip(tids, offs, lens, runs))


# reference writer constants (/root/reference/include/pmtiles.h:17-27)
TINY_LENGTH = 100       # blobs under this are dedup candidates
TINY_MAX_SIZE = 10000   # dedup cache bound
DENSE_Z6_THRESHOLD = 100  # auto dense index above this z6 coverage
                          # (/root/reference/src/tilemaker.cpp:381-385)


def _entries_sparse(tids, offs, lens):
    """Per-entry RLE append (the reference's appendWithRLE,
    src/pmtiles.cpp:102-111): an entry whose tile id continues the
    previous run AND shares its data offset extends that run."""
    entries: list[list[int]] = []
    for tid, off, ln in zip(tids, offs, lens):
        if (entries and entries[-1][1] == off
                and entries[-1][0] + entries[-1][3] == tid):
            entries[-1][3] += 1
        else:
            entries.append([tid, off, ln, 1])
    return [tuple(e) for e in entries]


def _entries_dense(tids, offs, lens):
    """Vectorized RLE over the whole (tid-sorted) index — the dense-index
    analogue of the reference's denseIndex vector walk
    (src/pmtiles.cpp:52-55): one numpy pass instead of a per-tile append,
    the scale path for planet-size contiguous tile sets.  Produces
    entries IDENTICAL to :func:`_entries_sparse` (property-tested)."""
    import numpy as np
    tid = np.asarray(tids, np.int64)
    off = np.asarray(offs, np.int64)
    ln = np.asarray(lens, np.int64)
    if tid.size == 0:
        return []
    # a run break = tile id not consecutive OR offset changed
    brk = np.ones(tid.size, bool)
    brk[1:] = (tid[1:] != tid[:-1] + 1) | (off[1:] != off[:-1])
    starts = np.flatnonzero(brk)
    runs = np.diff(np.append(starts, tid.size))
    return list(zip(tid[starts].tolist(), off[starts].tolist(),
                    ln[starts].tolist(), runs.tolist()))


def write_pmtiles(tiles: DataFrame, path: str,
                  metadata: dict | None = None,
                  vector_layers: list | None = None,
                  dense: bool | None = None) -> int:
    """tiles(z, x, y, tile) -> .pmtiles. Tile blobs must already be gzip
    (the engine's default tile compression). Returns tile count.
    ``vector_layers`` goes into the JSON metadata blob (spec/TileJSON;
    reference shared_data.cpp:184-209).

    Index assembly mirrors the reference writer (src/pmtiles.cpp:16-173):
    * identical tiny blobs (< TINY_LENGTH bytes — ocean/empty tiles) are
      written once and shared by offset (saveTile's tinyCache),
    * adjacent tile ids sharing one offset collapse into run-length
      entries (appendWithRLE) — together these shrink planet archives
      where sea tiles dominate,
    * ``dense`` picks the vectorized whole-index RLE pass (the
      reference's dense std::vector index, chosen for large contiguous
      areas at src/tilemaker.cpp:381-385: > 100 covered z6 tiles);
      ``None`` applies the same auto rule from the tile set itself.
      Both paths emit byte-identical archives — dense is the
      memory/speed scale path, not a format change.
    """
    if vector_layers is not None:
        metadata = dict(metadata or {})
        metadata["vector_layers"] = vector_layers
    # no cluster-side orderBy: the archive order is HILBERT tile id,
    # which the driver-side items.sort below establishes anyway — a
    # (z, x, y) orderBy here would add a full range-shuffle whose
    # ordering the sort then discards
    rows = tiles.select("z", "x", "y", "tile").toLocalIterator()
    items = []
    minz, maxz = 99, 0
    z6_cover = set()
    for r in rows:
        z = r["z"]
        items.append((tile_id(z, r["x"], r["y"]), bytes(r["tile"])))
        minz = min(minz, z)
        maxz = max(maxz, z)
        if z >= 6:
            z6_cover.add((r["x"] >> (z - 6), r["y"] >> (z - 6)))
    items.sort(key=lambda t: t[0])
    if dense is None:
        dense = len(z6_cover) > DENSE_Z6_THRESHOLD

    # data section in tile-id order, identical tiny blobs deduplicated
    blobs = bytearray()
    tiny: dict[bytes, tuple[int, int]] = {}
    tids, offs, lens = [], [], []
    clustered = True
    n_contents = 0
    for tid, blob in items:
        hit = tiny.get(blob) if len(blob) < TINY_LENGTH else None
        if hit is not None:
            off, ln = hit
            if not offs or off != offs[-1]:
                # only a NON-adjacent reuse breaks tile-id data order;
                # a run of identical tiles sharing the immediately
                # preceding blob (the ocean-tile RLE case) stays
                # clustered per the spec
                clustered = False
        else:
            off, ln = len(blobs), len(blob)
            blobs += blob
            n_contents += 1
            if len(blob) < TINY_LENGTH:
                if len(tiny) > TINY_MAX_SIZE:
                    tiny.clear()
                tiny[blob] = (off, ln)
        tids.append(tid)
        offs.append(off)
        lens.append(ln)
    n_addressed = len(items)
    entries = (_entries_dense if dense else _entries_sparse)(
        tids, offs, lens)

    root = gzip.compress(_encode_directory(entries), 6, mtime=0)
    leaves = b""
    if len(root) > ROOT_DIR_SPACE:
        # split into leaf directories of 4096 entries; root entries that
        # point at leaves carry run_length=0 (spec leaf-pointer marker)
        leaf_bufs = []
        root_entries = []
        for i in range(0, len(entries), 4096):
            chunk = entries[i:i + 4096]
            enc = gzip.compress(_encode_directory(chunk), 6, mtime=0)
            root_entries.append((chunk[0][0], sum(
                len(b) for b in leaf_bufs), len(enc), 0))
            leaf_bufs.append(enc)
        leaves = b"".join(leaf_bufs)
        root = gzip.compress(_encode_directory(root_entries), 6, mtime=0)

    meta = {"name": "tilemaker_spark", "format": "pbf"}
    meta.update(metadata or {})
    meta_bytes = gzip.compress(json.dumps(meta).encode(), 6, mtime=0)

    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaves)

    header = bytearray(HEADER_SIZE)
    header[0:7] = MAGIC
    header[7] = 3  # version
    struct.pack_into("<QQQQQQQQ", header, 8,
                     root_off, len(root), meta_off, len(meta_bytes),
                     leaf_off, len(leaves), data_off, len(blobs))
    # addressed (logical tiles) / entries (after RLE) / contents
    # (distinct blobs after dedup) — pmtiles v3 header fields
    struct.pack_into("<QQQ", header, 72,
                     n_addressed, len(entries), n_contents)
    header[96] = 1 if clustered else 0  # data in tile-id order?
    header[97] = 2  # internal compression: gzip
    header[98] = 2  # tile compression: gzip
    header[99] = 1  # tile type: MVT
    header[100] = minz if entries else 0
    header[101] = maxz if entries else 0
    # bounds (E7 ints): world
    struct.pack_into("<iiii", header, 102,
                     -180 * 10**7, -85 * 10**7, 180 * 10**7, 85 * 10**7)
    struct.pack_into("<B", header, 118, (minz if entries else 0))
    struct.pack_into("<ii", header, 119, 0, 0)

    with open(path, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta_bytes)
        f.write(leaves)
        f.write(blobs)
    return n_addressed


def read_pmtiles_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    """Fetch one tile (for tests): header -> root dir (-> leaf) -> blob."""
    with open(path, "rb") as f:
        header = f.read(HEADER_SIZE)
        assert header[0:7] == MAGIC
        (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
         data_off, data_len) = struct.unpack_from("<QQQQQQQQ", header, 8)
        f.seek(root_off)
        root = _decode_directory(gzip.decompress(f.read(root_len)))
        tid = tile_id(z, x, y)
        entries = root
        # run_length==0 root entries are leaf-directory pointers (spec)
        if leaf_len and root and root[0][3] == 0:
            leaf = None
            for ltid, loff, llen, lrl in root:
                if lrl != 0:
                    continue
                if ltid <= tid:
                    leaf = (loff, llen)
                else:
                    break
            if leaf is None:
                return None
            f.seek(leaf_off + leaf[0])
            entries = _decode_directory(gzip.decompress(f.read(leaf[1])))
        for etid, off, ln, rl in entries:
            if rl >= 1 and etid <= tid < etid + rl:
                f.seek(data_off + off)
                return f.read(ln)
    return None


def pmtiles_stats(path: str) -> dict:
    with open(path, "rb") as f:
        header = f.read(HEADER_SIZE)
        n_addressed, n_entries, n_contents = struct.unpack_from(
            "<QQQ", header, 72)
        meta_off, meta_len = struct.unpack_from("<QQ", header, 24)
        f.seek(meta_off)
        meta = json.loads(gzip.decompress(f.read(meta_len)))
    return {"n_tiles": n_addressed, "n_entries": n_entries,
            "n_contents": n_contents, "clustered": bool(header[96]),
            "minzoom": header[100], "maxzoom": header[101],
            "metadata": meta}
