"""PMTiles v3 single-file tile-archive source/sink (SURVEY.md §2.4 —
container family next to MBTiles/GeoPackage/osmdroid/RMaps; format per the
public PMTiles v3 specification [SPEC], protomaps/PMTiles `spec/v3`).

Why it exists in this engine: PMTiles is the cloud-native successor to
MBTiles — a single read-only file whose tiles are addressed by a global
Hilbert tile id, so a CDN/range-request reader fetches one ~16 KB root
directory and then exactly the byte range of the tile it wants. That is
the natural *publish* format for a pyramid this engine renders: the tiles
table is already Hilbert-bucket-sorted on disk (`sources/layout.py`), so
the archive assembly is a streaming merge, not a sort.

Format facts implemented here (all from the public spec):

* 127-byte little-endian header: magic ``PMTiles`` + version 3, six
  u64 section offset/length pairs (root dir, JSON metadata, leaf dirs,
  tile data), three u64 counters (addressed tiles / tile entries / tile
  contents), clustered flag, internal+tile compression enums, tile type,
  min/max zoom, E7 lat/lon bounds + center.
* tile id = cumulative pyramid offset ``(4^z - 1) / 3`` + Hilbert xy2d
  index of (x, y_xyz) on the 2^z grid — the same published xy2d unroll
  as ``functions/spacefill.py`` (engine Column / NumPy / DuckDB twins).
* directories: varint-serialized struct-of-arrays — n_entries,
  delta-encoded tile ids, run lengths, lengths, then offsets where 0
  means "contiguous with the previous entry" and v+1 means absolute v.
* dedup: identical blobs are stored once (entries point back at the
  first occurrence's offset — still `clustered` per spec) and runs of
  *consecutive* tile ids sharing one blob collapse into a single entry
  with run_length > 1 (the ocean-tile win: 10^9 sea tiles = 1 entry).
* leaf directories: when the entry list exceeds the root budget the
  root becomes pointers (run_length = 0) into fixed-size leaf chunks.

Distributed strategy (100 TB-aware), mirroring `sources/mbtiles.py`:
the single-file archive is inherently one writer, so ``write_pmtiles``
streams a tileid-SORTED DataFrame through the driver with
``toLocalIterator`` (bounded driver memory — one partition in flight);
``write_pmtiles_shards`` is the production path: repartitionByRange on
tileid then one archive per partition via foreachPartition, each shard
internally clustered over a disjoint tileid range. Read side: directories
parse on the driver (they are KB-scale by design); blob bytes are fetched
executor-side by pread'ing the archive per entry batch (mapInPandas), so
tile data never flows through the driver.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tilemath as tm
from ..functions.spacefill import hilbert_d2xy_scalar, hilbert_key, hilbert_np

MAGIC = b"PMTiles"
VERSION = 3
HEADER_LEN = 127

# compression enums [SPEC]
COMPRESSION_UNKNOWN, COMPRESSION_NONE, COMPRESSION_GZIP = 0, 1, 2
# tile type enums [SPEC]
TILETYPE = {"unknown": 0, "mvt": 1, "png": 2, "jpeg": 3, "webp": 4, "avif": 5}
_TILETYPE_INV = {v: k for k, v in TILETYPE.items()}

# cumulative tile count below zoom z: sum_{i<z} 4^i = (4^z - 1) / 3
_ACC = [(4**z - 1) // 3 for z in range(32)]


# --- tile id <-> (z, x, y) --------------------------------------------------


def zxy_to_tileid_np(z: int, x, y_xyz):
    """PMTiles tile id for XYZ-addressed tiles at one zoom (vectorized):
    pyramid offset + Hilbert xy2d on the 2^z grid [SPEC]."""
    if not 0 <= z < 28:
        raise ValueError(f"PMTiles tile ids are defined for z in [0, 27], got {z}")
    return _ACC[z] + hilbert_np(x, y_xyz, z)


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    """Inverse of zxy_to_tileid (scalar; read/lookup path). Returns
    (z, x, y_xyz)."""
    if tid < 0 or tid >= _ACC[28]:
        raise ValueError(f"tile id out of range: {tid}")
    z = 0
    while _ACC[z + 1] <= tid:
        z += 1
    x, y = hilbert_d2xy_scalar(tid - _ACC[z], z)
    return z, x, y


def tileid_col(df: DataFrame, z: int, x_col: str = "x", y_xyz_col: str = "_y_xyz",
               out_col: str = "tileid") -> DataFrame:
    """Column-side tile id at fixed zoom (the distributed prep path):
    the spacefill Hilbert unroll + the pyramid-offset literal."""
    d = hilbert_key(df, z, x_col=x_col, y_col=y_xyz_col, out_col=out_col)
    return d.withColumn(out_col, F.col(out_col) + F.lit(_ACC[z]).cast("bigint"))


def add_tileid(tiles: DataFrame) -> DataFrame:
    """Add `tileid` to a (z, x, y[TMS], ...) tiles DF — driver loop over
    the (bounded, <= 28) distinct zoom levels, each a pure Column unroll."""
    zooms = sorted(r["z"] for r in tiles.select("z").distinct().collect())
    if not zooms:
        raise ValueError("empty tile set")
    parts = []
    for z in zooms:
        zi = int(z)
        d = tiles.filter(F.col("z") == z).withColumn(
            "_y_xyz", (F.lit((1 << zi) - 1) - F.col("y")).cast("bigint")
        )
        parts.append(tileid_col(d, zi).drop("_y_xyz"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- varint + directory serialization [SPEC] --------------------------------


def _put_varint(buf: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("varint must be non-negative")
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _get_varint(mv, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = mv[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def serialize_directory(entries) -> bytes:
    """entries: sorted list of (tileid, offset, length, run_length).
    Struct-of-arrays varint layout with delta tile ids and the
    0-means-contiguous offset encoding [SPEC]."""
    buf = bytearray()
    _put_varint(buf, len(entries))
    last = 0
    for tid, _o, _l, _r in entries:
        _put_varint(buf, tid - last)
        last = tid
    for _t, _o, _l, r in entries:
        _put_varint(buf, r)
    for _t, _o, length, _r in entries:
        _put_varint(buf, length)
    prev_off = prev_len = None
    for _t, off, length, _r in entries:
        if prev_off is not None and off == prev_off + prev_len:
            _put_varint(buf, 0)
        else:
            _put_varint(buf, off + 1)
        prev_off, prev_len = off, length
    return bytes(buf)


def deserialize_directory(data: bytes):
    """Inverse of serialize_directory -> list[(tileid, offset, length,
    run_length)]."""
    mv = memoryview(data)
    n, pos = _get_varint(mv, 0)
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _get_varint(mv, pos)
        last += d
        tids.append(last)
    runs = []
    for _ in range(n):
        r, pos = _get_varint(mv, pos)
        runs.append(r)
    lens = []
    for _ in range(n):
        ln, pos = _get_varint(mv, pos)
        lens.append(ln)
    entries = []
    prev_off = prev_len = None
    for i in range(n):
        v, pos = _get_varint(mv, pos)
        off = prev_off + prev_len if v == 0 else v - 1
        entries.append((tids[i], off, lens[i], runs[i]))
        prev_off, prev_len = off, lens[i]
    return entries


# --- header -----------------------------------------------------------------
# after magic+version: 11 u64 (4 section offset/length pairs + 3 counters),
# 6 u8 (clustered, 2 compressions, tile type, min/max zoom), 4 i32 bounds,
# u8 center zoom, 2 i32 center -> 8 + 88 + 6 + 16 + 1 + 8 = 127 bytes


def _pack_header(h: dict) -> bytes:
    out = struct.pack(
        "<7sB11Q6B4iB2i",
        MAGIC,
        VERSION,
        h["root_offset"], h["root_length"],
        h["metadata_offset"], h["metadata_length"],
        h["leaf_offset"], h["leaf_length"],
        h["data_offset"], h["data_length"],
        h["addressed_tiles"], h["tile_entries"], h["tile_contents"],
        1 if h["clustered"] else 0,
        h["internal_compression"], h["tile_compression"], h["tile_type"],
        h["min_zoom"], h["max_zoom"],
        h["min_lon_e7"], h["min_lat_e7"], h["max_lon_e7"], h["max_lat_e7"],
        h["center_zoom"], h["center_lon_e7"], h["center_lat_e7"],
    )
    assert len(out) == HEADER_LEN, len(out)
    return out


def parse_header(data: bytes) -> dict:
    if data[:7] != MAGIC or data[7] != VERSION:
        raise ValueError("not a PMTiles v3 archive")
    vals = struct.unpack("<11Q6B4iB2i", data[8:HEADER_LEN])
    keys = (
        "root_offset", "root_length", "metadata_offset", "metadata_length",
        "leaf_offset", "leaf_length", "data_offset", "data_length",
        "addressed_tiles", "tile_entries", "tile_contents",
        "clustered", "internal_compression", "tile_compression", "tile_type",
        "min_zoom", "max_zoom",
        "min_lon_e7", "min_lat_e7", "max_lon_e7", "max_lat_e7",
        "center_zoom", "center_lon_e7", "center_lat_e7",
    )
    h = dict(zip(keys, vals))
    h["clustered"] = bool(h["clustered"])
    return h


# --- archive assembly (streaming, driver- or shard-side) --------------------


def _gz(data: bytes) -> bytes:
    # mtime=0 -> deterministic bytes (same corpus twice = same archive)
    return gzip.compress(data, 6, mtime=0)


class _Assembler:
    """Streaming archive builder: feed (tileid, blob) in ASCENDING tileid
    order; finish() writes the file. Blobs buffer to a spill file, never
    in one big bytes — entries + dedup digests are the only in-memory
    state (~40 B/entry; run-length collapse keeps uniform oceans at one
    entry)."""

    def __init__(self, path: str, tile_type: str = "unknown",
                 metadata: dict | None = None,
                 max_root_entries: int = 16384, leaf_size: int = 8192):
        self.path = path
        self.tile_type = tile_type
        self.metadata = metadata or {}
        self.max_root = max_root_entries
        self.leaf_size = leaf_size
        self.entries: list[list[int]] = []  # [tileid, offset, length, run]
        self.seen: dict[bytes, tuple[int, int]] = {}  # md5 -> (offset, length)
        self.data_len = 0
        self.addressed = 0
        self.zooms: set[int] = set()
        self.xy_minmax: dict[int, list[int]] = {}  # z -> [xmin,ymin,xmax,ymax] XYZ
        self._spill = open(path + ".data.tmp", "wb")
        self._last_tid = -1

    def add(self, tid: int, blob: bytes) -> None:
        import hashlib

        if tid <= self._last_tid:
            raise ValueError(f"tile ids must be strictly ascending (got {tid} after {self._last_tid})")
        self._last_tid = tid
        z, x, y = tileid_to_zxy(tid)
        self.zooms.add(z)
        mm = self.xy_minmax.setdefault(z, [x, y, x, y])
        mm[0], mm[1] = min(mm[0], x), min(mm[1], y)
        mm[2], mm[3] = max(mm[2], x), max(mm[3], y)
        self.addressed += 1
        dig = hashlib.md5(blob).digest()
        if self.entries:
            e = self.entries[-1]
            known = self.seen.get(dig)
            if known is not None and known[0] == e[1] and tid == e[0] + e[3]:
                e[3] += 1  # extend the run: same content, consecutive id
                return
        known = self.seen.get(dig)
        if known is not None:
            off, ln = known
        else:
            off, ln = self.data_len, len(blob)
            self._spill.write(blob)
            self.data_len += ln
            self.seen[dig] = (off, ln)
        self.entries.append([tid, off, ln, 1])

    def finish(self) -> str:
        self._spill.close()
        entries = [tuple(e) for e in self.entries]
        if len(entries) <= self.max_root:
            root = _gz(serialize_directory(entries))
            leaves = b""
        else:
            leaf_blobs, root_entries = [], []
            leaf_off = 0
            for i in range(0, len(entries), self.leaf_size):
                chunk = entries[i:i + self.leaf_size]
                blob = _gz(serialize_directory(chunk))
                root_entries.append((chunk[0][0], leaf_off, len(blob), 0))
                leaf_blobs.append(blob)
                leaf_off += len(blob)
            root = _gz(serialize_directory(root_entries))
            leaves = b"".join(leaf_blobs)
        meta = _gz(json.dumps(self.metadata, sort_keys=True).encode())
        zmin = min(self.zooms) if self.zooms else 0
        zmax = max(self.zooms) if self.zooms else 0
        if self.zooms:
            mm = self.xy_minmax[zmax]
            # XYZ y: row 0 is the TOP (max lat); mercator bounds -> lat/lon
            n = 1 << zmax
            span = 2.0 * tm.ORIGIN / n
            lon0, lat1 = tm.inv_merc_np(mm[0] * span - tm.ORIGIN, tm.ORIGIN - mm[1] * span)
            lon1, lat0 = tm.inv_merc_np((mm[2] + 1) * span - tm.ORIGIN,
                                        tm.ORIGIN - (mm[3] + 1) * span)
        else:
            lon0 = lat0 = lon1 = lat1 = 0.0
        e7 = lambda v: int(round(float(v) * 1e7))  # noqa: E731
        root_off = HEADER_LEN
        meta_off = root_off + len(root)
        leaf_off = meta_off + len(meta)
        data_off = leaf_off + len(leaves)
        hdr = _pack_header({
            "root_offset": root_off, "root_length": len(root),
            "metadata_offset": meta_off, "metadata_length": len(meta),
            "leaf_offset": leaf_off, "leaf_length": len(leaves),
            "data_offset": data_off, "data_length": self.data_len,
            "addressed_tiles": self.addressed,
            "tile_entries": len(entries),
            "tile_contents": len(self.seen),
            "clustered": True,
            "internal_compression": COMPRESSION_GZIP,
            # png/jpeg/webp are already compressed; mvt ships gzip'd by
            # convention but this engine's MVT writer emits raw pbf, so
            # tile_compression is NONE for every type we produce
            "tile_compression": COMPRESSION_NONE,
            "tile_type": TILETYPE.get(self.tile_type, 0),
            "min_zoom": zmin, "max_zoom": zmax,
            "min_lon_e7": e7(lon0), "min_lat_e7": e7(lat0),
            "max_lon_e7": e7(lon1), "max_lat_e7": e7(lat1),
            "center_zoom": zmin,
            "center_lon_e7": e7((lon0 + lon1) / 2.0),
            "center_lat_e7": e7((lat0 + lat1) / 2.0),
        })
        with open(self.path, "wb") as out:
            out.write(hdr)
            out.write(root)
            out.write(meta)
            out.write(leaves)
            with open(self.path + ".data.tmp", "rb") as sp:
                while True:
                    chunk = sp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        os.remove(self.path + ".data.tmp")
        return self.path


def _sniff_tile_type(blob: bytes) -> str:
    from ..functions.codecs import sniff_fmt

    try:
        fmt = sniff_fmt(bytes(blob))
    except Exception:
        return "unknown"
    return {"png": "png", "jpeg": "jpeg", "webp": "webp"}.get(fmt, "unknown")


def write_pmtiles(tiles: DataFrame, path: str, metadata: dict | None = None,
                  tile_type: str | None = None,
                  max_root_entries: int = 16384, leaf_size: int = 8192) -> str:
    """Write a (z, x, y[TMS], tile) DataFrame to ONE PMTiles v3 archive.

    The sort happens distributed (range shuffle on tileid); the driver
    only streams the sorted iterator into the assembler (single-writer
    interop format, same stance as mbtiles single_file). Colliding
    (z, x, y) keys resolve deterministically before assembly (max-md5
    winner — the MBTiles unique-index role), so the assembler's strictly-
    ascending check never fires on valid input."""
    with_id = add_tileid(tiles.select("z", "x", "y", "tile"))
    # last-writer-wins on colliding keys (deterministic: max md5)
    picked = (
        with_id.groupBy("tileid")
        .agg(F.max_by("tile", F.md5("tile")).alias("tile"))
        .repartitionByRange(max(tiles.sparkSession.sparkContext.defaultParallelism, 1), "tileid")
        .sortWithinPartitions("tileid")
    )
    # r06 (guide §4.2): toLocalIterator deserializes one pickled Row at a
    # time — measured 2.4 s of a 2.9 s write at the sf0.1 gate (34k tiles)
    # spent in row iteration alone. When the archive's data section fits a
    # driver budget (parameterised via TILERS_PMTILES_ARROW_MAX_MB,
    # default 512), fetch the SAME sorted frame as one Arrow table
    # instead and feed the assembler from its columns — identical
    # (tileid, tile) sequence, identical bytes out (pinned by a
    # both-paths byte-identity test). Larger archives keep the
    # bounded-driver-memory streaming iterator (and truly large tile
    # sets belong in write_pmtiles_shards anyway). The sorted frame is
    # persisted so the byte-size probe and the collect share ONE
    # upstream computation (executor-side MEMORY_AND_DISK, released in
    # the finally) — without it the probe pays a second full pass, which
    # cancels the iterator savings.
    cap_mb = int(os.environ.get("TILERS_PMTILES_ARROW_MAX_MB", "512"))
    picked = picked.persist()
    asm = None
    try:
        est = picked.agg(F.sum(F.length("tile") + F.lit(64)).alias("b")).collect()[0]["b"]

        def _pairs():
            if est is not None and est <= cap_mb * (1 << 20):
                tbl = picked.toArrow()
                for tid, blob in zip(tbl.column("tileid").to_pylist(),
                                     tbl.column("tile").to_pylist()):
                    yield tid, blob
            else:
                for row in picked.toLocalIterator(prefetchPartitions=True):
                    yield row["tileid"], row["tile"]

        for tid, blob in _pairs():
            blob = bytes(blob)
            if asm is None:
                tt = tile_type if tile_type is not None else _sniff_tile_type(blob)
                asm = _Assembler(path, tile_type=tt, metadata=metadata,
                                 max_root_entries=max_root_entries, leaf_size=leaf_size)
            asm.add(int(tid), blob)
    finally:
        picked.unpersist()
    if asm is None:
        raise ValueError("empty tile set")
    return asm.finish()


def write_pmtiles_shards(tiles: DataFrame, out_dir: str, n_shards: int,
                         metadata: dict | None = None,
                         tile_type: str = "unknown") -> str:
    """Production path: range-partition on tileid and write one archive
    per partition via foreachPartition — every shard is a valid clustered
    PMTiles file over a disjoint tileid range, written executor-side (no
    driver bottleneck; a serving layer routes by range or merges offline)."""
    os.makedirs(out_dir, exist_ok=True)
    with_id = add_tileid(tiles.select("z", "x", "y", "tile"))
    part = with_id.repartitionByRange(n_shards, "tileid").sortWithinPartitions("tileid")
    meta = metadata or {}

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        asm = None
        for r in rows:
            if asm is None:
                asm = _Assembler(os.path.join(out_dir, f"part-{pid:05d}.pmtiles"),
                                 tile_type=tile_type, metadata=meta)
            asm.add(int(r["tileid"]), bytes(r["tile"]))
        if asm is not None:
            asm.finish()

    part.foreachPartition(write_part)
    return out_dir


# --- read side ---------------------------------------------------------------


def _read_dir(f, off: int, ln: int, compression: int):
    f.seek(off)
    data = f.read(ln)
    if compression == COMPRESSION_GZIP:
        data = gzip.decompress(data)
    elif compression != COMPRESSION_NONE:
        raise NotImplementedError(f"internal compression {compression} not supported")
    return deserialize_directory(data)


def read_entries(path: str):
    """Parse header + all directories (driver-side, KB-scale by design).
    Returns (header, [(tileid, offset, length, run_length)] with leaf
    pointers resolved and absolute data offsets)."""
    with open(path, "rb") as f:
        hdr = parse_header(f.read(HEADER_LEN))
        comp = hdr["internal_compression"]
        root = _read_dir(f, hdr["root_offset"], hdr["root_length"], comp)
        out = []
        for tid, off, ln, run in root:
            if run == 0:  # leaf pointer
                out.extend(_read_dir(f, hdr["leaf_offset"] + off, ln, comp))
            else:
                out.append((tid, off, ln, run))
    return hdr, out


def lookup_pmtiles(path: str, z: int, x: int, y_xyz: int) -> bytes | None:
    """Single-tile fetch — the serving path: root (binary search) ->
    optional leaf -> one pread of the blob range [SPEC lookup rule:
    largest tileid <= query, hit iff query < tileid + run_length]."""
    import bisect

    tid = int(zxy_to_tileid_np(z, np.array([x]), np.array([y_xyz]))[0])
    with open(path, "rb") as f:
        hdr = parse_header(f.read(HEADER_LEN))
        comp = hdr["internal_compression"]
        entries = _read_dir(f, hdr["root_offset"], hdr["root_length"], comp)
        for _ in range(3):  # spec: at most a few levels; we write 2
            ids = [e[0] for e in entries]
            i = bisect.bisect_right(ids, tid) - 1
            if i < 0:
                return None
            e = entries[i]
            if e[3] == 0:
                entries = _read_dir(f, hdr["leaf_offset"] + e[1], e[2], comp)
                continue
            if tid >= e[0] + e[3]:
                return None
            f.seek(hdr["data_offset"] + e[1])
            blob = f.read(e[2])
            if hdr["tile_compression"] == COMPRESSION_GZIP:
                blob = gzip.decompress(blob)
            return blob
        raise ValueError("directory nesting deeper than spec allows")


def read_pmtiles(spark: SparkSession, path: str) -> DataFrame:
    """Archive -> (z, x, y[TMS], tileid, tile) DataFrame. Directories
    parse on the driver; run-length entries expand to logical tiles;
    blob byte ranges are fetched EXECUTOR-side per batch (mapInPandas
    pread), so tile data never transits the driver."""
    import pandas as pd

    hdr, entries = read_entries(path)
    logical = []  # (tileid, abs_offset, length)
    for tid, off, ln, run in entries:
        for k in range(run):
            logical.append((tid + k, hdr["data_offset"] + off, ln))
    spans = spark.createDataFrame(
        pd.DataFrame(logical, columns=["tileid", "_off", "_len"]),
        "tileid long, _off long, _len long",
    )
    tile_comp = hdr["tile_compression"]

    def fetch(batches):
        with open(path, "rb") as f:
            for b in batches:
                blobs = []
                for off, ln in zip(b["_off"], b["_len"]):
                    f.seek(int(off))
                    blob = f.read(int(ln))
                    if tile_comp == COMPRESSION_GZIP:
                        blob = gzip.decompress(blob)
                    blobs.append(blob)
                zs, xs, ys = [], [], []
                for tid in b["tileid"]:
                    z, x, y = tileid_to_zxy(int(tid))
                    zs.append(z)
                    xs.append(x)
                    ys.append((1 << z) - 1 - y)  # back to engine TMS y
                yield pd.DataFrame(
                    {"z": zs, "x": xs, "y": ys, "tileid": b["tileid"], "tile": blobs}
                )

    return spans.mapInPandas(fetch, "z long, x long, y long, tileid long, tile binary")


def read_metadata(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = parse_header(f.read(HEADER_LEN))
        f.seek(hdr["metadata_offset"])
        data = f.read(hdr["metadata_length"])
    if hdr["internal_compression"] == COMPRESSION_GZIP:
        data = gzip.decompress(data)
    return json.loads(data)
