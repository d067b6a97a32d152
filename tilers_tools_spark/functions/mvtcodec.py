"""Mapbox Vector Tile 2.1 codec — pure Python/stdlib (no protobuf dep),
same zero-dependency policy as the PNG/JPEG/TIFF codecs.

Implements the published vector-tile-spec 2.1 [SPEC]
(github.com/mapbox/vector-tile-spec): protobuf wire format of the
``Tile`` message (layers field 3), ``Layer`` (version 15 = 2, name 1,
features 2, keys 3, values 4, extent 5), ``Value`` one-ofs (string 1,
double 3, int64 4, bool 7), ``Feature`` (id 1, packed tags 2, type 3,
packed geometry 4), and the command-integer geometry encoding
(command = (id & 0x7) | (count << 3); MoveTo=1, LineTo=2, ClosePath=7;
parameters zigzag-encoded cursor deltas carried across rings). Ring
winding per spec 4.3.3.3: signed area via the surveyor's formula on
tile coordinates — POSITIVE = exterior ring, NEGATIVE = interior ring;
the closing vertex is implicit (ClosePath).

Encoder + decoder twin share this module's layout assumptions, so the
wire format is ALSO pinned by hand-worked spec examples in
tests/test_mvtcodec.py (the spec's own MoveTo(25,17) -> [9, 50, 34] and
the documented triangle command stream) — a shared-layout bug cannot
hide behind the roundtrip.
"""

from __future__ import annotations

# --- protobuf wire primitives ---------------------------------------------


def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 10-byte varint (proto int64)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, ints) -> bytes:
    body = b"".join(_varint(i) for i in ints)
    return _len_delim(field, body)


# --- geometry commands -----------------------------------------------------

MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7


def signed_area2(ring) -> int:
    """Twice the surveyor's-formula signed area, applied DIRECTLY to the
    encoded tile coordinates per spec 4.3.3.3 (> 0 exterior, < 0
    interior; the spec's own exterior example (3,6),(8,12),(20,34)
    evaluates to +38 under this rule)."""
    a = 0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        a += x0 * y1 - x1 * y0
    return a


def polygon_geometry(rings) -> list[int]:
    """Rings (list of [(x,y) int] WITHOUT closing repeat; rings[0]
    exterior, rest holes) -> command-integer stream. Winding is enforced
    here (exterior positive area, holes negative). Cursor deltas carry
    across rings per spec."""
    cmds: list[int] = []
    cx = cy = 0
    for i, ring in enumerate(rings):
        r = list(ring)
        a2 = signed_area2(r)
        want_pos = i == 0
        if (a2 > 0) != want_pos and a2 != 0:
            r = r[::-1]
        cmds.append((MOVE_TO & 0x7) | (1 << 3))
        x, y = r[0]
        cmds += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
        cmds.append((LINE_TO & 0x7) | ((len(r) - 1) << 3))
        for x, y in r[1:]:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        cmds.append((CLOSE_PATH & 0x7) | (1 << 3))
    return cmds


def line_geometry(paths) -> list[int]:
    """LineString paths [[(x,y)...], ...] -> command stream (MoveTo +
    LineTo per path, NO ClosePath; cursor deltas carry across paths)."""
    cmds: list[int] = []
    cx = cy = 0
    for path in paths:
        cmds.append((MOVE_TO & 0x7) | (1 << 3))
        x, y = path[0]
        cmds += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
        cmds.append((LINE_TO & 0x7) | ((len(path) - 1) << 3))
        for x, y in path[1:]:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
    return cmds


def point_geometry(points) -> list[int]:
    """Points [(x,y) int] -> one MoveTo with count=len (multipoint)."""
    cmds = [(MOVE_TO & 0x7) | (len(points) << 3)]
    cx = cy = 0
    for x, y in points:
        cmds += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
    return cmds


# --- messages --------------------------------------------------------------


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(4, 0) + _varint(v)
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode("utf-8"))


GEOM_POINT, GEOM_LINE, GEOM_POLYGON = 1, 2, 3


def encode_layer(
    name: str, features, extent: int = 4096
) -> bytes:
    """features: [{'id': int, 'type': 1|2|3, 'geometry': [cmd ints],
    'props': {k: v}}]. Keys/values are interned in first-seen order
    (deterministic)."""
    keys: list[str] = []
    vals: list = []
    kidx: dict[str, int] = {}
    vidx: dict = {}
    feats = b""
    for f in features:
        tags: list[int] = []
        for k, v in (f.get("props") or {}).items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in vidx:
                vidx[vk] = len(vals)
                vals.append(v)
            tags += [kidx[k], vidx[vk]]
        body = b""
        if f.get("id") is not None:
            body += _tag(1, 0) + _varint(int(f["id"]))
        if tags:
            body += _packed(2, tags)
        body += _tag(3, 0) + _varint(int(f["type"]))
        body += _packed(4, f["geometry"])
        feats += _len_delim(2, body)
    out = _len_delim(1, name.encode("utf-8"))
    out += feats
    for k in keys:
        out += _len_delim(3, k.encode("utf-8"))
    for v in vals:
        out += _len_delim(4, _encode_value(v))
    out += _tag(5, 0) + _varint(extent)
    out += _tag(15, 0) + _varint(2)
    return out


def encode_mvt(layers: dict) -> bytes:
    """{layer_name: (features, extent)} or {layer_name: features} ->
    Tile bytes."""
    out = b""
    for name, spec in layers.items():
        if isinstance(spec, tuple):
            features, extent = spec
        else:
            features, extent = spec, 4096
        out += _len_delim(3, encode_layer(name, features, extent))
    return out


# --- decoder twin ----------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            n, i = _read_varint(buf, i)
            v = buf[i : i + n]
            i += n
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:  # pragma: no cover - spec uses only wt 0/1/2
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _decode_value(buf: bytes):
    import struct

    for field, _wt, v in _fields(buf):
        if field == 1:
            return v.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field in (4, 5):
            if field == 4 and v >= 1 << 63:
                v -= 1 << 64
            return v
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    return None


def decode_geometry(cmds: list[int]):
    """Command stream -> list of paths (each a list of absolute (x, y));
    ClosePath marks the path closed (polygon ring)."""
    paths = []
    cur = None
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        i += 1
        cid, count = cmd & 0x7, cmd >> 3
        if cid == MOVE_TO:
            for _ in range(count):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur = [(cx, cy)]
                paths.append(cur)
        elif cid == LINE_TO:
            for _ in range(count):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cid == CLOSE_PATH:
            pass  # implicit closing vertex
        else:
            raise ValueError(f"unknown command {cid}")
    return paths


def decode_mvt(buf: bytes) -> dict:
    """Tile bytes -> {layer: {'extent': int, 'version': int, 'features':
    [{'id', 'type', 'paths', 'props'}]}}."""
    out = {}
    for field, _wt, lbuf in _fields(buf):
        if field != 3:
            continue
        name = None
        extent, version = 4096, 1
        keys: list[str] = []
        vals: list = []
        raw_feats = []
        for f2, _w2, v2 in _fields(lbuf):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                raw_feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                vals.append(_decode_value(v2))
            elif f2 == 5:
                extent = v2
            elif f2 == 15:
                version = v2
        feats = []
        for fb in raw_feats:
            fid = None
            ftype = 0
            tags: list[int] = []
            geom: list[int] = []
            for f3, w3, v3 in _fields(fb):
                if f3 == 1:
                    fid = v3
                elif f3 == 2:
                    i = 0
                    while i < len(v3):
                        t, i = _read_varint(v3, i)
                        tags.append(t)
                elif f3 == 3:
                    ftype = v3
                elif f3 == 4:
                    i = 0
                    while i < len(v3):
                        g, i = _read_varint(v3, i)
                        geom.append(g)
            props = {keys[tags[j]]: vals[tags[j + 1]] for j in range(0, len(tags), 2)}
            feats.append(
                {"id": fid, "type": ftype, "paths": decode_geometry(geom), "props": props}
            )
        out[name] = {"extent": extent, "version": version, "features": feats}
    return out
