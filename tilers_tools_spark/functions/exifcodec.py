"""Exif 2.3 metadata parser + builder (pure stdlib, no image libs).

The camera-metadata sidecar of the image ingest path: a geotagged photo
archive carries its position/orientation/timestamp in an Exif APP1
segment, and extracting it turns an opaque image corpus into a spatially
joinable table (tile / H3 / S2 assignment downstream) without decoding a
single pixel.

Wire format ([SPEC] JEITA CP-3451 / CIPA DC-008 "Exif 2.3", published):
an APP1 (0xFFE1) JPEG marker segment whose payload is the 6-byte
identifier ``Exif\\x00\\x00`` followed by a **classic TIFF structure**
(II/MM byte-order mark, magic 42, IFD chain) where all offsets are
relative to the start of that TIFF header. IFD0 holds the camera tags
(Make 271, Model 272, Orientation 274, DateTime 306) plus two private
LONG pointers: tag 34665 -> the Exif sub-IFD (DateTimeOriginal 36867,
PixelXDimension 40962, PixelYDimension 40963) and tag 34853 -> the GPS
IFD (LatitudeRef 1, Latitude 2 as three RATIONALs deg/min/sec,
LongitudeRef 3, Longitude 4, AltitudeRef 5, Altitude 6). Exif mandates
classic (non-Big) TIFF; both byte orders occur in the wild (II from most
cameras, MM from older Motorola-era firmware) so both are supported.

Decimal-degree rule (documented so the DuckDB oracle can mirror it
term-for-term): with each RATIONAL evaluated as ``num / den`` in float64,

    dec = deg + min / 60.0 + sec / 3600.0

evaluated left-to-right, then negated when the ref byte is ``S`` / ``W``.
All operations are IEEE-754 doubles, so any engine evaluating the same
expression over the same integers produces bit-identical values.

Failure policy (repo convention — auditable, never silent): a blob that
is neither JPEG nor TIFF raises ``ValueError``; a well-formed JPEG with
no Exif APP1 returns the all-``None`` record (absence is data, not an
error); a corrupt TIFF structure inside an APP1 raises (the operator
maps that to an ``exif_ok = false`` row).

Builder (`build_exif_app1` / `insert_app1`): deterministic fixed-layout
serializer used to synthesize geotagged fixtures. Layout independence of
the parser is anchored by the hand-assembled byte KAT in
tests/test_exifcodec.py (offsets computed by hand, not by this builder).
"""

from __future__ import annotations

import struct

# TIFF field types used by Exif ([SPEC] TIFF 6.0 §2 + Exif 2.3 §4.6.2).
# type id -> (struct char or None for composite, byte size per value)
_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_T_UNDEF, _T_SLONG, _T_SRATIONAL = 7, 9, 10
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# IFD0
TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 34665
TAG_GPS_IFD = 34853
# Exif sub-IFD
TAG_DT_ORIGINAL = 36867
TAG_PIXEL_X = 40962
TAG_PIXEL_Y = 40963
# GPS IFD
TAG_GPS_LAT_REF = 1
TAG_GPS_LAT = 2
TAG_GPS_LON_REF = 3
TAG_GPS_LON = 4
TAG_GPS_ALT_REF = 5
TAG_GPS_ALT = 6

_EMPTY = {
    "orientation": None,
    "make": None,
    "model": None,
    "dt": None,
    "dt_original": None,
    "px_w": None,
    "px_h": None,
    "lat": None,
    "lon": None,
    "alt": None,
}


# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------


def _find_exif_tiff(data: bytes) -> bytes | None:
    """Locate the Exif TIFF payload: a bare TIFF blob is returned as-is
    (Exif-in-TIFF is the same tags in the ordinary IFD0 chain); a JPEG is
    walked marker-by-marker up to SOS — metadata segments precede entropy
    data per T.81, so the walk never touches compressed bytes. Returns
    None when the JPEG has no Exif APP1."""
    if data[:2] in (b"II", b"MM"):
        return data
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG or TIFF blob")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at {pos}")
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone / EOI
            if marker == 0xD9:
                break
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy-coded data begins, no more APPn
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if ln < 2 or pos + 2 + ln > len(data):
            raise ValueError("truncated JPEG marker segment")
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            return payload[6:]
        pos += 2 + ln
    return None


def _parse_ifd(tiff: bytes, bo: str, off: int) -> dict[int, tuple[int, list]]:
    """One classic-TIFF IFD at `off` -> {tag: (ftype, values)}. ASCII is
    returned as a NUL-stripped str, RATIONAL/SRATIONAL as (num, den)
    tuples. Offsets are relative to the TIFF header start, per spec."""
    if off + 2 > len(tiff):
        raise ValueError("IFD offset out of range")
    (n,) = struct.unpack(bo + "H", tiff[off : off + 2])
    base = off + 2
    if base + 12 * n + 4 > len(tiff):
        raise ValueError("truncated IFD")
    out: dict[int, tuple[int, list]] = {}
    for i in range(n):
        e = tiff[base + 12 * i : base + 12 * (i + 1)]
        tag, ftype, count = struct.unpack(bo + "HHI", e[:8])
        if ftype not in _SIZES:
            continue  # unknown type: skip per TIFF readers' convention
        total = _SIZES[ftype] * count
        if total <= 4:
            buf = e[8 : 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", e[8:12])
            if voff + total > len(tiff):
                raise ValueError(f"tag {tag} value out of range")
            buf = tiff[voff : voff + total]
        if ftype == _T_ASCII:
            vals: list = [buf.rstrip(b"\x00").decode("ascii", "replace")]
        elif ftype in (_T_BYTE, _T_UNDEF):
            vals = list(buf)
        elif ftype == _T_SHORT:
            vals = list(struct.unpack(bo + "H" * count, buf))
        elif ftype == _T_LONG:
            vals = list(struct.unpack(bo + "I" * count, buf))
        elif ftype == _T_SLONG:
            vals = list(struct.unpack(bo + "i" * count, buf))
        else:  # RATIONAL / SRATIONAL: pairs
            ch = "I" if ftype == _T_RATIONAL else "i"
            flat = struct.unpack(bo + ch * (2 * count), buf)
            vals = [(flat[2 * k], flat[2 * k + 1]) for k in range(count)]
        out[tag] = (ftype, vals)
    return out


def _rat(v: tuple[int, int]) -> float:
    num, den = v
    if den == 0:
        raise ValueError("zero-denominator RATIONAL")
    return num / den


def _dms_to_dec(dms: list[tuple[int, int]], ref: str) -> float:
    """deg + min/60 + sec/3600, negated for S/W (documented module rule)."""
    if len(dms) != 3:
        raise ValueError(f"GPS coordinate needs 3 rationals, got {len(dms)}")
    dec = _rat(dms[0]) + _rat(dms[1]) / 60.0 + _rat(dms[2]) / 3600.0
    return -dec if ref in ("S", "W") else dec


def parse_exif(data: bytes) -> dict:
    """JPEG or TIFF blob -> flat metadata record (see _EMPTY for keys).
    No pixel bytes are touched: for a JPEG only marker headers before SOS
    are read; for a TIFF only the IFD chain. Raises ValueError on a
    non-image blob or a structurally corrupt Exif payload; a JPEG simply
    lacking Exif returns the all-None record."""
    tiff = _find_exif_tiff(bytes(data))
    rec = dict(_EMPTY)
    if tiff is None:
        return rec
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        raise ValueError("bad Exif TIFF header")
    bo = "<" if tiff[:2] == b"II" else ">"
    magic, ifd0_off = struct.unpack(bo + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError(f"Exif mandates classic TIFF (magic 42), got {magic}")
    ifd0 = _parse_ifd(tiff, bo, ifd0_off)

    def first(ifd, tag):
        t = ifd.get(tag)
        return t[1][0] if t and t[1] else None

    rec["make"] = first(ifd0, TAG_MAKE)
    rec["model"] = first(ifd0, TAG_MODEL)
    rec["dt"] = first(ifd0, TAG_DATETIME)
    o = first(ifd0, TAG_ORIENTATION)
    rec["orientation"] = int(o) if o is not None else None

    exif_off = first(ifd0, TAG_EXIF_IFD)
    if exif_off is not None:
        sub = _parse_ifd(tiff, bo, int(exif_off))
        rec["dt_original"] = first(sub, TAG_DT_ORIGINAL)
        for key, tag in (("px_w", TAG_PIXEL_X), ("px_h", TAG_PIXEL_Y)):
            v = first(sub, tag)
            rec[key] = int(v) if v is not None else None

    gps_off = first(ifd0, TAG_GPS_IFD)
    if gps_off is not None:
        gps = _parse_ifd(tiff, bo, int(gps_off))
        lat_ref, lon_ref = first(gps, TAG_GPS_LAT_REF), first(gps, TAG_GPS_LON_REF)
        lat_t, lon_t = gps.get(TAG_GPS_LAT), gps.get(TAG_GPS_LON)
        if lat_ref and lat_t:
            rec["lat"] = _dms_to_dec(lat_t[1], lat_ref)
        if lon_ref and lon_t:
            rec["lon"] = _dms_to_dec(lon_t[1], lon_ref)
        alt_t = gps.get(TAG_GPS_ALT)
        if alt_t:
            sign = -1.0 if (first(gps, TAG_GPS_ALT_REF) or 0) == 1 else 1.0
            rec["alt"] = sign * _rat(alt_t[1][0])
    return rec


# ---------------------------------------------------------------------------
# build (deterministic fixed-layout serializer, for fixtures + re-tagging)
# ---------------------------------------------------------------------------


def _enc_values(bo: str, ftype: int, vals) -> bytes:
    if ftype == _T_ASCII:
        s = vals if isinstance(vals, (bytes, bytearray)) else str(vals).encode("ascii")
        return bytes(s) + b"\x00"
    if ftype in (_T_BYTE, _T_UNDEF):
        return bytes(vals)
    if ftype == _T_SHORT:
        return struct.pack(bo + "H" * len(vals), *vals)
    if ftype == _T_LONG:
        return struct.pack(bo + "I" * len(vals), *vals)
    if ftype == _T_SLONG:
        return struct.pack(bo + "i" * len(vals), *vals)
    ch = "I" if ftype == _T_RATIONAL else "i"
    flat = [x for pair in vals for x in pair]
    return struct.pack(bo + ch * len(flat), *flat)


def _count_of(ftype: int, raw: bytes) -> int:
    return len(raw) // _SIZES[ftype]


def _emit_ifd(bo: str, entries: list[tuple[int, int, object]], start: int) -> bytes:
    """Serialize one IFD whose block begins at absolute offset `start`
    (relative to the TIFF header). Out-of-line values are laid out
    immediately after the next-IFD pointer, even-aligned, in entry order
    (fixed layout => byte-deterministic builds)."""
    raws = [(tag, ftype, _enc_values(bo, ftype, vals)) for tag, ftype, vals in entries]
    n = len(raws)
    data_off = start + 2 + 12 * n + 4
    body = bytearray(struct.pack(bo + "H", n))
    tail = bytearray()
    for tag, ftype, raw in sorted(raws, key=lambda t: t[0]):  # spec: ascending tag order
        body += struct.pack(bo + "HHI", tag, ftype, _count_of(ftype, raw))
        if len(raw) <= 4:
            body += raw.ljust(4, b"\x00")
        else:
            body += struct.pack(bo + "I", data_off + len(tail))
            tail += raw
            if len(tail) & 1:
                tail += b"\x00"
    body += struct.pack(bo + "I", 0)  # next-IFD: none
    return bytes(body + tail)


def _ifd_size(bo: str, entries) -> int:
    size = 2 + 12 * len(entries) + 4
    for tag, ftype, vals in entries:
        raw = _enc_values(bo, ftype, vals)
        if len(raw) > 4:
            size += len(raw) + (len(raw) & 1)
    return size


def build_exif_app1(
    byteorder: str = "<",
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    dt_original: str | None = None,
    px: tuple[int, int] | None = None,
    gps: dict | None = None,
) -> bytes:
    """Compose a full APP1 segment (marker + length + Exif identifier +
    TIFF payload). `gps` keys: lat_dms / lon_dms (3 (num, den) pairs each),
    lat_ref / lon_ref ('N'/'S'/'E'/'W'), optional alt ((num, den), ref)."""
    bo = byteorder
    ifd0: list[tuple[int, int, object]] = []
    if make is not None:
        ifd0.append((TAG_MAKE, _T_ASCII, make))
    if model is not None:
        ifd0.append((TAG_MODEL, _T_ASCII, model))
    if orientation is not None:
        ifd0.append((TAG_ORIENTATION, _T_SHORT, [orientation]))
    sub: list[tuple[int, int, object]] = []
    if dt_original is not None:
        sub.append((TAG_DT_ORIGINAL, _T_ASCII, dt_original))
    if px is not None:
        sub.append((TAG_PIXEL_X, _T_LONG, [px[0]]))
        sub.append((TAG_PIXEL_Y, _T_LONG, [px[1]]))
    gifd: list[tuple[int, int, object]] = []
    if gps is not None:
        gifd.append((TAG_GPS_LAT_REF, _T_ASCII, gps["lat_ref"]))
        gifd.append((TAG_GPS_LAT, _T_RATIONAL, gps["lat_dms"]))
        gifd.append((TAG_GPS_LON_REF, _T_ASCII, gps["lon_ref"]))
        gifd.append((TAG_GPS_LON, _T_RATIONAL, gps["lon_dms"]))
        if "alt" in gps:
            (num, den), ref = gps["alt"]
            gifd.append((TAG_GPS_ALT_REF, _T_BYTE, [ref]))
            gifd.append((TAG_GPS_ALT, _T_RATIONAL, [(num, den)]))

    # pointer entries sized in before layout (LONG, inline — size-stable)
    if sub:
        ifd0.append((TAG_EXIF_IFD, _T_LONG, [0]))
    if gifd:
        ifd0.append((TAG_GPS_IFD, _T_LONG, [0]))
    ifd0_off = 8
    exif_off = ifd0_off + _ifd_size(bo, ifd0)
    gps_off = exif_off + (_ifd_size(bo, sub) if sub else 0)
    ifd0 = [
        (t, f, [exif_off] if t == TAG_EXIF_IFD else [gps_off] if t == TAG_GPS_IFD else v)
        for t, f, v in ifd0
    ]

    tiff = bytearray(b"II" if bo == "<" else b"MM")
    tiff += struct.pack(bo + "HI", 42, ifd0_off)
    tiff += _emit_ifd(bo, ifd0, ifd0_off)
    if sub:
        tiff += _emit_ifd(bo, sub, exif_off)
    if gifd:
        tiff += _emit_ifd(bo, gifd, gps_off)
    payload = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment into an existing JPEG, right after SOI
    (before APP0/JFIF if present — Exif 2.3 places APP1 first; decoders
    walk markers generically so either order decodes)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def dms_of(dec: float, den: int = 1000) -> tuple[bool, list[tuple[int, int]]]:
    """Decimal degrees -> (negative?, [(d,1),(m,1),(s_num,den)]) with a
    `den`-denominator seconds term — exact for inputs on the
    1/(3600*den)-degree grid (round-half-even to that grid otherwise)."""
    total = int(round(abs(dec) * 3600 * den))
    d, rem = divmod(total, 3600 * den)
    m, s_num = divmod(rem, 60 * den)
    return dec < 0, [(int(d), 1), (int(m), 1), (int(s_num), den)]
