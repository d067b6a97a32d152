"""T0 — codec roundtrips, byte determinism, foreign-filter decode, PSNR."""

import os

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("shape", [(16, 16, 3), (64, 48, 4), (33, 77, 1)])
def test_png_roundtrip(shape):
    arr = RNG.integers(0, 256, shape, dtype=np.uint8)
    data = codecs.encode_png(arr)
    back = codecs.decode_png(data)
    assert np.array_equal(back.reshape(shape), arr)


def test_png_deterministic():
    arr = RNG.integers(0, 256, (256, 256, 4), dtype=np.uint8)
    assert codecs.encode_png(arr) == codecs.encode_png(arr.copy())


def test_raw_roundtrip():
    arr = RNG.integers(0, 256, (31, 17, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_raw(codecs.encode_raw(arr)), arr)


def test_png_foreign_filters():
    """Decoder must handle Sub/Up/Average/Paeth scanlines (foreign PNGs)."""
    import struct
    import zlib

    arr = RNG.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    h, w, c = arr.shape
    bpp = c

    def paeth(a, b, cc):
        p = int(a) + int(b) - int(cc)
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    filters = [0, 1, 2, 3, 4]
    for r in range(h):
        line = arr[r].reshape(-1).astype(np.int32)
        f = filters[r % 5]
        raw.append(f)
        enc = np.zeros_like(line)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                enc[i] = line[i]
            elif f == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                enc[i] = (line[i] - paeth(a, b, cc)) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(data), arr)


def test_palette_decode():
    import struct
    import zlib

    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, (6, 6), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 6, 8, 3, 0, 0, 0)
    lines = b"".join(b"\x00" + idx[r].tobytes() for r in range(6))
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"PLTE", pal.tobytes())
        + codecs._chunk(b"IDAT", zlib.compress(lines))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    assert np.array_equal(out, pal[idx])


def test_to_rgba_and_psnr():
    g = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    rgba = codecs.to_rgba(g)
    assert rgba.shape == (8, 8, 4) and (rgba[:, :, 3] == 255).all()
    assert codecs.psnr(rgba, rgba) == float("inf")
    noisy = rgba.astype(np.int32) + RNG.integers(-2, 3, rgba.shape)
    assert codecs.psnr(rgba, np.clip(noisy, 0, 255).astype(np.uint8)) > 40.0


def test_paletted_encode_roundtrip():
    rng = np.random.default_rng(9)
    # 7-color RGBA image (<=256 colors -> paletted path)
    pal = rng.integers(0, 256, (7, 4), dtype=np.uint8)
    pal[0, 3] = 0  # one transparent entry
    idx = rng.integers(0, 7, (32, 32))
    arr = pal[idx]
    blob = codecs.encode_png_paletted(arr)
    # really paletted: PLTE chunk present, smaller than RGBA encode
    assert b"PLTE" in blob and b"tRNS" in blob
    back = codecs.to_rgba(codecs.decode_png(blob))
    assert np.array_equal(back, arr)
    # deterministic bytes
    assert blob == codecs.encode_png_paletted(arr)
    # opaque RGB -> PLTE without tRNS, roundtrips as RGB
    rgb = pal[idx][:, :, :3]
    blob3 = codecs.encode_png_paletted(rgb)
    assert b"PLTE" in blob3 and b"tRNS" not in blob3
    assert np.array_equal(codecs.decode_png(blob3), rgb)
    # >256 colors falls back to truecolor (no PLTE)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert b"PLTE" not in codecs.encode_png_paletted(big)
    assert np.array_equal(codecs.decode_png(codecs.encode_png_paletted(big)), big)


def test_external_writer_paletted_png_vs_ppm_oracle():
    """A paletted+tRNS PNG from an EXTERNAL encoder (CPython stdlib test
    data, PSF-licensed: IHDR ct=3 with PLTE/tRNS/cHRM/bKGD/tEXt ancillary
    chunks our own writer never emits) must decode to exactly the pixels
    of the same image's raw-PPM byte-slice oracle — PNG is lossless, and
    the PPM expected values touch no codec code in this repo. This is the
    suite's only PNG decode not produced by the repo's own encoder, so
    chunk-walk / palette-expansion assumptions shared by our writer and
    reader are actually exercised against a real producer."""
    import hashlib

    gold = os.path.join(os.path.dirname(__file__), "golden")
    png = open(os.path.join(gold, "external_writer_rgba.png"), "rb").read()
    ppm = open(os.path.join(gold, "external_writer_rgb.ppm"), "rb").read()
    assert hashlib.sha256(png).hexdigest().startswith("480ac039362a15a7")
    assert ppm[:12] == b"P6\n16 16\n255"
    rgb = np.frombuffer(ppm[13:], dtype=np.uint8).reshape(16, 16, 3)
    out = codecs.decode_image(png, "png")
    assert out.shape == (16, 16, 4) and out.dtype == np.uint8
    assert np.array_equal(out[:, :, :3], rgb)
    # the uncompressed-TIFF sibling fixture carries the alpha expectation
    tif = open(os.path.join(gold, "external_writer_rgba.tiff"), "rb").read()
    alpha = np.frombuffer(tif[8 : 8 + 1024], dtype=np.uint8).reshape(16, 16, 4)[:, :, 3]
    assert np.array_equal(out[:, :, 3], alpha)


def test_pnm_decode_external_and_handcrafted():
    """GDAL's PNM driver (gdal_translate -of PNM) writes binary P5/P6: the
    external PPM fixture decodes to its own byte-slice (header is 13 bytes,
    so the oracle is trivial), and handcrafted headers pin the tokenizer
    (comments, multi-whitespace) and the fail-loud gates."""
    gold = os.path.join(os.path.dirname(__file__), "golden")
    ppm = open(os.path.join(gold, "external_writer_rgb.ppm"), "rb").read()
    assert codecs.sniff_fmt(ppm) == "pnm"
    arr = codecs.decode_image(ppm, "pnm")
    assert np.array_equal(arr, np.frombuffer(ppm[13:], dtype=np.uint8).reshape(16, 16, 3))
    # P5 gray with a comment line and mixed whitespace in the header
    g = bytes(range(6))
    p5 = b"P5 # comment here\n 3\t2 # another\n255\n" + g
    out = codecs.decode_pnm(p5)
    assert out.shape == (2, 3) and np.array_equal(out.ravel(), np.frombuffer(g, np.uint8))
    with pytest.raises(ValueError, match="maxval"):
        codecs.decode_pnm(b"P5 2 2 65535\n" + bytes(8))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_pnm(b"P6 4 4 255\n" + bytes(10))
    with pytest.raises(ValueError, match="P5/P6"):
        codecs.decode_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII PNM: not binary


def test_bmp_decode_external_cross_checked():
    """32-bpp BI_BITFIELDS BMP (V5 header) from an external writer (CPython
    stdlib test data, PSF-licensed): RGB must equal the PPM byte-slice
    oracle and alpha the TIFF fixture's — three independent containers of
    one image, through three unrelated decode paths. Plus handcrafted
    24-bpp BI_RGB rows (bottom-up, padded stride) and the loud gates."""
    import hashlib
    import struct as st

    gold = os.path.join(os.path.dirname(__file__), "golden")
    b = open(os.path.join(gold, "external_writer_rgba.bmp"), "rb").read()
    assert hashlib.sha256(b).hexdigest().startswith("410c26b109ce9d32")
    assert codecs.sniff_fmt(b) == "bmp"
    arr = codecs.decode_image(b, "bmp")
    assert arr.shape == (16, 16, 4)
    ppm = open(os.path.join(gold, "external_writer_rgb.ppm"), "rb").read()
    assert np.array_equal(arr[:, :, :3], np.frombuffer(ppm[13:], np.uint8).reshape(16, 16, 3))
    tif = open(os.path.join(gold, "external_writer_rgba.tiff"), "rb").read()
    alpha = np.frombuffer(tif[8 : 8 + 1024], np.uint8).reshape(16, 16, 4)[:, :, 3]
    assert np.array_equal(arr[:, :, 3], alpha)
    # handcrafted 24-bpp BI_RGB, 3x2, bottom-up, stride padded 9 -> 12
    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)  # RGB rows
    rows = b""
    for r in (1, 0):  # bottom-up storage
        rows += px[r][:, ::-1].tobytes() + b"\x00\x00\x00"  # RGB -> BGR + pad
    hdr = b"BM" + st.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    hdr += st.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    out = codecs.decode_bmp(hdr + rows)
    assert np.array_equal(out, px)
    with pytest.raises(ValueError, match="bpp"):
        bad = bytearray(hdr + rows)
        bad[28] = 16  # bpp field: 16-bpp unsupported
        codecs.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="compression"):
        bad = bytearray(hdr + rows)
        bad[30] = 4  # BI_JPEG
        codecs.decode_bmp(bytes(bad))


def _bmp_pal(indices_raster, w, h, bpp, comp, pal_rgb, size=None):
    """Hand-assembled paletted BMP container around a raw raster blob."""
    import struct as st

    pal = b"".join(bytes([b_, g_, r_, 0]) for r_, g_, b_ in pal_rgb)
    data_ofs = 54 + len(pal)
    hdr = b"BM" + st.pack("<IHHI", data_ofs + len(indices_raster), 0, 0, data_ofs)
    hdr += st.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                   size if size is not None else len(indices_raster), 0, 0, len(pal_rgb), 0)
    return hdr + pal + indices_raster


_PAL4 = [(10, 10, 10), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def test_bmp_packed_1_and_4_bpp():
    # 4-bpp 3x2 bottom-up: display rows (1,2,3 / 0,2,1) store bottom row
    # first; nibbles pack MSB-first, rows pad to 4 bytes:
    # stored row0 = 0,2,1 -> 0x02 0x10 + 2 pad; row1 = 1,2,3 -> 0x12 0x30
    blob = _bmp_pal(b"\x02\x10\x00\x00\x12\x30\x00\x00", 3, 2, 4, 0, _PAL4)
    exp = np.array(_PAL4, np.uint8)[np.array([[1, 2, 3], [0, 2, 1]])]
    assert np.array_equal(codecs.decode_bmp(blob), exp)
    # 1-bpp 10x1: bits 1010101010 -> 0xAA 0x80 + 2 pad
    blob1 = _bmp_pal(b"\xaa\x80\x00\x00", 10, 1, 1, 0, [(0, 0, 0), (255, 255, 255)])
    exp1 = np.tile(np.array([[255, 255, 255], [0, 0, 0]], np.uint8), (5, 1)).reshape(1, 10, 3)
    assert np.array_equal(codecs.decode_bmp(blob1), exp1)
    with pytest.raises(ValueError, match="outside"):
        codecs.decode_bmp(_bmp_pal(b"\xf0\x00\x00\x00", 1, 1, 4, 0, _PAL4))


def test_bmp_rle8_and_rle4():
    # RLE8 4x2 bottom-up. Stored row0: absolute-mode 3 pixels [1,1,1]
    # (odd count -> word pad) + encoded run 1x idx2 + EOL; stored row1:
    # delta (+1,+0) — the skipped pixel stays index 0 — + run 3x idx3 +
    # EOB. Display top row = stored row1.
    rle = bytes([0, 3, 1, 1, 1, 0, 1, 2, 0, 0, 0, 2, 1, 0, 3, 3, 0, 1])
    blob = _bmp_pal(rle, 4, 2, 8, 1, _PAL4, size=len(rle))
    pal = np.array(_PAL4, np.uint8)
    assert np.array_equal(
        codecs.decode_bmp(blob), pal[np.array([[0, 3, 3, 3], [1, 1, 1, 2]])]
    )
    # RLE4 9x1: encoded run 4 of value 0x12 alternates nibbles 1,2,1,2;
    # absolute 5 pixels packs nibbles 3,1,2,3,1 into 3 bytes (odd -> word
    # pad); EOB
    rle4 = bytes([4, 0x12, 0, 5, 0x31, 0x23, 0x10, 0, 0, 1])
    blob4 = _bmp_pal(rle4, 9, 1, 4, 2, _PAL4, size=len(rle4))
    assert np.array_equal(
        codecs.decode_bmp(blob4), pal[np.array([[1, 2, 1, 2, 3, 1, 2, 3, 1]])]
    )
    # loud: missing EOB, run overflow, top-down RLE
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_bmp(_bmp_pal(bytes([3, 1]), 4, 2, 8, 1, _PAL4, size=2))
    with pytest.raises(ValueError, match="overflows"):
        codecs.decode_bmp(_bmp_pal(bytes([9, 1, 0, 1]), 4, 2, 8, 1, _PAL4, size=4))
    td = bytearray(_bmp_pal(rle, 4, 2, 8, 1, _PAL4, size=len(rle)))
    import struct as st
    td[22:26] = st.pack("<i", -2)  # negative height = top-down
    with pytest.raises(ValueError, match="top-down"):
        codecs.decode_bmp(bytes(td))


def test_png_sub8bit_and_16bit_decode():
    """Hand-packed scanlines (filter 0, MSB-first bit packing written out
    by hand) through hand-built chunks — independent of the repo encoder,
    which never emits these depths."""
    import struct
    import zlib as _z

    def png(w, h, depth, ct, scanlines, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
        return (
            codecs.PNG_SIG
            + codecs._chunk(b"IHDR", ihdr)
            + extra
            + codecs._chunk(b"IDAT", _z.compress(scanlines))
            + codecs._chunk(b"IEND", b"")
        )

    # 4-bit palette, 3x2: indices (1,2,3 / 0,2,1) pack MSB-first to
    # 0x12 0x30 / 0x02 0x10 (low nibble of the last byte is row padding)
    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    plte = codecs._chunk(b"PLTE", pal.tobytes())
    arr = codecs.decode_png(png(3, 2, 4, 3, b"\x00\x12\x30\x00\x02\x10", plte))
    assert np.array_equal(arr, pal[np.array([[1, 2, 3], [0, 2, 1]])])
    # 1-bit gray, 10x1: bits 1010101010 -> bytes 0xAA 0x80; scale 0/255
    g1 = codecs.decode_png(png(10, 1, 1, 0, b"\x00\xaa\x80"))
    assert np.array_equal(g1[:, :, 0], np.tile([255, 0], 5)[None, :])
    # 2-bit gray, 5x1: values 0,1,2,3,2 -> 00 01 10 11 | 10 000000 ->
    # 0x1b 0x80; scale factor 85
    g2 = codecs.decode_png(png(5, 1, 2, 0, b"\x00\x1b\x80"))
    assert np.array_equal(g2[:, :, 0], [[0, 85, 170, 255, 170]])
    # 16-bit gray, 2x1: samples 0x1234, 0xff01 -> high bytes 0x12, 0xff
    g16 = codecs.decode_png(png(2, 1, 16, 0, b"\x00\x12\x34\xff\x01"))
    assert np.array_equal(g16[:, :, 0], [[0x12, 0xFF]])
    # 16-bit RGB, 1x1 with a Sub filter (bpp=6): payload after filter is
    # the raw first pixel (no left neighbor), value (0x0102, 0x0304, 0x0506)
    rgb16 = codecs.decode_png(png(1, 1, 16, 2, b"\x01\x01\x02\x03\x04\x05\x06"))
    assert np.array_equal(rgb16, [[[0x01, 0x03, 0x05]]])
    # invalid combos stay loud
    with pytest.raises(ValueError, match="invalid"):
        codecs.decode_png(png(1, 1, 4, 2, b"\x00\x00"))
    with pytest.raises(ValueError, match="invalid"):
        codecs.decode_png(png(1, 1, 16, 3, b"\x00\x00\x00", plte))


_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _adam7_png(img, depth=8, ct=None, pal=None):
    """Test-local Adam7 interlacer: emit each pass's sub-image as
    filter-0 scanlines (per the published pass grid)."""
    import struct
    import zlib as _z

    h, w = img.shape[:2]
    nch = 1 if img.ndim == 2 else img.shape[2]
    if ct is None:
        ct = {1: 0, 3: 2, 4: 6}[nch]
    scan = b""
    for xs, xst, ys, yst in _ADAM7:
        sub = img[ys::yst, xs::xst]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            row = sub[r]
            if depth == 16:
                payload = row.astype(">u2").tobytes()
            elif depth == 8:
                payload = row.astype(np.uint8).tobytes()
            else:  # sub-8: MSB-first packing
                vals = row.reshape(-1).astype(np.uint8)
                bits = ((vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
                payload = np.packbits(bits).tobytes()
            scan += b"\x00" + payload
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 1)
    extra = codecs._chunk(b"PLTE", pal.tobytes()) if pal is not None else b""
    return (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + extra
        + codecs._chunk(b"IDAT", _z.compress(scan))
        + codecs._chunk(b"IEND", b"")
    )


def test_png_adam7_handworked_2x2():
    # for 2x2 only passes 1, 6, 7 are non-empty; storage order is pixels
    # (0,0), (0,1), then row 1 — worked out by hand from the pass grid
    px = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    import struct
    import zlib as _z

    scan = (
        b"\x00" + bytes([1, 2, 3])        # pass 1: (0,0)
        + b"\x00" + bytes([4, 5, 6])      # pass 6: (0,1)
        + b"\x00" + bytes([7, 8, 9, 10, 11, 12])  # pass 7: row 1
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    blob = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", _z.compress(scan))
        + codecs._chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(blob), px)


def test_png_adam7_roundtrips_across_depths():
    rng = np.random.default_rng(11)
    # 8-bit RGBA and gray at a non-multiple-of-8 size (edge passes)
    rgba = rng.integers(0, 256, (13, 11, 4), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(_adam7_png(rgba)), rgba)
    gray = rng.integers(0, 256, (9, 17), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(_adam7_png(gray))[:, :, 0], gray)
    # 4-bit palette
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    idx = rng.integers(0, 4, (10, 12), dtype=np.uint8)
    out = codecs.decode_png(_adam7_png(idx, depth=4, ct=3, pal=pal))
    assert np.array_equal(out, pal[idx])
    # 16-bit gray reduces to the high byte
    g16 = rng.integers(0, 65536, (8, 9), dtype=np.uint16)
    out16 = codecs.decode_png(_adam7_png(g16, depth=16, ct=0))
    assert np.array_equal(out16[:, :, 0], (g16 >> 8).astype(np.uint8))


def test_bmp_encode_roundtrip_and_external_cross():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    blob = codecs.encode_bmp(rgba)
    assert codecs.sniff_fmt(blob) == "bmp"
    assert np.array_equal(codecs.decode_bmp(blob), rgba)
    rgb = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)  # odd stride pad
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(rgb)), rgb)
    gray = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(gray))  # palette expansion
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # re-encoding the external-writer image must round-trip bit-exact
    gold = os.path.join(os.path.dirname(__file__), "golden")
    ext = codecs.decode_bmp(open(os.path.join(gold, "external_writer_rgba.bmp"), "rb").read())
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(ext)), ext)
    with pytest.raises(ValueError, match="gray/RGB/RGBA"):
        codecs.encode_bmp(np.zeros((2, 2, 2), np.uint8))


def test_paletted_png_min_depth():
    """bit_depth='min' packs 2/4/16-color images at 1/2/4 bits and
    roundtrips through the sub-8-bit decode path; default stays 8-bit
    byte-stable."""
    rng = np.random.default_rng(12)
    for n, depth in ((2, 1), (4, 2), (16, 4), (40, 8)):
        pal = np.unique(rng.integers(0, 256, (n * 3, 3), dtype=np.uint8), axis=0)[:n]
        idx = rng.integers(0, pal.shape[0], (9, 13))
        rgb = pal[idx]
        blob = codecs.encode_png_paletted(rgb, bit_depth="min")
        assert blob[24] == depth  # IHDR bit-depth byte
        assert np.array_equal(codecs.decode_png(blob), rgb)
        if depth < 8:
            assert len(blob) <= len(codecs.encode_png_paletted(rgb))
    with pytest.raises(ValueError, match="bit_depth"):
        codecs.encode_png_paletted(rgb, bit_depth=4)
