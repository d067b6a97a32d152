"""GIF codec (functions/gifcodec.py): handcrafted-bytes decode KATs with
HAND-PACKED LSB-first LZW payloads (independent of the encoder), encoder
roundtrips across palette sizes / interlace / transparency / multi-
sub-block payloads, the deinterlace permutation pin, and the loud
rejects."""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs, gifcodec

_PAL = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220])  # 4 RGB entries


def _gif(w, h, payload, packed_img=0, gce=b"", pal=_PAL, mcs=2):
    head = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([0x81, 0, 0]) + pal  # GCT present, 4 entries
    body = bytes([0x2C]) + b"\x00\x00\x00\x00"
    body += w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([packed_img])
    body += bytes([mcs, len(payload)]) + payload + bytes([0, 0x3B])
    return head + gce + body


def test_decode_handcrafted_kwkwk_kat():
    # codes [clear=4, 1, 6, 5(eoi)] at width 3; code 6 == next_code is the
    # KwKwK case -> pixels [1,1,1]. Bit-packing done by hand, LSB-first:
    # 100 001 110 101 -> bytes 0b10001100=140, 0b00001011=11.
    blob = _gif(3, 1, bytes([140, 11]))
    assert codecs.sniff_fmt(blob) == "gif"
    arr = codecs.decode_image(blob, "gif")
    assert arr.shape == (1, 3, 3)
    assert np.array_equal(arr, np.tile([40, 50, 60], (1, 3, 1)))


def test_decode_handcrafted_width_growth_kat():
    # codes [4, 1, 2, 6] at width 3 then eoi 5 at width 4 (the table hits
    # 8 entries after code 6, widening before the next read) -> pixels
    # [1, 2, 1, 2]. Hand-packed: 100 001 010 110 0101 -> bytes 140, 92.
    arr = gifcodec.decode_gif(_gif(4, 1, bytes([140, 92])))
    exp = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], np.uint8)[
        np.array([[1, 2, 1, 2]])
    ]
    assert np.array_equal(arr, exp)


def test_deinterlace_permutation_pin():
    # stored pass order for h=8 is display rows 0,4,2,6,1,3,5,7 — so
    # stored row i lands AT display row order[i] (inverse permutation:
    # display row r shows stored index [0,4,2,5,1,6,3,7][r])
    stored = np.arange(8, dtype=np.uint8).reshape(8, 1)
    disp = gifcodec._deinterlace(stored)
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    assert disp[order, 0].tolist() == list(range(8))
    assert disp[:, 0].tolist() == [0, 4, 2, 5, 1, 6, 3, 7]


@pytest.mark.parametrize("ncolors", [2, 5, 17, 256])
def test_roundtrip_rgb(ncolors):
    rng = np.random.default_rng(ncolors)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    idx = rng.integers(0, pal.shape[0], (23, 31), dtype=np.uint8)
    rgb = pal[idx]
    back = gifcodec.decode_gif(gifcodec.encode_gif(rgb))
    assert np.array_equal(back, rgb)


def test_roundtrip_interlaced_and_transparent():
    rng = np.random.default_rng(0)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    idx = rng.integers(0, 4, (19, 7), dtype=np.uint8)
    blob = gifcodec.encode_gif(idx, palette=pal, interlaced=True, transparent=2)
    back = gifcodec.decode_gif(blob)
    assert back.shape == (19, 7, 4)
    assert np.array_equal(back[:, :, :3], pal[idx])
    assert np.array_equal(back[:, :, 3], np.where(idx == 2, 0, 255).astype(np.uint8))


def test_roundtrip_large_multiblock_with_width_reset():
    # > 255 payload bytes forces multiple data sub-blocks; > 4096 root
    # codes forces the encoder's 12-bit CLEAR reset path
    rng = np.random.default_rng(42)
    idx = rng.integers(0, 200, (80, 90), dtype=np.uint8)
    pal = np.arange(600, dtype=np.uint32).reshape(200, 3).astype(np.uint8)
    back = gifcodec.decode_gif(gifcodec.encode_gif(idx, palette=pal))
    assert np.array_equal(back, pal[idx])


def test_loud_rejects():
    with pytest.raises(ValueError, match="magic"):
        gifcodec.decode_gif(b"NOTAGIF" + bytes(20))
    ok = _gif(3, 1, bytes([140, 11]))
    with pytest.raises(ValueError, match="truncated"):
        gifcodec.decode_gif(ok[:20])
    # LZW code beyond the table: width-3 stream [clear=4, 7, ...] — code 7
    # is neither root nor next_code (6). 100 111 -> byte 0b00111100=60
    with pytest.raises(ValueError, match="beyond table|not a root"):
        gifcodec.decode_gif(_gif(3, 1, bytes([60, 0])))
    # first code after clear must be a root: [4, 6, ...] -> 100 110 -> 52
    with pytest.raises(ValueError, match="not a root"):
        gifcodec.decode_gif(_gif(3, 1, bytes([52, 0])))
    with pytest.raises(ValueError, match="<= 256 colors"):
        r = np.arange(300)
        rgb = np.stack([r // 256, r % 256, np.zeros_like(r)], axis=1)
        gifcodec.encode_gif(rgb.astype(np.uint8).reshape(300, 1, 3).repeat(2, axis=1))
    with pytest.raises(ValueError, match="needs an explicit palette"):
        gifcodec.encode_gif(np.zeros((2, 2), np.uint8))


def _gif_lzw_compress(indices, mcs):
    """Test-local REAL GIF-LZW compressor (classic greedy longest-match
    table algorithm, width growth mirrored to the decoder, CLEAR at the
    12-bit cap) — an independent producer for the decoder, exercising
    multi-character table codes the repo's roots-only encoder never
    emits."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = gifcodec._BitWriterLSB()
    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    w = b""
    for v in indices:
        wk = w + bytes([int(v)])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        # decoder widens when ITS table length reaches 1<<width; its
        # table length after this emission equals next_code
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == 4097:
            bw.write(clear, width)
            width = mcs + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        w = bytes([int(v)])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.flush()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decoder_vs_independent_real_compressor(seed):
    rng = np.random.default_rng(seed)
    # runs + structure so real multi-char codes dominate
    base = rng.integers(0, 16, 400)
    runs = np.repeat(base, rng.integers(1, 9, 400).astype(np.int64))
    idx = np.resize(runs, 64 * 57).astype(np.uint8).reshape(57, 64)
    payload = _gif_lzw_compress(idx.reshape(-1), mcs=4)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    head = b"GIF89a" + (64).to_bytes(2, "little") + (57).to_bytes(2, "little")
    head += bytes([0x83, 0, 0]) + pal.tobytes()  # GCT: 16 entries
    body = bytes([0x2C]) + b"\x00\x00\x00\x00"
    body += (64).to_bytes(2, "little") + (57).to_bytes(2, "little") + b"\x00"
    body += bytes([4])
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        body += bytes([len(chunk)]) + chunk
    body += bytes([0, 0x3B])
    out = gifcodec.decode_gif(head + body)
    assert np.array_equal(out, pal[idx])
