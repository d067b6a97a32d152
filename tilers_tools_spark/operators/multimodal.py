"""Multimodal column operators (task brief): image/audio/video as opaque
binary columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs over mapInPandas.

The Spark-side plumbing (schemas, batch shapes, partition behavior, UDF
signatures) is real and tested; the image path is fully functional via the
engine's own pure-NumPy codecs. Audio/video decoding needs codec libraries
that are absent on this box (SURVEY.md §7 [ENV]) — those paths raise
NotImplementedError behind a capability gate, or produce a documented
deterministic fake when `deterministic_fake=True` (so downstream plumbing
is exercised end-to-end in tests).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, n_bands int, mean_r double, mean_g double, "
    "mean_b double, std_gray double, edge_energy double, phash64 long"
)


def _phash64(gray: np.ndarray) -> int:
    """DCT-free average-hash variant on an 8x8 downsample (deterministic)."""
    h, w = gray.shape
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(8) * w // 8).clip(0, w - 1)
    small = gray[ys][:, xs]
    bits = (small > small.mean()).astype(np.uint64).ravel()
    return int(np.int64((bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)))


def image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract per image (Arrow batches; pure NumPy)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf[["image_id", "bytes", "fmt"]].to_dict("records"):
                arr = codecs.to_rgba(codecs.decode_image(bytes(rec["bytes"]), rec["fmt"]))
                rgb = arr[:, :, :3].astype(np.float64)
                gray = rgb.mean(axis=2)
                gy, gx = np.gradient(gray)
                rows.append(
                    (
                        rec["image_id"],
                        arr.shape[1],
                        arr.shape[0],
                        int(arr.shape[2]),
                        float(rgb[:, :, 0].mean()),
                        float(rgb[:, :, 1].mean()),
                        float(rgb[:, :, 2].mean()),
                        float(gray.std()),
                        float(np.sqrt(gx * gx + gy * gy).mean()),
                        _phash64(gray),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "n_bands", "mean_r", "mean_g", "mean_b",
                    "std_gray", "edge_energy", "phash64",
                ],
            )

    return images.mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


def quantize_colors(images: DataFrame, max_colors: int = 256) -> DataFrame:
    """`rgb2pct` parity: per image, an optimal pseudo-color table via the
    deterministic integer median cut (functions/quantize.py spec) and the
    nearest-entry remap. Emits (image_id, n_colors, n_distinct,
    palette_md5, index_md5, sse) — the two md5s pin the exact palette and
    index-image bytes cross-engine, sse is the integer total squared
    error (floats never appear, so no rounding convention is needed).

    Scale shape: one Arrow-batched mapInPandas pass, each image quantized
    independently (per-file rgb2pct semantics) into narrow summary rows;
    pixels never shuffle. The sequential cut loop is bounded by
    max_colors-1 splits over distinct colors (<= 2^24), not pixels.
    """
    import hashlib

    from ..functions import quantize

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf[["image_id", "bytes", "fmt"]].to_dict("records"):
                arr = codecs.decode_image(bytes(rec["bytes"]), rec["fmt"])
                pal, idx, sse = quantize.quantize_image(arr, max_colors)
                packed = (
                    arr.reshape(-1, arr.shape[2])[:, :3].astype(np.int64)
                    if arr.ndim == 3
                    else np.repeat(arr.reshape(-1, 1), 3, axis=1).astype(np.int64)
                )
                n_distinct = len(np.unique(packed[:, 0] * 65536 + packed[:, 1] * 256 + packed[:, 2]))
                rows.append(
                    (
                        rec["image_id"],
                        int(len(pal)),
                        int(n_distinct),
                        hashlib.md5(pal.tobytes()).hexdigest(),
                        hashlib.md5(idx.tobytes()).hexdigest(),
                        int(sse),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "n_colors", "n_distinct", "palette_md5", "index_md5", "sse"],
            )

    return images.mapInPandas(
        fn,
        schema="image_id string, n_colors int, n_distinct int, "
        "palette_md5 string, index_md5 string, sse long",
    )


def pct2rgb(images: DataFrame) -> DataFrame:
    """`pct2rgb` parity (the inverse of ``quantize_colors``/rgb2pct):
    expand indexed-color blobs (paletted PNG color type 3 — incl. tRNS —
    or palette TIFF photometric 3; both decoders expand the LUT) to RGB
    and emit an audit row per image: (image_id, w, h, n_colors — distinct
    expanded colors, i.e. live palette entries —, rgb_md5, r_sum, g_sum,
    b_sum) plus the re-encoded RGB PNG in ``bytes`` for sinking.

    Scale shape: one Arrow-batched mapInPandas pass, per-image
    independent (per-file pct2rgb semantics); pixels never shuffle."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf[["image_id", "bytes"]].to_dict("records"):
                blob = bytes(rec["bytes"])
                arr = codecs.decode_image(blob, codecs.sniff_fmt(blob))
                if arr.ndim != 3 or arr.shape[2] < 3:
                    raise ValueError("pct2rgb expects indexed color, got grayscale")
                rgb = arr[:, :, :3]
                h, w = rgb.shape[:2]
                packed = (
                    rgb[:, :, 0].astype(np.int64) * 65536
                    + rgb[:, :, 1].astype(np.int64) * 256
                    + rgb[:, :, 2].astype(np.int64)
                )
                rows.append(
                    (
                        rec["image_id"],
                        w,
                        h,
                        int(len(np.unique(packed))),
                        hashlib.md5(np.ascontiguousarray(rgb).tobytes()).hexdigest(),
                        int(rgb[:, :, 0].sum(dtype=np.int64)),
                        int(rgb[:, :, 1].sum(dtype=np.int64)),
                        int(rgb[:, :, 2].sum(dtype=np.int64)),
                        codecs.encode_png(rgb),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "n_colors", "rgb_md5",
                         "r_sum", "g_sum", "b_sum", "bytes"],
            )

    return images.select("image_id", "bytes").mapInPandas(
        fn,
        schema="image_id string, w int, h int, n_colors int, rgb_md5 string, "
        "r_sum long, g_sum long, b_sum long, bytes binary",
    )


def codec_roundtrip(images: DataFrame, codec: str = "webp") -> DataFrame:
    """Corpus codec validation: decode each image, re-encode through a
    LOSSLESS engine codec (webp/png/raw/tiff), sniff the container magic,
    decode again, and report whether the pixel bytes survived bit-exact.
    Emits (image_id, w, h, px_md5, rt_md5, container, roundtrip_ok) —
    ``px_md5`` hashes the source RGBA, ``rt_md5`` the roundtripped RGBA,
    so a correct lossless codec yields rt_md5 == px_md5.

    The production use at 100 TB: ingest-time validation / normalization
    of an image corpus into one container format. One Arrow-batched
    mapInPandas pass per image; narrow summary rows out; bytes never
    shuffle.
    """
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec, webpcodec

        enc = {
            "webp": webpcodec.encode_webp,
            "png": lambda a: codecs.encode_png(codecs.to_rgba(a)),
            "raw": lambda a: codecs.encode_raw(codecs.to_rgba(a)),
            "tiff": lambda a: tiffcodec.encode_tiff(
                codecs.to_rgba(a), compression="deflate"
            ),
        }[codec]
        for pdf in batches:
            rows = []
            for rec in pdf[["image_id", "bytes", "fmt"]].to_dict("records"):
                rgba = codecs.to_rgba(
                    codecs.decode_image(bytes(rec["bytes"]), rec["fmt"])
                )
                blob = enc(rgba)
                container = codecs.sniff_fmt(blob)
                rt = codecs.to_rgba(codecs.decode_image(blob, container))
                rows.append(
                    (
                        rec["image_id"],
                        int(rgba.shape[1]),
                        int(rgba.shape[0]),
                        hashlib.md5(rgba.tobytes()).hexdigest(),
                        hashlib.md5(rt.tobytes()).hexdigest(),
                        container,
                        bool((rt == rgba).all()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "px_md5", "rt_md5", "container", "roundtrip_ok",
                ],
            )

    return images.mapInPandas(
        fn,
        schema="image_id string, w int, h int, px_md5 string, rt_md5 string, "
        "container string, roundtrip_ok boolean",
    )


def image_resize(images: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Bilinear resize -> PNG thumbnails (same sampling math as the tiler)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for rec in pdf[["image_id", "bytes", "fmt"]].to_dict("records"):
                arr = codecs.to_rgba(codecs.decode_image(bytes(rec["bytes"]), rec["fmt"])).astype(np.float64)
                h, w = arr.shape[:2]
                sy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
                sx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
                y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
                y1 = np.clip(y0 + 1, 0, h - 1)
                x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
                x1 = np.clip(x0 + 1, 0, w - 1)
                fy = (sy - np.floor(sy))[:, None, None]
                fx = (sx - np.floor(sx))[None, :, None]
                out = (
                    arr[y0][:, x0] * (1 - fy) * (1 - fx)
                    + arr[y0][:, x1] * (1 - fy) * fx
                    + arr[y1][:, x0] * fy * (1 - fx)
                    + arr[y1][:, x1] * fy * fx
                )
                ids.append(rec["image_id"])
                thumbs.append(codecs.encode_png(np.clip(out + 0.5, 0, 255).astype(np.uint8)))
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs})

    return images.mapInPandas(fn, schema="image_id string, thumb binary")


def audio_frame_sample(
    media: DataFrame, frames: int = 16, deterministic_fake: bool = False
) -> DataFrame:
    """Audio decode + fixed-rate frame sampling. STUB: no audio codec libs
    offline — with `deterministic_fake`, emits seeded pseudo-frames derived
    from the payload hash so schema/partitioning/batching is fully
    exercised; otherwise raises NotImplementedError.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "audio decode requires codec libraries not present offline; "
                    "run with deterministic_fake=True to exercise the plumbing"
                )
            rows = []
            for rec in pdf[["media_id", "payload"]].to_dict("records"):
                seed = np.frombuffer(
                    np.frombuffer(bytes(rec["payload"])[:8].ljust(8, b"\0"), dtype=np.uint8), dtype=np.uint8
                ).sum()
                rng = np.random.default_rng(int(seed))
                for i in range(frames):
                    rows.append((rec["media_id"], i, float(rng.standard_normal()), float(rng.uniform())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "rms", "zcr"])

    return media.mapInPandas(fn, schema="media_id string, frame_idx int, rms double, zcr double")


def video_frame_sample(
    media: DataFrame, frames: int = 4, out_w: int = 32, out_h: int = 32, deterministic_fake: bool = False
) -> DataFrame:
    """Video decode + uniform frame sampling -> one row per sampled frame
    with a PNG thumbnail. STUB decode (no video codec libs offline —
    SURVEY.md §7 [ENV]): with `deterministic_fake`, frames are seeded
    pseudo-images derived from the payload hash, then run through the REAL
    resize+PNG-encode path so the Spark plumbing (explode-shaped output,
    schema, Arrow batching, per-frame blobs) is exercised end-to-end;
    otherwise raises NotImplementedError.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires codec libraries not present offline; "
                    "run with deterministic_fake=True to exercise the plumbing"
                )
            rows = []
            for rec in pdf[["media_id", "payload"]].to_dict("records"):
                seed = int(np.frombuffer(bytes(rec["payload"])[:8].ljust(8, b"\0"), dtype=np.uint64)[0])
                rng = np.random.default_rng(seed & 0x7FFFFFFF)
                for i in range(frames):
                    frame = rng.integers(0, 256, (out_h, out_w, 3), dtype=np.uint8)
                    ts = i / max(frames - 1, 1)
                    rows.append((rec["media_id"], i, float(ts), codecs.encode_png(frame)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "rel_ts", "thumb"])

    return media.mapInPandas(fn, schema="media_id string, frame_idx int, rel_ts double, thumb binary")


PATCHIFY_SCHEMA = (
    "image_id string, patch_id int, py int, px int, n_py int, n_px int, "
    "patch binary, pix_sum long, first_byte int, pad_frac double"
)


def image_patchify(images: DataFrame, patch: int = 16, pad_value: int = 0) -> DataFrame:
    """ViT-style fixed-grid patch extraction (the patchify step of a
    vision-transformer training pipeline: Dosovitskiy et al. 2021 split
    an image into non-overlapping P x P patches, row-major order).

    Per image: decode to RGB, pad bottom/right to the next multiple of
    ``patch`` with ``pad_value``, emit ONE ROW PER PATCH:

      patch_id    row-major index py * n_px + px
      patch       raw HWC uint8 RGB bytes (patch*patch*3) — the training
                  tensor, ready for sequence packing
      pix_sum     exact integer sum over the (padded) patch RGB values
      first_byte  channel-0 value at the patch's top-left pixel (always a
                  real pixel: the grid starts inside the image)
      pad_frac    fraction of padded (synthetic) pixels in the patch

    Scale: one narrow mapInPandas pass over the images scan — no
    shuffle; patch rows stay co-partitioned with their source image for
    downstream packing/sampling. Blobs enter exactly one Arrow hop.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "patch_id", "py", "px", "n_py", "n_px",
                "patch", "pix_sum", "first_byte", "pad_frac",
            )}
            for rec in pdf[["image_id", "bytes", "fmt"]].to_dict("records"):
                rgb = codecs.to_rgba(codecs.decode_image(bytes(rec["bytes"]), rec["fmt"]))[:, :, :3]
                h, w = rgb.shape[:2]
                n_py, n_px = -(-h // patch), -(-w // patch)
                padded = np.full((n_py * patch, n_px * patch, 3), pad_value, np.uint8)
                padded[:h, :w] = rgb
                real = np.zeros((n_py * patch, n_px * patch), bool)
                real[:h, :w] = True
                for py in range(n_py):
                    for px in range(n_px):
                        sl = (slice(py * patch, (py + 1) * patch),
                              slice(px * patch, (px + 1) * patch))
                        blk = padded[sl]
                        out["image_id"].append(rec["image_id"])
                        out["patch_id"].append(py * n_px + px)
                        out["py"].append(py)
                        out["px"].append(px)
                        out["n_py"].append(n_py)
                        out["n_px"].append(n_px)
                        out["patch"].append(blk.tobytes())
                        out["pix_sum"].append(int(blk.sum(dtype=np.int64)))
                        out["first_byte"].append(int(blk[0, 0, 0]))
                        out["pad_frac"].append(1.0 - real[sl].mean())
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=PATCHIFY_SCHEMA)


def image_augment(images: DataFrame, seed: int = 0) -> DataFrame:
    """Deterministic training-time image augmentation (flip / quarter
    rotation / brightness) — the data-loading transform of a vision
    pipeline made REPRODUCIBLE: parameters derive from a portable md5 of
    (image_id, seed), so a re-run, a resumed job, or another engine
    regenerates the byte-identical augmented corpus (non-reproducible
    augmentation poisons dedup, caching and eval comparisons).

    Param contract (shared with the DuckDB gate): v = first 8 hex chars
    of md5(image_id || '|aug{seed}') as an integer; hflip = v&1, vflip =
    (v>>1)&1, rot_k = (v>>2)&3 quarter-turns CCW, delta = ((v>>4)&63) -
    32. Transform order: hflip -> vflip -> rot90(k) -> clip(v + delta,
    0, 255). One Arrow mapInPandas pass, blobs stay in-partition; stats
    columns (pix_sum, first_byte, row0_sum) exist so orientation and
    brightness are auditable without shipping pixels."""
    from ..functions import codecs

    v = F.conv(
        F.substring(F.md5(F.concat(F.col("image_id"), F.lit(f"|aug{seed}"))), 1, 8),
        16, 10,
    ).cast("bigint")
    d = (
        images.withColumn("_v", v)
        .withColumn("do_hflip", (F.col("_v") % 2).cast("int"))
        .withColumn("do_vflip", (F.shiftright("_v", 1) % 2).cast("int"))
        .withColumn("rot_k", (F.shiftright("_v", 2) % 4).cast("int"))
        .withColumn("delta", (F.shiftright("_v", 4) % 64 - 32).cast("int"))
        .drop("_v")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": [], "do_hflip": [], "do_vflip": [], "rot_k": [],
                "delta": [], "out_w": [], "out_h": [], "pix_sum": [],
                "first_byte": [], "row0_sum": [], "aug": [],
            }
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if r.do_hflip:
                    arr = arr[:, ::-1]
                if r.do_vflip:
                    arr = arr[::-1, :]
                arr = np.rot90(arr, k=int(r.rot_k))
                aug = np.clip(arr.astype(np.int32) + int(r.delta), 0, 255).astype(np.uint8)
                out["image_id"].append(r.image_id)
                out["do_hflip"].append(int(r.do_hflip))
                out["do_vflip"].append(int(r.do_vflip))
                out["rot_k"].append(int(r.rot_k))
                out["delta"].append(int(r.delta))
                out["out_w"].append(int(aug.shape[1]))
                out["out_h"].append(int(aug.shape[0]))
                out["pix_sum"].append(int(aug.sum(dtype=np.int64)))
                out["first_byte"].append(int(aug[0, 0, 0]))
                out["row0_sum"].append(int(aug[0].sum(dtype=np.int64)))
                out["aug"].append(codecs.encode_raw(np.ascontiguousarray(aug)))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        fn,
        schema=(
            "image_id string, do_hflip int, do_vflip int, rot_k int, delta int, "
            "out_w int, out_h int, pix_sum long, first_byte int, row0_sum long, "
            "aug binary"
        ),
    )


EXIF_SCHEMA = (
    "image_id string, exif_ok boolean, orientation long, make string, model string, "
    "dt_original string, px_w long, px_h long, lat double, lon double, alt double"
)


def exif_metadata(images: DataFrame) -> DataFrame:
    """Exif 2.3 camera/GPS metadata extraction (functions/exifcodec.py):
    one Arrow mapInPandas pass over (image_id, bytes) that walks only the
    JPEG marker headers before SOS (or a bare TIFF's IFD chain) — pixel
    bytes are never decompressed, so a 100 TB geotagged archive pays a
    few-KB header read per image, not a decode. GPS DMS rationals become
    signed decimal degrees under the documented left-to-right
    ``deg + min/60 + sec/3600`` float64 rule, which downstream tile/H3/S2
    assignment consumes directly. Failure policy: a structurally corrupt
    Exif payload yields an auditable ``exif_ok = false`` all-null row
    (never a silent wrong answer); a JPEG simply lacking Exif is a valid
    ``exif_ok = true`` row with null fields."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import exifcodec

        cols = EXIF_SCHEMA.replace(" string", "").replace(" boolean", "").replace(
            " long", ""
        ).replace(" double", "").split(", ")
        for pdf in batches:
            rows = []
            for rec in pdf[["image_id", "bytes"]].to_dict("records"):
                try:
                    m = exifcodec.parse_exif(bytes(rec["bytes"]))
                    ok = True
                except ValueError:
                    m = dict(exifcodec._EMPTY)
                    ok = False
                rows.append(
                    (
                        rec["image_id"],
                        ok,
                        m["orientation"],
                        m["make"],
                        m["model"],
                        m["dt_original"],
                        m["px_w"],
                        m["px_h"],
                        m["lat"],
                        m["lon"],
                        m["alt"],
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return images.select("image_id", "bytes").mapInPandas(fn, schema=EXIF_SCHEMA)


MORPHOLOGY_SCHEMA = (
    "image_id string, op string, out_w int, out_h int, pix_sum long, "
    "changed long, out binary"
)

_MORPH_OPS = ("erode", "dilate", "open", "close", "gradient")


def _dilate_once(a: np.ndarray) -> np.ndarray:
    """3x3 max with out-of-bounds neighbors IGNORED (pad with 0, the
    max-neutral for uint8 — equivalent to restricting the window to
    in-bounds pixels)."""
    h, w = a.shape[:2]
    p = np.zeros((h + 2, w + 2) + a.shape[2:], a.dtype)
    p[1:-1, 1:-1] = a
    out = p[0:h, 0:w].copy()
    for dr in range(3):
        for dc in range(3):
            np.maximum(out, p[dr:dr + h, dc:dc + w], out=out)
    return out


def _erode_once(a: np.ndarray) -> np.ndarray:
    """3x3 min, out-of-bounds ignored (pad 255, the min-neutral)."""
    h, w = a.shape[:2]
    p = np.full((h + 2, w + 2) + a.shape[2:], 255, a.dtype)
    p[1:-1, 1:-1] = a
    out = p[0:h, 0:w].copy()
    for dr in range(3):
        for dc in range(3):
            np.minimum(out, p[dr:dr + h, dc:dc + w], out=out)
    return out


def _morph(a: np.ndarray, op: str, iterations: int) -> np.ndarray:
    if op == "gradient":
        return _dilate_once(a) - _erode_once(a)  # dilate >= erode pointwise
    out = a
    if op == "erode":
        for _ in range(iterations):
            out = _erode_once(out)
    elif op == "dilate":
        for _ in range(iterations):
            out = _dilate_once(out)
    elif op == "open":
        for _ in range(iterations):
            out = _erode_once(out)
        for _ in range(iterations):
            out = _dilate_once(out)
    elif op == "close":
        for _ in range(iterations):
            out = _dilate_once(out)
        for _ in range(iterations):
            out = _erode_once(out)
    return out


def morphology(images: DataFrame, op: str, iterations: int = 1) -> DataFrame:
    """Grayscale mathematical morphology (Serra; the OpenCV cv2.erode /
    dilate / morphologyEx role) per channel with the 3x3 box structuring
    element: erode / dilate / open (erode^k then dilate^k) / close /
    gradient (dilate - erode, the edge extractor). Border rule: the
    window is restricted to IN-BOUNDS pixels (pad with the op-neutral
    value), documented and mirrored by the relational oracle — NOT
    OpenCV's BORDER_REFLECT default (a documented deviation; replicate
    borders change nothing for flat regions and this rule is exactly
    expressible in SQL). `gradient` ignores `iterations` (single-step
    morphological gradient).

    One Arrow mapInPandas pass — blobs decode, transform and re-encode
    inside the partition, pixels never shuffle; stats columns (pix_sum,
    changed) make the result auditable without shipping pixels.
    """
    if op not in _MORPH_OPS:
        raise ValueError(f"op must be one of {_MORPH_OPS}")
    if iterations < 1:
        raise ValueError("iterations >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "op", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = _morph(arr, op, iterations)
                out["image_id"].append(r.image_id)
                out["op"].append(op)
                out["out_w"].append(res.shape[1])
                out["out_h"].append(res.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=MORPHOLOGY_SCHEMA)


EQUALIZE_SCHEMA = (
    "image_id string, out_w int, out_h int, pix_sum long, changed long, "
    "out binary"
)


def _equalize_arr(arr: np.ndarray) -> np.ndarray:
    out = np.empty_like(arr)
    total = arr.shape[0] * arr.shape[1]
    for b in range(arr.shape[2]):
        ch = arr[:, :, b]
        counts = np.bincount(ch.ravel(), minlength=256).astype(np.int64)
        cdf = counts.cumsum()
        nz = np.nonzero(counts)[0]
        cdf_min = int(cdf[nz[0]])
        denom = total - cdf_min
        if denom == 0:  # constant channel: identity (division degenerate)
            out[:, :, b] = ch
            continue
        lut = ((cdf - cdf_min) * 255 + denom // 2) // denom
        out[:, :, b] = lut[ch].astype(np.uint8)
    return out


def equalize_hist(images: DataFrame) -> DataFrame:
    """Per-channel histogram equalization (Gonzalez & Woods §3.3; the
    OpenCV cv2.equalizeHist role applied per channel): with cdf(v) =
    #pixels <= v and cdf_min = cdf at the smallest occupied value, each
    value maps through the PURE-INTEGER round-half-up LUT

        lut(v) = ((cdf(v) - cdf_min) * 255 + (total - cdf_min) // 2)
                 // (total - cdf_min)

    so lut(v_min) = 0, lut(v_max) = 255 and the transfer curve follows
    the classic (cdf - cdf_min)/(total - cdf_min) normalization with a
    documented integer rounding rule — every output pixel is exact and
    reproducible by a relational engine (window cumulative sum + LUT
    join). A CONSTANT channel (total == cdf_min, the degenerate
    denominator) is passed through unchanged. Channels equalize
    independently (the per-channel convention; OpenCV's equalizeHist is
    single-channel).

    One Arrow mapInPandas pass — blobs decode, equalize and re-encode
    inside the partition, pixels never shuffle; pix_sum / changed make
    the result auditable without shipping pixels. Scale shape: per-image
    work is independent and bounded; 100 TB of images is pure map-side
    throughput.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = _equalize_arr(arr)
                out["image_id"].append(r.image_id)
                out["out_w"].append(res.shape[1])
                out["out_h"].append(res.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=EQUALIZE_SCHEMA)


LABEL_SCHEMA = (
    "image_id string, label long, area long, r_min int, r_max int, "
    "c_min int, c_max int, sum_r long, sum_c long"
)


def _label_regions_arr(fg: np.ndarray) -> dict:
    """4-connectivity connected-component labeling via union-by-min +
    path compression over the foreground mask; the component label is
    its MINIMUM pixel id (r*W + c) — the smallest id never acquires a
    parent (no smaller id exists in its component), so the final root
    IS the component minimum, matching the relational min-over-closure
    oracle semantics. Per-pixel Python loop: bounded by the blob size
    of ONE image (images are single rows; this never spans partitions)."""
    h, w = fg.shape
    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in range(h):
        base = r * w
        for c in range(w):
            if not fg[r, c]:
                continue
            pid = base + c
            parent[pid] = pid
            if r > 0 and fg[r - 1, c]:
                ra, rb = find(pid), find(pid - w)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            if c > 0 and fg[r, c - 1]:
                ra, rb = find(pid), find(pid - 1)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
    regions: dict = {}
    for pid in parent:
        root = find(pid)
        r, c = divmod(pid, w)
        st = regions.get(root)
        if st is None:
            regions[root] = [1, r, r, c, c, r, c]
        else:
            st[0] += 1
            st[1] = min(st[1], r)
            st[2] = max(st[2], r)
            st[3] = min(st[3], c)
            st[4] = max(st[4], c)
            st[5] += r
            st[6] += c
    return regions


def label_regions(images: DataFrame, threshold: int, band: int = 0) -> DataFrame:
    """Connected-component blob labeling + region properties (the
    skimage.measure.label / regionprops role, GDAL sieve's sibling):
    threshold band `band` at v >= threshold, label 4-connected
    foreground components, and emit ONE ROW PER REGION with exact
    integer properties — label (the component's minimum r*W+c pixel
    id, the deterministic canonical choice), area, bounding box
    (r_min/r_max/c_min/c_max) and centroid NUMERATORS (sum_r, sum_c —
    exact ints; centroid = sum/area is one division away, left to the
    caller so the row stays hash-stable cross-engine).

    One Arrow mapInPandas pass: a raster is a single row, so labeling
    is image-local — decode, threshold, union-find, aggregate inside
    the partition; pixels never shuffle and 100 TB of images is pure
    map-side throughput (contrast operators/dedup.py::
    connected_components, which is for CORPUS-spanning graphs).
    """
    if not 0 <= threshold <= 255:
        raise ValueError("threshold must be in [0, 255]")
    if band < 0:
        raise ValueError("band must be >= 0")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "label", "area", "r_min", "r_max", "c_min",
                "c_max", "sum_r", "sum_c")}
            for row in pdf.itertuples():
                arr = codecs.decode_image(bytes(row.bytes), row.fmt)
                if band >= arr.shape[2]:
                    raise ValueError(
                        f"band {band} out of range for {arr.shape[2]}-channel "
                        f"image {row.image_id}")
                fg = arr[:, :, band] >= threshold
                for root, (area, r0, r1, c0, c1, sr, sc) in sorted(
                        _label_regions_arr(fg).items()):
                    out["image_id"].append(row.image_id)
                    out["label"].append(root)
                    out["area"].append(area)
                    out["r_min"].append(r0)
                    out["r_max"].append(r1)
                    out["c_min"].append(c0)
                    out["c_max"].append(c1)
                    out["sum_r"].append(sr)
                    out["sum_c"].append(sc)
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=LABEL_SCHEMA)


SOBEL_SCHEMA = (
    "image_id string, out_w int, out_h int, sum_mag2 long, edge_px long, "
    "pix_sum long, out binary"
)


def _sobel_grad(a: np.ndarray) -> tuple:
    """Canonical Sobel Gx/Gy over (H,W,C) int64, zero-pad border —
    shared by ::sobel and ::harris_corners (one kernel definition)."""
    p = a.astype(np.int64)
    z = np.zeros_like(p)

    def sh(dr: int, dc: int) -> np.ndarray:
        out = z.copy()
        h, w = p.shape[:2]
        rs = slice(max(0, dr), min(h, h + dr))
        rd = slice(max(0, -dr), min(h, h - dr))
        cs = slice(max(0, dc), min(w, w + dc))
        cd = slice(max(0, -dc), min(w, w - dc))
        out[rd, cd] = p[rs, cs]
        return out

    gx = (
        sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
        - sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1)
    )
    gy = (
        sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
        - sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1)
    )
    return gx, gy


def sobel(images: DataFrame, threshold: int = 128) -> DataFrame:
    """Sobel gradient-magnitude edge extraction (Sobel-Feldman 1968;
    the cv2.Sobel / skimage.filters.sobel role) per channel with the
    canonical 3x3 kernels Gx = [[-1,0,1],[-2,0,2],[-1,0,1]], Gy = Gxᵀ.
    Out-of-bounds neighbors contribute 0 (zero-pad border — documented,
    exactly expressible relationally; NOT OpenCV's BORDER_REFLECT
    default). Per pixel: mag² = Gx² + Gy² (exact integer, <= 32·255²
    per axis so far inside int64), the output image is
    min(255, floor(sqrt(mag²))) — one correctly-rounded sqrt + floor,
    deterministic — and the audit columns are sum_mag2 (exact BIGINT),
    edge_px = #pixels with mag² >= threshold² and pix_sum over the
    clipped magnitude image.

    One Arrow mapInPandas pass; pixels never shuffle; per-image NumPy
    shifts (no per-pixel Python). 100 TB of tiles is map-side
    throughput.
    """
    if not 0 <= threshold <= 1448:  # max magnitude = sqrt(2)*1020 < 1449
        raise ValueError("threshold must be in [0, 1448]")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        thr2 = threshold * threshold
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "sum_mag2", "edge_px",
                "pix_sum", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gx, gy = _sobel_grad(arr)
                mag2 = gx * gx + gy * gy
                mag = np.minimum(np.floor(np.sqrt(mag2.astype(np.float64))), 255.0)
                res = mag.astype(np.uint8)
                out["image_id"].append(r.image_id)
                out["out_w"].append(arr.shape[1])
                out["out_h"].append(arr.shape[0])
                out["sum_mag2"].append(int(mag2.sum()))
                out["edge_px"].append(int((mag2 >= thr2).sum()))
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=SOBEL_SCHEMA)


MOMENTS_SCHEMA = (
    "image_id string, b int, m00 long, m10 long, m01 long, m11 long, "
    "m20 long, m02 long, m30 long, m03 long, "
    "mu20_num long, mu02_num long, mu11_num long, cbar_r double, cbar_c double"
)


def image_moments(images: DataFrame) -> DataFrame:
    """Raw image moments per channel (the cv2.moments role; Gonzalez &
    Woods §11.3): m_pq = Σ_r Σ_c r^p · c^q · v(r,c) for pq in {00, 10,
    01, 11, 20, 02, 30, 03} — EXACT BIGINTs. Dimensions are capped at
    2048 (validated): the worst raw term m30 <= 255·2048·Σr³ ≈ 2.3e18
    stays inside int64. Central second moments ship as exact INTEGER
    numerators over the common denominator m00:

        mu20_num = m00·m20 - m10²   (μ20 = mu20_num / m00)
        mu02_num = m00·m02 - m01²
        mu11_num = m00·m11 - m10·m01

    computed in arbitrary-precision Python ints — the DIFFERENCE is
    ~v²w²h⁴/12 (fits int64 for tiles up to ~340², i.e. every 256² tile
    this engine cuts), and a result outside int64 raises loudly rather
    than wrapping.

    Convention: r is the ROW index, c the COLUMN index; m10 weights r,
    m01 weights c (matrix convention, mirrored by the relational
    oracle; cv2 uses x=column — callers translating to cv2 swap).
    The centroid is the two single documented-order doubles
    cbar_r = m10/m00, cbar_c = m01/m00. All-zero channels emit the
    moment row with NULL centroids (m00 = 0).

    One Arrow mapInPandas pass; NumPy outer-product sums; pixels never
    shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("image_id", "b", "m00", "m10", "m01", "m11", "m20", "m02",
                "m30", "m03", "mu20_num", "mu02_num", "mu11_num",
                "cbar_r", "cbar_c")
        for pdf in batches:
            out = {k: [] for k in cols}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                if h > 2048 or w > 2048:
                    raise ValueError(
                        f"image {rec.image_id} is {w}x{h}; moments are exact "
                        "only for dimensions <= 2048 (int64 bound)")
                r = np.arange(h, dtype=np.int64)
                c = np.arange(w, dtype=np.int64)
                for b in range(arr.shape[2]):
                    v = arr[:, :, b].astype(np.int64)
                    rs = v.sum(axis=1)   # Σ_c v per row
                    cs = v.sum(axis=0)   # Σ_r v per col
                    m00 = int(v.sum())
                    m10 = int((r * rs).sum())
                    m01 = int((c * cs).sum())
                    m20 = int((r * r * rs).sum())
                    m02 = int((c * c * cs).sum())
                    m30 = int((r * r * r * rs).sum())
                    m03 = int((c * c * c * cs).sum())
                    m11 = int((r[:, None] * c[None, :] * v).sum())
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["m00"].append(m00)
                    out["m10"].append(m10)
                    out["m01"].append(m01)
                    out["m11"].append(m11)
                    out["m20"].append(m20)
                    out["m02"].append(m02)
                    out["m30"].append(m30)
                    out["m03"].append(m03)
                    for key, val in (
                        ("mu20_num", m00 * m20 - m10 * m10),
                        ("mu02_num", m00 * m02 - m01 * m01),
                        ("mu11_num", m00 * m11 - m10 * m01),
                    ):
                        if not -(2**63) <= val < 2**63:
                            raise ValueError(
                                f"{key} overflows int64 for image "
                                f"{rec.image_id} ({w}x{h}); cut smaller tiles")
                        out[key].append(val)
                    out["cbar_r"].append(m10 / m00 if m00 else None)
                    out["cbar_c"].append(m01 / m00 if m00 else None)
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=MOMENTS_SCHEMA)


GLCM_SCHEMA = (
    "image_id string, b int, npairs long, contrast long, dissim long, "
    "energy long, max_count long"
)


def glcm_stats(
    images: DataFrame, dr: int = 0, dc: int = 1, levels: int = 8
) -> DataFrame:
    """Gray-level co-occurrence texture statistics (Haralick 1973; the
    skimage.feature.graycomatrix/graycoprops role) per channel for ONE
    pixel offset (dr, dc): pixel values quantize to `levels` bins
    (i = v // (256/levels); levels must divide 256), the co-occurrence
    census c(i,j) counts in-bounds pixel pairs (p, p+offset)
    (ASYMMETRIC, the graycomatrix symmetric=False default), and the
    emitted statistics are the EXACT-INTEGER Haralick forms:

        npairs    = Σ c(i,j)
        contrast  = Σ c(i,j)·(i-j)²
        dissim    = Σ c(i,j)·|i-j|
        energy    = Σ c(i,j)²        (the ASM numerator; ASM =
                                      energy/npairs² is one division away)
        max_count = max c(i,j)       (the mode pair)

    Rational/transcendental props (homogeneity, entropy) are omitted:
    their float accumulation order is engine-dependent, which breaks
    the bit-identical contract — the exact numerators above carry the
    same texture signal. One Arrow mapInPandas pass (NumPy bincount on
    i·L+j); pixels never shuffle.
    """
    if levels not in (2, 4, 8, 16, 32, 64, 128, 256):
        raise ValueError("levels must be a power of two dividing 256")
    if (dr, dc) == (0, 0):
        raise ValueError("offset must be non-zero")
    if abs(dr) > 64 or abs(dc) > 64:
        raise ValueError("offset components must be in [-64, 64]")
    step = 256 // levels

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "npairs", "contrast", "dissim", "energy",
                "max_count")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                r0, r1 = max(0, -dr), min(h, h - dr)
                c0, c1 = max(0, -dc), min(w, w - dc)
                for b in range(arr.shape[2]):
                    q = (arr[:, :, b] // step).astype(np.int64)
                    if r0 >= r1 or c0 >= c1:
                        cnt = np.zeros(0, np.int64)
                    else:
                        i = q[r0:r1, c0:c1]
                        j = q[r0 + dr:r1 + dr, c0 + dc:c1 + dc]
                        cnt = np.bincount(
                            (i * levels + j).ravel(), minlength=levels * levels)
                    ii, jj = np.divmod(np.arange(cnt.size, dtype=np.int64), levels)
                    d = ii - jj
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["npairs"].append(int(cnt.sum()))
                    out["contrast"].append(int((cnt * d * d).sum()))
                    out["dissim"].append(int((cnt * np.abs(d)).sum()))
                    # Σc² <= (Σc)² = npairs² <= ~1.8e13 at the 2048 dim cap
                    out["energy"].append(int((cnt * cnt).sum()))
                    out["max_count"].append(int(cnt.max()) if cnt.size else 0)
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=GLCM_SCHEMA)


HARRIS_SCHEMA = (
    "image_id string, b int, n_corners long, max_r25 long, sum_pos long"
)


def harris_corners(images: DataFrame, threshold: int = 0) -> DataFrame:
    """Harris-Stephens corner response (Harris & Stephens 1988; the
    cv2.cornerHarris role) per channel, made EXACT-INTEGER by fixing
    k = 0.04 = 1/25 (the standard default) and scaling by 25:

        gx, gy   = Sobel derivatives (zero-pad border, as ::sobel)
        Sxx/Syy/Sxy = 3x3 box sums of gx², gy², gx·gy (zero-pad)
        r25      = 25·(Sxx·Syy - Sxy²) - (Sxx + Syy)²   ( = 25·R )

    Worst case |r25| <= 25·(9·1020²)² ≈ 2.2e15 — inside int64 with no
    rounding anywhere. A CORNER is a pixel with r25 >= threshold that
    is a 3x3 local maximum of r25 (>= all in-bounds neighbors — plateau
    pixels all count, documented; ties are exact-integer so the rule is
    engine-independent). Emits per (image, channel): n_corners,
    max_r25, sum_pos = Σ max(r25, 0) — audit numbers a relational
    engine can replay with three nested neighbor joins.

    One Arrow mapInPandas pass; vectorized NumPy shifts; pixels never
    shuffle.
    """

    def _box(a: np.ndarray) -> np.ndarray:
        h, w = a.shape
        out = np.zeros_like(a)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rs = slice(max(0, dr), min(h, h + dr))
                rd = slice(max(0, -dr), min(h, h - dr))
                cs = slice(max(0, dc), min(w, w + dc))
                cd = slice(max(0, -dc), min(w, w - dc))
                out[rd, cd] += a[rs, cs]
        return out

    def _nbmax(a: np.ndarray) -> np.ndarray:
        h, w = a.shape
        out = np.full_like(a, np.iinfo(np.int64).min)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rs = slice(max(0, dr), min(h, h + dr))
                rd = slice(max(0, -dr), min(h, h - dr))
                cs = slice(max(0, dc), min(w, w + dc))
                cd = slice(max(0, -dc), min(w, w - dc))
                out[rd, cd] = np.maximum(out[rd, cd], a[rs, cs])
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "n_corners", "max_r25", "sum_pos")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                for b in range(arr.shape[2]):
                    ch = arr[:, :, b:b + 1]
                    gx3, gy3 = _sobel_grad(ch)
                    gx, gy = gx3[:, :, 0], gy3[:, :, 0]
                    sxx = _box(gx * gx)
                    syy = _box(gy * gy)
                    sxy = _box(gx * gy)
                    r25 = 25 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                    is_corner = (r25 >= threshold) & (r25 >= _nbmax(r25))
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["n_corners"].append(int(is_corner.sum()))
                    out["max_r25"].append(int(r25.max()))
                    out["sum_pos"].append(int(np.maximum(r25, 0).sum()))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=HARRIS_SCHEMA)


LBP_SCHEMA = "image_id string, b int, code int, cnt long"


_LBP_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]


def lbp_hist(images: DataFrame) -> DataFrame:
    """Local Binary Pattern histogram (Ojala et al. 2002; the
    skimage.feature.local_binary_pattern texture-descriptor role,
    P=8, R=1, 'default' non-uniform codes): for every INTERIOR pixel
    (border pixels lack a full neighborhood and are skipped — the
    standard convention, documented), code = Σ_k 2^k · [v(p + off_k)
    >= v(p)] with the fixed clockwise-from-top-left neighbor order
    off = (-1,-1),(-1,0),(-1,1),(0,1),(1,1),(1,0),(1,-1),(0,-1).
    Output: one row per (image, channel, occupied code) with its
    exact count — the texture histogram a relational engine replays
    with one 8-neighbor self-join. Ties (neighbor == center) set the
    bit (the published >= rule).

    One Arrow mapInPandas pass; vectorized slice comparisons; pixels
    never shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "b", "code", "cnt")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                if h < 3 or w < 3:
                    continue  # no interior pixels
                for b in range(arr.shape[2]):
                    v = arr[:, :, b].astype(np.int64)
                    ctr = v[1:h - 1, 1:w - 1]
                    code = np.zeros_like(ctr)
                    for k, (dr, dc) in enumerate(_LBP_OFFS):
                        nb = v[1 + dr:h - 1 + dr, 1 + dc:w - 1 + dc]
                        code += (nb >= ctr).astype(np.int64) << k
                    cnt = np.bincount(code.ravel(), minlength=256)
                    for c in np.nonzero(cnt)[0]:
                        out["image_id"].append(rec.image_id)
                        out["b"].append(b)
                        out["code"].append(int(c))
                        out["cnt"].append(int(cnt[c]))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=LBP_SCHEMA)


BOXBLUR_SCHEMA = (
    "image_id string, out_w int, out_h int, pix_sum long, changed long, "
    "out binary"
)


def box_blur(images: DataFrame, radius: int = 1) -> DataFrame:
    """Box-mean blur (the cv2.blur / PIL BoxBlur role) per channel with
    a (2r+1)² window restricted to IN-BOUNDS pixels (the border window
    simply shrinks — documented, exactly expressible relationally) and
    a PURE-INTEGER round-half-up mean:

        out(p) = (S(p) + A(p) // 2) // A(p)

    with S = the in-bounds window sum and A the in-bounds window area —
    every output pixel exact, no float anywhere. One Arrow mapInPandas
    pass (cumulative-sum integral image per channel: O(1) per pixel
    regardless of radius); pix_sum / changed audit columns; pixels
    never shuffle.
    """
    if not 1 <= radius <= 7:
        raise ValueError("radius must be in [1, 7]")

    def _blur(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[:2]
        p = a.astype(np.int64)
        # integral image with zero row/col: I[r, c] = sum p[:r, :c]
        ii = np.zeros((h + 1, w + 1) + p.shape[2:], np.int64)
        np.cumsum(p, axis=0, out=ii[1:, 1:])
        np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
        r0 = np.clip(np.arange(h) - radius, 0, h)
        r1 = np.clip(np.arange(h) + radius + 1, 0, h)
        c0 = np.clip(np.arange(w) - radius, 0, w)
        c1 = np.clip(np.arange(w) + radius + 1, 0, w)
        s = (
            ii[r1][:, c1] - ii[r0][:, c1] - ii[r1][:, c0] + ii[r0][:, c0]
        )
        area = ((r1 - r0)[:, None] * (c1 - c0)[None, :])
        if p.ndim == 3:
            area = area[:, :, None]
        return ((s + area // 2) // area).astype(np.uint8)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = _blur(arr)
                out["image_id"].append(r.image_id)
                out["out_w"].append(arr.shape[1])
                out["out_h"].append(arr.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=BOXBLUR_SCHEMA)


MEDIAN_SCHEMA = (
    "image_id string, out_w int, out_h int, pix_sum long, changed long, "
    "out binary"
)


def median_filter(images: DataFrame) -> DataFrame:
    """3x3 median filter (the cv2.medianBlur / scipy median_filter
    role — the salt-and-pepper denoiser) per channel with the window
    restricted to IN-BOUNDS pixels and the LOWER-median convention for
    even window sizes: out = the k-th smallest with k = (n+1)//2 —
    exactly DuckDB's quantile_disc(v, 0.5) element (index
    floor((n-1)/2) of the sorted window), so the relational oracle
    needs no interpolation convention. Interior windows have n = 9
    (odd; the true median); only border windows (n in {4, 6}) see the
    lower-median rule. Pure integer selection — no arithmetic at all.

    One Arrow mapInPandas pass; per-image NumPy windowed sort; pixels
    never shuffle.
    """

    def _med(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[:2]
        out = np.empty_like(a)
        for r in range(h):
            for c in range(w):
                win = a[max(0, r - 1):min(h, r + 2), max(0, c - 1):min(w, c + 2)]
                flat = np.sort(win.reshape(-1, *a.shape[2:]), axis=0)
                out[r, c] = flat[(flat.shape[0] - 1) // 2]
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = _med(arr)
                out["image_id"].append(r.image_id)
                out["out_w"].append(arr.shape[1])
                out["out_h"].append(arr.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=MEDIAN_SCHEMA)


OTSU_SCHEMA = (
    "image_id string, b int, threshold int, wb long, sumb long, score double"
)


def otsu_threshold(images: DataFrame) -> DataFrame:
    """Otsu's threshold (Otsu 1979; the skimage threshold_otsu /
    cv2.THRESH_OTSU role) per channel: choose t maximizing the
    between-class variance. With class B = pixels <= t (documented
    convention) and wB/sumB the class count/value-sum, the criterion

        σ²_B(t) ∝ (sumB·wF - sumF·wB)² / (wB·wF)

    is evaluated on EXACT integers (arbitrary-precision in the engine;
    HUGEINT in the oracle — the squared numerator can pass int64 for
    large images) and converted to ONE double per t (both engines
    correctly round the same integer ratio operands), with the argmax
    tie-broken (score DESC, t ASC) — fully deterministic cross-engine.
    Only t with both classes non-empty are candidates; a CONSTANT
    channel has none and emits NO row (documented). Output: (image, b,
    threshold, wb, sumb, score).

    One Arrow mapInPandas pass; the 256-entry criterion loop runs per
    channel in Python ints (overflow-free); pixels never shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "threshold", "wb", "sumb", "score")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                n = arr.shape[0] * arr.shape[1]
                for b in range(arr.shape[2]):
                    cnt = np.bincount(arr[:, :, b].ravel(), minlength=256)
                    total = int((cnt * np.arange(256)).sum())
                    best = None  # (score, t, wb, sumb)
                    wb = sumb = 0
                    for t in range(256):
                        wb += int(cnt[t])
                        sumb += int(cnt[t]) * t
                        wf = n - wb
                        if wb == 0 or wf == 0:
                            continue
                        sumf = total - sumb
                        num = (sumb * wf - sumf * wb) ** 2
                        score = float(num) / float(wb * wf)
                        if best is None or score > best[0]:
                            best = (score, t, wb, sumb)
                    if best is None:
                        continue  # constant channel
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["threshold"].append(best[1])
                    out["wb"].append(best[2])
                    out["sumb"].append(best[3])
                    out["score"].append(best[0])
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=OTSU_SCHEMA)


STRETCH_SCHEMA = (
    "image_id string, b int, lo_v int, hi_v int, pix_sum long, changed long"
)


def percentile_stretch(
    images: DataFrame, lo_pct: int = 2, hi_pct: int = 98
) -> DataFrame:
    """Percentile contrast stretch (the QGIS 'cumulative count cut' /
    GDAL -scale-with-percentiles display stretch) per channel: with
    n = pixel count, the cut values are the k-th smallest pixels at
    k_lo = n·lo_pct//100 + 1 and k_hi = n·hi_pct//100 (clamped to
    k_lo; exact order statistics off the 256-bin histogram), and the
    remap is the PURE-INTEGER round-half-up ramp

        v <= lo_v -> 0;  v >= hi_v -> 255;
        else ((v - lo_v)·255 + (hi_v - lo_v)//2) // (hi_v - lo_v)

    (lo_v == hi_v — a near-constant channel — passes through
    unchanged, documented). Emits per (image, channel): the cut
    values, pix_sum over the stretched channel and the changed-pixel
    census — every number exact and relationally replayable from the
    histogram. One Arrow mapInPandas pass; pixels never shuffle.
    """
    if not 0 <= lo_pct < hi_pct <= 100:
        raise ValueError("need 0 <= lo_pct < hi_pct <= 100")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "lo_v", "hi_v", "pix_sum", "changed")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                n = arr.shape[0] * arr.shape[1]
                k_lo = n * lo_pct // 100 + 1
                k_hi = max(n * hi_pct // 100, k_lo)
                for b in range(arr.shape[2]):
                    ch = arr[:, :, b]
                    cnt = np.bincount(ch.ravel(), minlength=256)
                    cum = cnt.cumsum()
                    lo_v = int(np.searchsorted(cum, k_lo))
                    hi_v = int(np.searchsorted(cum, k_hi))
                    if hi_v > lo_v:
                        span = hi_v - lo_v
                        ramp = np.arange(256, dtype=np.int64)
                        lut = np.clip(
                            ((ramp - lo_v) * 255 + span // 2) // span, 0, 255)
                        lut[:lo_v + 1] = 0
                        lut[hi_v:] = 255
                        res = lut[ch]
                    else:
                        res = ch.astype(np.int64)
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["lo_v"].append(lo_v)
                    out["hi_v"].append(hi_v)
                    out["pix_sum"].append(int(res.sum()))
                    out["changed"].append(int((res != ch).sum()))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=STRETCH_SCHEMA)


CANNY_SCHEMA = (
    "image_id string, b int, n_nms long, n_strong long, n_weak long, "
    "n_edge long, sum_mag2_edge long"
)


def canny_edges(
    images: DataFrame, lo: int = 60, hi: int = 120
) -> DataFrame:
    """Canny edge detection (Canny 1986; the cv2.Canny role) per
    channel, made FULLY INTEGER by three documented choices, so a
    relational engine can replay every stage:

    1. Gradients are the shared Sobel kernels (zero-pad border);
       magnitude comparisons use mag² (no sqrt).
    2. Non-maximum suppression uses the INTEGER sector rule
       (2|gy| <= |gx| -> horizontal gradient, compare (r, c±1);
       2|gx| <= |gy| -> vertical, compare (r±1, c); else the diagonal
       picked by sign(gx·gy) — a published discrete approximation of
       the 22.5° sectors with no trigonometry) and keeps pixels with
       mag² > 0 and mag² >= BOTH sector neighbors (out-of-bounds = 0;
       plateaus survive — documented, deterministic).
    3. Double threshold on mag² (weak >= lo², strong >= hi²) and
       hysteresis = strong pixels plus weak pixels 8-connected to a
       strong one THROUGH kept-weak pixels — a reachability closure,
       mirrored by a recursive CTE.

    Emits per (image, channel) the stage census: n_nms (NMS
    survivors), n_strong, n_weak (kept weak, non-strong), n_edge
    (after hysteresis), sum_mag2_edge — exact BIGINTs. One Arrow
    mapInPandas pass; BFS flood per image; pixels never shuffle.
    """
    if not 1 <= lo <= hi <= 1448:
        raise ValueError("need 1 <= lo <= hi <= 1448")

    from collections import deque

    def _pad_take(m: np.ndarray, dr: int, dc: int) -> np.ndarray:
        h, w = m.shape
        out = np.zeros_like(m)
        rs = slice(max(0, dr), min(h, h + dr))
        rd = slice(max(0, -dr), min(h, h - dr))
        cs = slice(max(0, dc), min(w, w + dc))
        cd = slice(max(0, -dc), min(w, w - dc))
        out[rd, cd] = m[rs, cs]
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo2, hi2 = lo * lo, hi * hi
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "n_nms", "n_strong", "n_weak", "n_edge",
                "sum_mag2_edge")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                for b in range(arr.shape[2]):
                    gx3, gy3 = _sobel_grad(arr[:, :, b:b + 1])
                    gx, gy = gx3[:, :, 0], gy3[:, :, 0]
                    mag2 = gx * gx + gy * gy
                    ax, ay = np.abs(gx), np.abs(gy)
                    horiz = 2 * ay <= ax
                    vert = (~horiz) & (2 * ax <= ay)
                    diag_main = (~horiz) & (~vert) & (gx * gy > 0)
                    diag_anti = (~horiz) & (~vert) & ~diag_main
                    n1 = np.where(
                        horiz, _pad_take(mag2, 0, 1),
                        np.where(vert, _pad_take(mag2, 1, 0),
                                 np.where(diag_main, _pad_take(mag2, 1, 1),
                                          _pad_take(mag2, 1, -1))))
                    n2 = np.where(
                        horiz, _pad_take(mag2, 0, -1),
                        np.where(vert, _pad_take(mag2, -1, 0),
                                 np.where(diag_main, _pad_take(mag2, -1, -1),
                                          _pad_take(mag2, -1, 1))))
                    keep = (mag2 > 0) & (mag2 >= n1) & (mag2 >= n2)
                    strong = keep & (mag2 >= hi2)
                    weak = keep & (mag2 >= lo2)
                    edge = strong.copy()
                    q = deque(zip(*np.nonzero(strong)))
                    while q:
                        r, c = q.popleft()
                        for dr in (-1, 0, 1):
                            for dc in (-1, 0, 1):
                                rr, cc = r + dr, c + dc
                                if (0 <= rr < h and 0 <= cc < w
                                        and weak[rr, cc] and not edge[rr, cc]):
                                    edge[rr, cc] = True
                                    q.append((rr, cc))
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["n_nms"].append(int(keep.sum()))
                    out["n_strong"].append(int(strong.sum()))
                    out["n_weak"].append(int((weak & ~strong).sum()))
                    out["n_edge"].append(int(edge.sum()))
                    out["sum_mag2_edge"].append(int(mag2[edge].sum()))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=CANNY_SCHEMA)


EDT_SCHEMA = (
    "image_id string, b int, n_fg long, sum_d2 long, max_d2 long, "
    "n_inf long"
)


def distance_transform(images: DataFrame, threshold: int = 128) -> DataFrame:
    """EXACT squared Euclidean distance transform (Felzenszwalb &
    Huttenlocher 2012; the scipy distance_transform_edt / GDAL
    proximity role) per channel: for every pixel, the exact minimum
    d² = (Δr)² + (Δc)² to a FOREGROUND pixel (v >= threshold on that
    channel). The two-pass algorithm — 1-D transforms along columns
    then the lower-envelope-of-parabolas pass along rows — is exact in
    integers (parabola intersections compare via the standard integer
    division; d² values are exact BIGINTs), verified against the naive
    min-over-all-fg definition, which is also the relational oracle.
    Emits per (image, channel): n_fg, sum_d2 and max_d2 over pixels
    WITH a foreground pixel in the channel, and n_inf = pixel count of
    channels with NO foreground (those have no defined distance;
    sum/max are 0 then, documented).

    One Arrow mapInPandas pass; O(pixels) per image; never shuffles.
    """
    if not 0 <= threshold <= 255:
        raise ValueError("threshold must be in [0, 255]")
    INF = 1 << 40  # larger than any achievable d² for capped dims

    def _edt_1d(f: np.ndarray) -> np.ndarray:
        # canonical Felzenszwalb §2 lower envelope. INF is FINITE (2^40):
        # every quantity (f + q², intersection numerators) stays < 2^53,
        # so the float64 arithmetic is exact; an INF-site parabola can
        # never undercut a finite site within reachable (q-p)² <= ~4e9,
        # so no special-casing is needed and the result is exact.
        n = len(f)
        d = np.empty(n, np.int64)
        v = np.zeros(n, np.int64)
        z = np.empty(n + 1, np.float64)
        k = 0
        z[0], z[1] = -np.inf, np.inf
        for q in range(1, n):
            while True:
                p = v[k]
                s = ((f[q] + q * q) - (f[p] + p * p)) / (2 * q - 2 * p)
                if s <= z[k]:
                    k -= 1
                else:
                    break
            k += 1
            v[k] = q
            z[k], z[k + 1] = s, np.inf
        k = 0
        for q in range(n):
            while z[k + 1] < q:
                k += 1
            p = v[k]
            d[q] = f[p] + (q - p) * (q - p)
        return d

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "b", "n_fg", "sum_d2", "max_d2", "n_inf")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                for b in range(arr.shape[2]):
                    fg = arr[:, :, b] >= threshold
                    n_fg = int(fg.sum())
                    if n_fg == 0:
                        out["image_id"].append(rec.image_id)
                        out["b"].append(b)
                        out["n_fg"].append(0)
                        out["sum_d2"].append(0)
                        out["max_d2"].append(0)
                        out["n_inf"].append(h * w)
                        continue
                    g = np.where(fg, 0, INF).astype(np.int64)
                    for c in range(w):
                        g[:, c] = _edt_1d(g[:, c])
                    for r in range(h):
                        g[r, :] = _edt_1d(g[r, :])
                    out["image_id"].append(rec.image_id)
                    out["b"].append(b)
                    out["n_fg"].append(n_fg)
                    out["sum_d2"].append(int(g.sum()))
                    out["max_d2"].append(int(g.max()))
                    out["n_inf"].append(0)
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=EDT_SCHEMA)


TEMPLATE_SCHEMA = (
    "image_id string, b int, rank int, r int, c int, sad long"
)


def template_match(
    images: DataFrame, template: "np.ndarray", top_k: int = 3
) -> DataFrame:
    """Template matching by sum of absolute differences (the
    cv2.matchTemplate TM_SQDIFF-family role with the L1 metric —
    EXACT integers, no normalization floats): the (th, tw) single-band
    integer template slides over every valid position of each channel;
    sad(r, c) = Σ |img[r+i, c+j] - tpl[i, j]| is an exact BIGINT, and
    the top_k best positions per (image, channel) are ranked
    (sad ASC, r ASC, c ASC) — a total order, deterministic
    cross-engine. Images smaller than the template emit no rows.

    One Arrow mapInPandas pass; the slide is NumPy sliding windows;
    template size is capped at 16x16 (the oracle inlines it as
    VALUES; bigger templates belong in a broadcast join pipeline).
    """
    tpl = np.asarray(template, dtype=np.int64)
    if tpl.ndim != 2 or not (1 <= tpl.shape[0] <= 16 and 1 <= tpl.shape[1] <= 16):
        raise ValueError("template must be 2-D with dims in [1, 16]")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    th, tw = tpl.shape

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out = {k: [] for k in ("image_id", "b", "rank", "r", "c", "sad")}
            for rec in pdf.itertuples():
                arr = codecs.decode_image(bytes(rec.bytes), rec.fmt)
                h, w = arr.shape[:2]
                if h < th or w < tw:
                    continue
                for b in range(arr.shape[2]):
                    win = sliding_window_view(
                        arr[:, :, b].astype(np.int64), (th, tw))
                    sad = np.abs(win - tpl).sum(axis=(2, 3))
                    flat = sad.ravel()
                    order = np.lexsort(
                        (np.arange(flat.size), flat))[:top_k]
                    for rank, idx in enumerate(order):
                        r, c = divmod(int(idx), sad.shape[1])
                        out["image_id"].append(rec.image_id)
                        out["b"].append(b)
                        out["rank"].append(rank + 1)
                        out["r"].append(r)
                        out["c"].append(c)
                        out["sad"].append(int(flat[idx]))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=TEMPLATE_SCHEMA)


MODE_SCHEMA = (
    "image_id string, out_w int, out_h int, pix_sum long, changed long, "
    "out binary"
)


def mode_filter(images: DataFrame) -> DataFrame:
    """3x3 mode (majority) filter (the ArcGIS Majority Filter / GRASS
    r.neighbors mode role — the categorical-raster cleaner) per
    channel: each pixel takes the most frequent value of its in-bounds
    3x3 window, ties broken to the SMALLEST value ((count DESC, value
    ASC) — a total order, deterministic and exactly the ROW_NUMBER
    pick a relational engine makes). Pure integer counting/selection —
    no arithmetic, no rounding convention. The center pixel is part of
    its own window (so a pixel whose window has no repeated value
    keeps... the smallest value of the window, NOT necessarily itself
    — the documented plain-mode semantics, unlike ArcGIS's
    replace-only-on-majority variant).

    One Arrow mapInPandas pass; pix_sum/changed audit columns; pixels
    never shuffle.
    """

    def _mode(a: np.ndarray) -> np.ndarray:
        h, w = a.shape[:2]
        out = np.empty_like(a)
        for r in range(h):
            for c in range(w):
                win = a[max(0, r - 1):min(h, r + 2), max(0, c - 1):min(w, c + 2)]
                flat = win.reshape(-1, *a.shape[2:])
                for b in range(a.shape[2]):
                    vals, cnts = np.unique(flat[:, b], return_counts=True)
                    # np.unique sorts values ASC; argmax takes the FIRST
                    # maximal count -> (count DESC, value ASC) pick
                    out[r, c, b] = vals[np.argmax(cnts)]
        return out

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                res = _mode(arr)
                out["image_id"].append(r.image_id)
                out["out_w"].append(arr.shape[1])
                out["out_h"].append(arr.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=MODE_SCHEMA)


HISTMATCH_SCHEMA = (
    "image_id string, out_w int, out_h int, pix_sum long, changed long, "
    "out binary"
)


def histogram_match(images: DataFrame, reference: "np.ndarray") -> DataFrame:
    """Histogram matching / specification (Gonzalez & Woods §3.3.2; the
    skimage.exposure.match_histograms role) per channel against a fixed
    reference image, with the mapping decided by EXACT INTEGER rank
    algebra: with cdf_s(v) = #source pixels <= v over n_s and cdf_r(u)
    over n_r,

        lut(v) = min{ u : cdf_r(u) · n_s  >=  cdf_s(v) · n_r }

    — the classic inverse-CDF composition with the quantile comparison
    CROSS-MULTIPLIED so no fraction is ever formed; u = 255 always
    qualifies, so the LUT is total. Deterministic, engine-independent,
    and exactly the MIN-over-join a relational engine computes. The
    reference must have the same channel count (validated).

    One Arrow mapInPandas pass (two bincounts + one searchsorted per
    channel); pix_sum/changed audit columns; pixels never shuffle.
    """
    ref = np.asarray(reference)
    if ref.ndim != 3:
        raise ValueError("reference must be (H, W, C)")
    ref_cdfs = []
    n_r = ref.shape[0] * ref.shape[1]
    for b in range(ref.shape[2]):
        ref_cdfs.append(np.bincount(
            ref[:, :, b].ravel(), minlength=256).cumsum().astype(np.int64))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "out_w", "out_h", "pix_sum", "changed", "out")}
            for r in pdf.itertuples():
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.shape[2] != len(ref_cdfs):
                    raise ValueError(
                        f"channel mismatch: image {r.image_id} has "
                        f"{arr.shape[2]}, reference {len(ref_cdfs)}")
                n_s = arr.shape[0] * arr.shape[1]
                res = np.empty_like(arr)
                for b in range(arr.shape[2]):
                    cdf_s = np.bincount(
                        arr[:, :, b].ravel(), minlength=256).cumsum().astype(np.int64)
                    lut = np.searchsorted(
                        ref_cdfs[b] * n_s, cdf_s * n_r, side="left")
                    res[:, :, b] = lut.astype(np.uint8)[arr[:, :, b]]
                out["image_id"].append(r.image_id)
                out["out_w"].append(arr.shape[1])
                out["out_h"].append(arr.shape[0])
                out["pix_sum"].append(int(res.astype(np.int64).sum()))
                out["changed"].append(int((res != arr).sum()))
                out["out"].append(codecs.encode_raw(np.ascontiguousarray(res)))
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, schema=HISTMATCH_SCHEMA)
