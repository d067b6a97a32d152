"""Raster catalog utilities — gdalinfo / gdaltindex / gdalcompare /
gdal_edit parity (reference checkout absent, SURVEY.md §0.1 — the
capability set follows the GDAL-utility mandate, BASELINE.json:6).

* ``raster_info``  — `gdalinfo` report: per-raster structural metadata
  (dims, bands, dtype, compression, organization, overview count) and
  georef corners, from a TAGS-ONLY parse — pixel strips are never
  decompressed, so a multi-hundred-MB LZW chart costs microseconds.
* ``raster_tindex`` — `gdaltindex`: a footprint index table (bbox +
  WKT polygon per georeferenced raster; non-georeferenced rasters are
  skipped, exactly gdaltindex's warn-and-skip).
* ``raster_compare`` — `gdalcompare.py`: pairwise pixel comparison of
  two raster tables keyed by id. TWO-PHASE by design: each side first
  reduces map-side to a narrow (id, md5-of-quantized-grid) summary —
  raster bytes do NOT shuffle for identical pairs (the common
  regression-check case); only pairs whose digests differ enter the
  blob join that computes per-pixel diff stats.
* ``georef_edit`` — `gdal_edit.py -a_ullr` / `gdalmove`: rewrite the
  georef tags via in-place byte splice (``tiffcodec.rewrite_georef``);
  pixel bytes are untouched and the op verifies that by digest.
* ``vrt_build`` — `gdalbuildvrt`: per-group virtual-mosaic geometry
  (union extent, average/highest/lowest resolution rule) and the
  per-source placement offsets a VRT <SimpleSource> would carry;
  tags-only parse, one narrow group aggregation, broadcast join.

Scale shape: every op is a per-raster-independent Arrow pass
(`mapInPandas`); the only shuffle anywhere is ``raster_compare``'s
narrow digest join plus a blob join restricted to differing ids.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID_SENT = -(2**60)  # shared non-finite sentinel (see operators/zonal.py)


def _qgrid(a: np.ndarray, quant: float) -> np.ndarray:
    """float64 grid -> int64 quantized grid with GRID_SENT for non-finite."""
    bad = ~np.isfinite(a)
    return np.where(bad, GRID_SENT, np.round(np.where(bad, 0.0, a) / quant)).astype(np.int64)


def raster_info(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalinfo` parity: one metadata row per raster. Columns:
    width/height/bands/bits/sample_format/compression/organization/
    n_overviews plus georef (gsd, mx0, my1, mx1, my0 — corner coords)
    and epsg; non-georeferenced rasters keep NaN geo columns (auditable,
    not dropped). Tags-only: never touches pixel strips."""
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                t = tiffcodec.read_tiff_tags(bytes(blob))
                g = t["geo"] or {}
                nan = float("nan")
                rows.append(
                    (
                        iid,
                        t["w"],
                        t["h"],
                        t["bands"],
                        t["bits"],
                        t["sample_format"],
                        t["compression"],
                        t["organization"],
                        t["n_ifds"] - 1,
                        float(g.get("gsd", nan)),
                        float(g.get("mx0", nan)),
                        float(g.get("my1", nan)),
                        float(g.get("mx1", nan)),
                        float(g.get("my0", nan)),
                        int(g["epsg"]) if g.get("epsg") is not None else -1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "bands", "bits", "sample_format",
                    "compression", "organization", "n_overviews",
                    "gsd", "mx0", "my1", "mx1", "my0", "epsg",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} string, width int, height int, bands int, bits int, "
            "sample_format int, compression string, organization string, "
            "n_overviews int, gsd double, mx0 double, my1 double, "
            "mx1 double, my0 double, epsg int"
        ),
    )


def raster_tindex(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdaltindex` parity: footprint index over a raster table — one
    (id, mx0, my0, mx1, my1, wkt) row per GEOREFERENCED raster; rasters
    without georef are skipped (gdaltindex warns and skips them — the
    skip is visible as a missing id, and ``raster_info`` reports every
    raster for auditing). WKT ring is counter-clockwise from the
    lower-left corner, coordinates fixed to 3 decimals (stable
    cross-engine text)."""
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                g = tiffcodec.read_tiff_tags(bytes(blob))["geo"]
                if g is None:
                    continue
                x0, y0, x1, y1 = g["mx0"], g["my0"], g["mx1"], g["my1"]
                wkt = (
                    f"POLYGON (({x0:.3f} {y0:.3f}, {x1:.3f} {y0:.3f}, "
                    f"{x1:.3f} {y1:.3f}, {x0:.3f} {y1:.3f}, {x0:.3f} {y0:.3f}))"
                )
                rows.append((iid, float(x0), float(y0), float(x1), float(y1), wkt))
            yield pd.DataFrame(
                rows, columns=[id_col, "mx0", "my0", "mx1", "my1", "wkt"]
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, mx0 double, my0 double, mx1 double, my1 double, wkt string",
    )


def _grid_digest(images: DataFrame, id_col: str, bytes_col: str, quant: float) -> DataFrame:
    """Narrow per-raster summary (id, w, h, md5 of the quantized grid) —
    the map-side reduction that lets identical pairs skip the blob join."""
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                q = _qgrid(a.astype(np.float64), quant)
                # shape is part of the digest: a 4x5 and a 5x4 raster with
                # the same raveled cells must NOT compare identical
                h = hashlib.md5(repr(a.shape).encode())
                h.update(np.ascontiguousarray(q).tobytes())
                rows.append((iid, int(a.size), h.hexdigest()))
            yield pd.DataFrame(rows, columns=[id_col, "n_px", "digest"])

    return images.select(id_col, bytes_col).mapInPandas(
        fn, schema=f"{id_col} string, n_px long, digest string"
    )


def raster_compare(
    golden: DataFrame,
    new: DataFrame,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalcompare.py` parity: per shared id report
    (identical, n_px, n_diff, max_qdiff, sum_qdiff) where diffs are over
    the quantized grids (non-finite cells compare as the sentinel — a
    NaN-vs-value cell IS a diff; NaN-vs-NaN is not, matching
    gdalcompare's checksum-then-pixels behavior). Ids present on only
    one side surface as n_px = -1 rows (gdalcompare errors on them;
    an auditable row keeps the op total).

    Scale shape: phase 1 digests both sides map-side (bytes stay put);
    phase 2 joins ONLY the narrow summaries; phase 3 re-joins blobs for
    the (typically tiny) differing-id set, broadcast-filtered."""
    ga = _grid_digest(golden, id_col, bytes_col, quant).alias("ga")
    gb = _grid_digest(new, id_col, bytes_col, quant).alias("gb")
    summary = ga.join(gb, on=id_col, how="full")
    both = summary.where(F.col("ga.digest").isNotNull() & F.col("gb.digest").isNotNull())
    same = both.where(F.col("ga.digest") == F.col("gb.digest")).select(
        F.col(id_col),
        F.lit(True).alias("identical"),
        F.col("ga.n_px").cast("long").alias("n_px"),
        F.lit(0).cast("long").alias("n_diff"),
        F.lit(0).cast("long").alias("max_qdiff"),
        F.lit(0).cast("long").alias("sum_qdiff"),
    )
    one_sided = summary.where(
        F.col("ga.digest").isNull() | F.col("gb.digest").isNull()
    ).select(
        F.col(id_col),
        F.lit(False).alias("identical"),
        F.lit(-1).cast("long").alias("n_px"),
        F.lit(-1).cast("long").alias("n_diff"),
        F.lit(-1).cast("long").alias("max_qdiff"),
        F.lit(-1).cast("long").alias("sum_qdiff"),
    )
    diff_ids = both.where(F.col("ga.digest") != F.col("gb.digest")).select(id_col)
    pairs = (
        golden.select(F.col(id_col), F.col(bytes_col).alias("bytes_a"))
        .join(F.broadcast(diff_ids), on=id_col, how="semi")
        .join(
            new.select(F.col(id_col), F.col(bytes_col).alias("bytes_b")).join(
                F.broadcast(diff_ids), on=id_col, how="semi"
            ),
            on=id_col,
        )
    )
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, ba, bb in zip(pdf[id_col], pdf["bytes_a"], pdf["bytes_b"]):
                a, _ = tiffcodec.decode_tiff(bytes(ba), scale_16bit=False)
                b, _ = tiffcodec.decode_tiff(bytes(bb), scale_16bit=False)
                if a.shape != b.shape:
                    # dimension mismatch: gdalcompare reports and stops
                    # pixel checks; every pixel counts as different
                    rows.append((iid, False, int(a.size), int(a.size), -1, -1))
                    continue
                qa = _qgrid(a.astype(np.float64), quant)
                qb = _qgrid(b.astype(np.float64), quant)
                d = qa != qb
                ad = np.abs(qa - qb)[d]
                rows.append(
                    (iid, False, int(a.size), int(d.sum()),
                     int(ad.max()) if ad.size else 0,
                     int(ad.sum()) if ad.size else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "identical", "n_px", "n_diff", "max_qdiff", "sum_qdiff"],
            )

    diff = pairs.mapInPandas(
        fn,
        schema=(
            f"{id_col} string, identical boolean, n_px long, n_diff long, "
            "max_qdiff long, sum_qdiff long"
        ),
    )
    return same.unionByName(diff).unionByName(one_sided)


def georef_edit(
    images: DataFrame,
    gsd: float | None = None,
    mx0: float | None = None,
    my1: float | None = None,
    dx: float = 0.0,
    dy: float = 0.0,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_edit.py -a_ullr` / `gdalmove` parity: splice new georef
    into each raster's tags (pixels untouched) and return an audit row
    per raster — the NEW georef read back from the edited bytes plus
    ``pixels_unchanged`` (md5 of the quantized decoded grid before ==
    after; the gdal_edit contract is precisely "metadata only").
    The edited blob itself is in the ``bytes`` column for sinking."""
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(blob)
                a0, _ = tiffcodec.decode_tiff(raw, scale_16bit=False)
                edited = tiffcodec.rewrite_georef(
                    raw, gsd=gsd, mx0=mx0, my1=my1, dx=dx, dy=dy
                )
                a1, g1 = tiffcodec.decode_tiff(edited, scale_16bit=False)
                h0 = hashlib.md5(
                    np.ascontiguousarray(_qgrid(a0.astype(np.float64), quant)).tobytes()
                ).hexdigest()
                h1 = hashlib.md5(
                    np.ascontiguousarray(_qgrid(a1.astype(np.float64), quant)).tobytes()
                ).hexdigest()
                rows.append(
                    (iid, edited, float(g1["gsd"]), float(g1["mx0"]),
                     float(g1["my1"]), h0 == h1, h1)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "bytes", "gsd", "mx0", "my1",
                         "pixels_unchanged", "grid_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} string, bytes binary, gsd double, mx0 double, "
            "my1 double, pixels_unchanged boolean, grid_md5 string"
        ),
    )


# ---------------------------------------------------------------------------
# gdalbuildvrt parity: virtual-mosaic placement index
# ---------------------------------------------------------------------------


def vrt_build(
    images: DataFrame,
    group_col: str = "vrt_group",
    resolution: str = "average",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalbuildvrt` parity: per-group virtual-mosaic geometry + the
    per-source placement every <SimpleSource> would carry, as a table.

    Semantics (documented, gdalbuildvrt equivalents):
    * VRT extent = union of source bboxes (min mx0 / max mx1 / min my0
      / max my1 per group);
    * ``resolution``: average (gdalbuildvrt default) | highest (finest
      = MIN gsd) | lowest (coarsest = MAX gsd);
    * sizes/offsets by gdalbuildvrt's round-half-up rule
      floor(x/res + 0.5): vrt_w/h from the union extent, dst_xoff /
      dst_yoff from the source's offset to the VRT top-left, dst_xsize
      / dst_ysize from the source's ground span;
    * mixed-SRS groups: gdalbuildvrt refuses to mix projections — every
      row of such a group keeps its identity but carries dst offsets
      -1 (auditable skip, NaN-row convention; n_srs > 1 flags it);
      rasters without georef are skipped entirely (gdaltindex's
      warn-and-skip rule).

    Scale shape: one narrow tags-only Arrow parse (pixels never read),
    one aggregation shuffle on the group key, and a broadcast join of
    the tiny per-group geometry back onto sources. Placement math is
    pure Column arithmetic (JVM-side, exactly-rounded IEEE doubles —
    the relational oracle replays it in SQL verbatim).
    """
    from ..functions import tiffcodec

    if resolution not in ("average", "highest", "lowest"):
        raise ValueError(f"unknown resolution rule {resolution!r}")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for grp, iid, blob in zip(pdf[group_col], pdf[id_col], pdf[bytes_col]):
                g = tiffcodec.read_tiff_tags(bytes(blob))
                geo = g["geo"]
                if geo is None:
                    continue
                rows.append(
                    (
                        grp, iid, int(g["w"]), int(g["h"]), float(geo["gsd"]),
                        float(geo["mx0"]), float(geo["my0"]),
                        float(geo["mx1"]), float(geo["my1"]),
                        int(geo["epsg"]) if geo.get("epsg") is not None else -1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[group_col, id_col, "w", "h", "gsd",
                         "mx0", "my0", "mx1", "my1", "epsg"],
            )

    info = images.select(group_col, id_col, bytes_col).mapInPandas(
        parse,
        schema=f"{group_col} string, {id_col} string, w int, h int, gsd double, "
        "mx0 double, my0 double, mx1 double, my1 double, epsg int",
    )
    res_agg = {
        "average": F.avg("gsd"),
        "highest": F.min("gsd"),
        "lowest": F.max("gsd"),
    }[resolution]
    grp = info.groupBy(group_col).agg(
        F.min("mx0").alias("vmx0"),
        F.max("mx1").alias("vmx1"),
        F.min("my0").alias("vmy0"),
        F.max("my1").alias("vmy1"),
        res_agg.alias("res"),
        F.countDistinct("epsg").alias("n_srs"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    j = info.join(F.broadcast(grp), group_col)
    rhu = lambda c: F.floor(c + F.lit(0.5)).cast("int")  # noqa: E731
    clean = F.col("n_srs") == 1
    return j.select(
        group_col,
        id_col,
        "n_sources",
        "n_srs",
        "res",
        rhu((F.col("vmx1") - F.col("vmx0")) / F.col("res")).alias("vrt_w"),
        rhu((F.col("vmy1") - F.col("vmy0")) / F.col("res")).alias("vrt_h"),
        F.col("vmx0"),
        F.col("vmy1"),
        F.when(clean, rhu((F.col("mx0") - F.col("vmx0")) / F.col("res")))
        .otherwise(F.lit(-1)).alias("dst_xoff"),
        F.when(clean, rhu((F.col("vmy1") - F.col("my1")) / F.col("res")))
        .otherwise(F.lit(-1)).alias("dst_yoff"),
        F.when(clean, rhu(F.col("w") * F.col("gsd") / F.col("res")))
        .otherwise(F.lit(-1)).alias("dst_xsize"),
        F.when(clean, rhu(F.col("h") * F.col("gsd") / F.col("res")))
        .otherwise(F.lit(-1)).alias("dst_ysize"),
        # carried for the VRT XML serializer (<SrcRect>/<SRS>): source pixel
        # dims and the group's single EPSG code (-1 flags the mixed case)
        F.col("w").alias("src_w"),
        F.col("h").alias("src_h"),
        F.when(clean, F.col("epsg")).otherwise(F.lit(-1)).alias("epsg"),
    )


def vrt_xml(placement: DataFrame, group_col: str = "vrt_group") -> DataFrame:
    """Serialize `vrt_build` placement rows to GDAL VRT XML (the published
    VRTDataset format [SPEC] — gdalbuildvrt's actual output file): one row
    per CLEAN group (n_srs == 1; gdalbuildvrt refuses mixed projections,
    so a mixed group has no legal VRT) with a `vrt_xml` string column.

    Pure Column exprs end-to-end — per-source <SimpleSource> fragments via
    `format_string`, assembled per group with a sort_array over
    (image_id, fragment) structs so the document is DETERMINISTIC
    regardless of shuffle order. Doubles are rendered %.17g (17 significant
    digits round-trips IEEE 754 exactly — `vrt_parse` recovers the bitwise
    geotransform). One key-only group aggregation; no UDF, no driver loop.
    """
    # groups with georef but NO CRS code (epsg -1) have no legal VRT either
    # — GDAL could not assign an SRS — so they are skipped like mixed-SRS
    # groups. SourceFilename is XML-escaped (& first) or ids containing
    # &/<(>) would emit non-well-formed documents.
    esc = F.col("image_id")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    src = placement.filter((F.col("n_srs") == 1) & (F.col("epsg") > 0)).withColumn(
        "_frag",
        F.format_string(
            '  <SimpleSource>\n'
            '   <SourceFilename relativeToVRT="1">%s</SourceFilename>\n'
            "   <SourceBand>1</SourceBand>\n"
            '   <SrcRect xOff="0" yOff="0" xSize="%d" ySize="%d"/>\n'
            '   <DstRect xOff="%d" yOff="%d" xSize="%d" ySize="%d"/>\n'
            "  </SimpleSource>",
            esc, F.col("src_w"), F.col("src_h"),
            F.col("dst_xoff"), F.col("dst_yoff"),
            F.col("dst_xsize"), F.col("dst_ysize"),
        ),
    )
    agg = src.groupBy(group_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("image_id", "_frag"))),
                lambda s: s["_frag"],
            ),
            "\n",
        ).alias("_sources"),
        F.first("vrt_w").alias("vrt_w"),
        F.first("vrt_h").alias("vrt_h"),
        F.first("vmx0").alias("vmx0"),
        F.first("vmy1").alias("vmy1"),
        F.first("res").alias("res"),
        F.first("epsg").alias("epsg"),
    )
    return agg.select(
        group_col,
        F.format_string(
            '<VRTDataset rasterXSize="%d" rasterYSize="%d">\n'
            " <SRS>EPSG:%d</SRS>\n"
            " <GeoTransform>%.17g, %.17g, 0, %.17g, 0, %.17g</GeoTransform>\n"
            ' <VRTRasterBand dataType="Byte" band="1">\n%s\n'
            " </VRTRasterBand>\n"
            "</VRTDataset>",
            F.col("vrt_w"), F.col("vrt_h"), F.col("epsg"),
            F.col("vmx0"), F.col("res"), F.col("vmy1"), -F.col("res"),
            F.col("_sources"),
        ).alias("vrt_xml"),
    )


def vrt_parse(
    vrts: DataFrame, group_col: str = "vrt_group", xml_col: str = "vrt_xml"
) -> DataFrame:
    """Parse GDAL VRT XML back to the `vrt_build` placement schema (the
    VRT *input driver* — SURVEY.md §2.1 row 1 lists VRT among the
    reference's accepted raster sources). Inverse of `vrt_xml` and of any
    north-up single-band VRT gdalbuildvrt writes: <GeoTransform> must
    carry zero rotation terms (fail-loud NaN-free: bad documents yield no
    rows and are counted nowhere — mirror gdalbuildvrt's refusal).

    Arrow-batched stdlib `xml.etree` parse per row; emits one row per
    <SimpleSource>. Since a legal VRT is single-SRS by construction,
    n_srs is 1 and epsg comes from <SRS>.
    """
    import xml.etree.ElementTree as ET

    def parse_one(grp, doc):
        """One document -> its placement rows, or raise (caller skips the
        whole document — the 'bad documents yield no rows' contract
        covers malformed XML AND well-formed-but-non-conforming docs:
        missing GeoTransform, GCP-georeferenced VRTs, partial Rects)."""
        root = ET.fromstring(doc)
        if root.tag != "VRTDataset":
            raise ValueError("not a VRTDataset")
        gt = [float(v) for v in root.findtext("GeoTransform", "").split(",")]
        if len(gt) != 6 or gt[2] != 0.0 or gt[4] != 0.0 or gt[1] <= 0.0 or gt[5] >= 0.0:
            # rotated / south-up / degenerate-resolution: out of the
            # north-up contract
            raise ValueError("geotransform outside the north-up contract")
        srs = root.findtext("SRS", "").strip()
        epsg = int(srs.split(":")[1]) if srs.upper().startswith("EPSG:") else -1
        vrt_w = int(root.get("rasterXSize", "0"))
        vrt_h = int(root.get("rasterYSize", "0"))
        srcs = root.findall(".//SimpleSource")
        out = []
        for s in srcs:
            sr = s.find("SrcRect")
            dr = s.find("DstRect")
            if sr is None or dr is None:
                raise ValueError("SimpleSource without SrcRect/DstRect")
            out.append(
                (
                    grp,
                    (s.findtext("SourceFilename") or "").strip(),
                    len(srcs), 1, gt[1], vrt_w, vrt_h, gt[0], gt[3],
                    int(dr.get("xOff")), int(dr.get("yOff")),
                    int(dr.get("xSize")), int(dr.get("ySize")),
                    int(sr.get("xSize")), int(sr.get("ySize")),
                    epsg,
                )
            )
        return out

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for grp, doc in zip(pdf[group_col], pdf[xml_col]):
                try:
                    rows.extend(parse_one(grp, doc))
                except Exception:
                    continue  # bad document -> zero rows, auditable by count
            yield pd.DataFrame(
                rows,
                columns=[
                    group_col, "image_id", "n_sources", "n_srs", "res",
                    "vrt_w", "vrt_h", "vmx0", "vmy1", "dst_xoff", "dst_yoff",
                    "dst_xsize", "dst_ysize", "src_w", "src_h", "epsg",
                ],
            )

    return vrts.mapInPandas(
        parse,
        schema=f"{group_col} string, image_id string, n_sources long, "
        "n_srs long, res double, vrt_w int, vrt_h int, vmx0 double, "
        "vmy1 double, dst_xoff int, dst_yoff int, dst_xsize int, "
        "dst_ysize int, src_w int, src_h int, epsg int",
    )


# ---------------------------------------------------------------------------
# COG layout validation (validate_cloud_optimized_geotiff parity)
# ---------------------------------------------------------------------------


def cog_check(
    images: DataFrame,
    overview_threshold: int = 512,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Cloud-Optimized-GeoTIFF layout validation — the checks GDAL's
    `validate_cloud_optimized_geotiff.py` applies, as a table operator
    over a raster catalog (tags-only parse, pixel data never read):

    * ``tiled_ok``    — every IFD uses tiled organization with tile
      dims that are multiples of 16 (TIFF 6.0 §15 requirement);
    * ``overviews_ok`` — rasters larger than ``overview_threshold`` in
      either dimension carry at least one internal overview IFD;
    * ``decreasing_ok`` — the IFD chain is strictly decreasing in both
      dimensions (main -> coarser overviews);
    * ``data_order_cog`` — pixel data is laid out smallest-overview
      first and full-resolution last (the streaming-read property that
      makes a COG a COG; offsets compared, bytes untouched);
    * ``cog_ok`` — conjunction of the four.

    Unreadable blobs surface as the auditable (-1, False...) row.
    Scale shape: per-raster independent Arrow pass, no shuffle."""
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    t = tiffcodec.read_tiff_tags(bytes(blob))
                except Exception:
                    rows.append((iid, -1, -1, 0, False, False, False, False, False))
                    continue
                ifds = t["ifds"]
                tiled_ok = all(
                    d["tiled"] and d["tile_w"] % 16 == 0 and d["tile_h"] % 16 == 0
                    for d in ifds
                )
                needs_ov = max(t["w"], t["h"]) > overview_threshold
                overviews_ok = (not needs_ov) or len(ifds) > 1
                decreasing_ok = all(
                    ifds[k]["w"] > ifds[k + 1]["w"] and ifds[k]["h"] > ifds[k + 1]["h"]
                    for k in range(len(ifds) - 1)
                )
                offs = [d["data0"] for d in ifds]
                data_order_cog = all(o >= 0 for o in offs) and all(
                    offs[k] > offs[k + 1] for k in range(len(offs) - 1)
                )
                rows.append(
                    (
                        iid, t["w"], t["h"], len(ifds) - 1,
                        tiled_ok, overviews_ok, decreasing_ok, data_order_cog,
                        tiled_ok and overviews_ok and decreasing_ok and data_order_cog,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "w", "h", "n_overviews", "tiled_ok",
                         "overviews_ok", "decreasing_ok", "data_order_cog", "cog_ok"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, w int, h int, n_overviews int, tiled_ok boolean, "
        "overviews_ok boolean, decreasing_ok boolean, data_order_cog boolean, "
        "cog_ok boolean",
    )
