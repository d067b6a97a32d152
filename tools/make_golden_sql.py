"""Generate golden-VALUES oracle result sets for the engine-only queries
(the driver's rows-only checks), so EVERY queries() entry gets a DuckDB
oracle (CORRECTNESS gate green across the board).

Everything here is computed WITHOUT the Spark engine:

* tile pixels via ``oracle/minitiler`` (single-process loop oracle,
  independently derived tile math);
* H3/S2 ids via the pure-NumPy kernels (``h3lite``/``s2lite`` — the same
  public-algorithm kernels the pytest suite pins with KATs/invariants);
* Spark hash semantics via ``oracle/sparkhash`` (pure-Python XXH64,
  bit-verified against Spark in tests/test_sparkhash.py);
* banding / LSH / IVF pipeline logic as plain Python loops and sets.

Queries that read driver tables are pinned to sf0.01 (the driver's
CORRECTNESS scale); fixture-driven queries (pyramid/warp/cutline/image
features) are sf-independent.

Run: python tools/make_golden_sql.py   -> writes tests/golden/values/*.json
Each JSON carries {columns, types, rows}; the SQL VALUES table is built at
query-registry import time by tilers_tools_spark/plans/golden_sql.py.

INDEPENDENCE SCOPE (read before trusting "oracle-gated" for these): some
goldens reuse engine kernels (single-process NumPy, no Spark). For those,
the DuckDB gate pins *distributed-execution ≡ local-kernel* equivalence
and regression, NOT independent algorithmic truth; truth rests on the
spec-derived pytest KAT listed per golden below. A kernel bug cannot hide:
it would have to fool both the spec KAT and the gate simultaneously.

  golden query        kernel reused      independent spec test pinning it
  ------------------  -----------------  ----------------------------------
  h3_s2_assign,       h3lite, s2lite     S2: published KAT vectors
  h3_rollup                              (tests/test_indexers.py); H3:
                                         documented deviation pinned by the
                                         canonical-KAT divergence test
                                         (test_indexers.py) + invariants
  pyramid_smoke,      codecs (png/jpeg   PNG: byte-exact decode/encode
  warped_smoke,       encode for         roundtrip; JPEG: PSNR>=40 + spec
  cutline_mask,       tile_md5),         Annex-K tables
  image_features      tilemath           (tests/test_codecs.py); tile math:
                                         T0 property twins + minitiler is
                                         an independent derivation
  fingerprint,        oracle/sparkhash   XXH64 published spec vectors
  minhash_lsh_pairs,  (XXH64 twin)       (tests/test_sparkhash.py) + pinned
  simhash                                bit-for-bit vs Spark's F.xxhash64
  ann_ivf             ann._kmeans_np     _kmeans_np invariants
                                         (tests/test_pipeline_ops.py); see
                                         SCOPE NOTE at g_ann_ivf
  ann_pq              ann._pq_train/     recall-vs-brute bound + code-range/
                      _pq_encode/_pq_luts  determinism invariants
                                         (tests/test_pipeline_ops.py); see
                                         SCOPE NOTE at g_ann_pq
  video_frames,       multimodal fake-   the fake decode IS the documented
  audio_frames        decode replica     contract (no codec libs offline);
                                         gate verifies plumbing end-to-end

Everything else (relational queries, minitiler-pixel goldens, plain-Python
banding/LSH loops) is an independent derivation.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fixtures import gen  # noqa: E402
from oracle import minitiler as mt  # noqa: E402
from oracle import sparkhash as sh  # noqa: E402
from tilers_tools_spark.functions import codecs, h3lite, s2lite  # noqa: E402
from tilers_tools_spark.functions import tilemath as tm  # noqa: E402

SF = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "values")

# Java \s (ASCII) — the exact char class Spark's split(lower(trim(text)),
# '\s+') applies; documents are all-ASCII (verified), so lower() matches too
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    return list(zip(t.doc_id.astype(int), t.text.astype(str)))


def _events_lonlat():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    e = ev.event_id.to_numpy(np.int64)
    lon = (e * 9973 % 360000) / 1000.0 - 180.0
    lat = (e * 7919 % 168000) / 1000.0 - 84.0
    return e, lon, lat


def _embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t.vec_id.astype(int).tolist()
    # engine casts array<float> -> array<double> element-wise (exact)
    vecs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in t.embedding]
    return ids, vecs


def _fold_dot(a, b) -> float:
    """Left-to-right float64 fold — F.aggregate(zip_with(...)) semantics."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_cosine(a, b) -> float:
    na = math.sqrt(_fold_dot(a, a))
    nb = math.sqrt(_fold_dot(b, b))
    return _fold_dot(a, b) / (na * nb)


def save(name: str, columns, types, rows):
    # generation-time guard (VERDICT r4 ask #4): a non-finite float in a
    # golden means the ORACLE COMPUTATION went wrong (every pinned
    # statistic is finite by construction) — fail here, loudly, rather
    # than depending on the renderer's CAST('nan') escape hatch
    for i, row in enumerate(rows):
        for c, (v, t) in enumerate(zip(row, types)):
            if t == "float64" and v is not None and not math.isfinite(float(v)):
                raise ValueError(
                    f"golden {name}: non-finite {v!r} at row {i} col {columns[c]!r} — "
                    "oracle computation bug, refusing to write"
                )
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}.json"), "w") as f:
        json.dump({"columns": list(columns), "types": list(types), "rows": rows}, f)
    print(f"{name}: {len(rows)} rows")


# ---------------------------------------------------------------------------
# indexer queries over events (sf-pinned)
# ---------------------------------------------------------------------------


def g_h3_s2_assign():
    _, lon, lat = _events_lonlat()
    h3 = h3lite.latlng_to_cell(lat, lon, 7)
    s2 = s2lite.latlng_to_cell(lat, lon, 12)
    df = pd.DataFrame({"h3_cell": h3, "s2": s2})
    g = df.groupby("h3_cell").agg(n=("s2", "size"), n_s2=("s2", "nunique")).reset_index()
    rows = [[int(r.h3_cell), int(r.n), int(r.n_s2)] for r in g.itertuples()]
    save("h3_s2_assign", ["h3_cell", "n", "n_s2"], ["int64", "int64", "int64"], rows)


def g_h3_rollup():
    _, lon, lat = _events_lonlat()
    h12 = h3lite.latlng_to_cell(lat, lon, 12)
    rows = []
    for r in (0, 3, 6):
        par = h3lite.cell_to_parent(h12, r)
        cells, counts = np.unique(par, return_counts=True)
        rows += [[int(r), int(c), int(n)] for c, n in zip(cells, counts)]
    save("h3_rollup", ["res", "cell", "n"], ["int32", "int64", "int64"], rows)


# ---------------------------------------------------------------------------
# xxhash64-based dedup queries over documents (sf-pinned)
# ---------------------------------------------------------------------------


def g_simhash(bits: int = 64):
    rows = []
    for doc_id, text in _docs():
        toks = _WS.split(text.lower().strip(" "))
        votes = [0] * bits
        for tok in toks:
            h = sh.xxhash64(("str", tok))
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        sim = 0
        for b in range(bits):
            if votes[b] > 0:
                sim += -(1 << 63) if b == 63 else (1 << b)
        rows.append([int(doc_id), int(sim)])
    save("simhash", ["doc_id", "simhash"], ["int64", "int64"], rows)


def _char_shingle_hashes(text: str, k: int = 5):
    t = text.lower()
    n = max(len(t) - (k - 1), 1)
    return [sh.xxhash64(("str", t[i : i + k])) for i in range(n)]


def g_minhash_lsh_pairs(num_hashes=16, bands=4, k=5, threshold=0.3):
    docs = _docs()
    sigs = {}
    shingles = {}
    for doc_id, text in docs:
        hs = _char_shingle_hashes(text, k)
        shingles[doc_id] = set(hs)
        sigs[doc_id] = [
            min(sh.xxhash64(("int", i), ("long", h)) for h in hs) for i in range(num_hashes)
        ]
    rpb = num_hashes // bands
    buckets: dict = {}
    for doc_id, mh in sigs.items():
        for b in range(bands):
            vals = [("int", b)] + [("long", mh[b * rpb + r]) for r in range(rpb)]
            key = sh.xxhash64(*vals)
            buckets.setdefault((b, key), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(cand):
        inter = len(shingles[a] & shingles[b])
        jac = inter / (len(shingles[a]) + len(shingles[b]) - inter)
        if jac >= threshold:
            rows.append([int(a), int(b), float(jac)])
    save("minhash_lsh_pairs", ["a", "b", "jaccard"], ["int64", "int64", "float64"], rows)


# ---------------------------------------------------------------------------
# pixel-pipeline queries over deterministic fixtures (sf-independent)
# ---------------------------------------------------------------------------


def g_pyramid_smoke():
    rows = []
    for rec in gen.gen_images(24, fmts=("raw", "png")):
        for r in mt.tile_image(rec):
            h3 = int(
                h3lite.latlng_to_cell(
                    np.array([r["lat"]]), np.array([r["lon"]]), mt.h3_res_for_zoom(r["z"])
                )[0]
            )
            md5 = hashlib.md5(codecs.encode_tile_png(r["rgba"])).hexdigest()
            rows.append([rec["image_id"], int(r["z"]), int(r["x"]), int(r["y"]), h3, int(r["s2_cell"]), md5, rec["caption"]])
    save(
        "pyramid_smoke",
        ["image_id", "z", "x", "y", "h3_cell", "s2_cell", "tile_md5", "caption"],
        ["str", "int32", "int64", "int64", "int64", "int64", "str", "str"],
        rows,
    )


def g_pyramid_geodetic():
    # geodetic-profile twin of g_pyramid_smoke: minitiler.tile_image_geo is
    # the independent scalar per-row renderer on the 2^(z+1) x 2^z grid;
    # tile_md5 over the shared byte-deterministic PNG encoder.
    rows = []
    for rec in gen.gen_images(16, fmts=("raw", "png")):
        for r in mt.tile_image_geo(rec):
            h3 = int(
                h3lite.latlng_to_cell(
                    np.array([r["lat"]]), np.array([r["lon"]]), mt.h3_res_for_zoom(r["z"])
                )[0]
            )
            md5 = hashlib.md5(codecs.encode_tile_png(r["rgba"])).hexdigest()
            rows.append(
                [rec["image_id"], int(r["z"]), int(r["x"]), int(r["y"]), int(r["y_xyz"]),
                 h3, int(r["s2_cell"]), md5, rec["caption"]]
            )
    save(
        "pyramid_geodetic",
        ["image_id", "z", "x", "y", "y_xyz", "h3_cell", "s2_cell", "tile_md5", "caption"],
        ["str", "int32", "int64", "int64", "int64", "int64", "int64", "str", "str"],
        rows,
    )


def g_dem_hillshade():
    # SCOPE NOTE: reuses terrain.hillshade_np (pure NumPy), whose math is
    # anchored independently by the hand-derived integer pins in
    # tests/test_terrain.py (flat=180, aligned-ramp=242, opposed=0;
    # combined/multidirectional: flat closed forms 255/180 + scalar
    # formula transcription pins). The
    # DEM surfaces are recomputed DIRECTLY from the analytic formulas —
    # this golden never reads TIFF bytes, so the gate cross-checks the
    # engine's Float32 tiled GeoTIFF decode path end-to-end.
    from tilers_tools_spark.operators.terrain import hillshade_np
    from tilers_tools_spark.plans.queries import _DEM_SPECS, _dem_surface

    rows = []
    for mode in ("standard", "combined", "multidirectional"):
        for name, h, w, gsd in _DEM_SPECS:
            dem = _dem_surface(name, h, w)
            sh = hillshade_np(dem, gsd, mode=mode)
            rows.append(
                [name, int(w), int(h), float(gsd), int(sh.sum(dtype=np.int64)),
                 hashlib.md5(sh.tobytes()).hexdigest(), mode]
            )
    save(
        "dem_hillshade",
        ["image_id", "w", "h", "gsd", "shade_sum", "shade_md5", "variant"],
        ["str", "int32", "int32", "float64", "int64", "str", "str"],
        rows,
    )


def g_zonal_stats():
    # FULLY INDEPENDENT: analytic DEM surfaces (no TIFF bytes), the
    # minitiler's scalar mercator (independent transcription), and a
    # SCALAR crossing-number point-in-polygon written here — a different
    # algorithm from the engine's vectorized scanline fill
    # (cutline.grid_mask), same strictly-right-of-center boundary rule.
    from oracle.minitiler import merc
    from tilers_tools_spark.plans.queries import _DEM_SPECS, _ZONE_RINGS, _dem_surface

    def pip(pts, x, y):
        inside = False
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if xint > x:
                    inside = not inside
        return inside

    zones = {pid: [merc(lon, lat) for lon, lat in ring] for pid, ring in _ZONE_RINGS.items()}
    acc: dict[str, list] = {}
    for name, h, w, gsd in _DEM_SPECS:
        dem = _dem_surface(name, h, w).astype(np.float64)
        for pid, pts in zones.items():
            vals = []
            for rr in range(h):
                my = 1.0e5 - (rr + 0.5) * gsd
                for cc in range(w):
                    if pip(pts, (cc + 0.5) * gsd, my):
                        vals.append(dem[rr, cc])
            if not vals:
                continue
            a = np.array(vals, dtype=np.float64)
            # per-image partial via np.sum (mirrors the engine's per-image
            # reduction order exactly); cross-image merge is 3 doubles —
            # any addition order agrees within the gate's round-to-9
            cur = acc.setdefault(pid, [0, None, None, 0.0])
            cur[0] += int(a.size)
            cur[1] = float(a.min()) if cur[1] is None else min(cur[1], float(a.min()))
            cur[2] = float(a.max()) if cur[2] is None else max(cur[2], float(a.max()))
            cur[3] += float(np.sum(a))
    rows = [
        [pid, n, mn, mx, s, s / n] for pid, (n, mn, mx, s) in sorted(acc.items())
    ]
    save(
        "zonal_stats",
        ["poly_id", "n_pixels", "min_elev", "max_elev", "sum_elev", "mean_elev"],
        ["str", "int64", "float64", "float64", "float64", "float64"],
        rows,
    )


def g_point_sample():
    # FULLY INDEPENDENT: analytic DEM surfaces (no TIFF bytes), the
    # minitiler's scalar mercator, and scalar nearest/bilinear sampling
    # written here (floor + edge-clamp lerp, GDAL pixel-center
    # convention). Both sides round to 6 decimals — cross-engine ulps
    # (~1e-8 from merc transcendentals) cannot move the rounded value.
    from oracle.minitiler import merc
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _SAMPLE_POINTS,
        _dem_surface,
    )

    rows = []
    for pid, lon, lat in _SAMPLE_POINTS:
        mx, my = merc(lon, lat)
        for name, h, w, gsd in _DEM_SPECS:
            gx0, gy1 = 0.0, 1.0e5
            gx1, gy0 = gx0 + w * gsd, gy1 - h * gsd
            # half-open containment [mx0, mx1) x (my0, my1]
            if not (gx0 <= mx < gx1 and gy0 < my <= gy1):
                continue
            dem = _dem_surface(name, h, w).astype(np.float64)
            px = (mx - gx0) / gsd
            py = (gy1 - my) / gsd
            cn = min(max(int(math.floor(px)), 0), w - 1)
            rn = min(max(int(math.floor(py)), 0), h - 1)
            u, v = px - 0.5, py - 0.5
            c0, r0 = math.floor(u), math.floor(v)
            fc, fr = u - c0, v - r0
            cl = lambda i, n: min(max(i, 0), n - 1)
            top = dem[cl(r0, h), cl(c0, w)] * (1.0 - fc) + dem[cl(r0, h), cl(c0 + 1, w)] * fc
            bot = dem[cl(r0 + 1, h), cl(c0, w)] * (1.0 - fc) + dem[cl(r0 + 1, h), cl(c0 + 1, w)] * fc
            bil = top * (1.0 - fr) + bot * fr
            rows.append(
                [int(pid), name, round(float(dem[rn, cn]), 6), round(float(bil), 6)]
            )
    save(
        "point_sample",
        ["point_id", "image_id", "value_nearest", "value_bilinear"],
        ["int64", "str", "float64", "float64"],
        rows,
    )


def g_polygonize():
    # FULLY INDEPENDENT: recomputes the quantized analytic surfaces (no
    # TIFF bytes) and labels them with a scalar BFS flood fill — a
    # different algorithm family than the engine's runs-based union-find
    # (label_regions_np). Canonical region id, bbox, pixel count and the
    # 4-connected perimeter (edges facing a different value or the
    # raster boundary) are all recomputed from first principles here.
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _POLY_STEPS,
        _dem_surface,
    )

    rows = []
    for conn in (4, 8):
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if conn == 8:
            nbrs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for name, h, w, _gsd in _DEM_SPECS:
            q = np.floor(
                _dem_surface(name, h, w).astype(np.float64) / _POLY_STEPS[name]
            ).astype(np.float32)
            seen = [[False] * w for _ in range(h)]
            for r0 in range(h):
                for c0 in range(w):
                    if seen[r0][c0]:
                        continue
                    # BFS from the scan-order-first pixel = canonical id
                    v = q[r0, c0]
                    stack = [(r0, c0)]
                    seen[r0][c0] = True
                    pix = []
                    while stack:
                        r, c = stack.pop()
                        pix.append((r, c))
                        for dr, dc in nbrs:
                            rr, cc = r + dr, c + dc
                            if 0 <= rr < h and 0 <= cc < w and not seen[rr][cc] and q[rr, cc] == v:
                                seen[rr][cc] = True
                                stack.append((rr, cc))
                    # perimeter stays the 4-edge different-value count in
                    # BOTH connectivities (the documented contract)
                    perim = 0
                    for r, c in pix:
                        for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                            if not (0 <= rr < h and 0 <= cc < w) or q[rr, cc] != v:
                                perim += 1
                    rows.append(
                        [
                            name,
                            r0 * w + c0,
                            float(v),
                            len(pix),
                            min(r for r, _ in pix),
                            min(c for _, c in pix),
                            max(r for r, _ in pix),
                            max(c for _, c in pix),
                            perim,
                            conn,
                        ]
                    )
    save(
        "polygonize",
        ["image_id", "region_id", "value", "n_pixels", "min_row", "min_col", "max_row", "max_col", "perimeter", "conn"],
        ["str", "int64", "float64", "int64", "int64", "int64", "int64", "int64", "int64", "int32"],
        rows,
    )


def g_quantize_colors():
    # INDEPENDENT ALGORITHM CODING: the engine's median cut is vectorized
    # NumPy (functions/quantize.py); this golden re-implements the same
    # integer spec with scalar Python lists/sorted/Counter — no shared
    # code, no NumPy vector ops in the cut/remap. Pixels come straight
    # from fixtures.gen.make_pixels (lossless raw/png fixture only), so
    # codec bytes are never decoded here; fixture reuse is infrastructure,
    # not the kernel under test.
    import hashlib
    from collections import Counter

    from fixtures import gen
    from tilers_tools_spark.functions import georef

    MAXC = 16
    n = 12
    idx = np.arange(n, dtype=np.uint64)
    phash = georef.splitmix64(np.uint64(gen.SEED) ^ idx)
    w, h = georef.derive_size_np(phash)

    def scalar_quantize(pix):
        cntr = Counter()
        for row in pix.reshape(-1, 3).tolist():
            cntr[tuple(row)] += 1
        colors = sorted(cntr)  # lexicographic == packed ascending
        counts = [cntr[c] for c in colors]
        boxes = [list(range(len(colors)))]
        while len(boxes) < MAXC:
            best, bkey = -1, None
            for bid, bx in enumerate(boxes):
                if len(bx) < 2:
                    continue
                rng = max(
                    max(colors[i][c] for i in bx) - min(colors[i][c] for i in bx)
                    for c in range(3)
                )
                key = (rng, sum(counts[i] for i in bx), -bid)
                if bkey is None or key > bkey:
                    best, bkey = bid, key
            if best < 0:
                break
            bx = boxes[best]
            rngs = [
                max(colors[i][c] for i in bx) - min(colors[i][c] for i in bx)
                for c in range(3)
            ]
            ch = rngs.index(max(rngs))
            bx = sorted(
                bx,
                key=lambda i: (
                    colors[i][ch],
                    colors[i][0] * 65536 + colors[i][1] * 256 + colors[i][2],
                ),
            )
            tot = sum(counts[i] for i in bx)
            cum, m = 0, len(bx) - 2
            for j, i in enumerate(bx):
                cum += counts[i]
                if 2 * cum >= tot:
                    m = min(j, len(bx) - 2)
                    break
            boxes[best] = bx[: m + 1]
            boxes.append(bx[m + 1 :])
        pal = []
        for bx in boxes:
            tot = sum(counts[i] for i in bx)
            pal.append(
                tuple(
                    (2 * sum(colors[i][c] * counts[i] for i in bx) + tot) // (2 * tot)
                    for c in range(3)
                )
            )
        near = {}
        sse = 0
        for ci, col in enumerate(colors):
            bd, bk = None, -1
            for k, p in enumerate(pal):
                d = sum((col[c] - p[c]) ** 2 for c in range(3))
                if bd is None or d < bd:  # strict < keeps the first index
                    bd, bk = d, k
            near[col] = bk
            sse += bd * cntr[col]
        idx_bytes = bytes(near[tuple(px)] for px in pix.reshape(-1, 3).tolist())
        pal_bytes = bytes(v for p in pal for v in p)
        return (
            len(pal),
            len(colors),
            hashlib.md5(pal_bytes).hexdigest(),
            hashlib.md5(idx_bytes).hexdigest(),
            sse,
        )

    rows = []
    for i in range(n):
        pix = gen.make_pixels(i, int(phash[i]), int(w[i]), int(h[i]))
        nc, nd, pmd5, imd5, sse = scalar_quantize(pix)
        rows.append([f"img{i:08d}", nc, nd, pmd5, imd5, sse])
    save(
        "quantize_colors",
        ["image_id", "n_colors", "n_distinct", "palette_md5", "index_md5", "sse"],
        ["str", "int32", "int32", "str", "str", "int64"],
        rows,
    )


def g_proximity():
    # FULLY INDEPENDENT: squared distances by scalar brute force over the
    # target pixel list (O(n_pixels * n_targets)) on the recomputed
    # analytic surfaces — no EDT, no separable passes, no TIFF bytes.
    import hashlib

    from tilers_tools_spark.plans.queries import _DEM_SPECS, _POLY_STEPS, _dem_surface

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        q = np.floor(
            _dem_surface(name, h, w).astype(np.float64) / _POLY_STEPS[name]
        )
        targets = [(r, c) for r in range(h) for c in range(w) if q[r, c] == 0.0]
        grid = []
        for r in range(h):
            for c in range(w):
                if not targets:
                    grid.append(-1)
                else:
                    grid.append(min((r - tr) ** 2 + (c - tc) ** 2 for tr, tc in targets))
        arr = np.array(grid, np.int64).reshape(h, w)
        rows.append(
            [
                name,
                len(targets),
                int(max(grid)),
                int(sum(grid)),
                hashlib.md5(arr.tobytes()).hexdigest(),
            ]
        )
    save(
        "proximity",
        ["image_id", "n_target", "max_sqdist", "sum_sqdist", "sqdist_md5"],
        ["str", "int64", "int64", "int64", "str"],
        rows,
    )


def g_sieve():
    # INDEPENDENT ALGORITHM CODING: scalar BFS labeling + the sieve_np
    # docstring spec (small regions repainted with the (largest, then
    # smallest-canonical-id) 4-neighbor, simultaneous sweeps to
    # fixpoint). No union-find, no vectorized adjacency, no TIFF bytes.
    import hashlib

    from tilers_tools_spark.plans.queries import _DEM_SPECS, _POLY_STEPS, _dem_surface

    THRESHOLD = 12

    def label(a, h, w, nbrs):
        lab = [[-1] * w for _ in range(h)]
        regions = {}
        for r0 in range(h):
            for c0 in range(w):
                if lab[r0][c0] != -1:
                    continue
                rid = r0 * w + c0
                v = a[r0][c0]
                stack = [(r0, c0)]
                lab[r0][c0] = rid
                pix = []
                while stack:
                    r, c = stack.pop()
                    pix.append((r, c))
                    for dr, dc in nbrs:
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < h and 0 <= cc < w and lab[rr][cc] == -1 and a[rr][cc] == v:
                            lab[rr][cc] = rid
                            stack.append((rr, cc))
                regions[rid] = pix
        return lab, regions

    rows = []
    for conn in (4, 8):
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if conn == 8:
            nbrs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for name, h, w, _gsd in _DEM_SPECS:
            q32 = np.floor(
                _dem_surface(name, h, w).astype(np.float64) / _POLY_STEPS[name]
            ).astype(np.float32)
            a = [row[:] for row in q32.tolist()]
            orig = [row[:] for row in a]
            _, reg0 = label(a, h, w, nbrs)
            n_before = len(reg0)
            while True:
                lab, regions = label(a, h, w, nbrs)
                n_after = len(regions)
                if n_after <= 1:
                    break
                small = [rid for rid, pix in regions.items() if len(pix) < THRESHOLD]
                if not small:
                    break
                vals = {rid: a[rid // w][rid % w] for rid in regions}
                repaint = {}
                for rid in small:
                    best = None
                    for r, c in regions[rid]:
                        for dr, dc in nbrs:
                            rr, cc = r + dr, c + dc
                            if 0 <= rr < h and 0 <= cc < w and lab[rr][cc] != rid:
                                nbr = lab[rr][cc]
                                key = (len(regions[nbr]), -nbr)
                                if best is None or key > best[0]:
                                    best = (key, nbr)
                    if best is not None:
                        repaint[rid] = vals[best[1]]
                for rid, v in repaint.items():
                    for r, c in regions[rid]:
                        a[r][c] = v
            changed = sum(
                1 for r in range(h) for c in range(w) if a[r][c] != orig[r][c]
            )
            out32 = np.array(a, np.float32)
            rows.append(
                [name, n_before, n_after, changed,
                 hashlib.md5(out32.tobytes()).hexdigest(), conn]
            )
    save(
        "sieve",
        ["image_id", "n_regions_before", "n_regions_after", "n_changed", "out_md5", "conn"],
        ["str", "int64", "int64", "int64", "str", "int32"],
        rows,
    )


def g_rasterize():
    # FULLY INDEPENDENT: scalar crossing-number PIP (the g_zonal_stats
    # algorithm family) + minitiler's scalar mercator; the engine uses
    # the vectorized scanline fill. Burn order: ascending poly_id,
    # later overwrites — recomputed here pixel by pixel.
    import hashlib

    from oracle.minitiler import merc
    from tilers_tools_spark.plans.queries import _BURN_VALUES, _RAST_GRID, _ZONE_RINGS

    def pip(pts, x, y):
        inside = False
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if xint > x:
                    inside = not inside
        return inside

    zones = sorted(
        (pid, [merc(lon, lat) for lon, lat in ring]) for pid, ring in _ZONE_RINGS.items()
    )
    w, h, gsd = _RAST_GRID["w"], _RAST_GRID["h"], _RAST_GRID["gsd"]
    mx0, my1 = _RAST_GRID["mx0"], _RAST_GRID["my1"]
    n_bands = 4
    band_h = (h + n_bands - 1) // n_bands
    rows = []
    for band in range(n_bands):
        y0 = band * band_h
        bh = min(band_h, h - y0)
        if bh <= 0:
            continue
        g = [[0.0] * w for _ in range(bh)]
        owner = [["__bg__"] * w for _ in range(bh)]
        for rr in range(bh):
            my = my1 - (y0 + rr + 0.5) * gsd
            for cc in range(w):
                mx = mx0 + (cc + 0.5) * gsd
                for pid, pts in zones:  # ascending id; later overwrites
                    if pip(pts, mx, my):
                        g[rr][cc] = _BURN_VALUES[pid]
                        owner[rr][cc] = pid
        md5 = hashlib.md5(np.array(g, np.float32).tobytes()).hexdigest()
        counts: dict[str, int] = {}
        for rr in range(bh):
            for cc in range(w):
                counts[owner[rr][cc]] = counts.get(owner[rr][cc], 0) + 1
        for pid in sorted(counts):
            rows.append(
                [band, y0, bh, pid, _BURN_VALUES.get(pid, 0.0), counts[pid], md5]
            )
    save(
        "rasterize",
        ["band", "y0", "band_h", "poly_id", "burn_value", "n_pixels", "band_md5"],
        ["int32", "int32", "int32", "str", "float64", "int64", "str"],
        rows,
    )


def g_grid_idw():
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel IDW loop (sequential
    # accumulation in sorted-point order) vs the engine's vectorized
    # broadcast fold; the shared 1e-3 quantization absorbs ULP-order
    # summation differences, making the md5 contract integer-exact.
    import hashlib

    from tilers_tools_spark.plans.queries import _RAST_GRID, _idw_points

    pts = sorted((x, y, z) for _i, x, y, z in _idw_points())
    w, h, gsd = _RAST_GRID["w"], _RAST_GRID["h"], _RAST_GRID["gsd"]
    mx0, my1 = _RAST_GRID["mx0"], _RAST_GRID["my1"]
    power = 2
    quant = 1e-3
    n_bands = 4
    band_h = (h + n_bands - 1) // n_bands
    rows = []
    for band in range(n_bands):
        y0 = band * band_h
        bh = min(band_h, h - y0)
        if bh <= 0:
            continue
        q = []
        for rr in range(bh):
            my = (my1 - y0 * gsd) - (rr + 0.5) * gsd
            for cc in range(w):
                mx = mx0 + (cc + 0.5) * gsd
                num = den = 0.0
                val = None
                for x, y, z in pts:
                    d2 = (mx - x) ** 2 + (my - y) ** 2
                    if d2 < 1e-12:
                        val = z  # first hit in sorted-point order
                        break
                    wgt = 1.0 / d2 ** (power / 2)
                    num += wgt * z
                    den += wgt
                q.append(float(np.round((val if val is not None else num / den) / quant)))
        qa = np.array(q, np.int64)
        rows.append(
            [
                band, y0, bh, int(qa.size), int(qa.sum()), int(qa.min()),
                int(qa.max()), hashlib.md5(qa.tobytes()).hexdigest(),
            ]
        )
    save(
        "grid_idw",
        ["band", "y0", "band_h", "n_cells", "q_sum", "q_min", "q_max", "band_md5"],
        ["int32", "int32", "int32", "int64", "int64", "int64", "int64", "str"],
        rows,
    )


def g_raster_xyz(stride=2, quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel loops over the
    # recomputed analytic surfaces + hole masks; same georef arithmetic
    # (identical float64 expressions -> identical doubles), no TIFF.
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for name, h, w, gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w)
        mask = np.asarray(_fillnodata_mask(name, h, w))
        mx0, my1 = 0.0, 1.0e5
        for r in range(0, h, stride):
            for c in range(0, w, stride):
                if mask[r, c]:
                    continue
                rows.append(
                    [
                        name, r, c,
                        float(np.round((mx0 + (c + 0.5) * gsd) / 1e-3) * 1e-3),
                        float(np.round((my1 - (r + 0.5) * gsd) / 1e-3) * 1e-3),
                        int(np.round(float(np.float64(a[r, c])) / quant)),
                    ]
                )
    save(
        "raster_xyz",
        ["image_id", "row", "col", "mx", "my", "q_value"],
        ["str", "int32", "int32", "float64", "float64", "int64"],
        rows,
    )


def g_warp4326(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-destination-pixel replay
    # of the documented 4326->3857 mapping (math.* transcendentals —
    # identical libm calls to the engine's per-row scalar loop — then
    # plain python bilinear/nearest), over the recomputed analytic
    # lon/lat surfaces. No NumPy grids, no TIFF bytes.
    import hashlib
    import math

    from tilers_tools_spark.plans.queries import (
        _WARP4326_SPECS,
        _fillnodata_mask,
        _warp4326_surface,
    )

    SENT = -(2**60)
    R = 6378137.0
    rows = []
    for resample in ("bilinear", "nearest"):
        for name, lon0, lat1, gsd, h, w in _WARP4326_SPECS:
            surf = _warp4326_surface(name, h, w)
            mask = np.asarray(_fillnodata_mask("plane", h, w)) if name == "alps" else np.zeros((h, w), bool)
            a = [
                [
                    float("nan") if mask[r, c] else float(np.float64(surf[r, c]))
                    for c in range(w)
                ]
                for r in range(h)
            ]
            lon1 = lon0 + w * gsd
            lat0 = lat1 - h * gsd
            out_gsd = R * math.radians(gsd)
            x0 = R * math.radians(lon0)
            x1 = R * math.radians(lon1)
            y1 = R * math.log(math.tan(math.pi / 4.0 + math.radians(lat1) / 2.0))
            y0 = R * math.log(math.tan(math.pi / 4.0 + math.radians(lat0) / 2.0))
            out_w = max(1, int(math.ceil((x1 - x0) / out_gsd - 1e-9)))
            out_h = max(1, int(math.ceil((y1 - y0) / out_gsd - 1e-9)))
            q = np.empty((out_h, out_w), np.int64)
            n_nan = 0
            vals = []
            for rr in range(out_h):
                lat = math.degrees(
                    2.0 * math.atan(math.exp((y1 - (rr + 0.5) * out_gsd) / R)) - math.pi / 2.0
                )
                sy = (lat1 - lat) / gsd
                for cc in range(out_w):
                    sx = (math.degrees((x0 + (cc + 0.5) * out_gsd) / R) - lon0) / gsd
                    if resample == "nearest":
                        ri = min(max(math.floor(sy), 0), h - 1)
                        ci = min(max(math.floor(sx), 0), w - 1)
                        v = a[ri][ci]
                    else:
                        uu, vv = sx - 0.5, sy - 0.5
                        c0, r0 = math.floor(uu), math.floor(vv)
                        fc, fr = uu - c0, vv - r0
                        c0c = min(max(c0, 0), w - 1)
                        c1c = min(max(c0 + 1, 0), w - 1)
                        r0c = min(max(r0, 0), h - 1)
                        r1c = min(max(r0 + 1, 0), h - 1)
                        top = a[r0c][c0c] * (1.0 - fc) + a[r0c][c1c] * fc
                        bot = a[r1c][c0c] * (1.0 - fc) + a[r1c][c1c] * fc
                        v = top * (1.0 - fr) + bot * fr
                    if math.isnan(v) or math.isinf(v):
                        q[rr, cc] = SENT
                        n_nan += 1
                    else:
                        qv = int(np.round(v / quant))
                        q[rr, cc] = qv
                        vals.append(qv)
            rows.append(
                [
                    name, out_w, out_h,
                    float(np.round(x0 / 1e-3) * 1e-3),
                    float(np.round(y1 / 1e-3) * 1e-3),
                    float(np.round(out_gsd / 1e-6) * 1e-6),
                    n_nan,
                    sum(vals) if vals else 0,
                    min(vals) if vals else 0,
                    max(vals) if vals else 0,
                    hashlib.md5(q.tobytes()).hexdigest(),
                    resample,
                ]
            )
    save(
        "warp_4326",
        ["image_id", "out_w", "out_h", "mx0", "my1", "out_gsd",
         "n_nan", "q_sum", "q_min", "q_max", "grid_md5", "variant"],
        ["str", "int32", "int32", "float64", "float64", "float64",
         "int64", "int64", "int64", "int64", "str", "str"],
        rows,
    )


def g_contour_bands():
    # FULLY INDEPENDENT: recompute the float32 analytic surfaces (with
    # the wave nodata holes), classify each cell with a SCALAR count of
    # levels <= v (NaN -> band -1), and relabel with the scalar BFS
    # flood fill — a different algorithm family than the engine's
    # runs-based union-find. 4-edge perimeter recomputed per pixel.
    from tilers_tools_spark.plans.queries import (
        _CONTOUR_LEVELS,
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        surf = _dem_surface(name, h, w).astype(np.float32)
        if name == "wave":
            surf[np.asarray(_fillnodata_mask("wave", h, w))] = np.nan
        band = [[-1] * w for _ in range(h)]
        for r in range(h):
            for c in range(w):
                v = float(surf[r, c])
                if v == v:  # finite (fixture has no inf)
                    band[r][c] = sum(1 for lv in _CONTOUR_LEVELS if lv <= v)
        seen = [[False] * w for _ in range(h)]
        for r0 in range(h):
            for c0 in range(w):
                if seen[r0][c0]:
                    continue
                v = band[r0][c0]
                stack = [(r0, c0)]
                seen[r0][c0] = True
                pix = []
                while stack:
                    r, c = stack.pop()
                    pix.append((r, c))
                    for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                        if 0 <= rr < h and 0 <= cc < w and not seen[rr][cc] and band[rr][cc] == v:
                            seen[rr][cc] = True
                            stack.append((rr, cc))
                perim = 0
                for r, c in pix:
                    for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                        if not (0 <= rr < h and 0 <= cc < w) or band[rr][cc] != v:
                            perim += 1
                rows.append(
                    [
                        name, r0 * w + c0, v, len(pix),
                        min(r for r, _ in pix), min(c for _, c in pix),
                        max(r for r, _ in pix), max(c for _, c in pix),
                        perim,
                    ]
                )
    save(
        "contour_bands",
        ["image_id", "region_id", "band", "n_pixels", "min_row", "min_col",
         "max_row", "max_col", "perimeter"],
        ["str", "int64", "int64", "int64", "int64", "int64", "int64", "int64", "int64"],
        rows,
    )


def g_cog_validate():
    # FULLY INDEPENDENT: the expected booleans are derived BY HAND from
    # each fixture's documented construction (tiled-16? overviews
    # present vs the 512 threshold? strictly-decreasing chain?
    # smallest-data-first layout?) — no bytes are parsed here.
    rows = [
        # id, w, h, n_ov, tiled_ok, overviews_ok, decreasing_ok,
        # data_order_cog, cog_ok
        ["cogok", 36, 40, 2, True, True, True, True, True],
        ["mainfirst", 36, 40, 2, True, True, True, False, False],
        ["strip", 36, 40, 0, False, True, True, True, False],
        ["big_noov", 600, 24, 0, True, False, True, True, False],
        ["badtile", 36, 40, 0, False, True, True, True, False],
        ["junk", -1, -1, 0, False, False, False, False, False],
    ]
    save(
        "cog_validate",
        ["image_id", "w", "h", "n_overviews", "tiled_ok", "overviews_ok",
         "decreasing_ok", "data_order_cog", "cog_ok"],
        ["str", "int32", "int32", "int32", "bool", "bool", "bool", "bool", "bool"],
        rows,
    )


def g_overviews_addo():
    # FULLY INDEPENDENT: the analytic fixture surface is recomputed from
    # its formula (no TIFF bytes, no engine kernels) and every overview
    # level is built with SCALAR integer loops — round-half-up mean as
    # (2s+n)//(2n), the documented no-floats contract. IFD 0 pins the
    # untouched base raster through the deflate roundtrip.
    import hashlib

    from tilers_tools_spark.plans.queries import _ADDO_SPECS, _addo_surface

    rows = []
    for name, w, h, bands in _ADDO_SPECS:
        base = np.asarray(_addo_surface(w, h, bands), np.int64)
        grids = [(0, base)]
        for k, level in ((1, 2), (2, 4)):
            oh, ow = (h + level - 1) // level, (w + level - 1) // level
            if bands == 1:
                ov = np.empty((oh, ow), np.int64)
            else:
                ov = np.empty((oh, ow, bands), np.int64)
            for rr in range(oh):
                for cc in range(ow):
                    blk = base[
                        rr * level : min((rr + 1) * level, h),
                        cc * level : min((cc + 1) * level, w),
                    ]
                    if bands == 1:
                        s = int(blk.sum())
                        n = blk.size
                        ov[rr, cc] = (2 * s + n) // (2 * n)
                    else:
                        n = blk.shape[0] * blk.shape[1]
                        for bb in range(bands):
                            s = int(blk[:, :, bb].sum())
                            ov[rr, cc, bb] = (2 * s + n) // (2 * n)
            grids.append((k, ov))
        for k, g in grids:
            u8 = g.astype(np.uint8)
            rows.append(
                [
                    name, k, int(u8.shape[1]), int(u8.shape[0]),
                    int(u8.astype(np.int64).sum()),
                    hashlib.md5(np.ascontiguousarray(u8).tobytes()).hexdigest(),
                ]
            )
    save(
        "overviews_addo",
        ["image_id", "ifd", "w", "h", "px_sum", "grid_md5"],
        ["str", "int32", "int32", "int32", "int64", "str"],
        rows,
    )


def g_warputm(quant=1e-3):
    # Sampling / quantize / aggregate replayed with scalar python loops
    # (independent of the engine's vectorized _sample_grid). The dest
    # grid geometry + continuous source coords come from the SHARED
    # utm_dest_grid helper — by-construction bit-identity for the
    # transverse-Mercator transcendentals, whose independence is
    # anchored by tests/test_utm.py (closed-form anchors + an
    # independently coded Snyder-series cross-check to < 1 mm). Scalar
    # +-*/ replay of the bilinear stencil is exact (IEEE ops round
    # identically scalar vs vector).
    import hashlib
    import math

    from tilers_tools_spark.operators.translate import utm_dest_grid
    from tilers_tools_spark.plans.queries import (
        _WARPUTM_SPECS,
        _fillnodata_mask,
        _warp4326_surface,
    )

    SENT = -(2**60)
    rows = []
    for resample in ("bilinear", "nearest"):
        for name, epsg, e0, n1, gsd, h, w in _WARPUTM_SPECS:
            surf = _warp4326_surface(name if name == "alps" else "fjord", h, w)
            mask = (
                np.asarray(_fillnodata_mask("plane", h, w))
                if name == "oslo"
                else np.zeros((h, w), bool)
            )
            a = [
                [
                    float("nan") if mask[r, c] else float(surf[r, c])
                    for c in range(w)
                ]
                for r in range(h)
            ]
            g = utm_dest_grid(h, w, e0, n1, gsd, epsg)
            out_w, out_h = g["out_w"], g["out_h"]
            q = np.empty((out_h, out_w), np.int64)
            n_nan = 0
            vals = []
            for rr in range(out_h):
                for cc in range(out_w):
                    sx = float(g["sx"][rr, cc])
                    sy = float(g["sy"][rr, cc])
                    if resample == "nearest":
                        ri = min(max(math.floor(sy), 0), h - 1)
                        ci = min(max(math.floor(sx), 0), w - 1)
                        v = a[ri][ci]
                    else:
                        uu, vv = sx - 0.5, sy - 0.5
                        c0, r0 = math.floor(uu), math.floor(vv)
                        fc, fr = uu - c0, vv - r0
                        c0c = min(max(c0, 0), w - 1)
                        c1c = min(max(c0 + 1, 0), w - 1)
                        r0c = min(max(r0, 0), h - 1)
                        r1c = min(max(r0 + 1, 0), h - 1)
                        top = a[r0c][c0c] * (1.0 - fc) + a[r0c][c1c] * fc
                        bot = a[r1c][c0c] * (1.0 - fc) + a[r1c][c1c] * fc
                        v = top * (1.0 - fr) + bot * fr
                    if math.isnan(v) or math.isinf(v):
                        q[rr, cc] = SENT
                        n_nan += 1
                    else:
                        qv = int(np.round(v / quant))
                        q[rr, cc] = qv
                        vals.append(qv)
            rows.append(
                [
                    name, out_w, out_h,
                    float(np.round(g["x0"] / 1e-3) * 1e-3),
                    float(np.round(g["y1"] / 1e-3) * 1e-3),
                    float(np.round(g["out_gsd"] / 1e-6) * 1e-6),
                    n_nan,
                    sum(vals) if vals else 0,
                    min(vals) if vals else 0,
                    max(vals) if vals else 0,
                    hashlib.md5(q.tobytes()).hexdigest(),
                    resample,
                ]
            )
    save(
        "warp_utm",
        ["image_id", "out_w", "out_h", "mx0", "my1", "out_gsd",
         "n_nan", "q_sum", "q_min", "q_max", "grid_md5", "variant"],
        ["str", "int32", "int32", "float64", "float64", "float64",
         "int64", "int64", "int64", "int64", "str", "str"],
        rows,
    )


def g_raster_translate(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-destination-pixel replay
    # of the documented crop/resize/rescale mapping formulas (python
    # floats, math.floor, explicit NaN short-circuit for the clamp) —
    # no NumPy grids, no TIFF bytes.
    import hashlib
    import math

    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _TRANSLATE_VARIANTS,
        _dem_surface,
        _fillnodata_mask,
    )

    SENT = -(2**60)
    rows = []
    for variant, srcwin, outsize, resample, scale in _TRANSLATE_VARIANTS:
        for name, H, W, _gsd in _DEM_SPECS:
            surf = _dem_surface(name, H, W)
            mask = np.asarray(_fillnodata_mask(name, H, W))
            a = [
                [
                    float("nan") if mask[r, c] else float(np.float64(surf[r, c]))
                    for c in range(W)
                ]
                for r in range(H)
            ]
            h, w = H, W
            if srcwin is not None:
                xoff, yoff, xsize, ysize = srcwin
                a = [row[xoff : xoff + xsize] for row in a[yoff : yoff + ysize]]
                h, w = ysize, xsize
            if outsize is not None:
                out_w, out_h = outsize
                b = []
                for yd in range(out_h):
                    ys = (yd + 0.5) * h / out_h
                    rowv = []
                    for xd in range(out_w):
                        xs = (xd + 0.5) * w / out_w
                        if resample == "nearest":
                            ri = min(h - 1, math.floor(ys))
                            ci = min(w - 1, math.floor(xs))
                            rowv.append(a[ri][ci])
                        else:  # bilinear
                            uu, vv = xs - 0.5, ys - 0.5
                            c0, r0 = math.floor(uu), math.floor(vv)
                            fc, fr = uu - c0, vv - r0
                            c0c = min(max(c0, 0), w - 1)
                            c1c = min(max(c0 + 1, 0), w - 1)
                            r0c = min(max(r0, 0), h - 1)
                            r1c = min(max(r0 + 1, 0), h - 1)
                            top = a[r0c][c0c] * (1.0 - fc) + a[r0c][c1c] * fc
                            bot = a[r1c][c0c] * (1.0 - fc) + a[r1c][c1c] * fc
                            rowv.append(top * (1.0 - fr) + bot * fr)
                    b.append(rowv)
                a, h, w = b, out_h, out_w
            if scale is not None:
                smin, smax, dmin, dmax = scale
                factor = (dmax - dmin) / (smax - smin)
                lo, hi = (dmin, dmax) if dmax >= dmin else (dmax, dmin)
                a = [
                    [
                        v if math.isnan(v) else min(max(dmin + (v - smin) * factor, lo), hi)
                        for v in row
                    ]
                    for row in a
                ]
            q = np.empty((h, w), np.int64)
            n_nan = 0
            vals = []
            for r in range(h):
                for c in range(w):
                    v = a[r][c]
                    if math.isnan(v) or math.isinf(v):
                        q[r, c] = SENT
                        n_nan += 1
                    else:
                        qv = int(np.round(v / quant))
                        q[r, c] = qv
                        vals.append(qv)
            rows.append(
                [
                    name, w, h, n_nan,
                    sum(vals) if vals else 0,
                    min(vals) if vals else 0,
                    max(vals) if vals else 0,
                    hashlib.md5(q.tobytes()).hexdigest(),
                    variant,
                ]
            )
    save(
        "raster_translate",
        ["image_id", "out_w", "out_h", "n_nan", "q_sum", "q_min", "q_max", "grid_md5", "variant"],
        ["str", "int32", "int32", "int64", "int64", "int64", "int64", "str", "str"],
        rows,
    )


def g_nearblack(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar deque BFS flood from the
    # border (python floats, explicit 4-neighbor queue, set-of-tuples
    # collar) — no iterative NumPy dilation, no masks, no TIFF bytes.
    # The fixture surface spec (_nearblack_surface) is shared; the
    # ALGORITHM under test (border-connected near-target collar) is
    # replayed independently.
    import hashlib
    from collections import deque

    from tilers_tools_spark.plans.queries import _DEM_SPECS, _nearblack_surface

    SENT = -(2**60)
    target, tol = 0.0, 2.0
    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        a32 = _nearblack_surface(name, h, w).astype(np.float32)
        a = [[float(np.float64(a32[r, c])) for c in range(w)] for r in range(h)]

        def near(v):
            return math.isnan(v) or abs(v - target) <= tol

        collar = set()
        dq = deque()
        for r in range(h):
            for c in (0, w - 1):
                if near(a[r][c]) and (r, c) not in collar:
                    collar.add((r, c))
                    dq.append((r, c))
        for c in range(w):
            for r in (0, h - 1):
                if near(a[r][c]) and (r, c) not in collar:
                    collar.add((r, c))
                    dq.append((r, c))
        while dq:
            r, c = dq.popleft()
            for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                if 0 <= rr < h and 0 <= cc < w and (rr, cc) not in collar and near(a[rr][cc]):
                    collar.add((rr, cc))
                    dq.append((rr, cc))
        q = np.empty((h, w), np.int64)
        n_kept = 0
        q_sum = 0
        for r in range(h):
            for c in range(w):
                v = a[r][c]
                if (r, c) in collar or math.isnan(v):
                    q[r, c] = SENT
                else:
                    qv = int(np.round(v / quant))
                    q[r, c] = qv
                    n_kept += 1
                    q_sum += qv
        rows.append(
            [name, len(collar), n_kept, q_sum, hashlib.md5(q.tobytes()).hexdigest()]
        )
    save(
        "nearblack",
        ["image_id", "n_collar", "n_kept", "q_sum", "grid_md5"],
        ["str", "int64", "int64", "int64", "str"],
        rows,
    )


_INFO_SPEC = [
    # (name, h, w, gsd, mx0, bands, bits, sfmt, comp, org, n_ov, epsg)
    # — scalar restatement of queries._info_fixture_rows's fixture SPEC
    ("plane", 24, 40, 2.0, 1000.0, 1, 32, 3, "deflate", "tiled", 1, 3857),
    ("wave", 32, 28, 5.0, 2000.0, 1, 32, 3, "none", "strip", 0, 4326),
    ("flat", 16, 16, 1.0, 3000.0, 3, 8, 1, "deflate", "strip", 0, 3857),
]
_INFO_MY1 = 2.0e5


def g_raster_info():
    # Fixture-spec restatement + scalar corner arithmetic: the gate pins
    # that the tags-only parse reports exactly what the writer was asked
    # to write (a decode-path regression gate like geotiff_tiled_decode).
    rows = []
    for name, h, w, gsd, mx0, bands, bits, sfmt, comp, org, n_ov, epsg in _INFO_SPEC:
        rows.append(
            [name, w, h, bands, bits, sfmt, comp, org, n_ov,
             gsd, mx0, _INFO_MY1, mx0 + w * gsd, _INFO_MY1 - h * gsd, epsg]
        )
    save(
        "raster_info",
        ["image_id", "width", "height", "bands", "bits", "sample_format",
         "compression", "organization", "n_overviews",
         "gsd", "mx0", "my1", "mx1", "my0", "epsg"],
        ["str", "int32", "int32", "int32", "int32", "int32", "str", "str",
         "int32", "float64", "float64", "float64", "float64", "float64", "int32"],
        rows,
    )


def g_raster_tindex():
    # Scalar corner arithmetic + the same fixed-3-decimal WKT contract.
    rows = []
    for name, h, w, gsd, mx0, *_rest in _INFO_SPEC:
        x0, y1 = mx0, _INFO_MY1
        x1, y0 = mx0 + w * gsd, _INFO_MY1 - h * gsd
        wkt = (
            f"POLYGON (({x0:.3f} {y0:.3f}, {x1:.3f} {y0:.3f}, "
            f"{x1:.3f} {y1:.3f}, {x0:.3f} {y1:.3f}, {x0:.3f} {y0:.3f}))"
        )
        rows.append([name, x0, y0, x1, y1, wkt])
    save(
        "raster_tindex",
        ["image_id", "mx0", "my0", "mx1", "my1", "wkt"],
        ["str", "float64", "float64", "float64", "float64", "str"],
        rows,
    )


def g_raster_compare(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel quantized diff
    # (python floats through explicit np.float32 casts matching the
    # fixture encode, NaN -> sentinel, abs-diff accumulation in python
    # ints) — no engine code, no TIFF bytes.
    from tilers_tools_spark.plans.queries import _DEM_SPECS, _dem_surface

    SENT = -(2**60)

    def q(v):
        v = float(np.float64(np.float32(v)))
        return SENT if (math.isnan(v) or math.isinf(v)) else int(np.round(v / quant))

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        surf = _dem_surface(name, h, w).astype(np.float64)
        if name == "plane":
            rows.append([name, False, -1, -1, -1, -1])  # golden-only id
            continue
        if name == "flat":
            rows.append([name, True, h * w, 0, 0, 0])  # byte-identical
            continue
        # wave: (3,4) += 5.0 ; (10,11) -> NaN
        n_diff = 0
        max_d = 0
        sum_d = 0
        for r in range(h):
            for c in range(w):
                va = q(surf[r, c])
                if (r, c) == (3, 4):
                    vb = q(surf[r, c] + 5.0)
                elif (r, c) == (10, 11):
                    vb = SENT
                else:
                    vb = va
                if va != vb:
                    n_diff += 1
                    d = abs(va - vb)
                    max_d = max(max_d, d)
                    sum_d += d
        rows.append([name, False, h * w, n_diff, max_d, sum_d])
    rows.append(["extra", False, -1, -1, -1, -1])  # new-only id
    save(
        "raster_compare",
        ["image_id", "identical", "n_px", "n_diff", "max_qdiff", "sum_qdiff"],
        ["bool" if c == "identical" else ("str" if c == "image_id" else "int64")
         for c in ["image_id", "identical", "n_px", "n_diff", "max_qdiff", "sum_qdiff"]],
        rows,
    )


def g_georef_edit(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: the shifted anchor is scalar
    # arithmetic; the pixel digest is recomputed from the ANALYTIC
    # surfaces (float32 casts matching the fixture encode; uint8 RGB for
    # 'flat') — the golden never sees TIFF bytes, so the gate pins both
    # "splice moved the anchor" and "splice left every pixel alone".
    from tilers_tools_spark.plans.queries import _dem_surface

    SENT = -(2**60)
    dx, dy = 1234.5, -789.25
    rows = []
    for name, h, w, gsd, mx0, bands, _bits, _sf, _c, _o, _n, _e in _INFO_SPEC:
        if name == "flat":
            q = np.empty((h, w, 3), np.int64)
            for r in range(h):
                for c in range(w):
                    for k, v in enumerate((10, 120, 250)):
                        q[r, c, k] = int(np.round(float(v) / quant))
        else:
            surf = _dem_surface(name, h, w)
            q = np.empty((h, w), np.int64)
            for r in range(h):
                for c in range(w):
                    v = float(np.float64(np.float32(surf[r, c])))
                    q[r, c] = SENT if math.isnan(v) else int(np.round(v / quant))
        md5 = hashlib.md5(q.tobytes()).hexdigest()
        rows.append([name, gsd, mx0 + dx, _INFO_MY1 + dy, True, md5])
    save(
        "georef_edit",
        ["image_id", "gsd", "mx0", "my1", "pixels_unchanged", "grid_md5"],
        ["str", "float64", "float64", "float64", "bool", "str"],
        rows,
    )


def g_raster_retile(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar chunk-slicing replay (python
    # loops over explicit row/col ranges, per-cell NaN short-circuit,
    # scalar anchor arithmetic) — no NumPy slicing, no TIFF bytes.
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    SENT = -(2**60)
    TW, TH = 12, 10
    rows = []
    for name, H, W, gsd in _DEM_SPECS:
        surf = _dem_surface(name, H, W)
        mask = np.asarray(_fillnodata_mask(name, H, W))
        a = [
            [
                float("nan") if mask[r, c] else float(np.float64(surf[r, c]))
                for c in range(W)
            ]
            for r in range(H)
        ]
        for tr in range((H + TH - 1) // TH):
            for tc in range((W + TW - 1) // TW):
                r0, r1 = tr * TH, min((tr + 1) * TH, H)
                c0, c1 = tc * TW, min((tc + 1) * TW, W)
                q = np.empty((r1 - r0, c1 - c0), np.int64)
                n_nan = 0
                q_sum = 0
                for r in range(r0, r1):
                    for c in range(c0, c1):
                        v = a[r][c]
                        if math.isnan(v) or math.isinf(v):
                            q[r - r0, c - c0] = SENT
                            n_nan += 1
                        else:
                            qv = int(np.round(v / quant))
                            q[r - r0, c - c0] = qv
                            q_sum += qv
                rows.append(
                    [name, tr, tc, c1 - c0, r1 - r0,
                     0.0 + tc * TW * gsd, 1.0e5 - tr * TH * gsd,
                     n_nan, q_sum, hashlib.md5(q.tobytes()).hexdigest()]
                )
    save(
        "raster_retile",
        ["image_id", "tile_row", "tile_col", "w", "h", "mx0", "my1",
         "n_nan", "q_sum", "grid_md5"],
        ["str", "int32", "int32", "int32", "int32", "float64", "float64",
         "int64", "int64", "str"],
        rows,
    )


def g_pct2rgb():
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel palette/index
    # FORMULA replay (python ints, set for distinct colors, md5 over
    # bytes assembled row-major) — no codec, no NumPy grids; the gate
    # therefore spans the engine's full paletted-PNG encode -> decode ->
    # LUT-expand path end-to-end.
    from tilers_tools_spark.plans.queries import _PCT_SPECS

    rows = []
    for name, h, w, k in _PCT_SPECS:
        buf = bytearray()
        seen = set()
        rs = gs = bs = 0
        for r in range(h):
            for c in range(w):
                i = (r * 7 + c * 3 + r * c) % k
                rr, gg, bb = (37 * i + 11) % 256, (255 - 13 * i) % 256, (i * i + 7) % 256
                buf += bytes((rr, gg, bb))
                seen.add((rr, gg, bb))
                rs += rr
                gs += gg
                bs += bb
        rows.append(
            [name, w, h, len(seen), hashlib.md5(bytes(buf)).hexdigest(), rs, gs, bs]
        )
    save(
        "pct2rgb",
        ["image_id", "w", "h", "n_colors", "rgb_md5", "r_sum", "g_sum", "b_sum"],
        ["str", "int32", "int32", "int32", "str", "int64", "int64", "int64"],
        rows,
    )


def g_pansharpen(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel Brovey replay
    # (python floats, nearest upsample via integer //2 indexing, same
    # fixed accumulation order w0*b0 + w1*b1 + w2*b2) — no NumPy
    # elementwise ops, no TIFF bytes.
    import hashlib

    from tilers_tools_spark.plans.queries import _pan_fixture

    SENT = -(2**60)
    W = (1.0 / 3, 1.0 / 3, 1.0 / 3)
    rows = []
    for scene in ("s1", "s2"):
        pan, ms = _pan_fixture(scene)
        H, Wd = pan.shape
        wsum = 0.0
        for wi in W:
            wsum = wsum + wi
        for b in range(3):
            q = np.empty((H, Wd), np.int64)
            n_nan = 0
            vals = []
            for r in range(H):
                for c in range(Wd):
                    bands = [float(np.float64(ms[r // 2, c // 2, i])) for i in range(3)]
                    s = 0.0
                    for wi, bi in zip(W, bands):
                        s = s + wi * bi
                    pseudo = s / wsum
                    if pseudo == 0.0:
                        q[r, c] = SENT
                        n_nan += 1
                        continue
                    ratio = float(np.float64(pan[r, c])) / pseudo
                    v = bands[b] * ratio
                    qv = int(np.round(v / quant))
                    q[r, c] = qv
                    vals.append(qv)
            rows.append(
                [
                    scene, b, H * Wd, n_nan,
                    sum(vals) if vals else 0,
                    min(vals) if vals else 0,
                    max(vals) if vals else 0,
                    hashlib.md5(q.tobytes()).hexdigest(),
                ]
            )
    save(
        "pansharpen",
        ["image_id", "band", "n_pixels", "n_nan", "q_sum", "q_min", "q_max", "band_md5"],
        ["str", "int32", "int64", "int64", "int64", "int64", "int64", "str"],
        rows,
    )


def g_viewshed():
    # INDEPENDENT ALGORITHM CODING: scalar per-target ray walk (python
    # loops, math.sqrt/math.floor, early-exit on a blocking sample) vs
    # the engine's masked per-step vectorized pass. Same documented
    # sampling rule and elementwise float64 formulas -> identical grids.
    import hashlib
    import math

    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _VIEWSHED_OBS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w).astype(np.float64)
        if name == "plane":
            a[np.asarray(_fillnodata_mask(name, h, w))] = np.nan
        r0, c0, oh = _VIEWSHED_OBS[name]
        z0 = float(a[r0, c0]) + oh
        vis = np.empty((h, w), np.uint8)
        for r in range(h):
            for c in range(w):
                zt = float(a[r, c])
                if math.isnan(zt):
                    vis[r, c] = 1
                    continue
                dr, dc = r - r0, c - c0
                K = max(abs(dr), abs(dc))
                if K == 0:
                    vis[r, c] = 255
                    continue
                st = (zt - z0) / math.sqrt(float(dr * dr + dc * dc))
                ok = True
                for k in range(1, K):
                    ri = math.floor(r0 + (k * dr) / K + 0.5)
                    ci = math.floor(c0 + (k * dc) / K + 0.5)
                    if (ri == r0 and ci == c0) or (ri == r and ci == c):
                        continue
                    zi = float(a[ri, ci])
                    if math.isnan(zi):
                        ok = False
                        break
                    d2 = (ri - r0) ** 2 + (ci - c0) ** 2
                    if not ((zi - z0) / math.sqrt(float(d2)) <= st):
                        ok = False
                        break
                vis[r, c] = 255 if ok else 0
        rows.append(
            [
                name, r0, c0,
                int((vis == 255).sum()),
                int((vis == 0).sum()),
                int((vis == 1).sum()),
                hashlib.md5(vis.tobytes()).hexdigest(),
            ]
        )
    save(
        "viewshed",
        ["image_id", "obs_row", "obs_col", "n_visible", "n_hidden", "n_nodata", "vis_md5"],
        ["str", "int32", "int32", "int64", "int64", "int64", "str"],
        rows,
    )


def g_mosaic(quant=1e-3, n_bands=4):
    # INDEPENDENT ALGORITHM CODING: one full-grid scalar placement pass
    # (python-loop pixel copies in seq order over the recomputed analytic
    # surfaces — no banding, no vectorized masking, no TIFF bytes), then
    # the grid is sliced into the engine's 4 bands for the summary rows.
    import hashlib

    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _MOSAIC_LAYOUT,
        _dem_surface,
        _fillnodata_mask,
    )

    SENT = -(2**60)
    gsd = 2.0
    dims = {n: (h, w) for n, h, w, _g in _DEM_SPECS}
    mx0 = min(ox for _n, ox, _oy in _MOSAIC_LAYOUT)
    my1 = max(oy for _n, _ox, oy in _MOSAIC_LAYOUT)
    mx1 = max(ox + dims[n][1] * gsd for n, ox, _oy in _MOSAIC_LAYOUT)
    my0 = min(oy - dims[n][0] * gsd for n, _ox, oy in _MOSAIC_LAYOUT)
    out_w = int(round((mx1 - mx0) / gsd))
    out_h = int(round((my1 - my0) / gsd))
    grid = [[None] * out_w for _ in range(out_h)]
    for name, ox, oy in _MOSAIC_LAYOUT:  # list order IS seq order
        h, w = dims[name]
        a = _dem_surface(name, h, w)
        mask = np.asarray(_fillnodata_mask(name, h, w))
        row0 = int(round((my1 - oy) / gsd))
        col0 = int(round((ox - mx0) / gsd))
        for r in range(h):
            for c in range(w):
                if not mask[r, c]:
                    grid[row0 + r][col0 + c] = float(np.float64(a[r, c]))
    band_h = (out_h + n_bands - 1) // n_bands
    rows = []
    for band in range(n_bands):
        y0 = band * band_h
        bh = min(band_h, out_h - y0)
        if bh <= 0:
            continue
        q = np.empty((bh, out_w), np.int64)
        vals = []
        for r in range(bh):
            for c in range(out_w):
                v = grid[y0 + r][c]
                if v is None:
                    q[r, c] = SENT
                else:
                    qv = int(np.round(v / quant))
                    q[r, c] = qv
                    vals.append(qv)
        n_r = sum(
            1
            for name, ox, oy in _MOSAIC_LAYOUT
            if int(round((my1 - oy) / gsd)) < y0 + bh
            and int(round((my1 - oy) / gsd)) + dims[name][0] > y0
        )
        rows.append(
            [
                band, y0, bh, out_w, out_h, n_r, len(vals),
                bh * out_w - len(vals),
                sum(vals) if vals else 0,
                min(vals) if vals else 0,
                max(vals) if vals else 0,
                hashlib.md5(q.tobytes()).hexdigest(),
            ]
        )
    save(
        "mosaic",
        ["band", "y0", "band_h", "out_w", "out_h", "n_rasters",
         "n_valid", "n_nodata", "q_sum", "q_min", "q_max", "band_md5"],
        ["int32", "int32", "int32", "int32", "int32", "int32",
         "int64", "int64", "int64", "int64", "int64", "str"],
        rows,
    )


def g_raster_calc(quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: the gate expression is transcribed
    # BY HAND into scalar Python (math.sqrt, branch-if, min) and applied
    # per pixel to the recomputed analytic surfaces — no ast machinery,
    # no NumPy elementwise ops, no TIFF bytes. NaN in any input band
    # short-circuits to the sentinel (every term of the expression
    # touches A or B, so engine-side NaN propagation reaches the total).
    import hashlib
    import math

    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _calc_surface_b,
        _dem_surface,
        _fillnodata_mask,
    )

    SENT = -(2**60)
    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w)
        b = _calc_surface_b(h, w)
        mask = np.asarray(_fillnodata_mask(name, h, w))
        q = np.empty((h, w), np.int64)
        n_nan = 0
        vals = []
        for r in range(h):
            for c in range(w):
                if mask[r, c]:
                    q[r, c] = SENT
                    n_nan += 1
                    continue
                A = float(np.float64(a[r, c]))
                B = float(np.float64(b[r, c]))
                t = (A - B) if A > 40 else (A + B)
                v = (
                    t * 0.5
                    + (A if A < B else B)
                    - abs(B - 50.0)
                    + math.sqrt(abs(B))
                    + (A * 0.1) ** 2.0
                )
                qv = int(np.round(v / quant))
                q[r, c] = qv
                vals.append(qv)
        rows.append(
            [
                name,
                h * w,
                n_nan,
                sum(vals),
                min(vals),
                max(vals),
                hashlib.md5(q.tobytes()).hexdigest(),
            ]
        )
    save(
        "raster_calc",
        ["image_id", "n_pixels", "n_nan", "q_sum", "q_min", "q_max", "grid_md5"],
        ["str", "int64", "int64", "int64", "int64", "int64", "str"],
        rows,
    )


def g_grid_stats(radius=6.0, quant=1e-3, n_bands=4):
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel loops — nearest via
    # a strict-< scan in sorted-point order (replaying argmin's
    # first-match tie rule), average via a left-to-right in-radius fold
    # (the half-unit fixture z's make all partial sums exact dyadic
    # float64s, so pairwise-vs-sequential order cannot diverge).
    import hashlib

    from tilers_tools_spark.plans.queries import _RAST_GRID, _idw_points

    SENT = -(2**60)
    pts = sorted((x, y, z) for _i, x, y, z in _idw_points())
    w, h, gsd = _RAST_GRID["w"], _RAST_GRID["h"], _RAST_GRID["gsd"]
    mx0, my1 = _RAST_GRID["mx0"], _RAST_GRID["my1"]
    band_h = (h + n_bands - 1) // n_bands
    import math

    rows = []
    for alg in ("average", "nearest", "minimum", "maximum", "range", "count",
                "average_distance"):
        for band in range(n_bands):
            y0 = band * band_h
            bh = min(band_h, h - y0)
            if bh <= 0:
                continue
            q = []
            n_empty = 0
            for rr in range(bh):
                my = (my1 - y0 * gsd) - (rr + 0.5) * gsd
                for cc in range(w):
                    mx = mx0 + (cc + 0.5) * gsd
                    if alg == "nearest":
                        best_d2 = None
                        best_z = None
                        for x, y, z in pts:
                            d2 = (mx - x) ** 2 + (my - y) ** 2
                            if best_d2 is None or d2 < best_d2:
                                best_d2, best_z = d2, z
                        q.append(int(np.round(best_z / quant)))
                    else:
                        # left-to-right in-radius fold in sorted-point
                        # order (replays the engine's point-loop fold;
                        # +, /, sqrt, min, max are exactly-rounded IEEE)
                        s = 0.0
                        cnt = 0
                        zmin = zmax = None
                        for x, y, z in pts:
                            d2 = (mx - x) ** 2 + (my - y) ** 2
                            if d2 <= radius * radius:
                                cnt += 1
                                if alg == "average_distance":
                                    s += math.sqrt(d2)
                                else:
                                    s += z
                                zmin = z if zmin is None else min(zmin, z)
                                zmax = z if zmax is None else max(zmax, z)
                        if cnt == 0:
                            q.append(SENT)
                            n_empty += 1
                        elif alg == "average" or alg == "average_distance":
                            q.append(int(np.round((s / cnt) / quant)))
                        elif alg == "minimum":
                            q.append(int(np.round(zmin / quant)))
                        elif alg == "maximum":
                            q.append(int(np.round(zmax / quant)))
                        elif alg == "range":
                            q.append(int(np.round((zmax - zmin) / quant)))
                        else:  # count
                            q.append(int(np.round(float(cnt) / quant)))
            qa = np.array(q, np.int64)
            nz = qa[qa != SENT]
            rows.append(
                [
                    alg, band, y0, bh, int(qa.size), n_empty,
                    int(nz.sum()) if nz.size else 0,
                    int(nz.min()) if nz.size else 0,
                    int(nz.max()) if nz.size else 0,
                    hashlib.md5(qa.tobytes()).hexdigest(),
                ]
            )
    save(
        "grid_stats",
        ["alg", "band", "y0", "band_h", "n_cells", "n_empty",
         "q_sum", "q_min", "q_max", "band_md5"],
        ["str", "int32", "int32", "int32", "int64", "int64",
         "int64", "int64", "int64", "str"],
        rows,
    )


def g_fillnodata(max_dist=4, quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar per-pixel 8-ray walk (no
    # shifted-mask sweeps, no vectorized adjacency, no TIFF bytes) on the
    # recomputed analytic surfaces + the shared hole-mask fixture spec.
    # Direction order matches fillnodata_np's docstring contract, so the
    # float64 accumulation (one first-hit term per ray) is bit-identical
    # by IEEE determinism; quantization to 1e-3 then pins the md5.
    import hashlib

    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    SENT = -(2**60)
    DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))
    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w).copy()
        mask = np.asarray(_fillnodata_mask(name, h, w))
        a[mask] = np.nan
        af = a.astype(np.float64)
        q = np.empty((h, w), np.int64)
        n_filled = 0
        q_sum = 0
        for r in range(h):
            for c in range(w):
                if not mask[r, c]:
                    q[r, c] = int(np.round(af[r, c] / quant))
                    continue
                num = 0.0
                den = 0.0
                for dy, dx in DIRS:
                    for step in range(1, max_dist + 1):
                        sr, sc = r - dy * step, c - dx * step
                        if not (0 <= sr < h and 0 <= sc < w):
                            continue  # ray clipped; farther steps also out
                        if mask[sr, sc]:
                            continue  # nodata does not block the ray
                        num = num + 1.0 / ((dy * dy + dx * dx) * step * step) * af[sr, sc]
                        den = den + 1.0 / ((dy * dy + dx * dx) * step * step)
                        break  # first valid pixel along this ray only
                if den > 0.0:
                    qv = int(np.round((num / den) / quant))
                    q[r, c] = qv
                    n_filled += 1
                    q_sum += qv
                else:
                    q[r, c] = SENT
        n_nodata = int(mask.sum())
        rows.append(
            [
                name,
                n_nodata,
                n_filled,
                n_nodata - n_filled,
                q_sum,
                hashlib.md5(q.tobytes()).hexdigest(),
            ]
        )
    save(
        "fillnodata",
        ["image_id", "n_nodata", "n_filled", "n_unfilled", "q_sum", "grid_md5"],
        ["str", "int64", "int64", "int64", "int64", "str"],
        rows,
    )


def g_raster_stats(n_bins=16, quant=1e-3):
    # INDEPENDENT ALGORITHM CODING: scalar Python loops over the
    # recomputed analytic surfaces — min/max/sum/sumsq accumulated as
    # Python ints over int(np.round(v/quant)) per pixel, bucket counts
    # via a plain dict, no NumPy reductions, no bincount, no TIFF bytes.
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    specs = [(name, h, w) for name, h, w, _g in _DEM_SPECS] + [("empty", 8, 8)]
    for name, h, w in specs:
        if name == "empty":
            vals = []
            n_nodata = h * w
        else:
            a = _dem_surface(name, h, w)
            mask = np.asarray(_fillnodata_mask(name, h, w))
            vals = [
                int(np.round(float(np.float64(a[r, c])) / quant))
                for r in range(h)
                for c in range(w)
                if not mask[r, c]
            ]
            n_nodata = int(mask.sum())
        if not vals:
            rows.append([name, w, h, 0, n_nodata, 0, 0, 0, 0, -1, 0])
            continue
        qmin = qmax = vals[0]
        qsum = qsumsq = 0
        counts: dict[int, int] = {}
        for v in vals:
            qmin = v if v < qmin else qmin
            qmax = v if v > qmax else qmax
            qsum += v
            qsumsq += v * v
        span = qmax - qmin + 1
        for v in vals:
            b = (v - qmin) * n_bins // span
            counts[b] = counts.get(b, 0) + 1
        for b in range(n_bins):
            rows.append(
                [name, w, h, len(vals), n_nodata, qmin, qmax, qsum, qsumsq, b, counts.get(b, 0)]
            )
    save(
        "raster_stats",
        [
            "image_id", "w", "h", "n_valid", "n_nodata", "q_min", "q_max",
            "q_sum", "q_sumsq", "bucket", "bucket_count",
        ],
        ["str", "int32", "int32", "int64", "int64", "int64", "int64",
         "int64", "int64", "int32", "int64"],
        rows,
    )


def g_webp_roundtrip():
    # INDEPENDENCE: expected px_md5/w/h come straight from the published
    # fixture generator (gen.make_pixels + alpha=255), never through any
    # engine codec; rt_md5 is pinned EQUAL to px_md5 (lossless contract)
    # and container to the literal 'webp'. The VP8L bitstream format is
    # anchored by handcrafted spec bytes in tests/test_webpcodec.py.
    import hashlib

    from fixtures import gen
    from tilers_tools_spark.functions import georef

    n = 10
    idx = np.arange(n, dtype=np.uint64)
    phash = georef.splitmix64(np.uint64(gen.SEED) ^ idx)
    w, h = georef.derive_size_np(phash)
    rows = []
    for i in range(n):
        pix = gen.make_pixels(i, int(phash[i]), int(w[i]), int(h[i]))
        rgba = np.dstack([pix, np.full(pix.shape[:2], 255, np.uint8)])
        md5 = hashlib.md5(rgba.tobytes()).hexdigest()
        rows.append([f"img{i:08d}", int(w[i]), int(h[i]), md5, md5, "webp", True])
    save(
        "webp_roundtrip",
        ["image_id", "w", "h", "px_md5", "rt_md5", "container", "roundtrip_ok"],
        ["str", "int32", "int32", "str", "str", "str", "bool"],
        rows,
    )


def g_dem_terrain():
    # SCOPE NOTE: reuses terrain.tri_np/tpi_np/roughness_np (pure NumPy),
    # anchored independently by the hand-derived pins in
    # tests/test_terrain.py (flat=0; east-ramp interior riley=sqrt(6),
    # wilson=3/4, tpi=0, rough=2; left-edge riley=sqrt(3), tpi=-3/8;
    # isolated peak riley=sqrt(200), tpi=+5). The DEM surfaces are
    # recomputed DIRECTLY from the analytic formulas — this golden never
    # reads TIFF bytes, so the gate cross-checks the engine's untiled
    # uncompressed Float32 TIFF decode path end-to-end.
    from tilers_tools_spark.operators.terrain import roughness_np, tpi_np, tri_np
    from tilers_tools_spark.plans.queries import _DEM_SPECS, _dem_surface

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        dem = _dem_surface(name, h, w).astype(np.float64)
        riley, wilson = tri_np(dem, "riley"), tri_np(dem, "wilson")
        tpi, rough = tpi_np(dem), roughness_np(dem)
        md5 = hashlib.md5(
            riley.tobytes() + wilson.tobytes() + tpi.tobytes() + rough.tobytes()
        ).hexdigest()
        rows.append(
            [name, int(w), int(h),
             round(float(riley.sum()), 6), round(float(wilson.sum()), 6),
             round(float(np.abs(tpi).sum()), 6), round(float(rough.sum()), 6),
             md5]
        )
    save(
        "dem_terrain",
        ["image_id", "w", "h", "tri_riley_sum", "tri_wilson_sum",
         "tpi_abs_sum", "rough_sum", "metrics_md5"],
        ["str", "int32", "int32", "float64", "float64", "float64", "float64", "str"],
        rows,
    )


def g_dem_derivatives():
    # SCOPE NOTE: reuses terrain.slope_np/aspect_np/color_relief_np,
    # anchored independently by the hand-derived pins in
    # tests/test_terrain.py (slope atan(2) on the |grad|=2 ramp, aspect
    # 90/0 on east/north ramps + all-NaN on flat, color-relief exact
    # midpoint/clamp/round-half-up pins). Surfaces recomputed DIRECTLY
    # from the analytic formulas — never reads TIFF bytes.
    from tilers_tools_spark.operators.terrain import (
        aspect_np,
        color_relief_np,
        slope_np,
    )
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _RELIEF_RAMP,
        _dem_surface,
    )

    rows = []
    for name, h, w, gsd in _DEM_SPECS:
        dem = _dem_surface(name, h, w).astype(np.float64)
        sl = slope_np(dem, gsd)
        asp = aspect_np(dem, gsd)
        rel = color_relief_np(dem, _RELIEF_RAMP)
        rows.append(
            [name, int(w), int(h),
             round(float(sl.sum()), 6),
             hashlib.md5(sl.tobytes()).hexdigest(),
             int(np.isnan(asp).sum()),
             hashlib.md5(asp.tobytes()).hexdigest(),
             hashlib.md5(rel.tobytes()).hexdigest()]
        )
    save(
        "dem_derivatives",
        ["image_id", "w", "h", "slope_sum", "slope_md5",
         "aspect_flat_n", "aspect_md5", "relief_md5"],
        ["str", "int32", "int32", "float64", "str", "int32", "str", "str"],
        rows,
    )


def g_dem_contour():
    # SCOPE NOTE: reuses terrain.contour_segments_np/contour_stats_np
    # (pure NumPy marching squares), anchored independently by the
    # hand-derived pins in tests/test_terrain.py (ramp -> vertical line
    # of H-1 unit segments; isolated peak -> the 4-segment diamond with
    # pinned edge-midpoint vertices; both saddle pairings at levels
    # 0.5/0.4; wave closed/border-terminated topology invariant). The
    # DEM surfaces are recomputed DIRECTLY from the analytic formulas.
    from tilers_tools_spark.operators.terrain import contour_stats_np
    from tilers_tools_spark.plans.queries import (
        _CONTOUR_LEVELS,
        _DEM_SPECS,
        _dem_surface,
    )

    rows = []
    for name, h, w, gsd in _DEM_SPECS:
        dem = _dem_surface(name, h, w).astype(np.float64)
        for lv in _CONTOUR_LEVELS:
            n, tot, md5 = contour_stats_np(dem, lv, gsd=gsd)
            rows.append([name, float(lv), int(n), float(tot), md5])
    save(
        "dem_contour",
        ["image_id", "level", "n_segments", "total_len", "seg_md5"],
        ["str", "float64", "int32", "float64", "str"],
        rows,
    )


def _trace_chains_scalar(segs):
    """INDEPENDENT polyline tracer for the contour_lines golden —
    iterative pairwise merging over a worklist (the engine walks an
    adjacency dict; only the canonical-form SPEC in
    operators/terrain.py::contour_lines_np is shared). Merging is only
    legal at vertices of segment-degree exactly 2, so maximal chains and
    junction breakpoints come out identical to the engine's by
    uniqueness of the decomposition."""
    from collections import Counter

    deg = Counter()
    polys = []
    for x0, y0, x1, y1 in segs:
        a, b = (float(x0), float(y0)), (float(x1), float(y1))
        if a == b:
            continue
        deg[a] += 1
        deg[b] += 1
        polys.append([a, b])
    changed = True
    while changed:
        changed = False
        done = []
        while polys:
            p = polys.pop()
            if p[0] == p[-1]:
                done.append(p)
                continue
            hit = None
            for k, q in enumerate(polys):
                if q[0] == q[-1]:
                    continue
                if p[-1] == q[0] and deg[p[-1]] == 2:
                    hit = (k, "pe_qs")
                elif p[-1] == q[-1] and deg[p[-1]] == 2:
                    hit = (k, "pe_qe")
                elif p[0] == q[-1] and deg[p[0]] == 2:
                    hit = (k, "ps_qe")
                elif p[0] == q[0] and deg[p[0]] == 2:
                    hit = (k, "ps_qs")
                if hit:
                    break
            if hit is None:
                done.append(p)
                continue
            k, mode = hit
            q = polys.pop(k)
            changed = True
            if mode == "pe_qs":
                polys.append(p + q[1:])
            elif mode == "pe_qe":
                polys.append(p + q[-2::-1])
            elif mode == "ps_qe":
                polys.append(q + p[1:])
            else:
                polys.append(q[::-1] + p[1:])
        polys = done
    # canonical form per the shared SPEC (terrain.contour_lines_np doc)
    canon = []
    for c in polys:
        if c[0] == c[-1] and len(c) > 2:
            ring = c[:-1]
            k = ring.index(min(ring))
            ring = ring[k:] + ring[:k]
            if len(ring) > 2 and ring[-1] < ring[1]:
                ring = [ring[0]] + ring[:0:-1]
            canon.append(ring + [ring[0]])
        else:
            canon.append(c if c[0] <= c[-1] else c[::-1])
    return sorted(canon)


def g_contour_lines():
    # SCOPE NOTE: reuses terrain.contour_segments_np (pure NumPy marching
    # squares, anchored by the hand-derived pins in tests/test_terrain.py)
    # but traces polylines with the INDEPENDENT worklist-merging tracer
    # above; the engine's adjacency-walk chaining never runs here. DEM
    # surfaces recomputed directly from the analytic formulas.
    from tilers_tools_spark.operators.terrain import contour_segments_np
    from tilers_tools_spark.plans.queries import (
        _CONTOUR_LEVELS,
        _DEM_SPECS,
        _dem_surface,
    )

    rows = []
    for name, h, w, gsd in _DEM_SPECS:
        dem = _dem_surface(name, h, w).astype(np.float64)
        for lv in _CONTOUR_LEVELS:
            chains = _trace_chains_scalar(contour_segments_np(dem, lv))
            wkts = [
                "LINESTRING (" + ", ".join("%.9f %.9f" % p for p in c) + ")"
                for c in chains
            ]
            n_closed = sum(1 for c in chains if c[0] == c[-1] and len(c) > 2)
            n_points = sum(len(c) for c in chains)
            total = 0.0
            for c in chains:
                for (xa, ya), (xb, yb) in zip(c, c[1:]):
                    total += math.hypot(xb - xa, yb - ya)
            md5 = hashlib.md5("\n".join(wkts).encode()).hexdigest()
            rows.append(
                [name, float(lv), len(chains), n_closed, n_points,
                 round(total * gsd, 6), md5]
            )
    save(
        "contour_lines",
        ["image_id", "level", "n_lines", "n_closed", "n_points",
         "total_len", "wkt_md5"],
        ["str", "float64", "int32", "int32", "int32", "float64", "str"],
        rows,
    )


def g_streaming_tiles():
    # minitiler render of the 16-image streaming fixture (the streaming
    # path must equal the batch render bit-for-tile; same kernel scope as
    # g_pyramid_smoke)
    rows = []
    for rec in gen.gen_images(16, fmts=("raw", "png")):
        for r in mt.tile_image(rec):
            md5 = hashlib.md5(codecs.encode_tile_png(r["rgba"])).hexdigest()
            rows.append([rec["image_id"], int(r["z"]), int(r["x"]), int(r["y"]), md5])
    save(
        "streaming_tiles",
        ["image_id", "z", "x", "y", "tile_md5"],
        ["str", "int32", "int64", "int64", "str"],
        rows,
    )


def g_warped_smoke(zoom: int = 12):
    rows = []
    for i, rec in enumerate(gen.gen_images(6, fmts=("raw",))):
        theta = math.radians(10.0 + 7.0 * i)
        gsd = 30.0 + 5.0 * i
        A = np.array(
            [
                [gsd * math.cos(theta), gsd * math.sin(theta), -2.0e6 + 9.0e5 * i],
                [gsd * math.sin(theta), -gsd * math.cos(theta), 1.0e6 + 3.0e5 * i],
            ],
            dtype=np.float64,
        )
        rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
        h, w = rgba.shape[:2]
        corners = np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=np.float64)
        mx = A[0, 0] * corners[:, 0] + A[0, 1] * corners[:, 1] + A[0, 2]
        my = A[1, 0] * corners[:, 0] + A[1, 1] * corners[:, 1] + A[1, 2]
        txmin, txmax, tymin, tymax = mt.cover(mx.min(), my.min(), mx.max(), my.max(), zoom)
        for tx in range(txmin, txmax + 1):
            for ty in range(tymin, tymax + 1):
                arr = mt.warp_tile(rgba, A, zoom, tx, ty)
                if arr[:, :, 3].max() == 0:
                    continue
                md5 = hashlib.md5(codecs.encode_tile_png(arr)).hexdigest()
                rows.append([rec["image_id"], zoom, int(tx), int(ty), md5])
    save(
        "warped_smoke",
        ["image_id", "z", "x", "y", "tile_md5"],
        ["str", "int32", "int64", "int64", "str"],
        rows,
    )


def g_cutline_mask():
    ring = [{"lon": 139.0, "lat": 35.0}, {"lon": 140.6, "lat": 35.2}, {"lon": 139.8, "lat": 36.4}]
    pts = [mt.merc(v["lon"], v["lat"]) for v in ring]
    bx0, bx1 = min(p[0] for p in pts), max(p[0] for p in pts)
    by0, by1 = min(p[1] for p in pts), max(p[1] for p in pts)
    recs = []
    for rec in gen.gen_images(120, fmts=("raw",)):
        if (rec["phash"] % (1 << 64)) % 5 == 0:
            recs.append(rec)
        if len(recs) == 8:
            break
    rows = []
    for rec in recs:
        for r in mt.tile_image(rec, zmin=7):
            z, tx, ty = r["z"], r["x"], r["y"]
            span = tm.RES0 / (2.0**z) * tm.TILE
            tmx0 = tx * span - tm.ORIGIN
            tmy0 = ty * span - tm.ORIGIN
            if not (tmx0 <= bx1 and tmx0 + span >= bx0 and tmy0 <= by1 and tmy0 + span >= by0):
                continue  # bbox prefilter drops non-candidates entirely
            m = mt.cutline_mask([ring], z, tx, ty)
            arr = r["rgba"]
            alpha = arr[:, :, 3] * m
            if not alpha.any():
                continue  # fully-masked tiles elided
            out = arr.copy()
            out[:, :, 3] = alpha
            out[:, :, :3] *= m[:, :, None]
            md5 = hashlib.md5(codecs.encode_tile_png(out)).hexdigest()
            rows.append([rec["image_id"], int(z), int(tx), int(ty), md5])
    save(
        "cutline_mask",
        ["image_id", "z", "x", "y", "tile_md5"],
        ["str", "int32", "int64", "int64", "str"],
        rows,
    )


def g_image_features():
    rows = []
    for rec in gen.gen_images(16, fmts=("raw", "png")):
        arr = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
        rgb = arr[:, :, :3].astype(np.float64)
        gray = rgb.mean(axis=2)
        gy, gx = np.gradient(gray)
        # phash64: average-hash on an 8x8 downsample (same published recipe
        # the operator documents; recomputed here from the decoded pixels)
        h, w = gray.shape
        ys = (np.arange(8) * h // 8).clip(0, h - 1)
        xs = (np.arange(8) * w // 8).clip(0, w - 1)
        small = gray[ys][:, xs]
        bits = (small > small.mean()).astype(np.uint64).ravel()
        ph = int(np.int64((bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)))
        rows.append(
            [
                rec["image_id"], int(arr.shape[1]), int(arr.shape[0]), int(arr.shape[2]),
                float(rgb[:, :, 0].mean()), float(rgb[:, :, 1].mean()), float(rgb[:, :, 2].mean()),
                float(gray.std()), float(np.sqrt(gx * gx + gy * gy).mean()), ph,
            ]
        )
    save(
        "image_features",
        ["image_id", "w", "h", "n_bands", "mean_r", "mean_g", "mean_b", "std_gray", "edge_energy", "phash64"],
        ["str", "int32", "int32", "int32", "float64", "float64", "float64", "float64", "float64", "int64"],
        rows,
    )


# ---------------------------------------------------------------------------
# ANN queries over embeddings (sf-pinned)
# ---------------------------------------------------------------------------


def _rank_topk(cands_by_q, vecs_by_id, qvecs, k=10):
    rows = []
    for qid in sorted(cands_by_q):
        scored = [(_fold_cosine(qvecs[qid], vecs_by_id[c]), c) for c in sorted(cands_by_q[qid])]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_cos, c) in enumerate(scored[:k], start=1):
            rows.append([int(qid), int(c), int(rank)])
    return rows


def g_ann_lsh(k=10, bits=8, dim=64, seed=42):
    ids, vecs = _embeddings()
    vecs_by_id = dict(zip(ids, vecs))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))

    def bucket(v):
        key = 0
        for bi in range(bits):
            if _fold_dot(v, planes[bi]) >= 0:
                key += 1 << bi
        return key

    cbuckets = {i: bucket(vecs_by_id[i]) for i in ids}
    qids = [i for i in ids if i < 4]
    qvecs = {i: vecs_by_id[i] for i in qids}
    cands = {}
    for qid in qids:
        b0 = bucket(qvecs[qid])
        probes = {b0} | {b0 ^ (1 << i) for i in range(bits)}
        cands[qid] = {c for c, cb in cbuckets.items() if cb in probes}
    rows = _rank_topk(cands, vecs_by_id, qvecs, k)
    save("ann_lsh", ["query_id", "vec_id", "rank"], ["int64", "int64", "int64"], rows)


def g_ann_ivf(k=10, n_lists=16, n_probe=4, seed=42, iters=10):
    # SCOPE NOTE: this golden reuses the engine's driver-side _kmeans_np
    # (like the h3lite/s2lite kernel reuse above), so the gate verifies the
    # SPARK side end-to-end — sample ordering, list assignment, probe
    # selection, candidate join, exact ranking — but cannot catch a defect
    # inside the k-means kernel itself. _kmeans_np's own invariants
    # (determinism, unit-norm centroids, assignment quality) are pinned
    # separately in tests/test_pipeline_ops.py.
    from tilers_tools_spark.operators.ann import _kmeans_np  # driver-side NumPy, no Spark

    ids, vecs = _embeddings()
    vecs_by_id = dict(zip(ids, vecs))
    # sample order = orderBy xxhash64(cast(vec_id as string), lit(seed))
    order = sorted(ids, key=lambda i: sh.xxhash64(("str", str(i)), ("int", seed)))
    sample = np.array([vecs_by_id[i] for i in order], dtype=np.float64)
    cent = _kmeans_np(sample, n_lists, iters, seed)
    x = np.array([vecs_by_id[i] for i in ids], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign = (xn @ cent.T).argmax(axis=1)
    lists = {}
    for i, a in zip(ids, assign):
        lists.setdefault(int(a), []).append(i)
    qids = [i for i in ids if i < 4]
    q = np.array([vecs_by_id[i] for i in qids], dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    top = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :n_probe]
    cands = {
        qid: {c for l in top[qi] for c in lists.get(int(l), [])} for qi, qid in enumerate(qids)
    }
    qvecs = {i: vecs_by_id[i] for i in qids}
    rows = _rank_topk(cands, vecs_by_id, qvecs, k)
    save("ann_ivf", ["query_id", "vec_id", "rank"], ["int64", "int64", "int64"], rows)


def g_ann_pq(k=10, n_sub=8, ks=16, seed=42, iters=10):
    # SCOPE NOTE: like g_ann_ivf, this golden reuses the engine's
    # driver-side PQ kernels (_pq_train/_pq_encode/_pq_luts — pure NumPy,
    # no Spark), so the gate verifies the SPARK side end-to-end — sample
    # ordering, the code/LUT columns surviving Arrow, the JVM
    # aggregate(zip_with(element_at)) ADC fold, ranking — but cannot catch
    # a defect inside the kernels themselves; those are pinned separately
    # (recall bound + code-range/determinism invariants in
    # tests/test_pipeline_ops.py). The ADC score here is accumulated
    # left-to-right in float64, matching F.aggregate's fold exactly.
    from tilers_tools_spark.operators.ann import _pq_encode, _pq_luts, _pq_train

    ids, vecs = _embeddings()
    vecs_by_id = dict(zip(ids, vecs))
    order = sorted(ids, key=lambda i: sh.xxhash64(("str", str(i)), ("int", seed)))
    sample = np.array([vecs_by_id[i] for i in order], dtype=np.float64)
    cents = _pq_train(sample, n_sub, ks, iters, seed)
    x = np.array([vecs_by_id[i] for i in ids], dtype=np.float64)
    codes = _pq_encode(x, cents)
    qids = [i for i in ids if i < 4]
    q = np.array([vecs_by_id[i] for i in qids], dtype=np.float64)
    luts = _pq_luts(q, cents)
    rows = []
    for qi, qid in enumerate(qids):
        scored = []
        for ci, cid in enumerate(ids):
            acc = 0.0
            for j in range(n_sub):
                acc = acc + float(luts[qi][j][codes[ci][j]])
            scored.append((acc, cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_s, cid) in enumerate(scored[:k], start=1):
            rows.append([int(qid), int(cid), int(rank)])
    save("ann_pq", ["query_id", "vec_id", "rank"], ["int64", "int64", "int64"], rows)


def g_ann_ivfpq(k=10, n_lists=16, n_probe=4, n_sub=8, ks=16, seed=42, iters=10):
    # SCOPE NOTE: composition of g_ann_ivf and g_ann_pq — same engine
    # kernel reuse and the same left-to-right ADC fold; verifies the Spark
    # side of the COMPOSED pipeline (list pruning feeding coded-candidate
    # ADC scoring through the equi-join).
    from tilers_tools_spark.operators.ann import (
        _kmeans_np,
        _pq_encode,
        _pq_luts,
        _pq_train,
    )

    ids, vecs = _embeddings()
    vecs_by_id = dict(zip(ids, vecs))
    order = sorted(ids, key=lambda i: sh.xxhash64(("str", str(i)), ("int", seed)))
    sample = np.array([vecs_by_id[i] for i in order], dtype=np.float64)
    coarse = _kmeans_np(sample, n_lists, iters, seed)
    cents = _pq_train(sample, n_sub, ks, iters, seed)
    x = np.array([vecs_by_id[i] for i in ids], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign = (xn @ coarse.T).argmax(axis=1)
    codes = _pq_encode(x, cents)
    lists = {}
    for idx, a in enumerate(assign):
        lists.setdefault(int(a), []).append(idx)
    qids = [i for i in ids if i < 4]
    q = np.array([vecs_by_id[i] for i in qids], dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qn @ coarse.T), axis=1, kind="stable")[:, :n_probe]
    luts = _pq_luts(q, cents)
    rows = []
    for qi, qid in enumerate(qids):
        cand_idx = sorted({ci for l in probes[qi] for ci in lists.get(int(l), [])})
        scored = []
        for ci in cand_idx:
            acc = 0.0
            for j in range(n_sub):
                acc = acc + float(luts[qi][j][codes[ci][j]])
            scored.append((acc, ids[ci]))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_s, cid) in enumerate(scored[:k], start=1):
            rows.append([int(qid), int(cid), int(rank)])
    save("ann_ivfpq", ["query_id", "vec_id", "rank"], ["int64", "int64", "int64"], rows)


def g_fingerprint(window: int = 8):
    rows = []
    for doc_id, t in _docs():
        tl = t.lower()
        n = max(len(tl) - (window - 1), 1)
        hs = [sh.xxhash64(("str", tl[i : i + window])) for i in range(n)]
        rows.append([int(doc_id), min(hs), max(hs), hashlib.md5(tl.encode("utf-8")).hexdigest()])
    save(
        "fingerprint",
        ["doc_id", "fp_min", "fp_max", "fp_md5"],
        ["int64", "int64", "int64", "str"],
        rows,
    )


def _media_payloads():
    return [(r["image_id"], r["bytes"]) for r in gen.gen_images(6, fmts=("raw",))]


def g_video_frames(frames: int = 4, out_w: int = 32, out_h: int = 32):
    """Replicates multimodal.video_frame_sample's documented fake-decode
    derivation (seed from payload head, seeded rng frames) + the REAL
    PNG-encode path — gates the Spark plumbing (explode shape, batching,
    per-frame blobs)."""
    rows = []
    for media_id, payload in _media_payloads():
        seed = int(np.frombuffer(bytes(payload)[:8].ljust(8, b"\0"), dtype=np.uint64)[0])
        rng = np.random.default_rng(seed & 0x7FFFFFFF)
        for i in range(frames):
            frame = rng.integers(0, 256, (out_h, out_w, 3), dtype=np.uint8)
            ts = i / max(frames - 1, 1)
            md5 = hashlib.md5(codecs.encode_png(frame)).hexdigest()
            rows.append([media_id, i, float(ts), md5])
    save(
        "video_frames",
        ["media_id", "frame_idx", "rel_ts", "thumb_md5"],
        ["str", "int32", "float64", "str"],
        rows,
    )


def g_audio_frames(frames: int = 8):
    rows = []
    for media_id, payload in _media_payloads():
        seed = np.frombuffer(
            np.frombuffer(bytes(payload)[:8].ljust(8, b"\0"), dtype=np.uint8), dtype=np.uint8
        ).sum()
        rng = np.random.default_rng(int(seed))
        for i in range(frames):
            rows.append([media_id, i, float(rng.standard_normal()), float(rng.uniform())])
    save(
        "audio_frames",
        ["media_id", "frame_idx", "rms", "zcr"],
        ["str", "int32", "float64", "float64"],
        rows,
    )


def g_aaigrid_ingest():
    # FULLY text-independent: recomputes every stat from the analytic DEM
    # surfaces + literal hole masks (shared fixture helper _aaigrid_holed —
    # plain numpy, no parsing) and the extent arithmetic (mx0=0, my1=1e5 by
    # construction). The engine path round-trips float64 -> repr() text ->
    # tokenizer -> float64, so any tokenizer / anchor-shift / NODATA /
    # dx-dy defect moves the md5 or a stat and fails the gate. Reject
    # variants (aniso, truncated) and the non-3857-prj georef are pinned
    # to the documented sentinels here, not recomputed.
    import hashlib

    from tilers_tools_spark.plans.queries import _AAIGRID_SPECS, _DEM_SPECS, _aaigrid_holed

    rows = []
    for iid, surface, holes, spelling, _prj in _AAIGRID_SPECS:
        if spelling in ("aniso", "truncated"):
            rows.append([iid, -1, -1, -1, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, ""])
            continue
        gsd = next(g for n, _h, _w, g in _DEM_SPECS if n == surface)
        a = _aaigrid_holed(surface, holes)
        ok_prj = iid != "plane_utm_prj"
        rows.append(
            [
                iid,
                int(a.shape[1]),
                int(a.shape[0]),
                len(holes),
                float(gsd) if ok_prj else -1.0,
                0.0 if ok_prj else -1.0,
                1.0e5 if ok_prj else -1.0,
                float(np.nanmin(a)),
                float(np.nanmax(a)),
                float(np.nansum(a)),
                hashlib.md5(a.tobytes()).hexdigest(),
            ]
        )
    save(
        "aaigrid_ingest",
        ["image_id", "ncols", "nrows", "n_nodata", "gsd", "mx0", "my1",
         "zmin", "zmax", "zsum", "grid_md5"],
        ["str", "int64", "int64", "int64", "float64", "float64", "float64",
         "float64", "float64", "float64", "str"],
        rows,
    )


def g_hgt_ingest():
    # Text/bytes-independent like g_aaigrid_ingest: stats, md5 and the
    # filename georef are recomputed from the analytic int16-quantized
    # surfaces + literal void masks and the literal tile corners; the
    # engine path round-trips float64 -> big-endian int16 -> float64, so
    # any byte-order / void-marker / name-parse defect fails the gate.
    import hashlib

    from tilers_tools_spark.plans.queries import _HGT_N, _HGT_SPECS, _hgt_holed

    corners = {"N34W119.hgt": (34.0, -119.0), "S02E010.hgt": (-2.0, 10.0), "n00e000": (0.0, 0.0)}
    rows = []
    for iid, surface, voids in _HGT_SPECS:
        if iid not in corners or surface == "truncated":
            rows.append([iid, -1, -1, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, ""])
            continue
        a = _hgt_holed(surface, voids)
        lat0, lon0 = corners[iid]
        rows.append(
            [
                iid,
                _HGT_N,
                len(voids),
                lat0,
                lon0,
                1.0 / (_HGT_N - 1),
                float(np.nanmin(a)),
                float(np.nanmax(a)),
                float(np.nansum(a)),
                hashlib.md5(a.tobytes()).hexdigest(),
            ]
        )
    save(
        "hgt_ingest",
        ["image_id", "n", "n_void", "lat0", "lon0", "step_deg",
         "zmin", "zmax", "zsum", "grid_md5"],
        ["str", "int64", "int64", "float64", "float64", "float64",
         "float64", "float64", "float64", "str"],
        rows,
    )


def g_gif_ingest():
    # INDEPENDENCE: expected px_md5/w/h come straight from the fixture
    # palette/index arrays (and the hand-derived literal for the
    # hand-packed spec-bytes frame) — no GIF code in the expected box;
    # rt_md5 is pinned EQUAL to px_md5 (lossless PNG re-encode) and
    # container to the literal 'png'. The GIF-LZW bit layout is anchored
    # by the handcrafted KATs in tests/test_gifcodec.py.
    import hashlib

    from tilers_tools_spark.plans.queries import _GIF_SPECS, _gif_fixture_rgba

    rows = []
    for iid in _GIF_SPECS:
        rgba = _gif_fixture_rgba(iid)
        md5 = hashlib.md5(rgba.tobytes()).hexdigest()
        rows.append([iid, rgba.shape[1], rgba.shape[0], md5, md5, "png", True])
    save(
        "gif_ingest",
        ["image_id", "w", "h", "px_md5", "rt_md5", "container", "roundtrip_ok"],
        ["str", "int32", "int32", "str", "str", "str", "bool"],
        rows,
    )


def g_png_depths():
    # INDEPENDENCE: expected px_md5/w/h come straight from the fixture
    # value/index arrays + the documented scale rules (255/(2^d-1),
    # 16-bit high byte) — no PNG code in the expected box; rt_md5 pinned
    # EQUAL to px_md5, container to the literal 'png'. The bit packing
    # itself is anchored by hand-packed scanline KATs in tests/test_codecs.py.
    import hashlib

    from tilers_tools_spark.plans.queries import _PNG_DEPTH_SPECS, _png_depth_rgba

    rows = []
    for iid in _PNG_DEPTH_SPECS:
        rgba = _png_depth_rgba(iid)
        md5 = hashlib.md5(rgba.tobytes()).hexdigest()
        rows.append([iid, rgba.shape[1], rgba.shape[0], md5, md5, "png", True])
    save(
        "png_depths",
        ["image_id", "w", "h", "px_md5", "rt_md5", "container", "roundtrip_ok"],
        ["str", "int32", "int32", "str", "str", "str", "bool"],
        rows,
    )


def g_terrain_rgb():
    # SCOPE NOTE: reuses terrain.terrain_rgb_encode/decode_np (pure
    # NumPy), whose pack rules are anchored by HAND-computed byte pins in
    # tests/test_terrain.py (terrarium (128,0,0)/(127,255,0)...; mapbox
    # (1,134,160)/(2,224,70)). The DEM surfaces + hole masks are
    # recomputed directly — this golden never reads TIFF bytes, so the
    # gate cross-checks the engine's GeoTIFF decode + UDF path.
    import hashlib

    from tilers_tools_spark.operators.terrain import (
        terrain_rgb_decode_np,
        terrain_rgb_encode_np,
    )
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for enc in ("terrarium", "mapbox"):
        for name, h, w, _gsd in _DEM_SPECS:
            a = _dem_surface(name, h, w).astype(np.float64)
            a[_fillnodata_mask(name, h, w)] = np.nan
            rgba = terrain_rgb_encode_np(a, enc)
            back = terrain_rgb_decode_np(rgba, enc)
            finite = ~np.isnan(a)
            err = float(np.max(np.abs(back[finite] - a[finite]))) if finite.any() else 0.0
            rows.append(
                [name, enc, int(w), int(h),
                 hashlib.md5(rgba.tobytes()).hexdigest(),
                 int((~finite).sum()), err]
            )
    save(
        "terrain_rgb",
        ["image_id", "encoding", "w", "h", "rgb_md5", "n_nodata", "err_max"],
        ["str", "str", "int32", "int32", "str", "int64", "float64"],
        rows,
    )


def g_dem_tiles():
    # The tile SAMPLING is replayed with scalar per-pixel loops — an
    # independent transcription of the documented affine mapping (dest
    # center -> continuous source coord -> floor pick, NaN outside) —
    # over the recomputed analytic surfaces; cover ranges come from the
    # same published floor/ceil rule as the image pyramid (shared
    # tilemath, pinned by its own KATs). terrain_rgb pack rules are
    # hand-pinned in tests/test_terrain.py; encode_tile_png is shared
    # exactly as in g_pyramid_smoke. No TIFF bytes, no engine dem_tile_np.
    import hashlib
    import math

    from tilers_tools_spark.functions import codecs, tilemath as tm
    from tilers_tools_spark.operators.terrain import terrain_rgb_encode_np
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for name, h, w, _gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w).astype(np.float64)
        a[_fillnodata_mask(name, h, w)] = np.nan
        span17 = float(tm.resolution_np(17)) * 256.0
        gsd = span17 / 16.0
        mx0 = 7 * span17 - tm.ORIGIN + 0.3 * span17
        my1 = 11 * span17 - tm.ORIGIN - 0.2 * span17
        for zz in (17, 16):
            span = float(tm.resolution_np(zz)) * 256.0
            res = span / 256.0
            x0, x1, y0, y1 = tm.cover_range_np(
                mx0, my1 - h * gsd, mx0 + w * gsd, my1, zz
            )
            for ty in range(int(y0), int(y1) + 1):
                for txx in range(int(x0), int(x1) + 1):
                    tmx0 = txx * span - tm.ORIGIN
                    tmy1 = (ty + 1) * span - tm.ORIGIN
                    elev = np.full((256, 256), np.nan)
                    for r in range(256):
                        sy = (my1 - (tmy1 - (r + 0.5) * res)) / gsd
                        ri = math.floor(sy)
                        if not (0 <= ri < h):
                            continue
                        for c in range(256):
                            sx = (tmx0 + (c + 0.5) * res - mx0) / gsd
                            ci = math.floor(sx)
                            if 0 <= ci < w:
                                elev[r, c] = a[ri, ci]
                    n_valid = int(np.sum(~np.isnan(elev)))
                    if n_valid == 0:
                        continue
                    png = codecs.encode_tile_png(terrain_rgb_encode_np(elev, "terrarium"))
                    rows.append(
                        [name, zz, int(txx), int(ty), n_valid,
                         hashlib.md5(png).hexdigest()]
                    )
    save(
        "dem_tiles",
        ["image_id", "z", "x", "y", "n_valid", "tile_md5"],
        ["str", "int32", "int64", "int64", "int64", "str"],
        rows,
    )


def g_xyz_grid_ingest():
    # Text-independent like g_aaigrid_ingest: stats + md5 recomputed from
    # the analytic surfaces + literal hole masks (absent cell == NaN) and
    # the literal anchor arithmetic; rejects pinned to the sentinels.
    import hashlib

    from tilers_tools_spark.plans.queries import _DEM_SPECS, _XYZ_SPECS, _dem_surface

    rows = []
    for iid, surface, holes in _XYZ_SPECS:
        if iid.startswith("xyz_bad"):
            rows.append([iid, -1, -1, -1, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, ""])
            continue
        (h, w, gsd) = next((hh, ww, g) for n, hh, ww, g in _DEM_SPECS if n == surface)
        a = _dem_surface(surface, h, w).astype(np.float64)
        for r, c in holes:
            a[r, c] = np.nan
        rows.append(
            [
                iid, w, h, len(holes),
                0.0, 1.0e5 - h * gsd, float(gsd),
                float(np.nanmin(a)), float(np.nanmax(a)), float(np.nansum(a)),
                hashlib.md5(a.tobytes()).hexdigest(),
            ]
        )
    save(
        "xyz_grid_ingest",
        ["image_id", "ncols", "nrows", "n_absent", "xll", "yll", "cellsize",
         "zmin", "zmax", "zsum", "grid_md5"],
        ["str", "int64", "int64", "int64", "float64", "float64", "float64",
         "float64", "float64", "float64", "str"],
        rows,
    )


def g_envi_ingest():
    # Bytes-independent like the other ingest goldens: dims, nodata
    # count, anchor, stats and md5 all recomputed from the shared
    # analytic-cube fixture helper (_envi_cube — pure numpy, no header
    # or raw bytes); the engine path round-trips through interleave
    # packing + byte order + ignore substitution, so any of those
    # defects moves the md5/stats. Rejects pinned to sentinels.
    import hashlib

    from tilers_tools_spark.plans.queries import _ENVI_SPECS, _envi_cube

    rows = []
    for iid, _surface, _il, _dtype, bands, holes in _ENVI_SPECS:
        if iid.startswith("envi_bad"):
            rows.append([iid, -1, -1, -1, -1, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, ""])
            continue
        cube = _envi_cube(iid)
        a = cube if cube.ndim == 3 else cube[:, :, None]
        anchor = (2.0, 0.0, 1.0e5) if iid == "envi_bil_i2" else (-1.0, -1.0, -1.0)
        rows.append(
            [
                iid, a.shape[1], a.shape[0], bands, len(holes),
                *anchor,
                float(np.nanmin(a)), float(np.nanmax(a)), float(np.nansum(a)),
                hashlib.md5(cube.tobytes()).hexdigest(),
            ]
        )
    save(
        "envi_ingest",
        ["image_id", "samples", "lines", "bands", "n_nodata", "gsd", "mx0", "my1",
         "zmin", "zmax", "zsum", "cube_md5"],
        ["str", "int64", "int64", "int64", "int64", "float64", "float64", "float64",
         "float64", "float64", "float64", "str"],
        rows,
    )


def g_bpe(num_merges: int = 12):
    """INDEPENDENT textbook BPE (Sennrich et al. 2016) — dict-of-tuples
    trainer with a Counter pair census and scan-and-skip merges (the
    engine trains via a distributed word-census DataFrame + Column fold;
    shared code: none). Same documented contract: whitespace (ASCII \\s+)
    words, char symbols + '</w>', max-freq pair with lexicographic
    (left, right) tie-break, merges applied in rank order on encode.
    Writes BOTH goldens: bpe_merges (the merge table) and bpe_encode
    (per-doc token count + md5 of the space-joined token stream)."""
    import re
    from collections import Counter

    ws = re.compile(r"\s+", re.ASCII)
    docs = _docs()
    census: Counter = Counter()
    for _id, text in docs:
        for w in ws.split(text):
            if w:
                census[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in census.items()}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (a, b), freq = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, int(freq)))
        nxt: dict = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    save(
        "bpe_merges",
        ["m_rank", "lhs", "rhs", "freq"],
        ["int64", "str", "str", "int64"],
        [[r, a, b, f] for r, (a, b, f) in enumerate(merges)],
    )

    ranked = [(a, b) for a, b, _f in merges]
    memo: dict = {}

    def enc_word(w: str):
        got = memo.get(w)
        if got is None:
            sym = list(w) + ["</w>"]
            for a, b in ranked:
                out = []
                i = 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            got = memo[w] = sym
        return got

    rows = []
    for did, text in docs:
        toks: list = []
        for w in ws.split(text):
            if w:
                toks += enc_word(w)
        rows.append(
            [
                int(did),
                len(toks),
                hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest(),
            ]
        )
    save("bpe_encode", ["doc_id", "n_tokens", "tok_md5"], ["int64", "int64", "str"], rows)


def _dp_keep_recursive(xs, ys, tol: float):
    """INDEPENDENT Douglas-Peucker for the simplify_lines golden: the
    textbook RECURSION with a scalar distance loop (the engine kernel in
    functions/simplify.py is an iterative explicit stack + vectorized
    scan — different code, same documented contract: infinite-line
    perpendicular distance, STRICT >, first index attaining the max)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j <= i + 1:
            return
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        norm = math.sqrt(dx * dx + dy * dy)
        best, bestd = -1, -1.0
        for k in range(i + 1, j):
            if norm == 0.0:
                d = math.hypot(xs[k] - ax, ys[k] - ay)
            else:
                d = abs((xs[k] - ax) * dy - (ys[k] - ay) * dx) / norm
            if d > bestd:
                bestd, best = d, k
        if bestd > tol:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return keep


def g_simplify_lines(mod: int = 37, tols=((0, 2.0), (1, 15.0))):
    """Per (line, tolerance): kept-vertex count + quantized coordinate
    sums of the Douglas-Peucker simplification of the event polylines
    (line = event_id % mod, vertices in event_id order, raw lon/lat
    degrees — pure-division derivation, bit-identical cross-engine)."""
    e, lon, lat = _events_lonlat()
    rows = []
    for line in sorted(set(int(v) for v in e % mod)):
        idx = np.where(e % mod == line)[0]
        idx = idx[np.argsort(e[idx], kind="stable")]
        xs = lon[idx]
        ys = lat[idx]
        for tol_id, tol in tols:
            keep = _dp_keep_recursive(xs, ys, tol)
            sx = sum(math.floor(x * 1000.0 + 0.5) for x in xs[keep])
            sy = sum(math.floor(y * 1000.0 + 0.5) for y in ys[keep])
            rows.append([line, tol_id, int(keep.sum()), int(sx), int(sy)])
    save(
        "simplify_lines",
        ["line_id", "tol_id", "n_kept", "sx", "sy"],
        ["int64", "int64", "int64", "int64", "int64"],
        rows,
    )


GENERATORS = {
    "simplify_lines": g_simplify_lines,
    "bpe": g_bpe,
    "envi_ingest": g_envi_ingest,
    "xyz_grid_ingest": g_xyz_grid_ingest,
    "dem_tiles": g_dem_tiles,
    "aaigrid_ingest": g_aaigrid_ingest,
    "hgt_ingest": g_hgt_ingest,
    "gif_ingest": g_gif_ingest,
    "png_depths": g_png_depths,
    "terrain_rgb": g_terrain_rgb,
    "h3_s2_assign": g_h3_s2_assign,
    "h3_rollup": g_h3_rollup,
    "simhash": g_simhash,
    "minhash_lsh_pairs": g_minhash_lsh_pairs,
    "pyramid_smoke": g_pyramid_smoke,
    "pyramid_geodetic": g_pyramid_geodetic,
    "warped_smoke": g_warped_smoke,
    "cutline_mask": g_cutline_mask,
    "image_features": g_image_features,
    "ann_lsh": g_ann_lsh,
    "ann_ivf": g_ann_ivf,
    "ann_pq": g_ann_pq,
    "ann_ivfpq": g_ann_ivfpq,
    "streaming_tiles": g_streaming_tiles,
    "dem_hillshade": g_dem_hillshade,
    "zonal_stats": g_zonal_stats,
    "point_sample": g_point_sample,
    "polygonize": g_polygonize,
    "quantize_colors": g_quantize_colors,
    "webp_roundtrip": g_webp_roundtrip,
    "proximity": g_proximity,
    "sieve": g_sieve,
    "rasterize": g_rasterize,
    "grid_idw": g_grid_idw,
    "fillnodata": g_fillnodata,
    "raster_stats": g_raster_stats,
    "grid_stats": g_grid_stats,
    "raster_calc": g_raster_calc,
    "mosaic": g_mosaic,
    "viewshed": g_viewshed,
    "pansharpen": g_pansharpen,
    "raster_xyz": g_raster_xyz,
    "raster_translate": g_raster_translate,
    "warp_4326": g_warp4326,
    "warp_utm": g_warputm,
    "overviews_addo": g_overviews_addo,
    "cog_validate": g_cog_validate,
    "contour_bands": g_contour_bands,
    "nearblack": g_nearblack,
    "raster_info": g_raster_info,
    "raster_tindex": g_raster_tindex,
    "raster_compare": g_raster_compare,
    "georef_edit": g_georef_edit,
    "pct2rgb": g_pct2rgb,
    "raster_retile": g_raster_retile,
    "dem_terrain": g_dem_terrain,
    "dem_contour": g_dem_contour,
    "contour_lines": g_contour_lines,
    "dem_derivatives": g_dem_derivatives,
    "fingerprint": g_fingerprint,
    "video_frames": g_video_frames,
    "audio_frames": g_audio_frames,
}


def main():
    only = sys.argv[1:] or list(GENERATORS)
    for name in only:
        if name not in GENERATORS:
            raise SystemExit(f"unknown query {name!r}; choose from: {', '.join(sorted(GENERATORS))}")
        GENERATORS[name]()


if __name__ == "__main__":
    main()
