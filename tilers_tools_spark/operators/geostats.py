"""Spatial statistics over cell-binned counts: Getis-Ord Gi* hot-spot
z-scores and global Moran's I autocorrelation.

The ArcGIS "Hot Spot Analysis" / "Spatial Autocorrelation" role (and
PySAL's ``esda.G_Local`` / ``esda.Moran``) re-expressed Spark-first over
a **cell lattice**: the input is a table of (cx, cy, v) integer cells
with an integer value per cell (typically a point-count census produced
by one upstream groupBy — the same bounded-grid collapse heatmap.py
uses, so 100 TB of points becomes a few million cells before any
statistics run).

Weights are binary queen contiguity on the lattice: cell (cx, cy) is a
neighbor of the 8 cells at Chebyshev distance 1 (Gi* additionally
includes self, per Ord & Getis 1995 — that is what the star means; the
Moran neighborhood excludes self, as W requires w_ii = 0). The universe
is exactly the given cells — absent lattice cells are NOT zero-filled
(documented deviation from raster-style implementations that analyze a
full rectangle; zero-fill of an unbounded global grid is undefined).
The lattice is planar: no antimeridian wrap.

Scale shape: never an all-pairs or theta join. Each cell EXPLODES into
its 3x3 (or 8-offset) window as the *contributor* side and equi-joins
back to the universe on the exact (cx, cy) key, so the neighborhood sum
is ONE explode + ONE groupBy with map-side partials + ONE join; weights
are never materialized as a matrix. Global moments (n, Σv, Σv²) are a
single scalar aggregate broadcast back via crossJoin. Every aggregate
is an exact BIGINT sum of integer inputs — doubles appear only in the
final closed-form z / I expression, evaluated in one documented
operand order so an independent engine reproduces it bit-for-bit
(IEEE-754 binary64 +,-,*,/ and sqrt are correctly rounded: identical
operands + identical order = identical doubles).

Formulas (Ord & Getis 1995, eq. 6-7; Moran 1950 / Cliff & Ord 1981):

  Gi*(i) = (wx_i - xbar * wn_i)
           / (s * sqrt((n * wn_i - wn_i^2) / (n - 1)))
    with wx_i = Σ_{j in N*(i)} v_j  (N* includes self),
         wn_i = |N*(i)|, xbar = Σv / n, s = sqrt(Σv²/n - xbar²);
    binary weights make Σ w_ij² = Σ w_ij = wn_i.

  I = (n / W) * (Spp - 2*xbar*Sp + xbar^2*W) / (Σv² - n*xbar²)
    over DIRECTED neighbor pairs (w_ij = 1 iff Chebyshev dist = 1):
    W = #pairs, Sp = Σ v_i over pairs, Spp = Σ v_i*v_j over pairs —
    the cross-product Σ w_ij (v_i-xbar)(v_j-xbar) expanded so every
    aggregate is an exact integer (symmetry gives Σw_ij v_i = Σw_ij
    v_j = Sp). E[I] = -1/(n-1).

  I_i = ((v_i - xbar) / m2) * Σ_j w_ij (v_j - xbar)   (Anselin 1995, eq. 12)
    with m2 = Σv²/n - xbar² (the biased variance, per the paper's
    m2 = Σ z²/n), Σ_j w_ij (v_j - xbar) expanded to wx_i - xbar*wn_i so
    the neighborhood sum stays an exact BIGINT; E[I_i] = -wn_i/(n-1).
    Identity Σ_i I_i = W * I_global ties the local and global operators
    together (pinned by test). Quadrant label for the LISA cluster map:
    HH/LL/HL/LH by the strict signs of (v_i - xbar) and the spatial lag,
    'NA' when either is exactly 0 — double comparisons are deterministic
    because both operands are the same documented-order expressions.

  K(d) = A/n² * Σ_{i≠j} 1[dist(i,j) <= d]   (Ripley 1977, naive
    estimator — NO edge correction, a documented deviation: the
    isotropic correction needs per-pair boundary arcs and is a
    border-bias refinement, not a different statistic; PySAL's
    ``ripley`` offers the uncorrected form too). L(d) = sqrt(K/π);
    under CSR K(d) = πd². Ordered pairs are counted via the same
    grid-cell EQUI-join census as DBSCAN (left side explodes into its
    3x3 d_max-cell neighborhood, right side keeps one cell — each
    ordered pair meets exactly once), ALL radii in one pass via
    conditional aggregation. Integer coordinates make every pair
    distance² an exact BIGINT, so the radius comparisons cannot flip
    between engines.

Cells whose s = 0 (all values equal) or n < 2 yield NULL z / I rather
than a division blow-up.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spatial import _spread

_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _contributions(cells: DataFrame, include_self: bool) -> DataFrame:
    """Each cell re-addressed to every lattice cell it contributes to:
    one row per (receiver cx, cy) carrying the contributor's value."""
    offs = [o for o in _OFFS if include_self or o != (0, 0)]
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
    )
    return cells.withColumn("_o", off).select(
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
        F.col("v").alias("_nv"),
    )


def _prep(cells: DataFrame, cx_col: str, cy_col: str, v_col: str) -> DataFrame:
    return cells.select(
        F.col(cx_col).cast("long").alias("cx"),
        F.col(cy_col).cast("long").alias("cy"),
        F.col(v_col).cast("long").alias("v"),
    )


def getis_ord_gi(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    v_col: str = "v",
) -> DataFrame:
    """Gi* per cell -> (cx, cy, v, wx, wn, z).

    wx = Σ value over the 3x3 window restricted to EXISTING cells
    (self included), wn = that window's cell count (>= 1), both exact
    BIGINT; z = the Ord-Getis statistic (NULL when the variance or the
    n*wn - wn² term degenerates). One explode + groupBy + join + scalar
    crossJoin — no weight matrix, no theta join, survives any n.
    """
    c = _prep(cells, cx_col, cy_col, v_col)
    recv = _contributions(c, include_self=True).groupBy("cx", "cy").agg(
        F.sum("_nv").alias("wx"), F.count("*").alias("wn")
    )
    # inner join: only universe cells receive a statistic (a contribution
    # addressed to an absent lattice cell is dropped here)
    local = c.join(recv, ["cx", "cy"])
    glob = c.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = local.crossJoin(F.broadcast(glob))
    n = F.col("n").cast("double")
    xbar = F.col("sv").cast("double") / n
    s2 = F.col("svv").cast("double") / n - xbar * xbar
    wn = F.col("wn").cast("double")
    denom_in = (n * wn - wn * wn) / (n - F.lit(1.0))
    z = (F.col("wx").cast("double") - xbar * wn) / (F.sqrt(s2) * F.sqrt(denom_in))
    z = F.when((F.col("n") > 1) & (s2 > 0) & (denom_in > 0), z)
    return j.select("cx", "cy", "v", "wx", "wn", z.alias("z"))


def local_moran(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    v_col: str = "v",
) -> DataFrame:
    """Local Moran's I (LISA, Anselin 1995) per cell ->
    (cx, cy, v, wx, wn, ii, e_ii, quad).

    wx/wn = neighbor (self-EXCLUDED queen) value sum / count, exact
    BIGINT; ii = ((v - xbar)/m2) * (wx - xbar*wn) with m2 = Σv²/n -
    xbar² (NULL when variance degenerates; isolates get wn = 0 and
    ii = 0 — an empty neighborhood has zero spatial lag by definition);
    e_ii = -wn/(n-1); quad = the LISA cluster-map quadrant HH/LL/HL/LH
    by strict signs of the deviation and the lag, 'NA' on an exact zero.
    LEFT join keeps isolates (they receive no contributions). Same
    explode + groupBy + join + scalar crossJoin shape as Gi* — no
    weight matrix, survives any n.
    """
    c = _prep(cells, cx_col, cy_col, v_col)
    recv = _contributions(c, include_self=False).groupBy("cx", "cy").agg(
        F.sum("_nv").alias("wx"), F.count("*").alias("wn")
    )
    local = c.join(recv, ["cx", "cy"], "left").select(
        "cx", "cy", "v",
        F.coalesce(F.col("wx"), F.lit(0)).alias("wx"),
        F.coalesce(F.col("wn"), F.lit(0)).alias("wn"),
    )
    glob = c.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = local.crossJoin(F.broadcast(glob))
    n = F.col("n").cast("double")
    xbar = F.col("sv").cast("double") / n
    m2 = F.col("svv").cast("double") / n - xbar * xbar
    dev = F.col("v").cast("double") - xbar
    lag = F.col("wx").cast("double") - xbar * F.col("wn").cast("double")
    ii = F.when((F.col("n") > 1) & (m2 > 0), dev / m2 * lag)
    e_ii = F.when(F.col("n") > 1, -F.col("wn").cast("double") / (n - F.lit(1.0)))
    quad = (
        F.when((dev > 0) & (lag > 0), F.lit("HH"))
        .when((dev < 0) & (lag < 0), F.lit("LL"))
        .when((dev > 0) & (lag < 0), F.lit("HL"))
        .when((dev < 0) & (lag > 0), F.lit("LH"))
        .otherwise(F.lit("NA"))
    )
    return j.select(
        "cx", "cy", "v", "wx", "wn", ii.alias("ii"), e_ii.alias("e_ii"), quad.alias("quad")
    )


def morans_i(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    v_col: str = "v",
) -> DataFrame:
    """Global Moran's I -> ONE row (n, w, sp, spp, sv, svv, i, e_i).

    n/w/sp/spp/sv/svv are exact BIGINTs (cell count, directed-pair
    count, pair Σv_i, pair Σv_i*v_j, Σv, Σv²); i is the statistic and
    e_i its null expectation -1/(n-1). NULL i when no pairs or zero
    variance. Two scalar aggregates + one equi-join — nothing about
    the lattice ever sits on the driver.
    """
    c = _prep(cells, cx_col, cy_col, v_col)
    pairs = _contributions(c, include_self=False).join(
        c.select("cx", "cy", F.col("v").alias("_v")), ["cx", "cy"]
    )
    # directed pair (contributor j -> receiver i): _nv = v_j, _v = v_i
    pstats = pairs.agg(
        F.count("*").alias("w"),
        F.sum("_v").alias("sp"),
        F.sum(F.col("_v") * F.col("_nv")).alias("spp"),
    )
    glob = c.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = glob.crossJoin(pstats)
    n = F.col("n").cast("double")
    w = F.col("w").cast("double")
    xbar = F.col("sv").cast("double") / n
    cross = (
        F.col("spp").cast("double")
        - F.lit(2.0) * xbar * F.col("sp").cast("double")
        + xbar * xbar * w
    )
    ssd = F.col("svv").cast("double") - n * xbar * xbar
    i = (n / w) * (cross / ssd)
    i = F.when((F.col("w") > 0) & (ssd > 0), i)
    e_i = F.when(F.col("n") > 1, F.lit(-1.0) / (n - F.lit(1.0)))
    return j.select("n", "w", "sp", "spp", "sv", "svv", i.alias("i"), e_i.alias("e_i"))


def ripley_k(
    points: DataFrame,
    radii: list,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    area: float | None = None,
) -> DataFrame:
    """Ripley's K / L at each radius -> (d, npairs, k, l, csr_k).

    npairs = ordered pairs i != j with dist² <= d² (exact BIGINT when
    coordinates are integers — pass quantized coordinates or accept
    float boundary risk); k = A * npairs / n² and l = sqrt(k/π) in one
    documented operand order; csr_k = πd² (the complete-spatial-
    randomness expectation). A defaults to the points' bounding-box
    envelope (max-min exact under integer coords); k/l are NULL when
    n < 2 or A <= 0. One explode(9) + equi-join + conditional agg —
    every radius in a single pass, cell size = max(radii), no theta
    join, no per-radius rescan.
    """
    if not radii or any(d <= 0 for d in radii):
        raise ValueError("radii must be non-empty positive distances")
    radii = sorted(float(d) for d in radii)
    cell = radii[-1]
    pts = _spread(points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ))
    cx = F.floor(F.col("x") / F.lit(cell))
    cy = F.floor(F.col("y") / F.lit(cell))
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    left = pts.withColumn("_o", off).select(
        (cx + F.col("_o.dx")).alias("gx"),
        (cy + F.col("_o.dy")).alias("gy"),
        F.col("id").alias("lid"), F.col("x").alias("lx"), F.col("y").alias("ly"),
    )
    right = pts.select(
        cx.alias("gx"), cy.alias("gy"),
        F.col("id").alias("rid"), F.col("x").alias("rx"), F.col("y").alias("ry"),
    )
    dist2 = (
        (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
        + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
    )
    counts = (
        left.join(right, ["gx", "gy"])
        .where(F.col("lid") != F.col("rid"))
        .agg(*[
            F.sum(F.when(dist2 <= F.lit(d * d), F.lit(1)).otherwise(F.lit(0)))
            .alias(f"_c{i}")
            for i, d in enumerate(radii)
        ])
    )
    glob = pts.agg(
        F.count("*").alias("n"),
        (F.max("x") - F.min("x")).alias("_ax"),
        (F.max("y") - F.min("y")).alias("_ay"),
    )
    j = glob.crossJoin(counts)
    n = F.col("n").cast("double")
    a = F.lit(float(area)) if area is not None else F.col("_ax") * F.col("_ay")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("long").alias("npairs"),
            )
            for i, d in enumerate(radii)
        ])
    )
    out = j.select(rows.alias("_r"), n.alias("_n"), a.alias("_a"), F.col("n").alias("_ni"))
    k = F.col("_a") * F.col("_r.npairs").cast("double") / (F.col("_n") * F.col("_n"))
    ok = (F.col("_ni") > 1) & (F.col("_a") > 0)
    return out.select(
        F.col("_r.d").alias("d"),
        F.col("_r.npairs").alias("npairs"),
        F.when(ok, k).alias("k"),
        F.when(ok, F.sqrt(k / F.lit(math.pi))).alias("l"),
        (F.lit(math.pi) * F.col("_r.d") * F.col("_r.d")).alias("csr_k"),
    )


def std_ellipse(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Standard deviational ellipse (Yuill 1971; the ArcGIS Directional
    Distribution role) -> ONE row (n, xbar, ybar, var_x, var_y, cov_xy,
    sigma_major, sigma_minor, slope_major, theta_rad, ecc).

    Entirely from the 6 scalar moments (n, Σx, Σy, Σx², Σy², Σxy) in a
    single map-side aggregate — nothing else shuffles, any n survives.
    The ellipse axes come from the covariance eigendecomposition closed
    form, which needs only +,-,*,/ and sqrt (all correctly rounded, so
    an independent engine reproduces every column bit-for-bit):

      vx = Σx²/n - xbar², vy = Σy²/n - ybar², vxy = Σxy/n - xbar*ybar
      m = (vx+vy)/2, h = (vx-vy)/2, r = sqrt(h² + vxy²)
      λ1 = m + r, λ2 = max(m - r, 0)      (clamp kills -1e-17 float dust)
      sigma_major/minor = sqrt(2λ)        (the Yuill/ArcGIS √2 factor)
      slope_major = (λ1 - vx)/vxy         (eigenvector slope; NULL when
                                           vxy = 0 — axes already aligned)
      ecc = sqrt(1 - λ2/λ1)               (NULL when λ1 = 0: a point mass)

    theta_rad = atan2-based major-axis angle CCW from +x in (-π/2, π/2]
    — for humans; atan2 is NOT guaranteed correctly rounded across
    libms, so cross-engine gates should compare slope_major instead
    (ArcGIS's clockwise-from-north rotation = 90° - degrees(theta)).
    Integer coordinates keep the moments exact BIGINTs; |x| up to ~3e4
    (e.g. km-quantized mercator) stays overflow-safe past 10^9 points.
    """
    pts = points.select(
        F.col(x_col).cast("long").alias("x"), F.col(y_col).cast("long").alias("y")
    )
    agg = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / n
    ybar = F.col("sy").cast("double") / n
    vx = F.col("sxx").cast("double") / n - xbar * xbar
    vy = F.col("syy").cast("double") / n - ybar * ybar
    vxy = F.col("sxy").cast("double") / n - xbar * ybar
    m = (vx + vy) / F.lit(2.0)
    h = (vx - vy) / F.lit(2.0)
    r = F.sqrt(h * h + vxy * vxy)
    l1 = m + r
    l2 = F.greatest(m - r, F.lit(0.0))
    ok = F.col("n") > 0
    slope = F.when(ok & (vxy != 0), (l1 - vx) / vxy)
    theta = F.when(
        ok,
        F.when(vxy != 0, F.atan((l1 - vx) / vxy)).otherwise(
            F.when(vx >= vy, F.lit(0.0)).otherwise(F.lit(math.pi / 2.0))
        ),
    )
    return agg.select(
        "n",
        F.when(ok, xbar).alias("xbar"),
        F.when(ok, ybar).alias("ybar"),
        F.when(ok, vx).alias("var_x"),
        F.when(ok, vy).alias("var_y"),
        F.when(ok, vxy).alias("cov_xy"),
        F.when(ok, F.sqrt(F.lit(2.0) * l1)).alias("sigma_major"),
        F.when(ok, F.sqrt(F.lit(2.0) * l2)).alias("sigma_minor"),
        slope.alias("slope_major"),
        theta.alias("theta_rad"),
        F.when(ok & (l1 > 0), F.sqrt(F.lit(1.0) - l2 / l1)).alias("ecc"),
    )


def variogram(
    points: DataFrame,
    n_bins: int,
    bin_width: float,
    x_col: str = "x",
    y_col: str = "y",
    v_col: str = "v",
    id_col: str = "id",
) -> DataFrame:
    """Empirical semivariogram (Matheron 1963 — the kriging
    prerequisite; gstat/scikit-gstat role) -> one row per OCCUPIED lag
    bin: (bin, d_lo, d_hi, npairs, sum_sq, gamma).

    γ(h) = Σ (v_i - v_j)² / (2 N(h)) over ORDERED pairs i != j whose
    distance falls in [bin*w, (bin+1)*w) — ordered pairs double both the
    numerator and N, so γ matches the unordered definition exactly
    while the grid-cell equi-join census (cell = n_bins*w, each ordered
    pair meets once) never needs a dedup pass. npairs/sum_sq are exact
    (BIGINT with integer coordinates and values); gamma is one division.
    Lag bin = floor(sqrt(d2)/w) — sqrt and / are correctly rounded, so
    the bin label is deterministic cross-engine; pairs at or beyond
    n_bins*w are excluded, coincident points (d2 = 0) land in bin 0.
    Bins with no pairs are absent (not zero-filled).
    """
    if n_bins < 1 or bin_width <= 0:
        raise ValueError("need n_bins >= 1 and bin_width > 0")
    cell = n_bins * float(bin_width)
    pts = _spread(points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.col(v_col).cast("long").alias("v"),
    ))
    cx = F.floor(F.col("x") / F.lit(cell))
    cy = F.floor(F.col("y") / F.lit(cell))
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    left = pts.withColumn("_o", off).select(
        (cx + F.col("_o.dx")).alias("gx"),
        (cy + F.col("_o.dy")).alias("gy"),
        F.col("id").alias("lid"), F.col("x").alias("lx"),
        F.col("y").alias("ly"), F.col("v").alias("lv"),
    )
    right = pts.select(
        cx.alias("gx"), cy.alias("gy"),
        F.col("id").alias("rid"), F.col("x").alias("rx"),
        F.col("y").alias("ry"), F.col("v").alias("rv"),
    )
    d2 = (
        (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
        + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
    )
    dv = F.col("lv") - F.col("rv")
    binc = F.floor(F.sqrt(d2) / F.lit(float(bin_width)))
    agg = (
        left.join(right, ["gx", "gy"])
        .where(F.col("lid") != F.col("rid"))
        .select(binc.alias("bin"), (dv * dv).alias("_sq"))
        .where(F.col("bin") < n_bins)
        .groupBy("bin")
        .agg(F.count("*").alias("npairs"), F.sum("_sq").alias("sum_sq"))
    )
    return agg.select(
        "bin",
        (F.col("bin").cast("double") * F.lit(float(bin_width))).alias("d_lo"),
        ((F.col("bin") + 1).cast("double") * F.lit(float(bin_width))).alias("d_hi"),
        "npairs",
        "sum_sq",
        (
            F.col("sum_sq").cast("double")
            / (F.lit(2.0) * F.col("npairs").cast("double"))
        ).alias("gamma"),
    )


def _mk_s_sql(cols: list) -> str:
    """Unrolled Mann-Kendall S = Σ_{i<j} sign(c_j - c_i) as ONE SQL text
    over named columns. r06: the MK family builds its big unrolled
    expressions as F.expr strings over staged attribute columns instead
    of nested Column-DSL trees — the DSL form cost one py4j round-trip
    per operator (seconds of pure driver time per run at n_bins = 8) and
    re-inlined each operand subtree into every term (a ~460 KB physical
    plan for emerging_hotspot that Catalyst re-optimized on every run).
    Same expressions, same evaluation order, bit-identical results."""
    n = len(cols)
    return " + ".join(
        f"(CASE WHEN {cols[j]} > {cols[i]} THEN 1 WHEN {cols[j]} < {cols[i]} "
        f"THEN -1 ELSE 0 END)"
        for i in range(n) for j in range(i + 1, n)
    )


def _mk_tie_sql(cols: list) -> str:
    """Unrolled per-element tie term Σ_i (n_i - 1)(2 n_i + 5) with
    n_i = Σ_j [c_j = c_i] — the exact-integer form mann_kendall and
    emerging_hotspot unrolled as Column trees before r06."""
    n = len(cols)
    parts = []
    for i in range(n):
        n_i = " + ".join(
            f"(CASE WHEN {cols[j]} = {cols[i]} THEN 1 ELSE 0 END)" for j in range(n)
        )
        parts.append(f"((({n_i}) - 1) * (2 * ({n_i}) + 5))")
    return " + ".join(parts)


def _mk_z_sql(s_col: str, num_col: str) -> str:
    """Continuity-corrected MK Z over staged S / Var·18 attributes —
    NULL when Var·18 = 0, same branch order as the Column original."""
    sq = f"SQRT(CAST({num_col} AS DOUBLE) / 18.0D)"
    return (
        f"CASE WHEN {num_col} > 0 THEN (CASE "
        f"WHEN {s_col} > 0 THEN (CAST({s_col} AS DOUBLE) - 1.0D) / {sq} "
        f"WHEN {s_col} < 0 THEN (CAST({s_col} AS DOUBLE) + 1.0D) / {sq} "
        f"ELSE 0.0D END) END"
    )


def mann_kendall(
    cells_t: DataFrame,
    n_bins: int,
    cx_col: str = "cx",
    cy_col: str = "cy",
    bin_col: str = "bin",
    v_col: str = "v",
    alpha_z: float = 1.96,
) -> DataFrame:
    """Per-cell Mann-Kendall trend test over a complete time axis — the
    core of ArcGIS "Emerging Hot Spot Analysis" (space-time cube):
    given sparse (cell, time-bin, value) rows, each cell's ABSENT bins
    are zero-filled (the cube's time axis is complete by construction;
    zero activity is data, not a gap) and tested for monotone trend:

      S = Σ_{i<j} sign(v_j - v_i)                 (exact integer)
      Var·18 = n(n-1)(2n+5) - Σ_g t_g(t_g-1)(2t_g+5)   (tie-corrected,
               exact integer; per-element form Σ_i (n_i-1)(2n_i+5))
      Z = (S∓1)/sqrt(Var)  (continuity-corrected; NULL when Var = 0)
      trend = increasing / decreasing (|Z| >= alpha_z) / none; 'flat'
              when every bin is equal (Var = 0).

    n_bins is SMALL by contract (a space-time cube has a bounded time
    axis): S and the tie terms unroll into pure Column expressions over
    the per-cell value map — one groupBy on the cell key, no UDF, no
    second shuffle; every aggregate is an exact integer and Z is one
    documented-order float expression (sqrt only), bit-identical across
    engines.
    """
    if not 2 <= n_bins <= 16:
        raise ValueError("n_bins must be in [2, 16] (bounded time axis; terms unroll)")
    c = cells_t.select(
        F.col(cx_col).cast("long").alias("cx"),
        F.col(cy_col).cast("long").alias("cy"),
        F.col(bin_col).cast("long").alias("bin"),
        F.col(v_col).cast("long").alias("v"),
    )
    # r06 physical restructure (same algebra, bit-identical output): the
    # per-cell series pivots into plain v0..v{n-1} columns via max-when
    # conditional aggregation (a codegen HashAggregate; the previous
    # map_from_entries(collect_list) forced ObjectHashAggregate, and the
    # repeated getItem subtrees re-inlined into every one of the ~n²
    # unrolled terms), and the unrolled terms land in STAGED projections
    # built from F.expr SQL text — aggregation output is an attribute
    # barrier, so each stage references the previous one's columns as
    # leaves and the expression tree stays linear instead of exploding.
    cols = [f"v{b}" for b in range(n_bins)]
    g = c.groupBy("cx", "cy").agg(*[
        F.coalesce(F.max(F.when(F.col("bin") == b, F.col("v"))), F.lit(0)).alias(f"v{b}")
        for b in range(n_bins)
    ])
    base = n_bins * (n_bins - 1) * (2 * n_bins + 5)
    # Theil-Sen slope (Sen 1968): median of the T(T-1)/2 pairwise slopes
    # (v_j - v_i)/(j - i) — the trend MAGNITUDE beside Mann-Kendall's
    # significance. Each slope is one exact-int subtraction + one
    # division; array_sort gives a total order on identical doubles, so
    # the median (mean of the two middles at even counts) is
    # deterministic cross-engine.
    slope_sql = "array_sort(array(" + ", ".join(
        f"CAST({cols[j]} - {cols[i]} AS DOUBLE) / {float(j - i)!r}D"
        for i in range(n_bins) for j in range(i + 1, n_bins)
    ) + "))"
    st1 = g.select(
        "cx", "cy",
        F.expr(_mk_s_sql(cols)).alias("_s"),
        F.expr(f"{base} - ({_mk_tie_sql(cols)})").alias("_num"),
        F.expr(slope_sql).alias("_slopes"),
    )
    npair = n_bins * (n_bins - 1) // 2
    if npair % 2 == 1:
        sen_sql = f"element_at(_slopes, {(npair + 1) // 2})"
    else:
        sen_sql = (
            f"(element_at(_slopes, {npair // 2}) + "
            f"element_at(_slopes, {npair // 2 + 1})) / 2.0D"
        )
    a = f"{float(alpha_z)!r}D"
    st2 = st1.select(
        "cx", "cy", "_s", "_num",
        F.expr(_mk_z_sql("_s", "_num")).alias("_z"),
        F.expr(sen_sql).alias("_sen"),
    )
    trend_sql = (
        f"CASE WHEN _num = 0 THEN 'flat' WHEN _z >= {a} THEN 'increasing' "
        f"WHEN _z <= -{a} THEN 'decreasing' ELSE 'none' END"
    )
    return st2.select(
        "cx", "cy",
        F.col("_s").cast("long").alias("s"),
        F.col("_num").cast("long").alias("var18"),
        F.col("_z").alias("z"),
        F.col("_sen").alias("sen_slope"),
        F.expr(trend_sql).alias("trend"),
    )


def emerging_hotspot(
    cells_t: DataFrame,
    n_bins: int,
    cx_col: str = "cx",
    cy_col: str = "cy",
    bin_col: str = "bin",
    v_col: str = "v",
    alpha_z: float = 1.96,
) -> DataFrame:
    """Emerging Hot Spot Analysis — the full ArcGIS space-time-cube
    composition (Esri "How Emerging Hot Spot Analysis works"): sparse
    (cell, time-bin, value) rows -> ZERO-FILLED cube over (every observed
    cell) x (every bin 0..n_bins-1) -> space-time Getis-Ord Gi* per
    (cell, bin) with the 3x3x3 space-time neighborhood (spatial queen x
    time step 1, self included; Ord & Getis 1995 closed form, global
    moments over the WHOLE cube) -> per-cell Mann-Kendall trend test on
    the cell's Gi* z time series -> the published pattern categories.

    Category decision list (evaluated in this fixed order; `hot_b` means
    z_b >= alpha_z, `cold_b` means z_b <= -alpha_z, `hot90` means
    10*n_hot >= 9*n_bins, suffix = the hot bins form one contiguous run
    ending in the final bin):

      hot block (requires final-bin hot unless noted):
        new:           n_hot = 1, n_cold = 0, final hot
        consecutive:   n_hot >= 2, suffix run, NOT hot90, n_cold = 0
        intensifying:  hot90, final hot, MK trend 'increasing'
        diminishing:   hot90, final hot, MK trend 'decreasing'
        persistent:    hot90, final hot, no significant MK trend
        historical:    NOT final hot, hot90
        sporadic:      final hot, NOT hot90, n_hot >= 2, no prior cold,
                       run interrupted (not a suffix)
        oscillating:   final hot, NOT hot90, >= 1 prior cold bin
      cold block: the exact mirror (swap hot/cold flags; intensifying
        cold = MK trend 'decreasing' on z — low values clustering harder;
        diminishing cold = 'increasing')
      else: 'no pattern'

    Every intermediate is either an exact integer (census counts, wx, wn,
    Σv, Σv², MK S and tie terms) or ONE documented-order double (the Gi*
    z and the MK Z), so the whole pipeline is bit-identical cross-engine;
    the MK sign/equality comparisons run on identical doubles. Scale
    shape: census groupBy -> cube (cells x small bin axis) -> ONE explode
    (27 offsets) + groupBy + join for every Gi* -> ONE groupBy for the
    per-cell series; no weight matrix, no theta join, no UDF. 100 TB of
    events collapses to a few million cube rows before any statistics.
    """
    if not 2 <= n_bins <= 16:
        raise ValueError("n_bins must be in [2, 16] (bounded time axis; terms unroll)")
    c = cells_t.select(
        F.col(cx_col).cast("long").alias("cx"),
        F.col(cy_col).cast("long").alias("cy"),
        F.col(bin_col).cast("long").alias("bin"),
        F.col(v_col).cast("long").alias("v"),
    )
    # zero-filled cube: the time axis is complete by construction (zero
    # activity is data); the spatial extent = cells observed in ANY bin
    bins = F.explode(F.array(*[F.lit(b).cast("long") for b in range(n_bins)]))
    cube = (
        c.select("cx", "cy").distinct().withColumn("bin", bins)
        .join(c, ["cx", "cy", "bin"], "left")
        .select("cx", "cy", "bin", F.coalesce(F.col("v"), F.lit(0)).alias("v"))
    )
    # space-time Gi*: 3x3x3 contributions; addresses outside the cube
    # (bin < 0, bin >= n_bins, absent cells) drop on the inner join back
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(db).alias("db"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for db in (-1, 0, 1)
        ])
    )
    recv = (
        cube.withColumn("_o", offs)
        .select(
            (F.col("cx") + F.col("_o.dx")).alias("cx"),
            (F.col("cy") + F.col("_o.dy")).alias("cy"),
            (F.col("bin") + F.col("_o.db")).alias("bin"),
            F.col("v").alias("_nv"),
        )
        .groupBy("cx", "cy", "bin")
        .agg(F.sum("_nv").alias("wx"), F.count("*").alias("wn"))
    )
    local = cube.join(recv, ["cx", "cy", "bin"])
    glob = cube.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = local.crossJoin(F.broadcast(glob))
    n = F.col("n").cast("double")
    xbar = F.col("sv").cast("double") / n
    s2 = F.col("svv").cast("double") / n - xbar * xbar
    wn = F.col("wn").cast("double")
    denom_in = (n * wn - wn * wn) / (n - F.lit(1.0))
    z = (F.col("wx").cast("double") - xbar * wn) / (F.sqrt(s2) * F.sqrt(denom_in))
    z = F.when((F.col("n") > 1) & (s2 > 0) & (denom_in > 0), z)
    zt = j.select("cx", "cy", "bin", z.alias("z"))

    # r06 physical restructure (same algebra, bit-identical output; see
    # _mk_s_sql): pivot the Gi* z series into plain z0..z{n-1} columns
    # (codegen HashAggregate instead of the ObjectHashAggregate
    # map_from_entries pivot), then build the unrolled MK + category
    # expressions as staged F.expr SQL over the pivoted attributes —
    # the Column-DSL unroll cost ~20s of py4j driver time per bench run
    # and produced a ~460 KB plan Catalyst re-optimized every run.
    cols = [f"z{b}" for b in range(n_bins)]
    g = zt.groupBy("cx", "cy").agg(*[
        F.max(F.when(F.col("bin") == b, F.col("z"))).alias(f"z{b}")
        for b in range(n_bins)
    ])
    base = n_bins * (n_bins - 1) * (2 * n_bins + 5)
    a = f"{float(alpha_z)!r}D"
    hot = [f"(CASE WHEN z{b} >= {a} THEN 1 ELSE 0 END)" for b in range(n_bins)]
    cold = [f"(CASE WHEN z{b} <= -{a} THEN 1 ELSE 0 END)" for b in range(n_bins)]
    st1 = g.select(
        "cx", "cy", *cols,
        F.expr(_mk_s_sql(cols)).alias("_s"),
        F.expr(f"{base} - ({_mk_tie_sql(cols)})").alias("_num"),
        F.expr(" + ".join(hot)).alias("_nh"),
        F.expr(" + ".join(cold)).alias("_nc"),
    )
    # contiguous suffix: hot[b] == (b >= n_bins - n_hot) for every b,
    # i.e. hot[b] == (n_hot >= n_bins - b) — pure integer comparisons
    hsuffix = " AND ".join(
        f"({hot[b]} = (CASE WHEN _nh >= {n_bins - b} THEN 1 ELSE 0 END))"
        for b in range(n_bins)
    )
    csuffix = " AND ".join(
        f"({cold[b]} = (CASE WHEN _nc >= {n_bins - b} THEN 1 ELSE 0 END))"
        for b in range(n_bins)
    )
    st2 = st1.select(
        "cx", "cy", f"z{n_bins - 1}", "_s", "_num", "_nh", "_nc",
        F.expr(_mk_z_sql("_s", "_num")).alias("_z"),
        F.expr(f"({hsuffix})").alias("_hsuf"),
        F.expr(f"({csuffix})").alias("_csuf"),
    )
    trend_sql = (
        f"CASE WHEN _num = 0 THEN 'flat' WHEN _z >= {a} THEN 'increasing' "
        f"WHEN _z <= -{a} THEN 'decreasing' ELSE 'none' END"
    )
    st3 = st2.select("*", F.expr(trend_sql).alias("_trend"))
    fh = f"((CASE WHEN z{n_bins - 1} >= {a} THEN 1 ELSE 0 END) = 1)"
    fc = f"((CASE WHEN z{n_bins - 1} <= -{a} THEN 1 ELSE 0 END) = 1)"
    hot90 = f"(_nh * 10 >= {9 * n_bins})"
    cold90 = f"(_nc * 10 >= {9 * n_bins})"
    inc = "(_trend = 'increasing')"
    dec = "(_trend = 'decreasing')"
    category_sql = (
        f"CASE WHEN {fh} AND (_nh = 1) AND (_nc = 0) THEN 'new hot' "
        f"WHEN {fh} AND (_nh >= 2) AND _hsuf AND (NOT {hot90}) AND (_nc = 0) THEN 'consecutive hot' "
        f"WHEN {fh} AND {hot90} AND {inc} THEN 'intensifying hot' "
        f"WHEN {fh} AND {hot90} AND {dec} THEN 'diminishing hot' "
        f"WHEN {fh} AND {hot90} THEN 'persistent hot' "
        f"WHEN (NOT {fh}) AND {hot90} THEN 'historical hot' "
        f"WHEN {fh} AND (NOT {hot90}) AND (_nh >= 2) AND (_nc = 0) THEN 'sporadic hot' "
        f"WHEN {fh} AND (NOT {hot90}) AND (_nc >= 1) THEN 'oscillating hot' "
        f"WHEN {fc} AND (_nc = 1) AND (_nh = 0) THEN 'new cold' "
        f"WHEN {fc} AND (_nc >= 2) AND _csuf AND (NOT {cold90}) AND (_nh = 0) THEN 'consecutive cold' "
        f"WHEN {fc} AND {cold90} AND {dec} THEN 'intensifying cold' "
        f"WHEN {fc} AND {cold90} AND {inc} THEN 'diminishing cold' "
        f"WHEN {fc} AND {cold90} THEN 'persistent cold' "
        f"WHEN (NOT {fc}) AND {cold90} THEN 'historical cold' "
        f"WHEN {fc} AND (NOT {cold90}) AND (_nc >= 2) AND (_nh = 0) THEN 'sporadic cold' "
        f"WHEN {fc} AND (NOT {cold90}) AND (_nh >= 1) THEN 'oscillating cold' "
        f"ELSE 'no pattern' END"
    )
    return st3.select(
        "cx", "cy",
        F.col("_nh").cast("long").alias("n_hot"),
        F.col("_nc").cast("long").alias("n_cold"),
        F.col(f"z{n_bins - 1}").alias("z_final"),
        F.col("_s").cast("long").alias("s"),
        F.col("_num").cast("long").alias("var18"),
        F.col("_z").alias("z_mk"),
        F.expr("_trend").alias("trend"),
        F.expr(category_sql).alias("category"),
    )


def kernel_density(
    points: DataFrame,
    radius: int,
    cell: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Quartic-kernel density estimation (Silverman 1986 §4.5; the
    ArcGIS Kernel Density / QGIS heatmap role) evaluated at the CORNERS
    of occupied grid cells: for each corner e, over points p with
    d² = |p - e|² < R² (strict — the kernel is 0 at d = R, so the open
    ball loses nothing from the density while keeping npts unambiguous),

        num(e)     = Σ (R² - d²)²                   (exact BIGINT)
        density(e) = 3·num / (π·R⁶)                 (one double expr)

    which is Σ 3/(πR²)·(1 - d²/R²)² — the published per-unit-area
    quartic KDE. Coordinates and R must be INTEGERS in the same unit
    (quantize mercator meters to km first: R ≤ ~1000 km keeps every
    (R²-d²)² term ≤ 1e12 and sums for millions of in-radius points
    inside BIGINT). Eval corners are the occupied-cell corner lattice
    (cx·cell, cy·cell); `cell >= radius` is required so a corner's
    candidate points all lie in its 2x2 cell window.

    Scale shape: ONE narrow groupBy builds the cell census, corners
    explode into 4 cell addresses and equi-join points on the cell key
    (the ripley/variogram/dbscan pair-census family — never all-pairs),
    then one aggregation. Corners with no point inside R are absent.
    """
    if radius < 1:
        raise ValueError("radius must be a positive integer")
    if cell < radius:
        raise ValueError("cell must be >= radius (2x2 window coverage)")
    import math as _math

    p = points.select(
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    )
    # floor of an exact double division: deterministic cross-engine
    pc = p.select(
        "px", "py",
        F.floor(F.col("px").cast("double") / F.lit(float(cell))).cast("long").alias("cx"),
        F.floor(F.col("py").cast("double") / F.lit(float(cell))).cast("long").alias("cy"),
    )
    corners = pc.select("cx", "cy").distinct().select(
        "cx", "cy",
        (F.col("cx") * cell).alias("ex"),
        (F.col("cy") * cell).alias("ey"),
    )
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0) for dy in (-1, 0)
        ])
    )
    probe = corners.withColumn("_o", offs).select(
        "ex", "ey",
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
    )
    j = probe.join(pc, ["cx", "cy"])
    d2 = (
        (F.col("px") - F.col("ex")) * (F.col("px") - F.col("ex"))
        + (F.col("py") - F.col("ey")) * (F.col("py") - F.col("ey"))
    )
    r2 = radius * radius
    term = (F.lit(r2) - d2) * (F.lit(r2) - d2)
    g = (
        j.where(d2 < r2)
        .groupBy("ex", "ey")
        .agg(F.count("*").alias("npts"), F.sum(term).alias("num"))
    )
    r6 = radius ** 6
    dens = (F.lit(3.0) * F.col("num").cast("double")) / (
        F.lit(_math.pi) * F.lit(r6).cast("double")
    )
    return g.select("ex", "ey", "npts", "num", dens.alias("density"))


def knox_test(
    points: DataFrame,
    eps: float,
    tau: int,
    x_col: str = "x",
    y_col: str = "y",
    t_col: str = "t",
    id_col: str = "id",
) -> DataFrame:
    """Knox space-time interaction test (Knox 1964; the CrimeStat /
    epidemiology standard): over the n(n-1)/2 unordered event pairs,
    count ns = pairs with spatial d² <= eps² , nt = pairs with |Δt| <=
    tau (integer times, inclusive), x = pairs close in BOTH, and report
    the independence expectation e_x = ns·nt/npairs and ratio = x/e_x
    (clustering signal > 1). One row: (n, npairs, ns, nt, x, e_x,
    ratio). n/npairs/ns/nt/x are exact BIGINTs (integer coordinates
    and times; ordered-pair censuses count each unordered pair twice
    and halve exactly); e_x and ratio are single documented-order
    double expressions — bit-identical cross-engine.

    Scale shape: THREE narrow censuses, never all-pairs — the spatial
    count is the ripley/variogram grid-cell equi-join (left explodes
    3x3 at cell = eps), the temporal count is its 1D analog (time
    buckets of width tau, 3-bucket window), and the joint count is the
    spatial census with the time predicate added. Pair counts stay
    bounded when eps/tau are density-normalized.
    """
    if eps <= 0:
        raise ValueError("eps must be > 0")
    if tau < 0:
        raise ValueError("tau must be >= 0")
    p = _spread(points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.col(t_col).cast("long").alias("t"),
    ))
    cw = float(eps)
    pc = p.select(
        "id", "x", "y", "t",
        F.floor(F.col("x").cast("double") / F.lit(cw)).cast("long").alias("cx"),
        F.floor(F.col("y").cast("double") / F.lit(cw)).cast("long").alias("cy"),
    )
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    left = pc.withColumn("_o", offs).select(
        F.col("id").alias("ida"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.col("t").alias("ta"),
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x"))
        + (F.col("ya") - F.col("y")) * (F.col("ya") - F.col("y"))
    )
    eps2 = F.lit(float(eps) * float(eps))
    close_t = F.abs(F.col("ta") - F.col("t")) <= F.lit(int(tau))
    sp = (
        left.join(pc, ["cx", "cy"])
        .where((F.col("ida") != F.col("id")) & (d2.cast("double") <= eps2))
        .agg(
            F.count("*").alias("ns2"),
            # coalesce: SUM over ZERO census rows is NULL, not 0 — an
            # empty spatial census (no close pairs) must report x = 0,
            # matching ripley_k's convention (ns2/nt2 are counts, already 0)
            F.coalesce(F.sum(F.when(close_t, 1).otherwise(0)), F.lit(0)).alias("x2"),
        )
    )
    tw = float(tau) if tau > 0 else 1.0
    tb = p.select(
        "id", "t",
        F.floor(F.col("t").cast("double") / F.lit(tw)).cast("long").alias("b"),
    )
    toffs = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    tleft = tb.withColumn("_d", toffs).select(
        F.col("id").alias("ida"), F.col("t").alias("ta"),
        (F.col("b") + F.col("_d")).alias("b"),
    )
    tm = (
        tleft.join(tb, ["b"])
        .where(
            (F.col("ida") != F.col("id"))
            & (F.abs(F.col("ta") - F.col("t")) <= F.lit(int(tau)))
        )
        .agg(F.count("*").alias("nt2"))
    )
    nn = p.agg(F.count("*").alias("n"))
    j = nn.crossJoin(F.broadcast(sp)).crossJoin(F.broadcast(tm))
    # exact integer halving (the ordered censuses are even by symmetry)
    npairs = F.expr("(n * (n - 1)) div 2")
    ns = F.expr("ns2 div 2")
    nt = F.expr("nt2 div 2")
    x = F.expr("x2 div 2")
    e_x = (ns.cast("double") * nt.cast("double")) / npairs.cast("double")
    ratio = F.when(e_x > 0, x.cast("double") / e_x)
    return j.select(
        F.col("n"), npairs.alias("npairs"), ns.alias("ns"), nt.alias("nt"),
        x.alias("x"), e_x.alias("e_x"), ratio.alias("ratio"),
    )


def clark_evans(
    points: DataFrame,
    max_dist: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Clark-Evans nearest-neighbor index (Clark & Evans 1954; the
    PySAL/spatstat nearest-neighbor-analysis role): R = observed mean
    NN distance / expected mean under CSR, with R < 1 clustered, R > 1
    dispersed. Made exact-and-mirrorable by two documented choices:

    * NN search is CAPPED at integer `max_dist`: points whose nearest
      neighbor lies farther are counted in `n_far` and EXCLUDED from
      the mean (honest truncation, reported, oracle-mirrored; with a
      density-normalized cap the exclusion is a thin tail).
    * each NN distance is quantized to floor(sqrt(min d²)) — one
      correctly-rounded sqrt + floor per point — so the SUM is an
      exact BIGINT (never an order-dependent float accumulation).

    Study area = the coordinate bounding box (the standard practical
    choice, documented): A = (max_x - min_x)·(max_y - min_y), exact.
    Outputs one row: n, n_nn, n_far, sum_nnd_q, area, then the
    documented-order doubles mean_nnd = sum/n_nn, expected =
    0.5/sqrt(n/A), ce_index = mean_nnd/expected.

    Scale shape: ONE grid-cell equi-join census (3x3 window at cell =
    max_dist — the ripley/variogram family) + one min-aggregation;
    never all-pairs.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be a positive integer")
    p = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    cw = float(max_dist)
    pc = p.select(
        "id", "x", "y",
        F.floor(F.col("x").cast("double") / F.lit(cw)).cast("long").alias("cx"),
        F.floor(F.col("y").cast("double") / F.lit(cw)).cast("long").alias("cy"),
    )
    offs = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    left = pc.withColumn("_o", offs).select(
        F.col("id").alias("ida"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
    )
    d2 = (
        (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x"))
        + (F.col("ya") - F.col("y")) * (F.col("ya") - F.col("y"))
    )
    md2 = max_dist * max_dist
    nn = (
        left.join(pc, ["cx", "cy"])
        .where((F.col("ida") != F.col("id")) & (d2 <= F.lit(md2)))
        .groupBy("ida")
        .agg(F.min(d2).alias("d2min"))
        .select(
            "ida",
            F.floor(F.sqrt(F.col("d2min").cast("double"))).cast("long").alias("nnd_q"),
        )
    )
    s = nn.agg(
        F.count("*").alias("n_nn"), F.sum("nnd_q").alias("sum_nnd_q")
    )
    box = p.agg(
        F.count("*").alias("n"),
        ((F.max("x") - F.min("x")) * (F.max("y") - F.min("y"))).alias("area"),
    )
    j = box.crossJoin(F.broadcast(s))
    n_nn = F.coalesce(F.col("n_nn"), F.lit(0))
    sum_q = F.coalesce(F.col("sum_nnd_q"), F.lit(0))
    mean_nnd = F.when(n_nn > 0, sum_q.cast("double") / n_nn.cast("double"))
    lam = F.when(F.col("area") > 0, F.col("n").cast("double") / F.col("area").cast("double"))
    expected = F.lit(0.5) / F.sqrt(lam)
    ce = mean_nnd / expected
    return j.select(
        F.col("n"),
        n_nn.cast("long").alias("n_nn"),
        (F.col("n") - n_nn).cast("long").alias("n_far"),
        sum_q.cast("long").alias("sum_nnd_q"),
        F.col("area"),
        mean_nnd.alias("mean_nnd"),
        expected.alias("expected"),
        ce.alias("ce_index"),
    )


def geary_c(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    v_col: str = "v",
) -> DataFrame:
    """Global Geary's C (Geary 1954; the PySAL esda.Geary role — the
    rank-sensitive companion to Moran's I; E[C] = 1, C < 1 positive
    autocorrelation) over directed queen pairs (w_ii = 0):

        C = (n-1) · Σ w_ij (v_i - v_j)² / (2W · Σ(v_i - vbar)²)

    One row (n, w, num, sv, svv, c, e_c): num = Σ(v_i - v_j)² over the
    directed census is an exact BIGINT DIRECTLY (no mean subtraction —
    Geary's numerator is the beauty here), and C is the documented
    operand-order double ((n-1)·num) / (2·w·(svv - n·xbar²)). NULL C
    when no pairs or zero variance. Same single explode + equi-join
    census as morans_i — never a weight matrix."""
    c = _prep(cells, cx_col, cy_col, v_col)
    pairs = _contributions(c, include_self=False).join(
        c.select("cx", "cy", F.col("v").alias("_v")), ["cx", "cy"]
    )
    d = F.col("_v") - F.col("_nv")
    pstats = pairs.agg(F.count("*").alias("w"), F.sum(d * d).alias("num"))
    glob = c.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = glob.crossJoin(pstats)
    n = F.col("n").cast("double")
    w = F.col("w").cast("double")
    xbar = F.col("sv").cast("double") / n
    ssd = F.col("svv").cast("double") - n * xbar * xbar
    cst = ((n - F.lit(1.0)) * F.col("num").cast("double")) / (F.lit(2.0) * w * ssd)
    cst = F.when((F.col("w") > 0) & (ssd > 0), cst)
    e_c = F.when(F.col("n") > 1, F.lit(1.0))
    return j.select("n", "w", "num", "sv", "svv", cst.alias("c"), e_c.alias("e_c"))


def general_g(
    cells: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    v_col: str = "v",
) -> DataFrame:
    """Getis-Ord General G (Getis & Ord 1992; the ArcGIS High/Low
    Clustering role — are HIGH values clustered (G > E[G]) or LOW
    values?) over directed queen pairs (w_ii = 0), for NON-NEGATIVE
    values (validated fail-loud — the statistic is undefined otherwise):

        G = Σ w_ij v_i v_j / Σ_{i≠j} v_i v_j,     E[G] = W / (n(n-1))

    One row (n, w, spp, denom, g, e_g): spp = the neighbor cross-sum
    (exact BIGINT from the same census as morans_i), denom = sv² - svv
    (the all-pairs cross-sum by algebra — NO second join), both exact;
    g and e_g are single documented-order double divisions. NULL g
    when denom = 0."""
    c = _prep(cells, cx_col, cy_col, v_col)
    c = c.withColumn(
        "v",
        F.when(F.col("v") >= 0, F.col("v")).otherwise(
            F.raise_error(F.format_string("general_g requires v >= 0, got %s", F.col("v")))
        ),
    )
    pairs = _contributions(c, include_self=False).join(
        c.select("cx", "cy", F.col("v").alias("_v")), ["cx", "cy"]
    )
    pstats = pairs.agg(
        F.count("*").alias("w"),
        F.sum(F.col("_v") * F.col("_nv")).alias("spp"),
    )
    glob = c.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    j = glob.crossJoin(pstats)
    denom = F.col("sv") * F.col("sv") - F.col("svv")
    g = F.when(denom > 0, F.col("spp").cast("double") / denom.cast("double"))
    n = F.col("n").cast("double")
    e_g = F.when(
        F.col("n") > 1,
        F.col("w").cast("double") / (n * (n - F.lit(1.0))),
    )
    return j.select(
        "n", "w", "spp", denom.cast("long").alias("denom"),
        g.alias("g"), e_g.alias("e_g"),
    )


def quadrat_test(
    points: DataFrame,
    cell: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Quadrat-count CSR analysis (the spatstat quadrat.test role):
    partition the point BOUNDING BOX into cell x cell quadrats (EMPTY
    quadrats inside the box count — zero counts are data), then

        X²  = Σ_i (n_i - nbar)² / nbar  =  (Q·Σn_i² - N²) / N
        VMR = s²/nbar                   =  (Q·Σn_i² - N²) / (N·(Q-1))

    via the algebraic identities on the right — Q (quadrat count from
    the bbox cell range), N and Σn_i² are exact BIGINTs (absent
    quadrats contribute 0 to Σn² and nothing else), so X² and VMR are
    single documented-order double divisions of exact integers. VMR > 1
    clustered, < 1 dispersed; df = Q - 1. One row: (q, npts, sum_sq,
    df, chi2, vmr).

    Scale shape: ONE narrow groupBy census + two scalar aggregates;
    the quadrat lattice never materializes (the identities only need
    Σ over OCCUPIED cells)."""
    if cell < 1:
        raise ValueError("cell must be a positive integer")
    cw = float(cell)
    pc = points.select(
        F.floor(F.col(x_col).cast("long").cast("double") / F.lit(cw)).cast("long").alias("cx"),
        F.floor(F.col(y_col).cast("long").cast("double") / F.lit(cw)).cast("long").alias("cy"),
    )
    occ = pc.groupBy("cx", "cy").agg(F.count("*").alias("n"))
    agg = occ.agg(
        F.sum("n").alias("npts"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        ((F.max("cx") - F.min("cx") + 1) * (F.max("cy") - F.min("cy") + 1)).alias("q"),
    )
    qd = F.col("q").cast("double")
    nd = F.col("npts").cast("double")
    num = qd * F.col("sum_sq").cast("double") - nd * nd
    chi2 = F.when(F.col("npts") > 0, num / nd)
    vmr = F.when(
        (F.col("npts") > 0) & (F.col("q") > 1), num / (nd * (qd - F.lit(1.0)))
    )
    return agg.select(
        "q", "npts", "sum_sq",
        (F.col("q") - 1).alias("df"),
        chi2.alias("chi2"), vmr.alias("vmr"),
    )
