"""Distributed sketches — portable, mergeable, relational: HyperLogLog
distinct counts and Count-Min frequency estimation / heavy hitters.

The approx-distinct primitive a 100 TB ingest needs (cardinality of
URLs/shingles/users per partition/day without a distinct shuffle),
built so that the ENTIRE sketch is an ordinary DataFrame and every step
is reproducible by an independent engine:

- Hash = the repo's portable md5 idiom (`conv(substring(md5(key),1,15),
  16,10)` — 60 exact bits in any engine; same mechanism as hash_split /
  bloom_filter). NOT xxhash64: portability beats speed for a sketch
  that other engines must be able to rebuild and merge.
- Register index = low ``p`` bits (bitwise AND), rank window = the
  remaining 60-p bits (bitwise shift), rank ρ = leading zeros + 1
  computed as ``(60-p+1) - length(bin(w))`` — `bin` renders the minimal
  binary string identically in Spark and DuckDB, so no log2() float
  boundary bugs.
- The sketch IS a (register, max-rank) table of ≤ 2^p rows: one narrow
  groupBy/max with map-side partials — text/keys never shuffle, and two
  sketches merge with union + the same groupBy (`hll_merge`), which is
  what makes per-partition / per-day sketches roll up for free.
- Estimation (Flajolet-Fo-Gandouet-Meunier 2007): the harmonic-mean
  denominator Σ 2^-M_j is accumulated as the EXACT integer
  Σ 2^(62-M_j) in DECIMAL(38,0) (every term a power of two ≤ 2^62;
  absent registers contribute 2^62 each), so the sum is order-free and
  the final double is one deterministic rounding — bit-identical across
  engines. raw = α_m·m²·2^62 / Σ_scaled with α_m = 0.7213/(1+1.079/m)
  (the published large-m constant; p >= 7 enforced). Small-range
  correction: raw <= 2.5m and V>0 → linear counting m·ln(m/V); ln is
  transcendental (not correctly rounded across libms), so the corrected
  estimate is returned ROUNDED to a BIGINT while `raw_est` stays an
  exact double. No 32-bit large-range correction — the hash is 60-bit,
  collisions are negligible below ~2^30 distinct (documented bound).

Columns out of `hll_estimate`: (m, nonzero, v_zero, sum_scaled,
raw_est, est) — `est` is the headline corrected-and-rounded count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60


def _alpha(m: int) -> float:
    # FFGM 2007 eq. for m >= 128
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """Build the (register, rank) sketch table: <= 2^p rows, one narrow
    shuffle. Keys are stringified before hashing (document the cast —
    1 and '1' collide by design, matching the md5-idiom family)."""
    if not 7 <= p <= 20:
        raise ValueError("p must be in [7, 20] (m = 2^p registers, alpha valid from 128)")
    m = 1 << p
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    w = F.shiftright(h, p)
    maxrho = _HASH_BITS - p + 1
    rho = F.when(w == 0, F.lit(maxrho)).otherwise(
        F.lit(maxrho) - F.length(F.bin(w))
    )
    return (
        df.select(h.bitwiseAND(F.lit(m - 1)).alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the SAME p -> one merged sketch.
    max is associative/commutative, so merge order never matters."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """Sketch table -> ONE row (m, nonzero, v_zero, sum_scaled, raw_est,
    est). All but `est` are bit-identical across engines; `est` applies
    the linear-counting small-range correction (ln) and is rounded to a
    BIGINT so libm ULP differences cannot surface."""
    m = 1 << p
    # the PySpark shiftleft wrapper only takes a literal shift count
    # (same workaround as bloom_build); 62-rho stays in [13, 61] so the
    # term always fits BIGINT before the exact DECIMAL(38,0) sum
    term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(62 - rho AS INT))").cast(
        "decimal(38,0)"
    )
    agg = sketch.agg(
        F.count("*").alias("nonzero"),
        F.coalesce(F.sum(term), F.lit(0).cast("decimal(38,0)")).alias("_s"),
        F.coalesce(F.max("register"), F.lit(0)).alias("_maxreg"),
    )
    two62 = float(1 << 62)
    md = float(m)
    v = F.lit(m) - F.col("nonzero")
    scaled = (
        F.col("_s") + v.cast("decimal(38,0)") * F.lit(1 << 62).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(_alpha(m)) * F.lit(md) * F.lit(md) * F.lit(two62) / scaled
    vd = v.cast("double")
    corrected = F.when(
        (raw <= F.lit(2.5 * md)) & (v > 0), F.lit(md) * F.log(F.lit(md) / vd)
    ).otherwise(raw)
    # fail-loud p-mismatch guard (woven into a KEPT column, repo
    # convention): estimating a sketch built with a LARGER p under this p
    # has registers >= 2^p (or more than 2^p rows), and would otherwise
    # silently yield garbage (nonzero > m makes v_zero negative and the
    # harmonic sum wrong); a SMALLER-p sketch is indistinguishable from a
    # sparse one, which is why p is an explicit parameter, not sniffed
    ok = (F.col("_maxreg") < F.lit(m)) & (F.col("nonzero") <= F.lit(m))
    m_guarded = F.when(ok, F.lit(m).cast("long")).otherwise(
        F.raise_error(F.format_string(
            "hll_estimate: sketch is not a p=%s sketch (max register %s, "
            "nonzero %s) — estimate/merge must use the p the sketch was "
            "built with", F.lit(str(p)), F.col("_maxreg"), F.col("nonzero")))
        .cast("long")
    )
    return agg.select(
        m_guarded.alias("m"),
        F.col("nonzero").cast("long").alias("nonzero"),
        v.cast("long").alias("v_zero"),
        scaled.alias("sum_scaled"),
        raw.alias("raw_est"),
        F.round(corrected, 0).cast("long").alias("est"),
    )


def hll_distinct(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """Approximate COUNT(DISTINCT key) in one narrow pass: sketch +
    estimate composed. Standard error ~ 1.04/sqrt(2^p) (1.6% at p=12)."""
    return hll_estimate(hll_sketch(df, key_col, p), p)


def cms_build(
    df: DataFrame, key_col: str, width: int = 1 << 14, depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode-Muthukrishnan 2005) over a key column
    -> a (row, pos, cnt) table of depth*width counters, built with ONE
    narrow groupBy (keys explode to `depth` integer positions; text
    never shuffles). Positions use the portable md5 idiom salted per
    row (`md5(key || '#cm<r>')`), so any engine rebuilds the identical
    sketch; counters are exact BIGINT sums (optionally of weight_col).
    Sketches over disjoint batches MERGE by union + groupBy sum (exact
    additivity — the streaming/rollup property). Absent counters are
    zero (not materialized)."""
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    key = F.col(key_col).cast("string")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(key, F.lit(f"#cm{r}"))), 1, 15),
                        16, 10,
                    ).cast("bigint") % width
                ).alias("pos"),
            )
            for r in range(depth)
        ])
    )
    return (
        df.select(rows.alias("_rp"), w.alias("_w"))
        .groupBy(F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame, cms: DataFrame, key_col: str, width: int = 1 << 14,
    depth: int = 4, broadcast_sketch: bool = True,
) -> DataFrame:
    """Point-query the sketch: est = MIN over rows of the counter at
    that row's position (the CM guarantee: est >= true count, and
    est <= true + eps*N with prob 1-delta, eps = e/width, delta =
    e^-depth). Probes explode to (row, pos) and join the sketch —
    broadcast when it fits (depth*width counters), shuffled hash join
    otherwise; a missing counter is 0, which forces est = 0 for keys
    hashing to any untouched cell. Adds `est` to the probe rows."""
    key = F.col(key_col).cast("string")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(key, F.lit(f"#cm{r}"))), 1, 15),
                        16, 10,
                    ).cast("bigint") % width
                ).alias("pos"),
            )
            for r in range(depth)
        ])
    )
    sk = F.broadcast(cms) if broadcast_sketch else cms
    probe = probes.select(key.alias("key")).distinct().select(
        "key", rows.alias("_rp")
    ).select("key", F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos"))
    j = probe.join(sk, ["row", "pos"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return j.groupBy("key").agg(F.min("_c").alias("est"))


def cms_topk(
    df: DataFrame, key_col: str, k: int, width: int = 1 << 14, depth: int = 4,
) -> DataFrame:
    """Heavy hitters: estimate every distinct key against the sketch of
    the same data and keep the top k by (est DESC, key ASC — the
    deterministic tie-break). The candidate set is the exact distinct
    keys (sound: CM never underestimates, so no true heavy hitter can
    be pushed out by an underestimate — only overestimates can sneak
    IN, the documented one-sided error). Returns (key, est, rank)."""
    from pyspark.sql import Window

    cms = cms_build(df, key_col, width, depth)
    est = cms_estimate(df.select(key_col), cms, key_col, width, depth)
    win = Window.orderBy(F.col("est").desc(), F.col("key").asc())
    return (
        est.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("key", "est", "rank")
    )


def order_statistic(
    df: DataFrame,
    ks: list,
    v_col: str = "v",
) -> DataFrame:
    """EXACT k-th order statistics of an INTEGER column at scale —
    the primitive behind exact medians/percentiles on data too big to
    sort: for each 1-based k, the k-th smallest value, found by
    BISECTION ON THE VALUE DOMAIN — each probe is one narrow
    aggregation count(v <= mid) with map-side partials (no global
    sort, no shuffle of data rows, O(log range) ~ <=64 passes total
    per k over a cached projection). Returns (k, value) rows; the
    answer is the smallest v with count(<= v) >= k — the standard
    selection definition, ties handled inherently. Fails loud on
    k out of [1, n].

    Contrast approx_percentile (approximate, seed-dependent) and
    ORDER BY + OFFSET (a full sort): this is exact AND scale-safe.

    Physical shape (r06): B-ary search (B = `branch`, default 1024)
    over ALL requested ks at once — each round is ONE narrow
    (k, bucket) census with map-side partials (<= len(ks)*B tiny
    groups collected), and every k's live range shrinks by B per
    round, so a 64-bit domain resolves in <= ceil(64/log2 B) ~ 7
    passes TOTAL instead of binary search's ~64 passes PER k (the
    round-start shape: ~125 sequential driver-synchronous jobs at the
    sf0.1 gate, ~8s of pure job-launch overhead). Same selection rule,
    bit-identical answers: the k-th statistic is the smallest v with
    count(<= v) >= k, tracked as a running base = count(v < lo).
    """
    if not ks:
        raise ValueError("ks must be non-empty")
    ks = [int(k) for k in ks]
    if any(k < 1 for k in ks):
        raise ValueError("every k must be >= 1")
    B = 1024  # collected census is <= len(ks)*B rows — driver-tiny
    v = df.select(F.col(v_col).cast("long").alias("v")).persist()
    try:
        row = v.agg(
            F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        n, lo0, hi0 = row["n"], row["lo"], row["hi"]
        if any(k > n for k in ks):
            raise ValueError(f"k exceeds row count {n}")
        uks = sorted(set(ks))
        # per unique k: (lo, hi, base) with the invariants
        #   answer(k) in [lo, hi] and base = count(v < lo) < k
        live = {k: (lo0, hi0, 0) for k in uks}
        answers: dict[int, int] = {}
        while live:
            items = list(live.items())
            widths = [(hi - lo) // B + 1 for _, (lo, hi, _) in items]
            sel = F.array(*[
                F.when(
                    (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi)),
                    F.struct(
                        F.lit(i).alias("ki"),
                        # integer DIV: exact at any long span (a double
                        # division would misplace boundary values once the
                        # span exceeds 2^53)
                        F.expr(f"(v - ({lo})) div {w}").alias("b"),
                    ),
                )
                for i, ((_, (lo, hi, _)), w) in enumerate(zip(items, widths))
            ])
            cnt = (
                v.select(F.explode(sel).alias("s"))
                .where(F.col("s").isNotNull())
                .groupBy(F.col("s.ki").alias("ki"), F.col("s.b").alias("b"))
                .agg(F.count("*").alias("c"))
                .collect()
            )
            hist: dict[int, dict[int, int]] = {}
            for r in cnt:
                hist.setdefault(r["ki"], {})[int(r["b"])] = int(r["c"])
            for i, (k, (lo, hi, base)) in enumerate(items):
                w = widths[i]
                h = hist.get(i, {})
                cum = base
                nb = (hi - lo) // w + 1
                for j in range(nb):
                    c_j = h.get(j, 0)
                    if cum + c_j >= k:
                        if w == 1:
                            answers[k] = lo + j
                            del live[k]
                        else:
                            new_lo = lo + j * w
                            live[k] = (new_lo, min(hi, new_lo + w - 1), cum)
                        break
                    cum += c_j
                else:  # pragma: no cover — invariant violated
                    raise RuntimeError("order_statistic: bucket census lost rows")
        out = [(k, answers[k]) for k in ks]
    finally:
        v.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(out, "k long, value long")


def winsorize(
    df: DataFrame,
    lo_k: int,
    hi_k: int,
    v_col: str = "v",
) -> DataFrame:
    """Winsorization audit (the scipy.stats.mstats.winsorize /
    robust-feature-scaling role) with EXACT integer cut values: clip
    the column to [k_lo-th, k_hi-th order statistic] (1-based ks —
    callers derive them from fractions with their own documented floor
    rule) and report ONE exact row: (n, lo_v, hi_v, n_lo — values
    raised to lo_v —, n_hi, sum_clipped). Cut values come from
    ::order_statistic (value-domain bisection — no sort at any scale);
    the clip audit is one more narrow aggregation. lo_k <= hi_k
    validated; clipping to identical cuts (lo_k == hi_k) collapses the
    column to a constant, which the audit shows honestly."""
    if lo_k < 1 or hi_k < lo_k:
        raise ValueError("need 1 <= lo_k <= hi_k")
    cuts = {r["k"]: r["value"] for r in
            order_statistic(df, ks=sorted({lo_k, hi_k}), v_col=v_col).collect()}
    lo_v, hi_v = cuts[lo_k], cuts[hi_k]
    v = F.col(v_col).cast("long")
    clipped = F.greatest(F.least(v, F.lit(hi_v)), F.lit(lo_v))
    return df.agg(
        F.count("*").alias("n"),
        F.lit(lo_v).cast("long").alias("lo_v"),
        F.lit(hi_v).cast("long").alias("hi_v"),
        F.sum(F.when(v < F.lit(lo_v), 1).otherwise(0)).alias("n_lo"),
        F.sum(F.when(v > F.lit(hi_v), 1).otherwise(0)).alias("n_hi"),
        F.sum(clipped).alias("sum_clipped"),
    )


def skyline2d(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """2-D skyline / Pareto front (Börzsönyi, Kossmann & Stocker 2001
    — "The Skyline Operator"), minimizing BOTH integer columns: keep
    points not DOMINATED (a dominates b iff a.x <= b.x and a.y <= b.y
    and they differ in at least one coordinate; exact duplicates do
    not dominate each other and all survive together). Returns one
    row per surviving DISTINCT point with n = how many input rows sit
    there — exact integers, deterministic.

    Scale shape — the skyline is DISTRIBUTIVE (skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))), so stage 1 computes each
    partition's skyline locally (sort + single sweep inside Arrow
    batches; no shuffle), and stage 2 merges the candidate set — at
    most |partitions| · |true skyline| rows, i.e. bounded by the
    OUTPUT, not the input — on one task. 100 TB reduces map-side;
    the single-task finale touches only near-output-sized data.
    """

    import pandas as pd
    from typing import Iterator

    def _sky(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pdf
        g = pdf.groupby(["x", "y"], as_index=False)["n"].sum()
        g = g.sort_values(["x", "y"], kind="mergesort").reset_index(drop=True)
        keep = []
        best_y_strictly_smaller_x = None  # min y among kept points with x < cur
        cur_x = None
        cur_x_min_y = None
        for row in g.itertuples():
            if row.x != cur_x:
                if cur_x is not None:
                    best_y_strictly_smaller_x = (
                        cur_x_min_y if best_y_strictly_smaller_x is None
                        else min(best_y_strictly_smaller_x, cur_x_min_y))
                cur_x = row.x
                cur_x_min_y = row.y  # sorted: first y of the x-group is min
                # only the min-y row of each x-group can survive; it does
                # iff no smaller-x point has y <= it
                if (best_y_strictly_smaller_x is None
                        or row.y < best_y_strictly_smaller_x):
                    keep.append(row.Index)
            # non-first rows of an x-group are dominated by the first
        return g.loc[keep]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if len(p)]
        if parts:
            yield _sky(pd.concat(parts, ignore_index=True))

    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.lit(1).cast("long").alias("n"),
    )
    schema = "x long, y long, n long"
    stage1 = base.mapInPandas(fn, schema=schema)
    return stage1.coalesce(1).mapInPandas(fn, schema=schema)
