"""Similarity search over embedding columns (task brief): brute-force
cosine top-k baseline + LSH-bucketed scale path.

Brute force stays JVM-side (zip_with/aggregate dot products — no Python);
the LSH variant buckets by random-hyperplane sign bits so the candidate
join is an equi-join on the bucket key (multi-probe: query joins its own
bucket plus single-bit flips). At 100TB the bucket join replaces the
all-pairs cross join; recall is tunable via bits/probes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side, window top-k.
    Returns (query_id, vec_id, cosine, rank)."""
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("_qv"))
    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("_cv"))
    j = c.crossJoin(F.broadcast(q)).withColumn("cosine", _cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


def hyperplane_bucket(vec_col, planes: np.ndarray):
    """Sign-bit bucket key for random hyperplanes (list of lists literal)."""
    key = F.lit(0).cast("long")
    for bi, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        key = key + F.when(dot >= 0, F.lit(1 << bi).cast("long")).otherwise(F.lit(0).cast("long"))
    return key


def _kmeans_np(sample: np.ndarray, n_lists: int, iters: int, seed: int) -> np.ndarray:
    """Small deterministic Lloyd k-means on L2-normalized vectors (driver
    side, bounded sample) -> unit-norm centroids (n_lists, dim)."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    if len(cent) < n_lists:  # tiny corpus: pad with jittered copies
        extra = cent[rng.integers(0, len(cent), n_lists - len(cent))]
        cent = np.vstack([cent, extra + rng.standard_normal(extra.shape) * 1e-3])
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    sample_size: int = 100_000,
    max_sample_bytes: int = 256 << 20,
    iters: int = 10,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via an IVF coarse quantizer (the second
    scale path next to lsh_topk): k-means centroids trained driver-side on
    a bounded sample (centroids are tiny and broadcast inside the Arrow
    UDF closures), every corpus vector assigned to its nearest-centroid
    list (one vectorized pandas UDF, no shuffle), each query probes its
    `n_probe` nearest lists — candidate generation is an equi-join on the
    list id, so at 10^12 rows the join shuffles (id, list) keys instead of
    an all-pairs cross join. Exact cosine rank within candidates.

    Driver-memory contract: the k-means training sample is bounded in
    BYTES, not just rows — the effective sample is
    ``min(sample_size, max_sample_bytes // (dim * 8))`` rows (dim probed
    with one cheap head(1) job), so a dim=4096 corpus can't balloon the
    default 100k-row sample to multiple GB on the driver. The default
    256 MB cap keeps the collected float64 sample comfortably inside a
    normal driver heap; lower it for small drivers.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    # dim probe must skip NULL/empty vectors: with ANSI off, size(NULL) is
    # -1, which would zero out the byte cap and re-enable the unbounded
    # 100k-row collect this guard exists to prevent
    head = (
        corpus.select(F.size(F.col(c_vec).cast("array<double>")).alias("_d"))
        .filter(F.col("_d") > 0)
        .head(1)
    )
    if not head:
        raise ValueError("ivf_topk: empty corpus (no non-null embedding rows)")
    dim = int(head[0]["_d"])
    eff_sample = max(n_lists, min(sample_size, max_sample_bytes // max(dim * 8, 1)))

    # deterministic uniform sample: order by a hash of the id, not a
    # partition prefix (limit() alone returns the first partitions, which
    # for source-clustered corpora covers one region of the space and
    # collapses the quantizer); orderBy+limit = per-partition top-k merge
    sample_rows = (
        corpus.select(F.col(c_id).alias("_sid"), F.col(c_vec).cast("array<double>").alias("_sv"))
        .orderBy(F.xxhash64(F.col("_sid").cast("string"), F.lit(seed)))
        .limit(eff_sample)
        .collect()
    )
    if not sample_rows:
        raise ValueError("ivf_topk: empty corpus")
    sample = np.array([r["_sv"] for r in sample_rows], dtype=np.float64)
    cent = _kmeans_np(sample, n_lists, iters, seed)

    @F.pandas_udf(IntegerType())
    def assign_list(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_lists(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        top = np.argsort(-(x @ cent.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("_cv"))
    cb = c.withColumn("_list", assign_list(F.col("_cv")))
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("_qv"))
    qb = q.withColumn("_list", F.explode(probe_lists(F.col("_qv"))))
    cand = qb.join(cb, "_list").withColumn("cosine", _cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidate generation = equi-join on bucket; multiprobe adds all
    1-bit-flip buckets for the query side (bits+1 probes). Exact cosine
    rank within candidates.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("_qv"))
    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("_cv"))
    cb = c.withColumn("_bucket", hyperplane_bucket(F.col("_cv"), planes))
    qb = q.withColumn("_b0", hyperplane_bucket(F.col("_qv"), planes))
    if multiprobe:
        probes = F.array(*([F.col("_b0")] + [F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]))
        qb = qb.withColumn("_bucket", F.explode(probes))
    else:
        qb = qb.withColumn("_bucket", F.col("_b0"))
    cand = qb.join(cb, "_bucket").dropDuplicates([q_id, c_id])
    cand = cand.withColumn("cosine", _cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


def _kmeans_plain(sample: np.ndarray, ks: int, iters: int, seed: int) -> np.ndarray:
    """Small deterministic Lloyd k-means WITHOUT normalization (PQ
    sub-codebooks live in raw subvector space, unlike the unit-norm IVF
    coarse quantizer). Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(ks, len(sample)), replace=False)].copy()
    if len(cent) < ks:
        extra = cent[rng.integers(0, len(cent), ks - len(cent))]
        cent = np.vstack([cent, extra + rng.standard_normal(extra.shape) * 1e-3])
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(ks):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def _pq_train(sample: np.ndarray, n_sub: int, ks: int, iters: int, seed: int) -> np.ndarray:
    """Per-subspace codebooks over L2-NORMALIZED full vectors ->
    (n_sub, ks, d_sub). dim must divide evenly into n_sub subspaces."""
    n, dim = sample.shape
    if dim % n_sub:
        raise ValueError(f"pq: dim {dim} not divisible by n_sub {n_sub}")
    d_sub = dim // n_sub
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    return np.stack(
        [_kmeans_plain(x[:, j * d_sub : (j + 1) * d_sub], ks, iters, seed + j) for j in range(n_sub)]
    )


def _pq_encode(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """L2-normalize rows, then per subspace the nearest codebook entry
    (L2, first-minimum tie rule) -> int32 codes (n, n_sub)."""
    n_sub, ks, d_sub = cents.shape
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    codes = np.empty((len(x), n_sub), dtype=np.int32)
    for j in range(n_sub):
        sub = xn[:, j * d_sub : (j + 1) * d_sub]
        d2 = ((sub[:, None, :] - cents[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def _pq_luts(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup tables: lut[j][c] = <q_j, cent_jc> over the
    L2-normalized query -> float64 (nq, n_sub, ks). The approximate dot
    product of a query with a coded vector is sum_j lut[j][code_j]."""
    n_sub, ks, d_sub = cents.shape
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return np.stack(
        [qn[:, j * d_sub : (j + 1) * d_sub] @ cents[j].T for j in range(n_sub)], axis=1
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_sub: int = 8,
    ks: int = 16,
    seed: int = 42,
    sample_size: int = 100_000,
    max_sample_bytes: int = 256 << 20,
    iters: int = 10,
    rerank: int = 0,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (the third scale path, next to lsh_topk
    and ivf_topk): asymmetric-distance (ADC) scoring over compressed
    codes.

    * codebooks: per-subspace plain-L2 k-means trained driver-side on the
      same byte-bounded deterministic sample discipline as ivf_topk;
      tiny (n_sub * ks * d_sub doubles), shipped inside UDF closures.
    * corpus: encoded ONCE to an array<int> of n_sub codes — n_sub bytes
      of information per vector instead of dim*8 (32x at dim=64/n_sub=8);
      at 10^12 rows the scan reads codes, never embeddings.
    * scoring: per query an ADC lookup table lut[j][c] = <q_j, c_jc>;
      approx dot = sum_j lut[j][code_j] computed JVM-SIDE as
      aggregate(zip_with(lut, codes, element_at)) over the broadcast
      query side — n_sub array lookups per pair instead of dim multiplies,
      no Python in the scan, no shuffle (linear scan + per-query top-k).
    * optional exact rerank: top `rerank` ADC candidates re-scored with
      exact cosine (recall recovery at small extra cost); rerank=0 ranks
      by ADC score directly (deterministic: score desc, id asc).

    PQ accelerates and compresses the scan but does not prune it — for
    pruning AND compression compose with ivf_topk's list assignment
    (IVF-PQ), both building blocks being here.

    Returns (query_id, vec_id, rank).
    """
    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    head = (
        corpus.select(F.size(F.col(c_vec).cast("array<double>")).alias("_d"))
        .filter(F.col("_d") > 0)
        .head(1)
    )
    if not head:
        raise ValueError("pq_topk: empty corpus (no non-null embedding rows)")
    dim = int(head[0]["_d"])
    if dim % n_sub:
        raise ValueError(f"pq_topk: dim {dim} not divisible by n_sub {n_sub}")
    eff_sample = max(ks, min(sample_size, max_sample_bytes // max(dim * 8, 1)))
    sample_rows = (
        corpus.select(F.col(c_id).alias("_sid"), F.col(c_vec).cast("array<double>").alias("_sv"))
        .orderBy(F.xxhash64(F.col("_sid").cast("string"), F.lit(seed)))
        .limit(eff_sample)
        .collect()
    )
    sample = np.array([r["_sv"] for r in sample_rows], dtype=np.float64)
    cents = _pq_train(sample, n_sub, ks, iters, seed)

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def luts(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series([[r.tolist() for r in lut] for lut in _pq_luts(x, cents)])

    coded = pq_encode_corpus(corpus, cents, c_id=c_id, c_vec=c_vec)
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("_qv"))
    qb = q.select(q_id, "_qv", luts(F.col("_qv")).alias("_lut"))
    cand = coded.crossJoin(F.broadcast(qb)).withColumn("_score", _adc_score())
    w = Window.partitionBy(q_id).orderBy(F.col("_score").desc(), F.col(c_id).asc())
    if rerank and rerank > k:
        pool = cand.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= rerank)
        pool = pool.withColumn("cosine", _cosine(F.col("_qv"), F.col("_cv")))
        w2 = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
        return (
            pool.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank")
        )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "rank")
    )


def pq_encode_corpus(
    corpus: DataFrame,
    cents: np.ndarray,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    coarse: np.ndarray | None = None,
) -> DataFrame:
    """Index-BUILD half of the PQ/IVF-PQ pipeline: encode the corpus
    once to (id, [_list,] codes) and PERSIST the result — at 10^12 rows
    the codes table (n_sub small ints + optional list id per vector) is
    what searches scan; embeddings are only re-read by an exact rerank.
    `cents` from _pq_train; `coarse` (optional) are unit-norm IVF
    centroids from _kmeans_np — when given, each vector also gets its
    nearest-centroid `_list` for probe pruning (IVF-PQ, non-residual:
    codes quantize the normalized vector itself, not the residual —
    simpler, slightly coarser, documented)."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    out_fields = [StructField("_codes", ArrayType(IntegerType()))]
    if coarse is not None:
        out_fields.append(StructField("_list", IntegerType()))

    @F.pandas_udf(StructType(out_fields))
    def enc(v: pd.Series) -> pd.DataFrame:
        x = np.stack(v.to_numpy()).astype(np.float64)
        codes = [row.tolist() for row in _pq_encode(x, cents)]
        if coarse is None:
            return pd.DataFrame({"_codes": codes})
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        lists = (xn @ coarse.T).argmax(axis=1).astype(np.int32)
        return pd.DataFrame({"_codes": codes, "_list": lists})

    c = corpus.select(F.col(c_id), F.col(c_vec).cast("array<double>").alias("_cv"))
    enc_col = enc(F.col("_cv"))
    cols = [F.col(c_id), F.col("_cv"), enc_col.getField("_codes").alias("_codes")]
    if coarse is not None:
        cols.append(enc_col.getField("_list").alias("_list"))
    return c.select(*cols)


def _adc_score():
    """ADC score Column: left-to-right JVM double fold of per-subspace
    lookups — n_sub array indexings per pair instead of dim multiplies."""
    return F.aggregate(
        F.zip_with("_lut", "_codes", lambda l, cc: F.element_at(l, cc + F.lit(1))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    ks: int = 16,
    seed: int = 42,
    sample_size: int = 100_000,
    max_sample_bytes: int = 256 << 20,
    iters: int = 10,
    rerank: int = 0,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse-quantizer list PRUNING (ivf_topk's shape — the
    candidate join is an equi-join on the list id, so at 10^12 rows only
    n_probe/n_lists of the corpus is touched per query) COMPOSED with
    PQ/ADC COMPRESSION (pq_topk's scoring — candidates are scored from
    n_sub-int codes with JVM table lookups, embeddings untouched unless
    reranking). Non-residual variant: PQ codes quantize the normalized
    vector itself (one shared codebook set), trading a little accuracy
    for one codebook train + one encode pass; the residual refinement is
    a documented extension point, not a silent gap.

    Training sample discipline, determinism and tie rules are identical
    to ivf_topk/pq_topk. Returns (query_id, vec_id, rank)."""
    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    head = (
        corpus.select(F.size(F.col(c_vec).cast("array<double>")).alias("_d"))
        .filter(F.col("_d") > 0)
        .head(1)
    )
    if not head:
        raise ValueError("ivfpq_topk: empty corpus (no non-null embedding rows)")
    dim = int(head[0]["_d"])
    if dim % n_sub:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by n_sub {n_sub}")
    eff_sample = max(max(ks, n_lists), min(sample_size, max_sample_bytes // max(dim * 8, 1)))
    sample_rows = (
        corpus.select(F.col(c_id).alias("_sid"), F.col(c_vec).cast("array<double>").alias("_sv"))
        .orderBy(F.xxhash64(F.col("_sid").cast("string"), F.lit(seed)))
        .limit(eff_sample)
        .collect()
    )
    sample = np.array([r["_sv"] for r in sample_rows], dtype=np.float64)
    coarse = _kmeans_np(sample, n_lists, iters, seed)
    cents = _pq_train(sample, n_sub, ks, iters, seed)

    coded = pq_encode_corpus(corpus, cents, c_id=c_id, c_vec=c_vec, coarse=coarse)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_lists(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        top = np.argsort(-(xn @ coarse.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def luts(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series([[r.tolist() for r in lut] for lut in _pq_luts(x, cents)])

    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("_qv"))
    qb = q.select(
        q_id, "_qv", luts(F.col("_qv")).alias("_lut"),
        F.explode(probe_lists(F.col("_qv"))).alias("_list"),
    )
    # build side MUST be the (tiny) query side: at sf0.01 AQE happily
    # builds the corpus side instead, which at 10^12 coded rows is a
    # broadcast OOM — force it
    cand = coded.join(F.broadcast(qb), "_list").withColumn("_score", _adc_score())
    w = Window.partitionBy(q_id).orderBy(F.col("_score").desc(), F.col(c_id).asc())
    if rerank and rerank > k:
        pool = cand.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= rerank)
        pool = pool.withColumn("cosine", _cosine(F.col("_qv"), F.col("_cv")))
        w2 = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
        return (
            pool.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank")
        )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "rank")
    )
