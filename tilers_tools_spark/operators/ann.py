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
