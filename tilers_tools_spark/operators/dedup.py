"""Deduplication operators for large-scale training-data pipelines (task
brief: exact, MinHash+LSH, SimHash, n-gram Jaccard — each over a documents
table at 100TB scale).

All hashing is expressed with built-in JVM-side functions where possible
(md5/xxhash64, shingling via sequence+transform) so the hot path stays in
whole-stage codegen; only the final small candidate sets touch Python.
Scale notes per operator in docstrings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash (md5). One shuffle on the 128-bit digest;
    keeps the min id per group (deterministic winner). At 100TB: hash is
    computed map-side, shuffle carries (digest, id) only — project the text
    away BEFORE the shuffle by re-joining winners back if the full row is
    needed.
    """
    h = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        h.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(Window.partitionBy("content_hash")))
        .withColumn("is_canonical", F.col("rn") == 1)
        .drop("rn")
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_hash_col: str | None = None,
) -> DataFrame:
    """Delta dedup — the continuous-ingest twin of `exact_dedup`: keep the
    rows of a NEW batch that are (a) first arrival within the batch (min id
    per content hash) and (b) not already present in an EXISTING corpus.
    Returns (id, content_hash) of survivors — the rows safe to append.

    The standard shape for a growing 100 TB corpus: the corpus side ships
    ONLY its distinct content hashes (16 bytes/doc — pass
    `corpus_hash_col` to read a precomputed hash column and skip re-hashing
    the historical text entirely), the new batch shuffles (hash, id), and
    the membership test is a LEFT ANTI join — no payload ever moves. The
    streaming twin with in-flight state is
    streaming/stateful.streaming_exact_dedup; this operator is the batch
    path that needs no state store, only the corpus itself (or its hash
    projection, which Iceberg/parquet can serve column-pruned).
    """
    nh = new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    if corpus_hash_col is not None:
        ch = corpus.select(F.col(corpus_hash_col).alias("content_hash")).distinct()
    else:
        ch = corpus.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    first = nh.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return first.join(ch, "content_hash", "left_anti").select(id_col, "content_hash")


def _mat(df: DataFrame) -> DataFrame:
    """Materialize an ITERATIVE-LOOP intermediate: lazy localCheckpoint
    (lineage cut — the logical tree of round k would otherwise contain
    ~9 copies of round k-1's tree) + persist + one count job.

    Why not eager localCheckpoint alone (the pre-r06 shape): a
    checkpoint's LogicalRDD INHERITS its origin plan's ESTIMATED
    statistics, and the size-only estimator multiplies join children —
    so in a loop whose per-round plan joins the previous checkpoint
    several times, the inherited sizeInBytes estimate compounds
    EXPONENTIALLY (measured on this box: digits 5 -> 16 -> 62 -> 246 ->
    981 -> 3924 -> 15692 over six rounds; at the sf0.1 dbscan gate the
    optimizer then sat 48 minutes inside BigInteger.multiplyToomCook3
    under SizeInBytesOnlyStatsPlanVisitor). The persist layer fixes
    that: after materialization an InMemoryRelation reports its REAL
    cached byte size, so every downstream round plans against truthful
    leaf stats (which also lets AQE pick broadcast sides honestly).
    One count() both fills the cache and writes the (lazy) checkpoint
    blocks — a single job per materialization."""
    df = df.localCheckpoint(eager=False).persist()
    df.count()
    return df


def _barrier(df: DataFrame) -> DataFrame:
    """Prevent CollapseProject from inlining the previous projection into
    downstream higher-order-function lambdas. Expressions inside
    transform()/aggregate() lambdas are interpreted per element WITHOUT
    common-subexpression elimination, so an inlined split()/lower() gets
    re-evaluated once per array element — O(n^2) per doc. A
    nondeterministic column is a collapse barrier (measured 27x on
    sf0.1 documents)."""
    return df.withColumn("_hof_barrier", F.monotonically_increasing_id())


def _shingles(text_col: str, k: int = 5):
    """Character k-gram shingles as a native array column (no UDF).
    NOTE: evaluate over a MATERIALIZED lowered-text column (see _barrier)."""
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(t, i, F.lit(k)))


def _hashed_shingles(docs: DataFrame, text_col: str, id_col: str, k: int, mode: str) -> DataFrame:
    """(id, _sh_hash: array<long>) with staged materialization: lowered
    text / token array first, then the hashed shingle array — each stage
    behind a collapse barrier so the lambdas read attributes, not
    re-evaluated expression trees."""
    if mode == "char":
        d1 = _barrier(docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_t")))
        n = F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1))
        sh = F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(F.substr(F.col("_t"), i, F.lit(k))))
    elif mode == "word":
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        d1 = _barrier(docs.select(F.col(id_col), toks.alias("_toks")))
        n = F.greatest(F.size("_toks") - F.lit(k - 1), F.lit(1))
        sh = F.transform(
            F.sequence(F.lit(1), n), lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_toks"), i, k)))
        )
    else:
        raise ValueError(mode)
    return _barrier(d1.select(id_col, sh.alias("_sh_hash")))


def _word_shingles(text_col: str, k: int = 5):
    """Word k-gram shingles as a native array column (the scale path:
    ~n_words elements per doc instead of ~n_chars for char shingles)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def _shingle_expr(text_col: str, k: int, mode: str):
    if mode == "char":
        return _shingles(text_col, k)
    if mode == "word":
        return _word_shingles(text_col, k)
    raise ValueError(mode)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 5,
    mode: str = "char",
) -> DataFrame:
    """MinHash signature per doc: min of xxhash64(seed, shingle) per seed.

    The shingle array is hashed ONCE to 64-bit base hashes; each seed then
    mixes the longs (xxhash64(seed, h)) — cheap integer math instead of
    re-reading strings num_hashes times. `mode='word'` (k-word grams,
    ~n_words shingles/doc) is the 100TB path; `mode='char'` suits short
    docs. Pure column expressions — no shuffle for signatures.
    """
    hashed = _hashed_shingles(docs, text_col, id_col, k, mode)
    cols = [
        F.array_min(F.transform(F.col("_sh_hash"), lambda h: F.xxhash64(F.lit(i), h))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return hashed.select(F.col(id_col), *cols)


def minhash_signatures_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 4, k: int = 5
) -> DataFrame:
    """Portable MinHash variant: per-seed min of md5(seed || shingle) hex
    strings (lexicographic min). Slower than the xxhash64 path but exactly
    reproducible in any engine with md5 — used by the cross-engine
    correctness oracle (__spark_entry__.oracle_sql).
    """
    d1 = _barrier(docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_t")))
    n = F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(F.col("_t"), i, F.lit(k)))
    d2 = _barrier(d1.select(id_col, sh.alias("_sh")))
    cols = [
        F.array_min(F.transform(F.col("_sh"), lambda s: F.md5(F.concat(F.lit(str(i)), s)))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return d2.select(F.col(id_col), *cols)


def _lsh_banded(
    docs: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int, k: int, mode: str
) -> DataFrame:
    """(id, band, key) rows — one per (doc, band) — shared by the pair join
    and the bucket-size diagnostics."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, k, mode)
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("key")) for b in range(bands)])).alias(
            "bk"
        ),
    ).select(id_col, "bk.band", "bk.key")


def lsh_skipped_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    mode: str = "char",
    max_bucket: int = 500,
) -> DataFrame:
    """Buckets the pair join STAR-COLLAPSES under `max_bucket` (band, key,
    n). minhash_lsh_pairs keeps those buckets' members linked to the
    bucket's min-id representative (n-1 pairs) instead of all n^2 pairs;
    this companion reports exactly which buckets were collapsed so the
    pipeline can log it (no silent truncation)."""
    melted = _lsh_banded(docs, text_col, id_col, num_hashes, bands, k, mode)
    return (
        melted.groupBy("band", "key").agg(F.count("*").alias("n")).filter(F.col("n") > max_bucket)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
    mode: str = "char",
    max_bucket: int | None = 500,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified by shingle-set
    Jaccard (same shingle definition as the signatures). Scale path:
    band-key joins shuffle only (id, band_key); exact verify joins shingle
    arrays back for the (tiny) candidate set only. Returns (a, b, jaccard)
    with a < b.

    `max_bucket` bounds the band self-join: a bucket of n identical
    signatures costs O(n^2) pairs, so buckets with > max_bucket members
    (empty docs, boilerplate) are STAR-COLLAPSED — every member pairs with
    the bucket's min-id representative only (n-1 candidates, linear).
    PRECISION is unaffected (star candidates still pass the exact jaccard
    verify); RECALL inside a collapsed bucket is via the representative:
    member-member pairs are found only when both members verify against
    the rep (always true for the identical/near-identical content the cap
    targets) or share another, small bucket — a heterogeneous hash-
    collision bucket can lose intra-bucket pairs. That loss is bounded and
    REPORTED: `lsh_skipped_buckets` with the same parameters enumerates
    the collapsed buckets (log it — no silent truncation at 100TB).
    `max_bucket=None` disables the cap (exact recall, quadratic risk).
    """
    melted = _lsh_banded(docs, text_col, id_col, num_hashes, bands, k, mode)
    if max_bucket is not None:
        w = Window.partitionBy("band", "key")
        melted = melted.withColumn("_bn", F.count("*").over(w)).withColumn(
            "_rep", F.min(id_col).over(w)
        )
        small = melted.filter(F.col("_bn") <= max_bucket)
        # degenerate buckets: representative star (rep is the min id, so
        # rep < member always; n-1 pairs instead of n^2)
        star = (
            melted.filter((F.col("_bn") > max_bucket) & (F.col(id_col) != F.col("_rep")))
            .select(F.col("_rep").alias("a"), F.col(id_col).alias("b"))
        )
    else:
        small, star = melted, None
    l = small.select(F.col(id_col).alias("a"), "band", "key")
    r = small.select(F.col(id_col).alias("b"), "band", "key")
    cand = l.join(r, ["band", "key"]).filter(F.col("a") < F.col("b")).select("a", "b")
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    sh = _hashed_shingles(docs, text_col, id_col, k, mode).select(
        F.col(id_col), F.array_distinct(F.col("_sh_hash")).alias("sh")
    )
    # |A∪B| = |A| + |B| - |A∩B| : one set op per pair instead of two
    j = (
        cand.join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("shb")), "b")
        .withColumn("_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.size("sha") + F.size("shb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )
    return j


def minhash_lsh_pairs_md5(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Portable banded-LSH near-dup pairs: md5 minhash signatures
    (minhash_signatures_md5), band key = concatenated per-band minima,
    exact char-k-gram Jaccard verify — every step reproducible in any
    engine with md5 (used by the cross-engine oracle; the xxhash64
    `minhash_lsh_pairs` is the throughput path). Returns (a, b, jaccard),
    a < b.
    """
    melted = _banded_md5(docs, text_col, id_col, num_hashes, bands, k)
    l = melted.select(F.col(id_col).alias("a"), "band", "key")
    r = melted.select(F.col(id_col).alias("b"), "band", "key")
    cand = l.join(r, ["band", "key"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    sh = _hashed_shingles(docs, text_col, id_col, k, "char").select(
        F.col(id_col), F.array_distinct(F.col("_sh_hash")).alias("sh")
    )
    return (
        cand.join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("shb")), "b")
        .withColumn("_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.size("sha") + F.size("shb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )


def _banded_md5(docs: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int, k: int) -> DataFrame:
    """(id, band, key) rows from md5 minhash signatures (portable twin of
    _lsh_banded; band key = concatenated per-band minima)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures_md5(docs, text_col, id_col, num_hashes, k)
    band_cols = [
        F.concat(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("key")) for b in range(bands)])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def lsh_match_corpus_md5(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
    max_corpus_bucket: int | None = None,
) -> DataFrame:
    """NEAR-dup matches of a new batch against an existing corpus — the
    delta twin of `minhash_lsh_pairs_md5` (incremental_exact_dedup handles
    byte-identical content; this catches boilerplate/near-copies). Returns
    (new_id, corpus_id, jaccard) for every verified match.

    Shape at 100 TB: both sides band to narrow (id, band, key) rows — the
    corpus side can be PRECOMPUTED once and stored (signatures are tiny) —
    candidates come from a band-key equi-join (never all-pairs), and
    shingle arrays re-join for the surviving candidates only.
    `max_corpus_bucket` star-collapses degenerate CORPUS buckets to their
    min-id representative: a new doc probing a hot bucket (10k identical
    boilerplate docs) verifies against one representative instead of 10k
    members — enough to decide is-dup, and the candidate count stays
    linear in the new batch. New-side buckets need no cap: each new doc
    contributes at most `bands` probe rows.
    """
    nb = _banded_md5(new_docs, text_col, id_col, num_hashes, bands, k)
    cb = _banded_md5(corpus, text_col, id_col, num_hashes, bands, k)
    if max_corpus_bucket is not None:
        w = Window.partitionBy("band", "key")
        cb = (
            cb.withColumn("_bn", F.count("*").over(w))
            .withColumn("_rep", F.min(id_col).over(w))
            .filter((F.col("_bn") <= max_corpus_bucket) | (F.col(id_col) == F.col("_rep")))
            .drop("_bn", "_rep")
        )
    cand = (
        nb.select(F.col(id_col).alias("new_id"), "band", "key")
        .join(cb.select(F.col(id_col).alias("corpus_id"), "band", "key"), ["band", "key"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    def sh(docs):
        return _hashed_shingles(docs, text_col, id_col, k, "char").select(
            F.col(id_col), F.array_distinct(F.col("_sh_hash")).alias("sh")
        )
    return (
        cand.join(sh(new_docs).select(F.col(id_col).alias("new_id"), F.col("sh").alias("sha")), "new_id")
        .join(sh(corpus).select(F.col(id_col).alias("corpus_id"), F.col("sh").alias("shb")), "corpus_id")
        .withColumn("_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.size("sha") + F.size("shb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def incremental_lsh_dedup_md5(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
    max_corpus_bucket: int | None = None,
) -> DataFrame:
    """Ids of new-batch docs with NO verified near-dup in the corpus (the
    rows safe to append, near-dup-wise). Compose with
    `minhash_lsh_pairs`/`dedup_clusters` over the survivors for
    within-batch near-dups, and `incremental_exact_dedup` for exact ones.
    """
    matches = lsh_match_corpus_md5(
        new_docs, corpus, text_col, id_col, num_hashes, bands, k, jaccard_threshold,
        max_corpus_bucket,
    )
    return (
        new_docs.select(id_col)
        .distinct()
        .join(matches.select(F.col("new_id").alias(id_col)).distinct(), id_col, "left_anti")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens via explode + codegen'd
    hash-aggregate: per-token xxhash64 (computed ONCE, JVM-side), then 64
    sum(sign-of-bit) votes in one hash aggregation. One shuffle of narrow
    (doc_id, hash) rows with map-side partial aggregation — the relational
    formulation beats interpreted higher-order-function folds by orders of
    magnitude and scales with AQE. Empty docs get simhash = 0.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_tok")
    ).withColumn("_h", F.xxhash64("_tok"))
    votes = [
        F.sum(
            F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        bitval = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        sim = sim + F.when(F.col(f"_v{b}") > 0, bitval).otherwise(F.lit(0).cast("long"))
    out = agg.select(F.col(id_col), sim.alias("simhash"))
    # left join back so empty/whitespace-only docs are kept with simhash 0
    return docs.select(id_col).join(out, id_col, "left").fillna({"simhash": 0})


def simhash_md5_32(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Portable 32-bit SimHash twin of `simhash` for cross-engine
    verification: the per-token hash is defined POSITIONALLY on the first 8
    hex chars of md5(token) — bit b (0..31) is bit (b % 4) of the value of
    hex digit (b // 4) — so any engine with md5/substr reproduces it exactly
    (the production path `simhash` uses xxhash64, which only Spark has).
    Same explode + codegen'd hash-agg vote shape as `simhash`.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_tok")
    )
    md5c = F.md5("_tok")
    nib = [F.conv(F.substring(md5c, i + 1, 1), 16, 10).cast("int") for i in range(8)]
    votes = [
        F.sum(
            F.when(F.shiftright(nib[b // 4], b % 4).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(32)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(32):
        sim = sim + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    out = agg.select(F.col(id_col), sim.alias("simhash32"))
    return docs.select(id_col).join(out, id_col, "left").fillna({"simhash32": 0})


def _simhash_banded(sims: DataFrame, id_col: str, sim_col: str, bits: int, bands: int) -> DataFrame:
    """(id, band, val) rows — one per (doc, band) — shared by the pair join
    and the bucket-size diagnostics."""
    width = bits // bands
    mask = (1 << width) - 1
    s = sims.select(F.col(id_col), F.col(sim_col).cast("long").alias("_s"))
    return s.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("_s", b * width).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.val")


def simhash_skipped_buckets(
    sims: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 64,
    bands: int = 4,
    max_bucket: int = 500,
) -> DataFrame:
    """Band buckets simhash_pairs STAR-COLLAPSES under `max_bucket`:
    (band, val, n). Same no-silent-truncation companion as
    lsh_skipped_buckets — log it at scale."""
    melted = _simhash_banded(sims, id_col, sim_col, bits, bands)
    return melted.groupBy("band", "val").agg(F.count("*").alias("n")).filter(F.col("n") > max_bucket)


def simhash_pairs(
    sims: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs from a simhash column: the pairs with hamming
    distance <= max_hamming, found without an all-pairs join — EXACT when
    `max_bucket=None` (the default), and exact outside collapsed buckets
    otherwise (see below).

    Choosing `max_bucket`: the band-value space is 2^(bits/bands), so
    ORDINARY buckets hold ~corpus/2^(bits/bands) members — the cap must sit
    well above that or normal buckets get collapsed and true pairs lost
    (measured: a flat cap of 500 on a 32-bit/4-band corpus of 5000 docs
    loses 42% of true pairs). With the 64-bit/4-band production shape the
    band space is 2^16, so e.g. max_bucket=500 only triggers on genuinely
    degenerate hot values (simhash 0 from empty docs); with narrow bands
    (32-bit/4-band = 2^8 values) leave it None or size it to
    >> corpus/2^(bits/bands).

    Pigeonhole banding: the `bits` are split into `bands` disjoint bands;
    any pair differing in <= bands-1 bits matches exactly on at least one
    band, so equi-joining per-band values yields a candidate superset,
    then bit_count(a XOR b) filters exactly. Requires
    max_hamming <= bands - 1 (raises otherwise). Narrow (id, band, value)
    shuffle only; simhash values re-joined for surviving candidates.
    Returns (a, b, hamming) with a < b.

    `max_bucket` bounds the band self-join against degenerate hot values
    (simhash 0 from empty/whitespace docs makes a band bucket of n cost
    O(n^2) pairs): buckets with > max_bucket members are STAR-COLLAPSED —
    every member pairs with the bucket's min-id representative only (n-1
    candidates, linear). The hamming filter still applies to star pairs,
    so PRECISION is exact; inside a collapsed bucket, member-member pairs
    are recalled only when both members are within max_hamming of the rep
    (always true for the identical-value hot buckets the cap targets) or
    share another, small band bucket — a heterogeneous >max_bucket bucket
    can lose intra-bucket pairs. Bounded and REPORTED:
    `simhash_skipped_buckets` with the same parameters enumerates collapsed
    buckets (log it — no silent truncation at 100TB). `max_bucket=None`
    disables the cap (exact, quadratic risk).
    """
    if max_hamming > bands - 1:
        raise ValueError(f"pigeonhole needs max_hamming <= bands-1, got {max_hamming} > {bands - 1}")
    s = sims.select(F.col(id_col), F.col(sim_col).cast("long").alias("_s"))
    melted = _simhash_banded(sims, id_col, sim_col, bits, bands)
    if max_bucket is not None:
        w = Window.partitionBy("band", "val")
        melted = melted.withColumn("_bn", F.count("*").over(w)).withColumn(
            "_rep", F.min(id_col).over(w)
        )
        small = melted.filter(F.col("_bn") <= max_bucket)
        star = (
            melted.filter((F.col("_bn") > max_bucket) & (F.col(id_col) != F.col("_rep")))
            .select(F.col("_rep").alias("a"), F.col(id_col).alias("b"))
        )
    else:
        small, star = melted, None
    l = small.select(F.col(id_col).alias("a"), "band", "val")
    r = small.select(F.col(id_col).alias("b"), "band", "val")
    cand = l.join(r, ["band", "val"]).filter(F.col("a") < F.col("b")).select("a", "b")
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    sa = s.select(F.col(id_col).alias("a"), F.col("_s").alias("_sa"))
    sb = s.select(F.col(id_col).alias("b"), F.col("_s").alias("_sb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("long").alias("hamming"))
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    (plus 1-bit-flip probes) generate candidates as equi-joins; exact
    cosine filters at `threshold`. Returns (a, b, cosine) with a < b.
    The all-pairs cross join never materializes — the scale path for
    near-dup detection over embedding columns.

    Shuffle discipline (the 100TB path, same shape as minhash_lsh_pairs):
    candidate generation explodes and joins NARROW (id, bucket) rows only —
    the multiprobe explode amplifies the corpus x(bits+1), so carrying the
    dense vector there would shuffle ~9x the corpus bytes. Vectors are
    re-joined only for the surviving deduped candidate pairs.
    """
    import numpy as np

    from .ann import _cosine, hyperplane_bucket

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    e = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    b = e.withColumn("_b0", hyperplane_bucket(F.col("_v"), planes)).select(F.col(id_col), "_b0")
    probes = F.array(*([F.col("_b0")] + [F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]))
    left = b.withColumn("_bucket", F.explode(probes)).select(F.col(id_col).alias("a"), "_bucket")
    right = b.select(F.col(id_col).alias("b"), F.col("_b0").alias("_bucket"))
    cand = left.join(right, "_bucket").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    va = e.select(F.col(id_col).alias("a"), F.col("_v").alias("_va"))
    vb = e.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn("cosine", _cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5, threshold: float = 0.8, length_band: int = 32
) -> DataFrame:
    """All-pairs n-gram Jaccard within length bands (cheap blocking for
    small/medium corpora; MinHash-LSH is the scale path). Returns
    (a, b, jaccard) with a < b.
    """
    d1 = _barrier(
        docs.select(
            F.col(id_col),
            (F.length(text_col) / length_band).cast("long").alias("_band"),
            F.lower(F.col(text_col)).alias("_t"),
        )
    )
    n = F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(F.substr(F.col("_t"), i, F.lit(k))))
    sh = _barrier(d1.select(id_col, "_band", F.array_distinct(grams).alias("sh")))
    # band blocking as an EQUI join (not a |l-r|<=1 theta join, which Spark
    # plans as a single-partition nested loop): the probe side explodes to
    # bands {b-1, b, b+1}; band_r is unique per row so no duplicate pairs
    # arise. The explode and join carry NARROW (id, band, size) rows only —
    # the gram arrays are re-joined just for surviving candidates (same
    # discipline as minhash_lsh_pairs / embedding_near_dup). Size-ratio
    # prefilter (exact): jaccard >= t requires min(|A|,|B|) >= t*max(|A|,|B|).
    narrow = sh.select(id_col, "_band", F.size("sh").alias("_n"))
    l = narrow.select(
        F.col(id_col).alias("a"),
        F.col("_n").alias("_na"),
        F.explode(F.array(F.col("_band") - 1, F.col("_band"), F.col("_band") + 1)).alias("_band_j"),
    )
    r = narrow.select(F.col(id_col).alias("b"), F.col("_n").alias("_nb"), F.col("_band").alias("_band_r"))
    cand = l.join(
        r,
        (F.col("_band_j") == F.col("_band_r"))
        & (F.col("a") < F.col("b"))
        # same division shape as the final jaccard filter so a pair whose
        # exact jaccard equals the threshold is never dropped by float
        # rounding of threshold*max (least >= t*greatest can round the
        # wrong way when equality holds)
        & (F.least("_na", "_nb").cast("double") / F.greatest("_na", "_nb").cast("double") >= F.lit(threshold)),
    ).select("a", "b")
    # |A∪B| = |A| + |B| - |A∩B| : one set op per pair instead of two
    return (
        cand.join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sha")), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("shb")), "b")
        .withColumn("_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.size("sha") + F.size("shb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (id, comp) with
    comp = the component's minimum node id. The step that turns pairwise
    LSH/simhash/ngram candidates into DEDUP GROUPS (pick one canonical doc
    per component) — the standard tail of a 100TB dedup pipeline.

    GRAPH-CONTRACTION rounds (the MapReduce-CC family of Kiveris et al.
    2014): each round (1) every live supernode points to the MIN of itself
    and its neighbors, (2) pointers are compressed to a fixed point
    (comp := comp(comp) until stable — sound because pointers are monotone
    decreasing node ids inside one component, so the inner loop is a
    handful of narrow self-joins), (3) accumulated labels are relabeled
    through the pointer map, and (4) the edge set is CONTRACTED: endpoints
    rewritten to their pointers, self-loops dropped, duplicates merged.
    Contraction is what bounds the round count: every edge's larger
    endpoint merges into a strictly smaller supernode, so live supernodes
    shrink geometrically — measured ≤ 8 rounds on adversarial shapes
    (randomly-labeled 5k path, 90k grid) where plain min-label propagation
    needs O(diameter) rounds and even propagation + path-halving fails to
    converge (the pointer forest on a random-id path stays shallow, so
    labels still crawl one edge-hop per round — measured, not assumed).
    Terminates when the contracted edge set is EMPTY; the per-component
    minimum id never acquires a smaller pointer, so final labels are the
    component minima, matching the recursive-CTE oracle semantics.

    `nodes` = one row per id (singletons keep comp = own id). Shuffles
    carry only (id, comp) longs — never document payloads; rounds are
    driver-looped with localCheckpoint so round k costs a few narrow
    joins, not a replay of the upstream pair job.

    Deployment note: localCheckpoint blocks live on executors and are lost
    with one (fine on local[N]); on a multi-executor cluster set a
    reliable `spark.sparkContext.setCheckpointDir` and swap
    localCheckpoint() -> checkpoint() for fault-tolerant lineage cuts.
    """
    # materialize the (possibly expensive) edge pipeline ONCE: every
    # round joins against the live edge set, and without the checkpoint
    # each round would replay the full upstream plan (e.g. the LSH pair
    # job) — the edge list itself is narrow (two longs per pair).
    # Canonicalize to a < b and dedup so the contraction invariant
    # (edge count strictly decreases) is measured on the canonical set.
    live = _mat(
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    labels = _mat(nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp")))
    # precondition check (cheap: distinct endpoint ids anti-joined against
    # nodes): an edge endpoint missing from `nodes` has no label row, so
    # its merges would be invisible in the result — e.g. pairs built from
    # a different document snapshot. Fail loudly.
    n_stray = (
        live.select(F.col("a").alias("id"))
        .unionByName(live.select(F.col("b").alias("id")))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
        .count()
    )
    if n_stray:
        raise ValueError(
            f"connected_components: {n_stray} edge endpoint id(s) are not present in "
            f"`nodes` — edges and nodes must come from the same snapshot"
        )
    n_live = live.count()
    # r06 physical restructure (same algorithm, same labels): the wall of
    # this loop at gate scale is the NUMBER of sequential driver-
    # synchronous jobs, not bytes. Three changes, each preserving the
    # exact per-round fixed-point/contraction semantics:
    #   (a) pointer compression runs TWO composed m:=m(m) passes per
    #       materialization (pointer depth halves per pass, so pass count
    #       halves) with the moved? flag computed IN the same job — the
    #       round-start shape paid a separate join-and-count job per pass;
    #   (b) label relabeling is DEFERRED: each round's pointer map is
    #       collected and the accumulated labels are composed through
    #       them ONCE after convergence (relabeling is a pure function of
    #       (labels, m_r) applied in round order, so late composition is
    #       the identical computation — it just stops costing one
    #       full-label-table job per round);
    #   (c) no broadcast hints anywhere: m is node-sized on round 1 and
    #       may not fit an executor at corpus scale — AQE's runtime-size
    #       join planning picks broadcast locally on its own.
    maps: list[DataFrame] = []
    for _ in range(max_iters):
        if n_live == 0:
            break
        # (1)+(2) pointer = min over self + live neighbors, compressed to
        # a fixed point: m := m(m), two composed lookups per materialized
        # step. Pointer values are node ids with monotone-decreasing
        # pointers, so each lookup at least halves the depth of every
        # pointer chain; zero net change over the composed step implies
        # zero change in each lookup (monotonicity), i.e. the same fixed
        # point the one-pass-per-job loop detected. The FIRST step
        # composes the census itself (alias-qualified self-joins; the
        # identical census exchange is computed once and ReusedExchange
        # feeds the other lookups), so a round that converges immediately
        # — the common case — costs ONE materialization for its pointer
        # map instead of two.
        cur = (
            live.select(F.col("a").alias("id"), F.col("b").alias("nb"))
            .unionByName(live.select(F.col("b").alias("id"), F.col("a").alias("nb")))
            .groupBy("id")
            .agg(F.least(F.col("id"), F.min("nb")).alias("m"))
        )
        step = 0
        while True:
            c0, c1, c2, c3 = (f"_cc{step}_{i}" for i in range(4))
            p1 = cur.alias(c0).join(
                cur.alias(c1), F.col(f"{c0}.m") == F.col(f"{c1}.id"), "left"
            ).select(
                F.col(f"{c0}.id").alias("id"),
                F.least(
                    F.col(f"{c0}.m"),
                    F.coalesce(F.col(f"{c1}.m"), F.col(f"{c0}.m")),
                ).alias("m"),
            )
            p2 = p1.alias("_p").join(
                cur.alias(c2), F.col("_p.m") == F.col(f"{c2}.id"), "left"
            ).select(
                F.col("_p.id").alias("id"),
                F.least(
                    F.col("_p.m"),
                    F.coalesce(F.col(f"{c2}.m"), F.col("_p.m")),
                ).alias("m"),
            )
            m2 = _mat(
                p2.alias("_q").join(cur.alias(c3), F.col("_q.id") == F.col(f"{c3}.id"))
                .select(
                    F.col("_q.id").alias("id"),
                    F.col("_q.m").alias("m"),
                    (F.col("_q.m") != F.col(f"{c3}.m")).alias("_chg"),
                )
            )
            moved = m2.filter("_chg").count()
            m = m2.select("id", "m")
            if moved == 0:
                break
            cur = m
            step += 1
        maps.append(m)
        # (3) contract: rewrite endpoints through pointers, drop self-loops,
        # merge parallel edges — the graph SHRINKS, which is what bounds
        # the outer round count logarithmically.
        live = _mat(
            live.join(m.select(F.col("id").alias("a"), F.col("m").alias("_ma")), "a")
            .join(m.select(F.col("id").alias("b"), F.col("m").alias("_mb")), "b")
            .filter(F.col("_ma") != F.col("_mb"))
            .select(
                F.least("_ma", "_mb").alias("a"), F.greatest("_ma", "_mb").alias("b")
            )
            .distinct()
        )
        n_live = live.count()
    # (4) relabel the accumulated labels through every round's pointers in
    # round order (comp values are live supernode ids of that round; ids
    # absent from a round's map are already-retired supernodes whose
    # pointer is identity) — one composed job instead of one per round
    for m_r in maps:
        labels = (
            labels.join(m_r.select(F.col("id").alias("_mid"), "m"),
                        labels["comp"] == F.col("_mid"), "left")
            .select("id", F.coalesce(F.col("m"), F.col("comp")).alias("comp"))
        )
    if maps:
        labels = _mat(labels)
    if n_live != 0:
        # unconverged labels are WRONG labels (a component silently split):
        # refuse rather than return them. With contraction this needs a
        # component whose supernode count survives halving max_iters times
        # (> 2^50 nodes) — effectively unreachable; kept as a hard guard.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations "
            f"({n_live} edges still live); raise max_iters"
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup GROUP assignment: portable md5 MinHash-LSH pairs
    -> connected components -> (doc_id, comp, group_size, is_canonical).
    Keep rows where is_canonical to deduplicate the corpus; group_size > 1
    marks members of a duplicate cluster. Fully relational (verified
    against a DuckDB recursive-CTE oracle end-to-end)."""
    pairs = minhash_lsh_pairs_md5(
        docs, text_col, id_col, num_hashes=num_hashes, bands=bands, k=k,
        jaccard_threshold=jaccard_threshold,
    )
    comp = connected_components(pairs, docs.select(id_col), id_col=id_col)
    w = Window.partitionBy("comp")
    return (
        comp.withColumn("group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("id") == F.col("comp"))
        .select(F.col("id").alias(id_col), "comp", "group_size", "is_canonical")
    )


def substring_dedup_stats(
    docs: DataFrame,
    window: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication signals — the suffix-array
    train-data-dedup role (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better") in its hash-window form: the corpus is
    cut into NON-OVERLAPPING `window`-char pieces (piece k covers chars
    [k*window, (k+1)*window)); a piece whose content occurs more than
    once ANYWHERE in the corpus (other docs or elsewhere in the same doc)
    is a duplicated span. Per doc: number of full windows, number of
    duplicated windows, duplicated-char fraction (dup*window / length).
    Compose with a threshold filter to drop boilerplate-heavy docs, or
    with `exact_dedup` for whole-doc removal.

    Documented deviation vs the suffix-array original: window-aligned
    granularity (a duplicate not aligned to the stride is missed; spans
    are multiples of `window`). That is the price of a shuffle-bounded
    distributed formulation — the census shuffles ONE 128-bit digest per
    window, never text, and both aggregations take map-side partials.
    """
    nw = F.floor(F.length(F.col(text_col)) / F.lit(float(window))).cast("bigint")
    base = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("doc_len"),
        nw.alias("n_windows"),
        F.col(text_col).alias("_t"),
    )
    wins = base.where(F.col("n_windows") > 0).select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_windows") - 1)).alias("k"),
        "_t",
    ).select(
        id_col,
        F.md5(F.expr(f"substring(_t, k * {window} + 1, {window})")).alias("h"),
    )
    census = wins.groupBy("h").agg(F.count("*").alias("_n"))
    dup = (
        wins.join(census, "h")
        .groupBy(id_col)
        .agg(F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("n_dup_windows"))
    )
    return (
        base.drop("_t")
        .join(dup, id_col, "left")
        .withColumn("n_dup_windows", F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("bigint"))
        .withColumn(
            "dup_char_frac",
            F.when(
                F.col("doc_len") > 0,
                F.col("n_dup_windows") * F.lit(float(window)) / F.col("doc_len"),
            ).otherwise(F.lit(0.0)),
        )
    )


def _bloom_positions(text_col: str, m_bits: int, k: int):
    """array<bigint> of k bit positions for one document's content —
    portable md5-hex hashes (15 hex chars < 2^60, exact in any engine;
    the same mechanism as the engine's hash_split/webdataset shards) so
    a DuckDB/other-engine reader derives identical positions."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.col(text_col), F.lit(f":{i}"))), 1, 15),
                16, 10,
            ).cast("bigint") % m_bits
            for i in range(k)
        ]
    )


def bloom_build(
    corpus: DataFrame, m_bits: int = 1 << 20, k: int = 4, text_col: str = "text"
) -> DataFrame:
    """Distributed Bloom filter over corpus content -> a (word_idx,
    word) DataFrame of m_bits/32 packed words. NOTHING materializes on
    the driver: positions shuffle as bigints with map-side partial
    bit_or, so the filter scales to any m (a 10^12-doc corpus wants
    m ~ 10^13 bits = 1.25 TB of words — still just a table). Persist it
    next to the corpus; incremental ingest then answers "seen before?"
    with ONE join against the filter instead of shuffling corpus text
    (false-positive rate (1-e^{-kn/m})^k, zero false negatives)."""
    pos = corpus.select(F.explode(_bloom_positions(text_col, m_bits, k)).alias("p"))
    # 32-bit words, SQL shiftleft (the PySpark wrapper only takes a literal
    # shift count; 32 bits keeps 1 << bit inside BIGINT for engines that
    # CHECK shift overflow — DuckDB raises on 1::BIGINT << 63)
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
    return (
        pos.select(F.shiftright(F.col("p"), 5).alias("word_idx"), bit.alias("b"))
        .groupBy("word_idx")
        .agg(F.bit_or("b").alias("word"))
    )


def bloom_maybe_contains(
    docs: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_filter: bool = True,
) -> DataFrame:
    """Adds `maybe_in_corpus`: true iff ALL k bloom bits are set (no
    false negatives; false positives at the designed rate). The probe
    explodes to k narrow (id, position) rows and joins the filter on
    word_idx — broadcast when the filter fits (m_bits/8 bytes), shuffled
    hash join otherwise; text never shuffles either way."""
    probe = docs.select(
        F.col(id_col), F.explode(_bloom_positions(text_col, m_bits, k)).alias("p")
    ).select(
        id_col,
        F.shiftright(F.col("p"), 5).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias("b"),
    )
    flt = F.broadcast(bloom) if broadcast_filter else bloom
    j = probe.join(flt, "word_idx", "left")
    hit = F.when(
        F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("b")) != 0), 1
    ).otherwise(0)
    agg = j.groupBy(id_col).agg((F.sum(hit) == k).alias("maybe_in_corpus"))
    return docs.join(agg, id_col, "left")


# ---------------------------------------------------------------------------
# SemDeDup — cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------


def semdedup(
    embeddings: DataFrame,
    eps: float = 0.95,
    assign: str = "kmeans",
    n_clusters: int = 64,
    bits: int = 8,
    planes=None,
    keep: str = "low_centroid_sim",
    max_cluster: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    iters: int = 10,
    sample_size: int = 100_000,
    max_sample_bytes: int = 256 << 20,
) -> DataFrame:
    """SemDeDup (published method: Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication"):
    partition the embedding space into clusters, compute pairwise cosine
    ONLY within each cluster, group mutual near-duplicates (cosine >= eps,
    transitively), and keep ONE representative per group. Returns
    (id, cluster, group, keep, centroid_sim) — one row per input vector;
    filter `keep` for the deduplicated corpus.

    Backends (`assign`):
    * "kmeans" — the paper's clustering: centroids trained driver-side on
      a byte-bounded deterministic sample (same contract as
      ann.ivf_topk), vectors assigned by one vectorized Arrow UDF. The
      paper's keep rule is the default here: within a duplicate group
      keep the member with the LOWEST cosine to its cluster centroid
      (retains the boundary/diverse example), ties broken by id.
    * "hyperplane" — sign-bit buckets from fixed hyperplanes (pass
      `planes` for a deterministic, cross-engine-reproducible partition;
      the oracle gate uses small integer planes it can replay in SQL).
      centroid_sim is NULL; keep="min_id" is the natural rule here.

    Scale shape: one narrow (id, cluster) shuffle; the O(m^2) pairwise
    stage runs INSIDE each cluster via applyInPandas — exactly the
    paper's cost model (clusters are sized so m^2 is affordable; the
    paper uses ~100k clusters at web scale, so raise n_clusters/bits
    with corpus size). Clusters larger than `max_cluster` are NOT
    silently truncated: every member is kept (keep=true, group=own id)
    and `semdedup_skipped_clusters` enumerates them for re-sharding.
    Duplicate groups never span clusters — by construction of the
    method (the paper accepts this recall loss; measure it with
    embedding_near_dup on a sample if it matters).
    """
    from .ann import _kmeans_np, hyperplane_bucket

    if keep not in ("low_centroid_sim", "min_id"):
        raise ValueError(f"keep must be 'low_centroid_sim' or 'min_id', got {keep!r}")
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cent = None
    if assign == "hyperplane":
        if planes is None:
            rng = np.random.default_rng(seed)
            head = e.select(F.size("_v").alias("_d")).filter(F.col("_d") > 0).head(1)
            if not head:
                raise ValueError("semdedup: empty corpus")
            planes = rng.standard_normal((bits, int(head[0]["_d"])))
        clustered = e.withColumn("_cluster", hyperplane_bucket(F.col("_v"), np.asarray(planes)))
        if keep == "low_centroid_sim":
            raise ValueError("keep='low_centroid_sim' requires the kmeans backend")
    elif assign == "kmeans":
        head = e.select(F.size("_v").alias("_d")).filter(F.col("_d") > 0).head(1)
        if not head:
            raise ValueError("semdedup: empty corpus")
        dim = int(head[0]["_d"])
        eff = max(n_clusters, min(sample_size, max_sample_bytes // max(dim * 8, 1)))
        sample_rows = (
            e.orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)))
            .limit(eff)
            .collect()
        )
        sample = np.array([r["_v"] for r in sample_rows], dtype=np.float64)
        cent = _kmeans_np(sample, n_clusters, iters, seed)

        from pyspark.sql.types import IntegerType

        @F.pandas_udf(IntegerType())
        def assign_cluster(v: pd.Series) -> pd.Series:
            x = np.stack(v.to_numpy())
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32))

        clustered = e.withColumn("_cluster", assign_cluster(F.col("_v")).cast("long"))
    else:
        raise ValueError(f"assign must be 'kmeans' or 'hyperplane', got {assign!r}")

    keep_rule = keep
    out_schema = (
        "_id long, _cluster long, _group long, _keep boolean, _centroid_sim double"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        cl = int(pdf["_cluster"].iloc[0])
        if cent is not None:
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            csim = xn @ cent[cl]
        else:
            csim = np.full(m, np.nan)
        if m > max_cluster:  # no silent truncation: keep all, report
            return pd.DataFrame({
                "_id": ids, "_cluster": cl, "_group": ids,
                "_keep": True, "_centroid_sim": csim,
            })
        if cent is None:
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sim = xn @ xn.T
        adj = sim >= eps
        # union-find over the eps-graph (transitive duplicate groups)
        parent = np.arange(m)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(m):
            for j in np.nonzero(adj[i, i + 1:])[0] + i + 1:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
        root = np.array([find(i) for i in range(m)])
        group = ids[root]
        keep_mask = np.zeros(m, dtype=bool)
        for r in np.unique(root):
            members = np.nonzero(root == r)[0]
            if keep_rule == "low_centroid_sim":
                # paper rule: keep the member FURTHEST from the centroid
                # (lowest cosine); ids ascending breaks exact ties
                best = members[np.argmin(csim[members])]
            else:
                best = members[0]  # ids sorted ascending -> min id
            keep_mask[best] = True
        return pd.DataFrame({
            "_id": ids, "_cluster": cl, "_group": group,
            "_keep": keep_mask, "_centroid_sim": csim,
        })

    out = clustered.groupBy("_cluster").applyInPandas(prune, out_schema)
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_cluster").alias("cluster"),
        F.col("_group").alias("group"),
        F.col("_keep").alias("keep"),
        F.col("_centroid_sim").alias("centroid_sim"),
    )


def semdedup_skipped_clusters(result: DataFrame, max_cluster: int = 10_000) -> DataFrame:
    """Enumerate clusters that exceeded `max_cluster` in a semdedup run
    (every member was kept unpruned there) — the no-silent-truncation
    report; re-run those ids with more clusters/bits."""
    return (
        result.groupBy("cluster")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > max_cluster)
    )
