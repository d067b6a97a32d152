"""Deterministic dataset splitting & sampling for training-data pipelines
(task brief: operations a large-scale training pipeline needs).

Both operators assign each row to the unit interval via a seeded content
hash and compare against precomputed thresholds — fully deterministic,
re-runnable, and JOIN-FREE (pure map-side column expressions: at 100 TB
a split is one narrow projection over the scan, no shuffle, no sampled
state to persist). Two hash flavors:

* ``portable=True`` (default): the first 8 hex chars of
  ``md5(key || ':' || seed)`` compared LEXICOGRAPHICALLY against a hex
  threshold string. Lowercase-hex ordering equals numeric ordering
  (ASCII digits < 'a'..'f'), and md5 renders identically in every engine,
  so the exact same rows land in the exact same split in Spark, DuckDB,
  or any warehouse — the property that makes a train/test split auditable
  across systems (and lets the driver's oracle gate verify it).
* ``portable=False``: ``xxhash64`` bucket — cheaper per row (no hex
  string), engine-local. Use when cross-engine reproducibility isn't
  required.

Threshold precision: thresholds are 32-bit (8 hex chars), so split
fractions are quantized to ~2.3e-10 — negligible against sampling noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 32


def _hex_threshold(cum: float) -> str:
    """floor(cum * 2^32) as an 8-char lowercase hex string (clamped)."""
    v = min(max(int(cum * _SCALE), 0), _SCALE - 1)
    return format(v, "08x")


def _bucket_hex(key: Column, seed: int) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 8)


def split_column(
    key: Column, weights: dict[str, float], seed: int = 42, portable: bool = True
) -> Column:
    """A Column assigning each row a split label from `weights`
    (label -> fraction, summing to ~1; iteration order fixes the interval
    layout, so pass an ordered dict). Rows land by seeded hash of `key` —
    adding rows later never reassigns existing ones."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    labels = list(weights)
    # cumulative interval edges for all but the last label (tail fallthrough)
    cum = 0.0
    edges = []
    for lab in labels[:-1]:
        cum += weights[lab]
        edges.append((lab, cum))
    if portable:
        b = _bucket_hex(key, seed)
        conds = [(lab, F.lit(_hex_threshold(c))) for lab, c in edges]
    else:
        # fast path: xxhash64 bucket in [0, 2^32)
        b = F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(_SCALE))
        conds = [(lab, F.lit(int(c * _SCALE))) for lab, c in edges]
    expr = F.lit(labels[-1])
    for lab, thr in reversed(conds):
        expr = F.when(b < thr, F.lit(lab)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    portable: bool = True,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment as an added column."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_column(F.col(id_col), weights, seed, portable))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sample: keeps ~`fraction` of rows WITHIN
    each stratum (the hash is seeded by the stratum value, so one giant
    stratum can't starve small ones the way a global-hash sample can).
    Exactly reproducible cross-engine (portable md5 mechanism). Pure
    filter — no shuffle, no state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    key = F.concat(
        F.col(strata_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")
    )
    return df.filter(_bucket_hex(key, seed) < F.lit(_hex_threshold(fraction)))


def pack_sequences(
    docs,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
):
    """Concat-and-split sequence packing — the standard LLM pretraining
    batch layout: documents are laid end-to-end in deterministic id
    order and the token stream is cut every `max_tokens`. Returns one
    row per document with its placement in the packed stream:

      (id, n_tokens, start_tok, end_tok [exclusive], seq_first,
       seq_last, crosses)

    where seq_k = tok_offset // max_tokens and `crosses` marks documents
    split across a sequence boundary (what an attention-mask builder or
    a no-split repacker needs to know). Token counts use the engine's
    whitespace tokenizer (operators.text.token_count), matching the
    token_stats oracle.

    Scale: a naive global window (Window.orderBy with no partition spec)
    collapses to ONE partition in Spark — a 100 TB non-starter. This is
    the classic two-phase distributed prefix sum instead:
      1. range-repartition the NARROW (id, n_tokens) projection by id
         (text never moves), sort within partitions, and cumsum inside
         each partition with mapInPandas — a NARROW stage over the range
         partitioning (a Window.partitionBy(_pid) here would re-shuffle
         by hash(_pid), silently adding the exchange this design avoids);
      2. per-partition totals (tiny: one row per partition) come to the
         driver, their exclusive prefix sums go back as a broadcast map,
         and each row adds its partition's base offset.
    Result is independent of the partition count (pure function of the
    id order), so tests pin equality across parallelism levels.
    """
    from .text import token_count

    narrow = docs.select(F.col(id_col), token_count(text_col).cast("long").alias("n_tokens"))
    if num_ranges is None:
        num_ranges = narrow.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ranged = narrow.repartitionByRange(int(num_ranges), F.col(id_col)).sortWithinPartitions(
        id_col
    )

    def _local_cumsum(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            end = pdf["n_tokens"].cumsum() + acc
            acc = int(end.iloc[-1])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pdf["n_tokens"],
                    "_pid": pid,
                    "_local_end": end.astype("int64"),
                }
            )

    local = ranged.mapInPandas(
        _local_cumsum, f"{id_col} long, n_tokens long, _pid int, _local_end long"
    )
    local = local.localCheckpoint(eager=False)  # totals + rows read one lineage
    totals = (
        local.groupBy("_pid").agg(F.max("_local_end").alias("_tot")).orderBy("_pid").collect()
    )
    base = {}
    run = 0
    for r in totals:
        base[r["_pid"]] = run
        run += int(r["_tot"] or 0)
    # partition count is O(thousands) at most — a literal MAP expression
    # beats a join and broadcasts with the plan
    base_expr = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    ) if base else F.create_map()
    cum = local.withColumn("end_tok", F.col("_local_end") + F.coalesce(
        base_expr.getItem(F.col("_pid")), F.lit(0)
    ))
    return cum.select(
        id_col,
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
        "end_tok",
        ((F.col("end_tok") - F.col("n_tokens")) / max_tokens).cast("long").alias("seq_first"),
        # last token of the doc lives at end_tok - 1; empty docs occupy no
        # tokens and get seq_last = seq_first (degenerate but well-defined)
        F.when(F.col("n_tokens") > 0, ((F.col("end_tok") - 1) / max_tokens).cast("long"))
        .otherwise(((F.col("end_tok") - F.col("n_tokens")) / max_tokens).cast("long"))
        .alias("seq_last"),
    ).withColumn(
        "crosses",
        (F.col("seq_last") > F.col("seq_first")).cast("int"),
    )


def mixture_upsample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic UPSAMPLING to a target domain mixture — the
    epoch-replication flavor of data mixing (complement of
    mixture_resample): T = max_d(n_d / w_d), so every domain's repeat
    factor r_d = w_d * T / n_d is >= 1 (the binding domain is seen
    ~once, under-weighted domains repeat). Each row emits
    floor(r_d) full epochs plus one more iff its portable md5 hash
    clears the frac(r_d) threshold, so the expected output composition
    matches the weights exactly. One tiny counts aggregate fixes the
    factors; the data pass is a single narrow projection + explode of a
    per-row bounded sequence — no shuffle, no state, reproducible
    cross-engine (oracle recomputes the identical thresholds). Output
    keeps all columns plus `epoch` (0-based repeat index); rows whose
    fractional epoch misses are dropped only when floor(r_d) == 0
    (possible for the binding domain through float round-down)."""
    import math

    w = {str(k): float(v) for k, v in target_weights.items()}
    total = sum(w.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"mixture weights must sum to 1, got {total}")
    if any(v <= 0 for v in w.values()):
        raise ValueError("mixture weights must be positive")
    counts = {r[0]: r[1] for r in df.groupBy(domain_col).count().collect()}
    missing = sorted(set(w) - set(counts))
    if missing:
        raise ValueError(f"target domains absent from data: {missing}")
    t_max = max(counts[d] / wd for d, wd in w.items())
    base_e = F.lit(None).cast("long")
    thr_e = F.lit(None).cast("string")
    for d in sorted(w):
        r = w[d] * t_max / counts[d]
        b = math.floor(r)
        base_e = F.when(F.col(domain_col) == d, F.lit(int(b)).cast("long")).otherwise(base_e)
        thr_e = F.when(F.col(domain_col) == d, F.lit(_hex_threshold(r - b))).otherwise(thr_e)
    key = F.concat(
        F.col(domain_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")
    )
    n_epochs = base_e + (_bucket_hex(key, seed) < thr_e).cast("long")
    return (
        df.filter(base_e.isNotNull())
        .withColumn("_n_epochs", n_epochs)
        .filter(F.col("_n_epochs") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_epochs") - 1)),
        )
        .drop("_n_epochs")
    )


def leakage_safe_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = True,
    out_col: str = "split",
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: documents are first
    grouped into near-duplicate clusters (portable MinHash-LSH ->
    connected components, operators.dedup.dedup_clusters) and the split
    is keyed by the CLUSTER representative, not the document — so two
    near-duplicates can never straddle train and test (the
    decontamination property a per-document hash_split lacks; splitting
    before deduplicating is the classic benchmark-leakage bug).

    Returns (id, comp, group_size, is_canonical, split). Singletons are
    their own cluster, so the assignment remains ~weights-distributed;
    whole clusters move between splits atomically. Deterministic and
    cross-engine reproducible (same portable md5 interval mechanism as
    hash_split, keyed on the cluster id)."""
    from .dedup import dedup_clusters

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    clusters = dedup_clusters(docs, text_col=text_col, id_col=id_col, **lsh_kwargs)
    return clusters.withColumn(
        out_col, split_column(F.col("comp"), weights, seed, portable)
    )


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic DOWNSAMPLING to a target domain mixture (the static
    data-mixing step of a training pipeline: given per-domain weights,
    emit the largest subset whose composition matches them — never
    duplicating a row).

    Mechanics: one tiny aggregate collects per-domain counts n_d (one
    row per domain — driver-safe at any scale); the largest feasible
    output size is T = min_d(n_d / w_d); each domain keeps fraction
    f_d = w_d * T / n_d of its rows via the portable md5-threshold
    filter (seeded per domain, same mechanism as stratified_sample), so
    the pass over the data itself is ONE narrow map-side filter — no
    shuffle, no sampled state, re-runnable, and reproducible
    cross-engine (the DuckDB oracle recomputes the same thresholds).
    Domains not named in `target_weights` are dropped; a named domain
    absent from the data is an error (the mixture is infeasible)."""
    w = {str(k): float(v) for k, v in target_weights.items()}
    total = sum(w.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"mixture weights must sum to 1, got {total}")
    if any(v <= 0 for v in w.values()):
        raise ValueError("mixture weights must be positive")
    counts = {r[0]: r[1] for r in df.groupBy(domain_col).count().collect()}
    missing = sorted(set(w) - set(counts))
    if missing:
        raise ValueError(f"target domains absent from data: {missing}")
    t_max = min(counts[d] / wd for d, wd in w.items())
    thr = F.lit(None).cast("string")
    for d in sorted(w):
        frac = w[d] * t_max / counts[d]
        thr = F.when(F.col(domain_col) == d, F.lit(_hex_threshold(frac))).otherwise(thr)
    key = F.concat(
        F.col(domain_col).cast("string"), F.lit("|"), F.col(id_col).cast("string")
    )
    return df.filter(thr.isNotNull() & (_bucket_hex(key, seed) < thr))


def exact_stratified_k(
    df: DataFrame,
    k: int,
    strata_cols: list,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """EXACT-quota stratified sampling: precisely min(k, stratum size)
    rows per stratum (the guarantee ``stratified_sample``'s hash
    threshold deliberately trades away for join-freeness), selected as
    the k smallest ``md5(key || ':' || seed)`` hex digests within the
    stratum — the same portable-md5 mechanism as the rest of this
    module, so the SELECTION SET is deterministic and identical in any
    engine that can sort hex strings (tie-break on key_col for the
    astronomically-unlikely digest collision). Adds ``sample_rank``
    (1-based within stratum).

    Use for per-class training quotas (exactly k per language/domain/
    label). Cost: one window over the strata key — the shuffle a
    per-stratum quota fundamentally requires; rows never move twice.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
