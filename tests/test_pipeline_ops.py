"""Training-data pipeline operators: dedup / text / ANN / multimodal
(task brief) — verified against brute force on small corpora.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.operators import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",  # near-dup of 0
        "a completely different sentence about spark engines",
        "der schnelle braune fuchs springt",
        "le renard brun rapide saute",
        "numbers 12345 67890 and punctuation!!! ???",
        "",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    ]
    pdf = pd.DataFrame({"doc_id": range(len(base)), "text": base})
    return spark.createDataFrame(pdf).cache()


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "group_size"] == 2 and out.loc[7, "group_size"] == 2
    assert bool(out.loc[0, "is_canonical"]) and not bool(out.loc[7, "is_canonical"])
    assert out.loc[2, "group_size"] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, jaccard_threshold=0.5).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.a, pairs.b)}
    assert (0, 7) in got  # exact dup always collides
    assert (0, 1) in got  # near dup
    # jaccard values sane
    assert ((pairs.jaccard > 0.45) & (pairs.jaccard <= 1.0)).all()


def test_ngram_jaccard_matches_bruteforce(docs, spark):
    out = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.4, length_band=1000).toPandas()
    pdf = docs.toPandas()
    texts = dict(zip(pdf.doc_id, pdf.text))

    def sh(t):
        t = t.lower()
        n = max(len(t) - 2, 1)
        return {t[i : i + 3] for i in range(n)}

    want = set()
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                a, b = sh(texts[i]), sh(texts[j])
                jac = len(a & b) / len(a | b)
                if jac >= 0.4:
                    want.add((i, j))
    got = {(a, b) for a, b in zip(out.a, out.b)}
    assert got == want


def test_simhash_near_dup_close(docs):
    out = dedup.simhash(docs).toPandas().set_index("doc_id")

    def hamming(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")

    assert hamming(out.loc[0, "simhash"], out.loc[7, "simhash"]) == 0
    assert hamming(out.loc[0, "simhash"], out.loc[1, "simhash"]) <= 12
    assert hamming(out.loc[0, "simhash"], out.loc[2, "simhash"]) > 12


def test_minhash_lsh_bucket_cap(spark):
    """Degenerate corpus: 1k identical docs collide in one band bucket per
    band -> O(n^2) pairs without the cap. With the cap the bucket is
    STAR-COLLAPSED to its min-id representative (n-1 pairs, bounded time,
    still one connected component); the collapse is reported, and small
    buckets (the genuine near-dup pair) still produce their pair."""
    rows = [(i, "boilerplate header repeated verbatim everywhere") for i in range(1000)]
    rows += [(2000, "the quick brown fox jumps over the lazy dog"),
             (2001, "the quick brown fox jumped over the lazy dog")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=8, jaccard_threshold=0.5, max_bucket=100
    ).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.a, pairs.b)}
    assert (2000, 2001) in got
    intra = [(a, b) for a, b in got if a < 1000 and b < 1000]
    assert len(intra) == 999  # linear star, not ~500k all-pairs
    assert all(a == 0 for a, _ in intra)  # min-id representative
    skipped = dedup.lsh_skipped_buckets(
        docs, num_hashes=16, bands=8, max_bucket=100
    ).toPandas()
    assert len(skipped) >= 1 and (skipped.n == 1000).all()


def test_embedding_near_dup_narrow_candidate_plan(spark):
    """The multiprobe explode amplifies the corpus x(bits+1): the pair-dedup
    aggregate must run on narrow (a, b) rows — no dense vector column may
    appear at or below it in the optimized plan."""
    pdf = pd.DataFrame({"vec_id": range(8), "embedding": [[float(i), 1.0] for i in range(8)]})
    emb = spark.createDataFrame(pdf)
    out = dedup.embedding_near_dup(emb, threshold=0.9, bits=2, dim=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    agg_lines = [ln for ln in plan.splitlines() if "Aggregate" in ln]
    assert agg_lines, plan
    for ln in agg_lines:
        assert "_va" not in ln and "_vb" not in ln and "_v#" not in ln, ln


def test_simhash_pairs_exact_vs_bruteforce(spark):
    """Banded pigeonhole + exact hamming filter == brute-force all pairs
    with hamming <= max_hamming (pigeonhole guarantees candidate recall)."""
    rng = np.random.default_rng(17)
    n = 200
    base = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    # plant close pairs: flip <=3 random bits of the first 12 values
    for i in range(12):
        v = int(base[i])
        for b in rng.choice(32, size=int(rng.integers(0, 4)), replace=False):
            v ^= 1 << int(b)
        base[n - 1 - i] = v
    pdf = pd.DataFrame({"doc_id": range(n), "simhash32": base.astype(np.int64)})
    sims = spark.createDataFrame(pdf)
    got = dedup.simhash_pairs(sims, sim_col="simhash32", bits=32, bands=4, max_hamming=3).toPandas()
    gotset = {(a, b) for a, b in zip(got.a, got.b)}
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(base[i]) ^ int(base[j])).count("1") <= 3:
                want.add((i, j))
    assert gotset == want and len(want) >= 10
    with pytest.raises(ValueError):
        dedup.simhash_pairs(sims, sim_col="simhash32", bits=32, bands=4, max_hamming=5)


def test_simhash_pairs_bucket_cap(spark):
    """Degenerate corpus: thousands of empty/whitespace docs share simhash 0,
    so every band bucket holds all of them -> O(n^2) candidates without a
    cap. With the cap the hot bucket STAR-COLLAPSES to its min-id
    representative (n-1 pairs, all hamming 0, still one connected
    component); the collapse is reported; pairs outside the hot bucket are
    unaffected."""
    n = 5000
    # hot value + a genuine close pair whose band values are nonzero in
    # every band (so it never lands in the collapsed bucket)
    vals = [0] * n + [0x11111111, 0x11111110]
    pdf = pd.DataFrame({"doc_id": range(len(vals)), "simhash32": vals})
    sims = spark.createDataFrame(pdf)
    got = dedup.simhash_pairs(
        sims, sim_col="simhash32", bits=32, bands=4, max_hamming=3, max_bucket=100
    ).toPandas()
    pairs = {(a, b) for a, b in zip(got.a, got.b)}
    assert (n, n + 1) in pairs  # the real near-dup survives
    intra = [(a, b) for a, b in pairs if a < n and b < n]
    assert len(intra) == n - 1  # linear star, not ~12.5M all-pairs
    assert all(a == 0 for a, _ in intra)  # min-id representative
    # hamming filter still applies to star pairs (all-zero bucket -> 0)
    assert (got.hamming <= 3).all()
    skipped = dedup.simhash_skipped_buckets(
        sims, sim_col="simhash32", bits=32, bands=4, max_bucket=100
    ).toPandas()
    assert len(skipped) == 4 and (skipped.n == n).all()  # one hot bucket/band


def test_simhash_md5_portable_twin(docs):
    out = dedup.simhash_md5_32(docs).toPandas().set_index("doc_id")

    def hamming(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFF).count("1")

    assert hamming(out.loc[0, "simhash32"], out.loc[7, "simhash32"]) == 0  # exact dup
    assert hamming(out.loc[0, "simhash32"], out.loc[1, "simhash32"]) <= 8  # near dup
    assert hamming(out.loc[0, "simhash32"], out.loc[2, "simhash32"]) > 8
    assert int(out.loc[6, "simhash32"]) >= 0  # empty doc defined


def test_text_ops(docs):
    q = text.quality_features(docs).toPandas().set_index("doc_id")
    assert q.loc[6, "n_tokens"] == 0
    assert q.loc[5, "digit_ratio"] > 0.2
    assert q.loc[0, "stopword_ratio"] > 0.1  # {'the'} of 9 tokens
    lang = text.lang_id(docs).toPandas().set_index("doc_id")
    assert lang.loc[0, "lang_pred"] == "en"
    assert lang.loc[3, "lang_pred"] == "de"
    assert lang.loc[4, "lang_pred"] == "fr"
    fp = text.fingerprint(docs).toPandas().set_index("doc_id")
    assert fp.loc[0, "fp_md5"] == fp.loc[7, "fp_md5"]
    assert fp.loc[0, "fp_md5"] != fp.loc[2, "fp_md5"]


def test_ann_lsh_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(4)
    n, dim = 300, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf).cache()
    q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.brute_force_topk(q, emb, k=5).toPandas()
    # 4 bits -> 16 buckets (~19 pts each) suits a 300-vector corpus; more
    # bits only pay off at scale
    approx = ann.lsh_topk(q, emb, k=5, bits=4, dim=dim, multiprobe=True).toPandas()
    # brute force matches numpy oracle exactly on ids
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn[:5] @ vn.T
    for qi in range(5):
        want = list(np.argsort(-sims[qi], kind="stable")[:5])
        got = list(exact[exact.query_id == qi].sort_values("rank").vec_id)
        assert got == want
    # LSH recall@5 reasonable with multiprobe
    hits = 0
    for qi in range(5):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        hits += len(e & a)
    assert hits >= 15  # >=60% recall on this tiny corpus


def test_ann_ivf_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(11)
    n, dim = 300, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf).cache()
    q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.brute_force_topk(q, emb, k=5).toPandas()
    approx = ann.ivf_topk(q, emb, k=5, n_lists=8, n_probe=3).toPandas()
    hits = 0
    for qi in range(5):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        hits += len(e & a)
    assert hits >= 15  # >=60% recall probing 3/8 lists
    # determinism: same seed -> identical result
    again = ann.ivf_topk(q, emb, k=5, n_lists=8, n_probe=3).toPandas()
    assert approx.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_hash_split_deterministic_and_stable(spark):
    """Split proportions ~ weights; assignment is a pure function of
    (id, seed): re-running and adding rows never reassigns existing ids;
    the xxhash64 fast path is also deterministic."""
    from tilers_tools_spark.operators import sampling

    n = 4000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = sampling.hash_split(df, weights=w, seed=7).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02
    # stability under growth: the first 1000 ids keep their assignment
    small = sampling.hash_split(
        spark.range(1000).withColumnRenamed("id", "doc_id"), weights=w, seed=7
    ).toPandas().set_index("doc_id")["split"]
    big = (
        sampling.hash_split(df, weights=w, seed=7)
        .filter(F.col("doc_id") < 1000)
        .toPandas()
        .set_index("doc_id")["split"]
    )
    assert small.sort_index().equals(big.sort_index())
    # fast path: deterministic + roughly proportional
    fast = sampling.hash_split(df, weights=w, seed=7, portable=False)
    c1 = {r["split"]: r["count"] for r in fast.groupBy("split").count().collect()}
    c2 = {r["split"]: r["count"] for r in fast.groupBy("split").count().collect()}
    assert c1 == c2 and abs(c1["train"] / n - 0.8) < 0.03


def test_stratified_sample_per_stratum(spark):
    """~fraction kept WITHIN each stratum even when strata sizes differ
    by 20x; idempotent (same rows on re-run)."""
    from tilers_tools_spark.operators import sampling

    import pandas as _pd

    pdf = _pd.DataFrame(
        {
            "doc_id": range(4200),
            "lang": ["en"] * 4000 + ["de"] * 200,
        }
    )
    df = spark.createDataFrame(pdf)
    s = sampling.stratified_sample(df, "lang", 0.25, seed=11)
    got = s.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert abs(counts["en"] / 4000 - 0.25) < 0.03
    assert abs(counts["de"] / 200 - 0.25) < 0.10  # small stratum, wider noise
    assert sorted(r["doc_id"] for r in s.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in s.select("doc_id").collect()
    )


def test_mixture_upsample_epochs(spark):
    """Output composition tracks the weights; the binding domain is seen
    ~once (no loss), under-weighted domains repeat; per-doc epochs are a
    contiguous 0..n-1 range; deterministic on re-run."""
    import pandas as _pd

    from tilers_tools_spark.operators import sampling

    pdf = _pd.DataFrame(
        {
            "doc_id": range(5000),
            "lang": ["en"] * 4000 + ["de"] * 800 + ["fr"] * 200,
        }
    )
    df = spark.createDataFrame(pdf)
    w = {"en": 0.5, "de": 0.3, "fr": 0.2}
    out = sampling.mixture_upsample(df, "lang", w, seed=9).toPandas()
    counts = out["lang"].value_counts()
    total = len(out)
    # T = max(n/w) = 4000/0.5 = 8000 -> en x1, de x3, fr x8
    assert counts["en"] >= 3999  # binding domain kept whole (float guard)
    for d, wd in w.items():
        assert abs(counts[d] / total - wd) < 0.02, (d, counts)
    per_doc = out.groupby("doc_id")["epoch"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] == per_doc["count"] - 1).all()  # contiguous
    again = sampling.mixture_upsample(df, "lang", w, seed=9).toPandas()
    assert len(again) == total


def test_leakage_safe_split_cluster_atomicity(spark):
    """Planted near-duplicates always land in the SAME split (the
    decontamination property); a per-document hash_split demonstrably
    violates it on the same fixture; split sizes track the weights."""
    import pandas as _pd

    from tilers_tools_spark.operators import sampling

    import hashlib as _hl

    # per-doc pseudo-random vocabulary: cross-doc 5-gram Jaccard ~ 0,
    # twin-vs-base Jaccard ~ 1 — clusters are exactly the twin pairs
    base = [
        " ".join(
            _hl.md5(f"{i}:{j}".encode()).hexdigest()[:8] for j in range(12)
        )
        for i in range(120)
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t + " extra"))  # near-dup twin
    df = spark.createDataFrame(_pd.DataFrame(rows, columns=["doc_id", "text"]))
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = sampling.leakage_safe_split(
        df, weights=w, seed=5, num_hashes=8, bands=4, jaccard_threshold=0.5
    )
    pdf = out.toPandas()
    by_doc = dict(zip(pdf["doc_id"], pdf["split"]))
    comp_of = dict(zip(pdf["doc_id"], pdf["comp"]))
    clustered = 0
    for i in range(120):
        a, b = 2 * i, 2 * i + 1
        if comp_of[a] == comp_of[b]:  # LSH found the twin (most pairs)
            clustered += 1
            assert by_doc[a] == by_doc[b], (a, b)
    assert clustered > 100  # twins are trivially similar; LSH catches nearly all
    # contrast: the doc-keyed split separates at least one twin pair
    naive = sampling.hash_split(df, weights=w, seed=5).toPandas()
    nd = dict(zip(naive["doc_id"], naive["split"]))
    assert any(nd[2 * i] != nd[2 * i + 1] for i in range(120))
    # distribution tracks weights at cluster granularity
    counts = pdf["split"].value_counts()
    assert abs(counts.get("train", 0) / len(pdf) - 0.6) < 0.15


def test_mixture_resample_composition(spark):
    """Output composition tracks the target weights; the binding domain
    (smallest n/w) is kept ~whole; unnamed domains drop; absent named
    domains raise; deterministic on re-run."""
    import pandas as _pd
    import pytest as _pytest

    from tilers_tools_spark.operators import sampling

    pdf = _pd.DataFrame(
        {
            "doc_id": range(10_000),
            "lang": ["en"] * 8000 + ["de"] * 1500 + ["fr"] * 400 + ["xx"] * 100,
        }
    )
    df = spark.createDataFrame(pdf)
    w = {"en": 0.6, "de": 0.3, "fr": 0.1}
    out = sampling.mixture_resample(df, "lang", w, seed=3)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert "xx" not in counts  # unnamed domain dropped
    # binding domain: fr has n/w = 400/0.1 = 4000 = T; kept fraction ~1.0
    assert counts["fr"] / 400 > 0.97
    total = sum(counts.values())
    for d, wd in w.items():
        assert abs(counts[d] / total - wd) < 0.03, (d, counts)
    # deterministic: exact same id set on re-run
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.mixture_resample(df, "lang", w, seed=3)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2
    with _pytest.raises(ValueError, match="absent"):
        sampling.mixture_resample(df, "lang", {"en": 0.5, "ja": 0.5}).count()
    with _pytest.raises(ValueError, match="sum to 1"):
        sampling.mixture_resample(df, "lang", {"en": 0.5})


def test_incremental_exact_dedup(spark):
    """Survivors = first-in-batch AND not-in-corpus, vs a pandas brute
    force; the precomputed-hash-column corpus path gives identical
    results (the 100TB shape: corpus text never re-read)."""
    import pandas as _pd

    corpus_pdf = _pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["alpha", "beta", "gamma"]}
    )
    new_pdf = _pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13, 14],
            # 10 dups corpus; 12/13 dup each other; 11,14 new
            "text": ["alpha", "delta", "epsilon", "epsilon", "zeta"],
        }
    )
    corpus = spark.createDataFrame(corpus_pdf)
    new = spark.createDataFrame(new_pdf)
    got = dedup.incremental_exact_dedup(new, corpus).toPandas().sort_values("doc_id")
    assert list(got.doc_id) == [11, 12, 14]
    # corpus as a precomputed hash column (no text re-hash)
    ch = corpus.select(F.md5(F.col("text")).alias("h"))
    got2 = (
        dedup.incremental_exact_dedup(new, ch, corpus_hash_col="h")
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(got2.doc_id) == [11, 12, 14]
    assert list(got.content_hash) == list(got2.content_hash)


def test_incremental_lsh_dedup(spark):
    """Near-dup delta dedup: new docs matching corpus content (exactly or
    nearly) are matched/dropped; genuinely new text survives; the
    corpus-bucket star collapse still decides is-dup via the
    representative."""
    import pandas as _pd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus_pdf = _pd.DataFrame(
        {
            "doc_id": range(3),
            "text": [base, "completely different corpus text here", "third corpus doc content"],
        }
    )
    new_pdf = _pd.DataFrame(
        {
            "doc_id": [100, 101, 102],
            "text": [
                base.replace("today", "tonight"),  # near-dup of corpus 0
                "entirely novel new-batch document text",  # survivor
                base,  # exact dup of corpus 0
            ],
        }
    )
    corpus = spark.createDataFrame(corpus_pdf)
    new = spark.createDataFrame(new_pdf)
    m = dedup.lsh_match_corpus_md5(new, corpus, jaccard_threshold=0.5).toPandas()
    assert set(zip(m.new_id, m.corpus_id)) == {(100, 0), (102, 0)}
    surv = dedup.incremental_lsh_dedup_md5(new, corpus, jaccard_threshold=0.5).toPandas()
    assert sorted(surv.doc_id) == [101]
    # hot-corpus star collapse: 40 identical corpus docs, cap 5 -> the new
    # dup still matches (via the min-id representative at least)
    hot = _pd.DataFrame({"doc_id": range(40), "text": [base] * 40})
    m2 = dedup.lsh_match_corpus_md5(
        new, spark.createDataFrame(hot), jaccard_threshold=0.5, max_corpus_bucket=5
    ).toPandas()
    assert 0 in set(m2[m2.new_id == 102].corpus_id)
    assert sorted(
        dedup.incremental_lsh_dedup_md5(
            new, spark.createDataFrame(hot), jaccard_threshold=0.5, max_corpus_bucket=5
        ).toPandas().doc_id
    ) == [101]


def test_ann_ivf_sample_byte_cap(spark):
    """The k-means driver sample is bounded in BYTES: with a large dim and
    a tiny max_sample_bytes the effective sample shrinks below sample_size
    (but never below n_lists) and the operator still returns correct-shape
    results — the driver-memory contract from the ivf_topk docstring."""
    rng = np.random.default_rng(7)
    n, dim = 60, 256
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf).cache()
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    # dim=256 float64 rows are 2 KiB each; 16 KiB cap -> 8-row sample, which
    # must be floored to n_lists=4. A buggy rows-only bound would train on
    # all 60 rows; assert via the internal arithmetic the operator applies.
    cap_rows = (16 << 10) // (dim * 8)
    assert cap_rows == 8
    out = ann.ivf_topk(
        q, emb, k=5, n_lists=4, n_probe=4, sample_size=100_000, max_sample_bytes=16 << 10
    ).toPandas()
    # full probe of every list => candidate set is the whole corpus => the
    # result is exact regardless of the (capped) centroid quality
    exact = ann.brute_force_topk(q, emb, k=5).toPandas()
    a = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a.vec_id) == list(e.vec_id)


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(8)
    n, dim = 200, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    # plant near-dups: 5 pairs with tiny perturbations
    for i in range(5):
        vecs[n - 1 - i] = vecs[i] + rng.standard_normal(dim) * 0.01
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    pairs = dedup.embedding_near_dup(emb, threshold=0.99, bits=6, dim=dim).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.a, pairs.b)}
    want = {(i, n - 1 - i) for i in range(5)}
    assert want <= got, want - got
    # no false positives at this threshold beyond planted pairs (cos>=0.99 is tight)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    truth = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= 0.99}
    assert got <= truth


def test_multimodal_features_and_resize(spark):
    from fixtures import gen

    rows = [
        (r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for r in gen.gen_images(6, fmts=("raw", "png"))
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    feats = multimodal.image_features(images).toPandas()
    assert len(feats) == 6 and (feats.n_bands == 4).all()
    assert (feats.w % 256 == 0).all()
    thumbs = multimodal.image_resize(images, 32, 32).toPandas()
    from tilers_tools_spark.functions import codecs

    for t in thumbs.thumb:
        assert codecs.decode_png(bytes(t)).shape == (32, 32, 4)


def test_multimodal_audio_stub(spark):
    media = spark.createDataFrame(
        [("m1", b"payload-bytes"), ("m2", b"other")], "media_id string, payload binary"
    )
    fake = multimodal.audio_frame_sample(media, frames=4, deterministic_fake=True).toPandas()
    assert len(fake) == 8 and set(fake.columns) == {"media_id", "frame_idx", "rms", "zcr"}
    with pytest.raises(Exception):
        multimodal.audio_frame_sample(media, frames=4).toPandas()


def test_multimodal_video_stub(spark):
    rows = [(f"v{i}", bytes([i] * 64)) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    out = multimodal.video_frame_sample(media, frames=4, deterministic_fake=True).toPandas()
    assert len(out) == 24 and set(out.columns) == {"media_id", "frame_idx", "rel_ts", "thumb"}
    assert out.groupby("media_id").frame_idx.nunique().eq(4).all()
    from tilers_tools_spark.functions import codecs as _c
    arr = _c.decode_png(bytes(out.thumb.iloc[0]))
    assert arr.shape == (32, 32, 3)
    # deterministic across runs
    again = multimodal.video_frame_sample(media, frames=4, deterministic_fake=True).toPandas()
    key = ["media_id", "frame_idx"]
    a = out.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert all(bytes(x) == bytes(y) for x, y in zip(a.thumb, b.thumb))
    # gated path raises
    import pytest as _pt
    with _pt.raises(Exception):
        multimodal.video_frame_sample(media, frames=2).toPandas()


def test_near_dup_oracle_planted_pairs_within_multiprobe():
    """Guard for the embedding_near_dup driver gate (see queries.py note):
    the gate compares approximate LSH (bits=6, 1-bit multiprobe) against an
    EXACT all-pairs oracle, which is only valid while every planted pair
    (vec, vec + 0.001) differs in at most ONE bucket bit. Pin that property
    for the sf0.01 fixture so a fixture/seed change fails here first."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").head(4)
    dim = len(t.embedding.iloc[0])
    planes = np.random.default_rng(42).standard_normal((6, dim))
    for v in t.embedding:
        base = np.asarray(v, dtype=np.float32).astype(np.float64)
        pert = base + 0.001
        b0 = sum((1 << i) for i in range(6) if planes[i] @ base >= 0)
        b1 = sum((1 << i) for i in range(6) if planes[i] @ pert >= 0)
        assert bin(b0 ^ b1).count("1") <= 1, (b0, b1)


def test_connected_components_vs_union_find(spark):
    """Min-label propagation == brute-force union-find on a random graph
    with mixed component shapes (chains exercise multi-round propagation;
    singletons keep their own label)."""
    rng = np.random.default_rng(11)
    n = 300
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2)) if a != b]
    edges += [(i, i + 1) for i in range(200, 220)]  # a 21-node chain
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
    epdf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    got = dedup.connected_components(epdf, nodes).toPandas()
    assert dict(zip(got.id, got.comp)) == want


def test_connected_components_long_chain(spark):
    """Regression for the sf0.1 dbscan bench failure: a 500-node PATH graph
    (diameter 499) must converge within the default 50-round cap. Plain
    min-propagation needs one round per hop (499 rounds); the pointer-jump
    (path halving) added per round makes convergence logarithmic. Every
    node must land on comp 0 (the path's minimum id)."""
    n = 500
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
    epdf = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(n - 1)], columns=["a", "b"])
    )
    got = dedup.connected_components(epdf, nodes).toPandas()
    assert len(got) == n
    assert (got.comp == 0).all()


def test_dedup_clusters_end_to_end(docs):
    out = dedup.dedup_clusters(docs, num_hashes=8, bands=4, jaccard_threshold=0.5).toPandas()
    by_id = out.set_index("doc_id")
    # docs 0, 1 (near-dup) and 7 (exact dup of 0) cluster together
    assert by_id.loc[0, "comp"] == by_id.loc[1, "comp"] == by_id.loc[7, "comp"] == 0
    assert by_id.loc[0, "group_size"] == 3
    assert bool(by_id.loc[0, "is_canonical"]) and not bool(by_id.loc[7, "is_canonical"])
    # unrelated docs stay singletons with themselves as canonical
    assert by_id.loc[2, "group_size"] == 1 and bool(by_id.loc[2, "is_canonical"])
    # every doc present exactly once
    assert len(out) == 8 and out.doc_id.nunique() == 8


def test_kmeans_np_invariants():
    """_kmeans_np is reused by the ann_ivf golden oracle (which therefore
    cannot catch its defects) — pin its invariants independently here:
    deterministic, unit-norm centroids, and a sane quantizer (same-cluster
    points are closer to their centroid than to most others)."""
    from tilers_tools_spark.operators.ann import _kmeans_np

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)) * 3
    x = np.vstack([c + rng.standard_normal((50, 16)) * 0.05 for c in centers])
    c1 = _kmeans_np(x, 8, 10, 42)
    c2 = _kmeans_np(x, 8, 10, 42)
    assert np.array_equal(c1, c2)  # deterministic
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)  # unit-norm
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assign = (xn @ c1.T).argmax(axis=1)
    # the 8 planted blobs should map onto several distinct lists with
    # mostly-consistent within-blob assignment (nearby blobs can share a
    # list under cosine k-means; a DEGENERATE quantizer collapses to 1-2
    # lists with ~1/8 agreement)
    blob = np.repeat(np.arange(8), 50)
    per_blob = [np.bincount(assign[blob == b]).argmax() for b in range(8)]
    agree = sum((assign[blob == b] == per_blob[b]).mean() for b in range(8)) / 8
    assert len(set(per_blob)) >= 5 and agree > 0.85, (per_blob, agree)


def test_dedup_clusters_parallelism_invariant(spark):
    """T3 for the iterative component op: partitioning must not affect the
    assigned components (min-label is order-insensitive by construction —
    pin it)."""
    base = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zetb",
        "unrelated text about something else entirely",
        "alpha beta gamma delta epsilon zeta",
    ] * 3
    pdf = pd.DataFrame({"doc_id": range(len(base)), "text": base})
    a = dedup.dedup_clusters(spark.createDataFrame(pdf).repartition(2)).toPandas()
    b = dedup.dedup_clusters(spark.createDataFrame(pdf).repartition(7)).toPandas()
    key = a.sort_values("doc_id").reset_index(drop=True)
    other = b.sort_values("doc_id").reset_index(drop=True)
    assert key.equals(other)


def test_contamination_pairs_planted_and_broadcast(spark):
    """contamination_pairs finds exactly the train docs containing bench
    n-grams (planted: one exact copy, one embedded span, one clean), with
    correct distinct-gram counts, and the bench side joins BROADCAST (the
    100 TB-train scale shape: no train-side shuffle)."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import text as tx

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six"),
            (3, "Alpha, beta; GAMMA delta!! epsilon filler filler"),  # same 5 tokens, punct/case
            (4, "totally unrelated words here nothing shared"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],  # 5 tokens -> 2 distinct 4-grams
        "doc_id long, text string",
    )
    out = tx.contamination_pairs(train, bench, n=4)
    rows = {(r["train_id"], r["bench_id"]): r for r in out.collect()}
    assert set(rows) == {(1, 100), (3, 100)}
    for k in rows:
        assert rows[k]["bench_ngrams"] == 2
    assert rows[(1, 100)]["n_matched"] == 2 and rows[(1, 100)]["overlap_frac"] == 1.0
    assert rows[(3, 100)]["n_matched"] == 2  # tokenization collapses case/punct
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench side never shuffles the train corpus


def test_contamination_short_doc_and_empty(spark):
    """Docs shorter than n tokens produce no grams (the sequence(1,0)
    descending-range footgun is guarded); empty result is well-formed."""
    from tilers_tools_spark.operators import text as tx

    train = spark.createDataFrame([(1, "only three words")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = tx.contamination_pairs(train, bench, n=4)
    assert out.count() == 0
    assert out.columns == ["train_id", "bench_id", "n_matched", "bench_ngrams", "overlap_frac"]


def test_pack_sequences_placement(spark):
    """Concat-and-split packing: known token counts -> exact offsets,
    sequence ids, and boundary-crossing flags (max_tokens=10); empty doc
    occupies zero tokens and never 'crosses'."""
    from tilers_tools_spark.operators import sampling

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # 4 toks: [0,4)  seq 0
            (2, "e f g h i"),      # 5 toks: [4,9)  seq 0
            (3, "j k l"),          # 3 toks: [9,12) crosses 0->1
            (4, ""),               # 0 toks at 12: seq 1, no cross
            (5, " ".join("x" * 1 for _ in range(11))),  # 11 toks: [12,23) crosses 1->2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sampling.pack_sequences(docs, max_tokens=10).collect()}
    assert (out[1]["start_tok"], out[1]["end_tok"], out[1]["seq_first"], out[1]["seq_last"], out[1]["crosses"]) == (0, 4, 0, 0, 0)
    assert (out[2]["start_tok"], out[2]["end_tok"]) == (4, 9) and out[2]["crosses"] == 0
    assert (out[3]["start_tok"], out[3]["end_tok"], out[3]["seq_first"], out[3]["seq_last"], out[3]["crosses"]) == (9, 12, 0, 1, 1)
    assert out[4]["n_tokens"] == 0 and out[4]["crosses"] == 0
    assert (out[5]["seq_first"], out[5]["seq_last"], out[5]["crosses"]) == (1, 2, 1)
    # total stream length = sum of token counts
    assert max(r["end_tok"] for r in out.values()) == 4 + 5 + 3 + 0 + 11


def test_pii_scrub_counts_and_redaction(spark):
    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.smith+x@sub.example.org or admin@test.io thanks"),
            (2, "server at 10.0.0.1 and 192.168.255.254 up"),
            (3, "call +1 555-123-4567 today"),
            (4, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ipv4"]) == (0, 2)
    assert out[3]["n_phones"] == 1
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)
    # exact redaction bytes (md5 is over this string)
    import hashlib

    expected = "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[1]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert out[1]["redacted_len"] == len(expected)
    expected3 = "call <PHONE> today"
    assert out[3]["redacted_md5"] == hashlib.md5(expected3.encode()).hexdigest()


def test_pack_sequences_parallelism_invariant(spark):
    """The two-phase distributed prefix sum gives the SAME placement for
    any partition count (it is a pure function of id order) — and never
    plans the single-partition global window (the 100 TB killer)."""
    from tilers_tools_spark.operators import sampling

    rows = [(i, " ".join(["w"] * (1 + i % 13))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for nr in (1, 3, 17):
        df = sampling.pack_sequences(docs, max_tokens=64, num_ranges=nr)
        outs.append(sorted(tuple(r) for r in df.collect()))
    assert outs[0] == outs[1] == outs[2]
    # exact stream total
    assert max(t[3] for t in outs[0]) == sum(1 + i % 13 for i in range(200))
    plan = sampling.pack_sequences(docs, max_tokens=64)._jdf.queryExecution().executedPlan().toString()
    # window spec must be partitioned (no 'Window [...]' over a single
    # SinglePartition exchange)
    assert "SinglePartition" not in plan


def test_boilerplate_lines_hand_pins(spark):
    """Line-level boilerplate removal with a fully hand-derived corpus:
    'shared footer' appears (modulo trim) in 3 of 4 docs -> removed at
    min_docs=3; per-doc unique lines and the empty line survive; a doc
    that is ALL boilerplate cleans to the empty string; line order is
    preserved in the reassembled text."""
    import hashlib

    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "alpha one\nshared footer\nbeta one"),
            (2, "alpha two\n  shared footer  \n\ngamma two"),
            (3, "shared footer"),
            (4, "delta four\nepsilon four"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.boilerplate_lines(docs, min_docs=3).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 1)
    assert out[1]["cleaned_md5"] == md5("alpha one\nbeta one")
    # trim-variant footer removed; empty line kept
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (4, 1)
    assert out[2]["cleaned_md5"] == md5("alpha two\n\ngamma two")
    # all-boilerplate doc still present, cleaned to ''
    assert (out[3]["n_removed"], out[3]["cleaned_len"]) == (1, 0)
    assert out[3]["cleaned_md5"] == md5("")
    # untouched doc byte-identical
    assert out[4]["n_removed"] == 0
    assert out[4]["cleaned_md5"] == md5("delta four\nepsilon four")
    # below threshold nothing is boilerplate
    out4 = {r["doc_id"]: r for r in tx.boilerplate_lines(docs, min_docs=4).collect()}
    assert all(r["n_removed"] == 0 for r in out4.values())


def test_repetition_features_known_values(spark):
    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # 4 words, 1 distinct; bigram 'spam spam' x3/3
            (2, "all words here are unique ok"),   # 6 distinct
            (3, "a"),                              # 1 word, no bigrams
            (4, ""),                               # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.repetition_features(docs).collect()}
    assert out[1]["n_words"] == 4 and abs(out[1]["dup_word_frac"] - 0.75) < 1e-12
    assert out[1]["top_bigram_count"] == 3 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_count"] == 1
    assert out[3]["n_words"] == 1 and out[3]["top_bigram_count"] == 0
    assert out[4]["n_words"] == 0 and out[4]["dup_word_frac"] == 0.0


def test_line_repetition_features_known_values(spark):
    """Gopher line-level dup signals vs an independent scalar reference
    (first-occurrence rule: occurrence i is a duplicate iff the same
    line text appeared at an earlier index; empty lines dropped)."""
    from tilers_tools_spark.operators import text as tx

    rows = [
        (0, "a\nb\na\n\nc\na"),       # dups: a x2 of 5 lines
        (1, "hello"),                  # single line
        (2, ""),                       # no lines
        (3, "xx\nxx\nyyy\nzz\nyyy"),  # dup chars (2+3)/12
        (4, "solo\nsolo\nsolo"),       # all-but-first duplicate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.line_repetition_features(docs).collect()}

    def ref(t):
        ls = [x for x in t.split("\n") if x != ""]
        seen, dup = set(), []
        for x in ls:
            (dup.append(x) if x in seen else seen.add(x))
        n, tc, dc = len(ls), sum(map(len, ls)), sum(map(len, dup))
        return (n, len(dup) / n if n else 0.0, dc / tc if tc else 0.0)

    for d, t in rows:
        n, lf, cf = ref(t)
        assert out[d]["n_lines"] == n, d
        assert abs(out[d]["dup_line_frac"] - lf) < 1e-15, d
        assert abs(out[d]["dup_line_char_frac"] - cf) < 1e-15, d
    assert out[4]["dup_line_frac"] == 2 / 3 and out[4]["dup_line_char_frac"] == 2 / 3


def test_pq_topk_recall_and_invariants(spark):
    """PQ ANN: kernel invariants (codes in range, deterministic) + recall
    vs brute force on the sf0.01 embeddings — uniform-random vectors are
    PQ's ADVERSARIAL case (no cluster structure to quantize), so the
    pinned bounds are conservative; exact rerank recovers recall
    monotonically and puts an in-corpus query's own vector at rank 1."""
    import numpy as np
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import ann

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    bset = {}
    for r in ann.brute_force_topk(q, emb, k=10).collect():
        bset.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(rerank):
        pset = {}
        for r in ann.pq_topk(q, emb, k=10, n_sub=8, ks=16, rerank=rerank).collect():
            pset.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(bset[k] & pset.get(k, set())) for k in bset) / sum(
            len(v) for v in bset.values()
        )

    r0, r100 = recall(0), recall(100)
    assert r0 >= 0.15, r0          # measured 0.31
    assert r100 >= 0.6, r100       # measured 0.80
    assert r100 >= r0              # rerank never hurts
    # self-retrieval: every query IS a corpus vector; with exact rerank it
    # must rank itself first (cosine 1.0 beats everything)
    res = {r["query_id"]: r for r in
           ann.pq_topk(q, emb, k=1, n_sub=8, ks=16, rerank=50).collect()}
    for qid, row in res.items():
        assert row["vec_id"] == qid and row["rank"] == 1
    # kernel invariants: deterministic training, codes in [0, ks)
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((300, 64))
    c1 = ann._pq_train(sample, 8, 16, iters=5, seed=1)
    c2 = ann._pq_train(sample, 8, 16, iters=5, seed=1)
    assert np.array_equal(c1, c2) and c1.shape == (8, 16, 8)
    codes = ann._pq_encode(rng.standard_normal((50, 64)), c1)
    assert codes.min() >= 0 and codes.max() < 16 and codes.shape == (50, 8)
    luts = ann._pq_luts(rng.standard_normal((3, 64)), c1)
    assert luts.shape == (3, 8, 16) and np.isfinite(luts).all()


def test_ivfpq_topk_recall_and_build_search_split(spark):
    """IVF-PQ: recall with rerank on the adversarial uniform-random
    embeddings, and the build/search split — pq_encode_corpus output is
    a persistable codes table (id, _cv, _codes, _list) whose re-use
    reproduces the same candidates."""
    import numpy as np
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import ann

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    bset = {}
    for r in ann.brute_force_topk(q, emb, k=10).collect():
        bset.setdefault(r["query_id"], set()).add(r["vec_id"])
    pset = {}
    for r in ann.ivfpq_topk(q, emb, k=10, n_lists=16, n_probe=8, n_sub=8, ks=16,
                            rerank=100).collect():
        pset.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = sum(len(bset[k2] & pset.get(k2, set())) for k2 in bset) / sum(
        len(v) for v in bset.values()
    )
    assert rec >= 0.5, rec  # probe-pruned + PQ on random vectors, reranked
    # build/search split: encoding the corpus with explicit codebooks is
    # deterministic and schema-stable
    rng = np.random.default_rng(5)
    sample = rng.standard_normal((200, 64))
    cents = ann._pq_train(sample, 8, 16, iters=5, seed=2)
    coarse = ann._kmeans_np(sample, 16, iters=5, seed=2)
    coded = ann.pq_encode_corpus(emb.limit(50), cents, coarse=coarse)
    assert set(coded.columns) == {"vec_id", "_cv", "_codes", "_list"}
    a = sorted((r["vec_id"], tuple(r["_codes"]), r["_list"]) for r in coded.collect())
    b = sorted((r["vec_id"], tuple(r["_codes"]), r["_list"]) for r in
               ann.pq_encode_corpus(emb.limit(50), cents, coarse=coarse).collect())
    assert a == b
    assert all(0 <= c < 16 for _id, codes, _l in a for c in codes)
    assert all(0 <= l < 16 for _id, _c, l in a)


def test_image_patchify_bytes_roundtrip(spark):
    """The raw patch tensors reassemble bit-for-bit into the zero-padded
    source image (pins byte order/layout, grid geometry, and the pad
    rule — complements the gate's analytic per-patch stats)."""
    import numpy as np

    from tilers_tools_spark.functions import codecs
    from tilers_tools_spark.operators.multimodal import image_patchify

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (13, 20, 3), np.uint8)  # both axes ragged at P=8
    df = spark.createDataFrame(
        [("img", bytearray(codecs.encode_raw(arr)), "raw")],
        "image_id string, bytes binary, fmt string",
    )
    rows = image_patchify(df, patch=8).collect()
    assert len(rows) == 2 * 3  # ceil(13/8) x ceil(20/8)
    recon = np.zeros((16, 24, 3), np.uint8)
    for r in rows:
        blk = np.frombuffer(bytes(r["patch"]), np.uint8).reshape(8, 8, 3)
        recon[r["py"] * 8:(r["py"] + 1) * 8, r["px"] * 8:(r["px"] + 1) * 8] = blk
        assert r["patch_id"] == r["py"] * r["n_px"] + r["px"]
        assert r["pix_sum"] == int(blk.sum(dtype=np.int64))
    padded = np.zeros((16, 24, 3), np.uint8)
    padded[:13, :20] = arr
    assert (recon == padded).all()
    # pad fractions: bottom-right patch has (16-13)*(24-20+4... ) -> compute directly
    by_id = {r["patch_id"]: r for r in rows}
    assert by_id[0]["pad_frac"] == 0.0
    assert abs(by_id[5]["pad_frac"] - (1.0 - (13 - 8) * (20 - 16) / 64.0)) < 1e-15


def test_tfidf_keywords_hand_computed(spark):
    """Smoothed TF-IDF on a 3-doc corpus worked by hand: N=3, so a term
    in all docs has idf ln(4/4)+1 = 1.0; a term in one doc has
    ln(4/2)+1 = 1.6931...; ranks follow score DESC then term ASC."""
    import math

    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "cherry common common"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["term"]): r for r in tx.tfidf_keywords(docs, k=3).collect()}
    idf1 = math.log(4 / 2) + 1   # df=1 terms: apple
    idf2 = math.log(4 / 3) + 1   # df=2 terms: banana, cherry
    idf3 = math.log(4 / 4) + 1   # df=3 terms: common
    r = out[(0, "apple")]
    assert r["tf"] == 2 and r["df"] == 1 and abs(r["score"] - 2 * idf1) < 1e-12
    assert r["rank"] == 1
    assert out[(0, "banana")]["rank"] == 2  # 1*idf2 > 1*idf3
    assert out[(0, "common")]["rank"] == 3
    # doc 2: common tf=2*idf3=2.0 vs cherry 1*idf2~1.287 -> common first
    assert out[(2, "common")]["rank"] == 1 and out[(2, "cherry")]["rank"] == 2
    # doc 1: banana vs cherry tie on (tf=1, df=2) -> term ASC breaks it
    assert out[(1, "banana")]["rank"] == 1 and out[(1, "cherry")]["rank"] == 2
    assert out[(1, "common")]["rank"] == 3


def test_charlm_score_hand_computed(spark):
    """Char-trigram LM worked by hand on a 3-doc corpus: trigram census
    c3(aaa)=3, c3(aab)=1, context c2(aa)=4, so P = (c3+1)/(c2+37); a
    sub-3-char doc drops out; the model join is a broadcast."""
    import math

    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "Aaab!"), (2, "x")], "doc_id long, text string"
    )
    res = tx.charlm_score(docs)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    out = {r["doc_id"]: r for r in res.collect()}
    assert 2 not in out  # no trigram -> dropped
    p_aaa = 4.0 / 41.0   # (3+1)/(4+37)
    p_aab = 2.0 / 41.0
    b0 = -math.log2(p_aaa)
    b1 = (-math.log2(p_aaa) - math.log2(p_aab)) / 2.0
    assert out[0]["n_trigrams"] == 2 and abs(out[0]["bits_per_char"] - b0) < 1e-12
    assert out[1]["n_trigrams"] == 2 and abs(out[1]["bits_per_char"] - b1) < 1e-12
    assert abs(out[1]["ppl"] - 2.0 ** b1) < 1e-9
    # repetitive text scores lower bits than mixed text under its own model
    assert out[0]["bits_per_char"] < out[1]["bits_per_char"]


def test_url_canonicalize_hand_cases(spark):
    """Hand-worked expectations for every clause of the documented
    canonicalization contract (operators/text.py::url_canonicalize) —
    written from the contract text, not from the implementation."""
    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            # case-fold + default port + trailing slash + tracking strip + fragment
            (1, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&q=7#frag"),
            # non-default port kept; '//' inside path preserved verbatim
            (2, "http://host.io:8080/x//deep/path"),
            # no path -> '/', single-label host -> empty domain heuristic
            (3, "https://localhost"),
            # only-tracking query -> no '?' at all; https default port dropped
            (4, "https://a.b.co:443/p?utm_campaign=z&fbclid=1&gclid=2"),
            # param order preserved, uppercase UTM_ is NOT a tracking key
            (5, "http://e.net/p?zz=1&UTM_SOURCE=keep&aa=2"),
            # root with trailing slashes collapses to '/'
            (6, "https://e.net///"),
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in tx.url_canonicalize(docs).collect()}
    assert out[1]["canonical"] == "http://www.example.com/a/b?q=7"
    assert (out[1]["host"], out[1]["domain"]) == ("www.example.com", "example.com")
    assert (out[1]["path_depth"], out[1]["n_params"]) == (2, 1)
    assert out[2]["canonical"] == "http://host.io:8080/x//deep/path"
    assert out[2]["path_depth"] == 3  # empty segment from '//' not counted
    assert out[3]["canonical"] == "https://localhost/"
    assert (out[3]["domain"], out[3]["path_depth"]) == ("", 0)
    assert out[4]["canonical"] == "https://a.b.co/p"
    assert out[4]["n_params"] == 0
    assert out[5]["canonical"] == "http://e.net/p?zz=1&UTM_SOURCE=keep&aa=2"
    assert out[5]["n_params"] == 3
    assert out[6]["canonical"] == "https://e.net/"


def test_url_canonicalize_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form must be a fixed point or dedup keyed on it is unstable."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&q=7#frag"),
            (2, "http://host.io:8080/x//deep/path"),
            (3, "https://localhost"),
            (4, "https://a.b.co:443/p?utm_campaign=z"),
        ],
        "doc_id long, url string",
    )
    once = tx.url_canonicalize(docs).select("doc_id", F.col("canonical").alias("url"))
    twice = tx.url_canonicalize(once)
    pairs = {
        r["doc_id"]: (r["u1"], r["u2"])
        for r in once.withColumnRenamed("url", "u1")
        .join(twice.withColumnRenamed("canonical", "u2"), "doc_id")
        .select("doc_id", "u1", "u2")
        .collect()
    }
    for u1, u2 in pairs.values():
        assert u1 == u2
