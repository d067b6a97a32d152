"""Text-analysis operators for training-data pipelines (task brief):
language-ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM codegen, zero
Python) — at 100TB these run map-side in one narrow stage over the
documents scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (n-gram heuristic; good enough for
# coarse routing — a real pipeline swaps in fastText; interface stays)
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " los ", " que ", " es "],
    "it": [" il ", " di ", " che ", " per ", " una "],
}

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as",
]


def _marker_score(t: Column, lang: str) -> Column:
    s = F.lit(0)
    for m in _LANG_MARKERS[lang]:
        s = s + F.when(t.contains(m), 1).otherwise(0)
    return s


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-n-gram language guess + score. Ties resolve by fixed language
    order (deterministic)."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = F.array(
        *[F.struct(_marker_score(t, lang).alias("score"), F.lit(lang).alias("lang")) for lang in _LANG_MARKERS]
    )
    best = F.array_max(scores)
    return docs.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count (empty string -> 0)."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword estimate: words + punctuation runs + digit runs,
    counted via a tokenizing regex (proxy for tokenizer cost accounting)."""
    t = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(t, F.lit(r"[A-Za-z]{1,8}|\d{1,3}|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces)


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword/uppercase ratios + a blended quality
    score in [0,1] (heuristic web-quality filter features)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    n_safe = F.greatest(n, F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    ntok = token_count(t).cast("double")
    ntok_safe = F.greatest(ntok, F.lit(1.0))
    stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOPWORDS]))).cast(
        "double"
    )
    mean_word = n / ntok_safe
    score = (
        F.lit(1.0)
        - F.least(punct / n_safe * 4.0, F.lit(0.5))
        - F.least(digits / n_safe * 2.0, F.lit(0.3))
        + F.least(stop / ntok_safe * 2.0, F.lit(0.2))
    )
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_chars_q"),
        ntok.cast("long").alias("n_tokens"),
        (punct / n_safe).alias("punct_ratio"),
        (upper / n_safe).alias("upper_ratio"),
        (digits / n_safe).alias("digit_ratio"),
        (stop / ntok_safe).alias("stopword_ratio"),
        mean_word.alias("mean_word_len"),
        F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)).alias("quality_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling-window hash over
    character 8-grams (robust to small edits; column-expr only). The
    lowered text is materialized behind a collapse barrier so the gram
    lambda reads an attribute (see operators.dedup._barrier)."""
    from .dedup import _barrier

    d1 = _barrier(docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_t")))
    n = F.greatest(F.length("_t") - F.lit(window - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(F.substr(F.col("_t"), i, F.lit(window))))
    return d1.select(
        F.col(id_col),
        F.array_min(grams).alias("fp_min"),
        F.array_max(grams).alias("fp_max"),
        F.md5(F.col("_t")).alias("fp_md5"),
    )


def _word_ngrams(words_col: str, n: int):
    """Word n-gram array from a materialized token-array column, built as
    n-1 zip_withs of SHIFTED slices. NOT transform(sequence(...),
    i -> slice(words, i, n)): a dynamic-start Slice inside a
    higher-order-function lambda falls out of codegen and measured 5x
    slower on sf0.1 documents (5.9 s -> 1.1 s for the bigram explode)."""
    cnt = F.size(words_col) - F.lit(n - 1)

    def build():
        g = F.slice(words_col, 1, cnt)
        for j in range(1, n):
            g = F.zip_with(
                g, F.slice(words_col, 1 + j, cnt), lambda a, b: F.concat_ws(" ", a, b)
            )
        return g

    return F.when(cnt >= 1, build()).otherwise(F.array().cast("array<string>"))


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matched: int = 1,
) -> DataFrame:
    """Benchmark-contamination detection: which training documents
    contain word n-grams from an evaluation/benchmark set (the standard
    decontamination primitive for LLM training corpora — e.g. "flag any
    train doc sharing a 13-gram with the eval set", here parameterized
    by n).

    Tokenization (shared with the DuckDB oracle): lowercase, every
    non-[a-z0-9] run collapses to one separator, empty tokens dropped;
    an n-gram is n consecutive tokens joined by single spaces. Per-doc
    n-gram sets are DISTINCT, so `n_matched` counts distinct shared
    n-grams and `overlap_frac` = n_matched / |bench doc's n-gram set|
    (a ratio of exact ints — bit-stable cross-engine).

    Scale design (100 TB train corpus, KB-scale benchmark): the bench
    side is exploded to (bench_id, gram) and BROADCAST — benchmarks are
    tiny by construction — so the train corpus streams through ONE
    narrow map-side hash join on the gram string; no shuffle of train
    data, no all-pairs. Returns (train_id, bench_id, n_matched,
    bench_ngrams, overlap_frac) for pairs with n_matched >= min_matched.
    """
    from .dedup import _barrier

    def gram_rows(df: DataFrame, out_id: str) -> DataFrame:
        d1 = _barrier(
            df.select(
                F.col(id_col).alias(out_id),
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "), " "
                    ),
                    lambda w: w != "",
                ).alias("_w"),
            )
        )
        return d1.select(
            out_id, F.explode(F.array_distinct(_word_ngrams("_w", n))).alias("gram")
        )

    bench_grams = gram_rows(bench, "bench_id")
    bench_sizes = bench_grams.groupBy("bench_id").agg(F.count("*").alias("bench_ngrams"))
    train_grams = gram_rows(train, "train_id")
    matched = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= min_matched)
    )
    return matched.join(F.broadcast(bench_sizes), "bench_id").select(
        "train_id",
        "bench_id",
        "n_matched",
        "bench_ngrams",
        (F.col("n_matched").cast("double") / F.col("bench_ngrams").cast("double")).alias(
            "overlap_frac"
        ),
    )


# PII patterns (shared literal with the DuckDB oracle SQL) — deliberately
# restricted to constructs Java regex and RE2 interpret identically
# (char classes, bounded quantifiers, \b; no alternation ambiguity, no
# lookaround, no backrefs)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d -]{7,}\d"


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII detection + redaction (the Common-Crawl-pipeline staple):
    emails, IPv4 addresses and phone-like digit runs counted on the
    ORIGINAL text, then redacted sequentially (emails -> IPs -> phones)
    to <EMAIL>/<IP>/<PHONE> placeholders. Returns
    (id, n_emails, n_ipv4, n_phones, redacted_len, redacted_md5) —
    the md5 pins the exact redacted bytes cross-engine without moving
    the text through the compare. Pure Column exprs (JVM regex, no UDF);
    linear scan per row, no shuffle."""
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), F.lit(0))).alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency line dedup (the CCNet / RefinedWeb boilerplate
    pass): a line whose trimmed form appears in >= `min_docs` DISTINCT
    documents (nav bars, cookie banners, footers) is removed from every
    document; surviving lines are re-joined in original order. Empty
    lines are never counted as boilerplate (trim(line) = '' is exempt).
    Returns (id, n_lines, n_removed, cleaned_len, cleaned_md5) — the md5
    pins the exact cleaned bytes cross-engine without moving the text
    through the compare.

    Scale shape: lines key by fixed-width md5(trim(line)) so the
    boilerplate census shuffles (key, doc_id) only — never line text;
    Spark's distinct-count partial-aggregates map-side. The census
    output (lines repeated across >= min_docs docs) is tiny by
    construction, so AQE broadcasts the anti-join; line text shuffles
    exactly once, keyed by doc_id, to reassemble. No all-pairs stage
    anywhere — linear in corpus size at any scale.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n", -1)).alias("_pos", "_line"),
    ).withColumn("_key", F.md5(F.trim(F.col("_line"))))
    boiler = (
        lines.filter(F.trim(F.col("_line")) != "")
        .groupBy("_key")
        .agg(F.count_distinct(F.col(id_col)).alias("_d"))
        .filter(F.col("_d") >= int(min_docs))
        .select("_key")
    )
    kept = lines.join(boiler, "_key", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_cleaned"),
    )
    n_lines = F.size(F.split(F.col(text_col), r"\n", -1)).cast("long")
    cleaned = F.coalesce(F.col("_cleaned"), F.lit(""))
    return (
        docs.select(id_col, text_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            n_lines.alias("n_lines"),
            (n_lines - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("long").alias("n_removed"),
            F.length(cleaned).cast("long").alias("cleaned_len"),
            F.md5(cleaned).alias("cleaned_md5"),
        )
    )


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 quality
    heuristics, re-expressed relationally): per document,

      n_words           whitespace token count (lowercased tokenization
                        shared with contamination_pairs)
      dup_word_frac     1 - |distinct words| / n_words
      top_bigram_count  occurrences of the most frequent word bigram
      top_bigram_frac   top_bigram_count / bigram count

    High values flag boilerplate / keyword-stuffed / looping documents.
    Scale: one explode keyed by (doc, bigram) then two doc-keyed
    aggregations — all shuffles are on doc_id (uniform), text itself is
    dropped after the narrow projection; no cross-doc joins.
    """
    from .dedup import _barrier

    d1 = _barrier(
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "), " "),
                lambda w: w != "",
            ).alias("_w"),
        )
    )
    base = d1.select(
        id_col,
        F.size("_w").alias("n_words"),
        F.size(F.array_distinct("_w")).alias("_n_distinct"),
        _word_ngrams("_w", 2).alias("_bg"),
    ).localCheckpoint()  # r06: both the bigram census and the final select
    # consume base — unmaterialized, the tokenize + HOF pipeline (the
    # operator's dominant cost) replays once per consumer
    bg_counts = (
        base.select(id_col, F.explode("_bg").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("_n_bigrams"))
    )
    return (
        base.select(id_col, "n_words", "_n_distinct")
        .join(bg_counts, id_col, "left")
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.when(
                F.col("n_words") > 0,
                F.lit(1.0) - F.col("_n_distinct").cast("double") / F.col("n_words").cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup_word_frac"),
            F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("long").alias("top_bigram_count"),
            F.when(
                F.col("_n_bigrams") > 0,
                F.col("top_bigram_count").cast("double") / F.col("_n_bigrams").cast("double"),
            ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def line_repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher LINE-level repetition signals (Rae et al. 2021 appendix
    A1.1 duplicate-line family, as reimplemented by RefinedWeb /
    FineWeb-style corpus pipelines): per document,

      n_lines             count of non-empty '\\n'-separated lines
      dup_line_frac       fraction of line OCCURRENCES whose identical
                          line text already appeared earlier in the doc
      dup_line_char_frac  characters inside those duplicate occurrences
                          / total characters across all lines

    Exact rule (documented so the oracle can mirror it): lines =
    split(text, '\\n') with empty strings dropped; occurrence i
    (1-based) is a duplicate iff the index of the FIRST occurrence of
    its value != i. High values flag template / boilerplate / looping
    documents; complements the word/bigram signals of
    repetition_features.

    Scale: pure higher-order Column expressions over the documents scan
    — per-row compute, ZERO shuffle (unlike the word-level op's bigram
    explode+groupBy). The first-occurrence test is array_position
    inside a filter lambda: O(n_lines^2) per doc, all JVM-side, lines
    bounded by document size; the lines array is materialized behind a
    collapse barrier so the lambda reads an attribute, not a
    re-evaluated split().
    """
    from .dedup import _barrier

    d1 = _barrier(
        docs.select(
            F.col(id_col),
            F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "").alias("_l"),
        )
    )
    d2 = _barrier(
        d1.select(
            id_col,
            "_l",
            F.filter(
                "_l", lambda x, i: F.array_position(F.col("_l"), x) != (i + F.lit(1))
            ).alias("_d"),
        )
    )

    def _chars(c):
        return F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))

    return d2.select(
        F.col(id_col),
        F.size("_l").cast("long").alias("n_lines"),
        F.when(
            F.size("_l") > 0,
            F.size("_d").cast("double") / F.size("_l").cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(
            _chars(F.col("_l")) > 0,
            _chars(F.col("_d")).cast("double") / _chars(F.col("_l")).cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-k keyword extraction by smoothed TF-IDF (the
    sklearn TfidfVectorizer smooth_idf formula, documented so the oracle
    can mirror it exactly):

        idf(t)  = ln((N + 1) / (df(t) + 1)) + 1
        score   = tf(doc, t) * idf(t)

    Tokens share the corpus-wide normalization of repetition_features /
    contamination_pairs (lowercase, non-alphanumeric -> space). Output:
    one row per (doc, term) with rank <= k, deterministic tie-break
    (score DESC, term ASC).

    Scale: the canonical distributed shape — (doc, term) hash-agg for
    tf (map-side partials), term-keyed agg for df (one narrow count per
    vocab term), then tf JOIN df on term. Stopword-grade terms make
    that join key skewed (df side is 1 row/term, tf side is
    corpus-sized for hot terms) — AQE skew-join splits it; N is a
    1-row broadcast, not a driver-side count, so the whole plan stays
    lazy. Top-k is a doc-keyed window (uniform partitioning).
    """
    from pyspark.sql.window import Window

    from .dedup import _barrier

    d1 = _barrier(
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "), " "),
                lambda w: w != "",
            ).alias("_w"),
        )
    )
    tf = (
        d1.select(id_col, F.explode("_w").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df")).filter(F.col("df") >= min_df)
    ndf = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(ndf))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.log((F.col("_n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double")) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score").cast("double").alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def charlm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", alpha: float = 1.0
) -> DataFrame:
    """Corpus-trained character-trigram LM quality score — the CCNet
    role (Wenzek et al. 2020 filter corpora by LM perplexity; a char
    n-gram model is the tokenizer-free stand-in used by many pipeline
    reimplementations). Per document:

      n_trigrams     trigram occurrences in the normalized text
      bits_per_char  mean -log2 P(c3 | c1 c2) under the corpus model
      ppl            2^bits_per_char (lower = more typical of corpus)

    Exact rule (mirrored by the oracle): text normalized to the 37-char
    alphabet [a-z0-9 ] (lowercase, non-alphanumeric runs -> one space,
    trimmed); model P(c3|c12) = (count3 + alpha) / (count2 + alpha*37)
    with add-alpha smoothing, count2 = sum of trigram counts sharing the
    prefix (so the model is self-consistent); docs with no trigram drop
    out.

    Scale: the model lives in the BOUNDED trigram space (<= 37^3 ~ 50k
    rows regardless of corpus size) — one explode+count over the corpus
    builds it, then scoring is a BROADCAST join of per-doc distinct
    trigram counts against the model plus one doc-keyed aggregate. No
    all-corpus shuffle ever carries text; the trigram census key space
    is fixed, so AQE has nothing to skew-split bigger than 37^3 keys.

    Physical shape (r06): trigrams are generated as ROWS —
    explode(sequence(1, len-2)) + substring — not as a per-doc string
    array from a transform() lambda. Higher-order-function lambdas are
    interpreted per element (no whole-stage codegen), and materializing
    ~len 3-char strings per doc cost more than everything else in this
    operator combined (measured ~10s of a 35s sf0.1 wall per pass);
    the row form runs entirely inside one WholeStageCodegen span. The
    (doc, trigram) census is also materialized ONCE (localCheckpoint)
    because both the model build and the scoring join consume it —
    unmaterialized, the corpus explode replays per consumer.
    """
    V = 37.0
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    d1 = docs.select(F.col(id_col), norm.alias("_t"))
    # docs with no trigram (normalized length < 3) drop out here — same
    # contract as the previous size(_g) > 0 filter on the array form
    d2 = d1.filter(F.length("_t") >= 3)
    doc_tri = (
        d2.select(
            id_col,
            "_t",
            F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(2))).alias("_i"),
        )
        .select(id_col, F.col("_t").substr(F.col("_i"), F.lit(3)).alias("tri"))
        .groupBy(id_col, "tri")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    tri_counts = doc_tri.groupBy("tri").agg(F.sum("n").alias("c3"))
    ctx = tri_counts.groupBy(F.substring("tri", 1, 2).alias("_p")).agg(F.sum("c3").alias("c2"))
    model = tri_counts.join(ctx, tri_counts["tri"].substr(1, 2) == ctx["_p"]).select(
        "tri", "c3", "c2"
    )
    logp = F.log2(
        (F.col("c3").cast("double") + F.lit(alpha)) / (F.col("c2").cast("double") + F.lit(alpha * V))
    )
    scored = doc_tri.join(F.broadcast(model), "tri").groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_trigrams"),
        (F.sum(F.col("n") * -logp) / F.sum("n")).alias("bits_per_char"),
    )
    return scored.select(
        F.col(id_col),
        "n_trigrams",
        F.col("bits_per_char").cast("double").alias("bits_per_char"),
        F.pow(F.lit(2.0), F.col("bits_per_char")).cast("double").alias("ppl"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer: distributed training + encoding (Sennrich et al. 2016)
# ---------------------------------------------------------------------------

BPE_EOW = "</w>"


def _bpe_word_census(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) census — the ONLY pass over the corpus text: one
    shuffle of words with map-side partial counts; every training
    iteration afterwards runs on the (much smaller) distinct-word set."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _bpe_merge_expr(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b as a pure
    Column fold (no Python in the training loop). Fold invariant: the
    accumulator's last element merges with the current one iff they
    equal (a, b) — since the merged string a+b != a, a freshly merged
    token never cascades within the same pass (matches the textbook
    scan-and-skip greedy, verified against the scalar golden)."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (cur == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def bpe_train(
    docs: DataFrame, num_merges: int = 100, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding training (Sennrich et al. 2016) — the
    tokenizer-building step of an LLM data pipeline, distributed:

    * words split on whitespace; symbols = characters + a final
      ``</w>`` end-of-word marker;
    * each round counts adjacent symbol pairs over the weighted word
      census (explode + sum — narrow pair strings only), picks the
      max-frequency pair (ties broken lexicographically on (left,
      right) — deterministic, partitioning-independent) and merges it
      everywhere with a pure Column fold;
    * the census is localCheckpoint'ed each round so the plan does not
      grow with the merge count.

    Returns [(left, right, freq)] in merge order. Scale: the corpus is
    read ONCE (word census); rounds touch only distinct words — the
    same shape fastBPE uses single-node, with the census sharded."""
    words = _bpe_word_census(docs, text_col).select(
        "cnt",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(BPE_EOW))).alias("sym"),
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = words.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["freq"])
        merges.append((a, b, freq))
        words = words.select("cnt", _bpe_merge_expr(F.col("sym"), a, b).alias("sym"))
        words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a trained merge list: merges applied in rank order
    per word (the Sennrich apply rule — same greedy the trainer used).
    One Arrow mapInPandas pass; each batch memoizes per distinct word,
    so hot words tokenize once per batch. Adds ``tokens`` +
    ``n_tokens``."""
    ranked = [(m[0], m[1]) for m in merges]

    def run(it):
        import re

        import pandas as pd

        # Java \s is ASCII-only: match the trainer's F.split exactly
        ws = re.compile(r"\s+", re.ASCII)

        def enc_word(w: str, memo: dict) -> list[str]:
            got = memo.get(w)
            if got is None:
                sym = list(w) + [BPE_EOW]
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

        for pdf in it:
            memo: dict = {}
            toks = []
            for t in pdf[text_col]:
                doc_tokens: list[str] = []
                for w in ws.split(str(t)):
                    if w:
                        doc_tokens += enc_word(w, memo)
                toks.append(doc_tokens)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(x) for x in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, tokens array<string>, n_tokens long"
    )


# ---------------------------------------------------------------------------
# text normalization (the ftfy/clean-before-tokenize role)
# ---------------------------------------------------------------------------

_CTRL_RE = r"[\x00-\x08\x0e-\x1f\x7f]"  # C0 controls + DEL, KEEPING \t..\r
_WS_RE = r"[ \t\n\x0b\f\r]+"  # explicit class: Java \s and RE2 \s disagree on \x0b


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "norm_text",
) -> DataFrame:
    """Canonical text normalization before tokenization/dedup (the
    cleanup every corpus pipeline runs; fixed documented order so two
    engines agree byte-for-byte):

    1. strip C0 control chars + DEL (whitespace controls \\t..\\r kept);
    2. Unicode NFC (combining sequences composed — the one step that
       needs Python: ``unicodedata.normalize`` in an Arrow-batched
       pandas UDF; everything else is JVM Column ops);
    3. collapse ASCII whitespace runs to one space (EXPLICIT char class
       — Java's \\s includes \\x0b, RE2's does not; spelling the class
       keeps Spark and the DuckDB oracle identical);
    4. trim + lowercase.

    The driver gate compares md5 of the result against DuckDB's
    independent utf8proc ``nfc_normalize`` — a genuinely cross-engine
    Unicode pin, not a twin of our own kernel."""
    import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _nfc(s):  # type: ignore[misc]
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)

    s1 = F.regexp_replace(F.col(text_col), _CTRL_RE, "")
    s2 = _nfc(s1)
    s3 = F.regexp_replace(s2, _WS_RE, " ")
    return docs.withColumn(out_col, F.lower(F.trim(s3)))


URL_TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid)="


def url_canonicalize(docs: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL canonicalization + domain features (the web-crawl dedup/filter
    prerequisite: the same page arrives under dozens of spellings, and
    exact dedup / domain mixing both key on the canonical form).

    Documented canonicalization contract (the oracle implements the SAME
    contract independently in DuckDB's RE2 dialect — different regex
    engine + different list functions, so a dialect-specific parsing bug
    cannot cross-validate):
      1. fragment dropped (everything from the first '#');
      2. scheme and host lowercased;
      3. default port stripped (http:80 / https:443), others kept;
      4. empty path -> '/', trailing '/' runs stripped (non-root);
      5. tracking params removed (utm_*, fbclid, gclid), surviving
         params kept IN ORIGINAL ORDER (no re-sort: order is part of
         the URL's identity for non-canonical-query servers);
      6. registered domain = last two dot-labels of the host
         (documented heuristic: the public-suffix list is external data
         and unavailable offline; co.uk-style suffixes mis-split).

    Pure Column exprs (JVM regex + array HOFs, no UDF, no shuffle):
    a 100 TB crawl canonicalizes map-side at scan speed."""
    u = F.col(url_col)
    base = F.regexp_extract(u, "^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_extract(hostport, "^([^:]*)", 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    path_raw = F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)", 1)
    path_stripped = F.regexp_replace(path_raw, "/+$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    query = F.regexp_extract(base, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"), lambda x: (x != "") & ~x.rlike(URL_TRACKING_RE)
    )
    canon_q = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    domain = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    path_depth = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    return docs.select(
        F.col(id_col),
        canonical.alias("canonical"),
        host.alias("host"),
        domain.alias("domain"),
        path_depth.cast("long").alias("path_depth"),
        F.size(params).cast("long").alias("n_params"),
    )
