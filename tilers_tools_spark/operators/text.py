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
