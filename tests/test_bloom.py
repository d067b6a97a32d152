"""Bloom corpus membership (operators/dedup.py::bloom_build /
bloom_maybe_contains): zero false negatives, scalar-replica agreement,
fp-rate sanity."""

from __future__ import annotations

import hashlib

import pandas as pd

from tilers_tools_spark.operators import dedup

M, K = 2048, 4


def scalar_positions(text: str):
    return [
        int(hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:15], 16) % M
        for i in range(K)
    ]


def test_membership_vs_scalar_replica(spark):
    corpus_texts = [f"corpus doc {i} body" for i in range(150)]
    probe_texts = corpus_texts[:50] + [f"novel doc {i} body" for i in range(100)]
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(150), "text": corpus_texts})
    )
    probe = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(150), "text": probe_texts})
    )
    bloom = dedup.bloom_build(corpus, m_bits=M, k=K)
    got = {
        r["doc_id"]: r["maybe_in_corpus"]
        for r in dedup.bloom_maybe_contains(probe, bloom, m_bits=M, k=K).collect()
    }
    # scalar replica of the whole filter
    bits = set()
    for t in corpus_texts:
        bits.update(scalar_positions(t))
    want = {
        i: all(p in bits for p in scalar_positions(t))
        for i, t in enumerate(probe_texts)
    }
    assert got == want
    # no false negatives: every true member flagged
    assert all(got[i] for i in range(50))
    # fp rate sane: fill ratio ~ 1-e^(-600/2048) = 0.25 -> fp ~ 0.4%/probe;
    # allow generous headroom but catch an always-true filter
    fps = sum(1 for i in range(50, 150) if got[i])
    assert fps < 20


def test_filter_table_shape(spark):
    corpus = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    rows = dedup.bloom_build(corpus, m_bits=M, k=K).collect()
    assert 1 <= len(rows) <= K
    for r in rows:
        assert 0 <= r["word_idx"] < M // 32
        assert r["word"] != 0 and 0 <= r["word"] < (1 << 32)
