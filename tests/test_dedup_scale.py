"""Scale dress-rehearsal for the dedup family (VERDICT r3 ask #5).

The 500-row oracle fixtures prove the dedup operators CORRECT; this test
proves the star-collapse scale path actually ENGAGES at size. A 50k-doc
adversarial corpus — one 10k-member identical-text hot group (the "10k
empty/boilerplate docs" failure mode of web corpora) plus 50 boilerplate
cliques of 100 — must:

* collapse the hot group's band buckets (``*_skipped_buckets`` non-empty)
  instead of exploding into ~50M candidate pairs (O(n^2));
* still recall every true pair rep-mediated (exact pair counts below);
* feed ``connected_components`` edges that converge to the exact expected
  component count;
* finish the whole pipeline inside a bounded wall — the quadratic path
  would take orders of magnitude longer, so the bound is the regression
  alarm, generously sized for this shared-host box's 2-3x noise.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.operators import dedup

N_HOT = 10_000
N_GROUPS, GROUP_SZ = 50, 100
N_UNIQUE = 35_000
N_DOCS = N_HOT + N_GROUPS * GROUP_SZ + N_UNIQUE  # 50_000
CAP = 500
BUDGET_SEC = 120.0


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    rows = []
    hot_text = "common boilerplate header footer page content words here now"
    for i in range(N_HOT):
        rows.append((i, hot_text))
    for g in range(N_GROUPS):
        text = (
            f"section {g} has distinct content words alpha{g * 13} beta gamma "
            f"delta{g * 7} epsilon zeta eta theta unique tail marker{g}"
        )
        for m in range(GROUP_SZ):
            rows.append((N_HOT + g * GROUP_SZ + m, text))
    base = N_HOT + N_GROUPS * GROUP_SZ
    for i in range(N_UNIQUE):
        d = base + i
        rows.append((d, f"unique document {d} body {d * 7919 % 100000} tail {d % 97} end{d * 31 % 1009}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf).repartition(32).cache()
    assert df.count() == N_DOCS
    return df


def test_dedup_family_scale_rehearsal(spark, adversarial_docs):
    docs = adversarial_docs
    t0 = time.monotonic()

    # --- MinHash-LSH pairs with the cap ON -----------------------------
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, mode="word", jaccard_threshold=0.5, max_bucket=CAP
    ).cache()
    n_pairs = pairs.count()
    # hot group: star-collapsed -> exactly N_HOT-1 rep-mediated pairs, all
    # verified at jaccard 1.0; cliques of 100 (< CAP) stay exact: C(100,2)
    # per group. Unique docs never survive the jaccard>=0.5 verify.
    expected = (N_HOT - 1) + N_GROUPS * (GROUP_SZ * (GROUP_SZ - 1) // 2)
    assert n_pairs == expected, f"pairs {n_pairs} != {expected}"
    hot_pairs = pairs.filter((F.col("a") < N_HOT) & (F.col("b") < N_HOT)).count()
    assert hot_pairs == N_HOT - 1  # linear, NOT ~50M: the collapse engaged
    skipped = dedup.lsh_skipped_buckets(
        docs, num_hashes=16, bands=4, mode="word", max_bucket=CAP
    ).collect()
    assert skipped, "hot-group buckets must be reported as collapsed"
    assert all(r["n"] == N_HOT for r in skipped)

    # --- SimHash pairs with the cap ON ---------------------------------
    sims = dedup.simhash(docs).cache()
    spairs = dedup.simhash_pairs(sims, bands=4, max_hamming=3, max_bucket=CAP).cache()
    hot_spairs = spairs.filter((F.col("a") < N_HOT) & (F.col("b") < N_HOT)).count()
    assert hot_spairs == N_HOT - 1  # identical simhash -> star pairs, hamming 0
    # every clique pair recalled (identical text -> identical simhash)
    clique = spairs.filter((F.col("a") >= N_HOT) & (F.col("b") < N_HOT + N_GROUPS * GROUP_SZ))
    assert clique.filter(F.col("hamming") == 0).count() >= N_GROUPS * (GROUP_SZ * (GROUP_SZ - 1) // 2)
    s_skipped = dedup.simhash_skipped_buckets(sims, bands=4, max_bucket=CAP).collect()
    # the hot group's identical simhash must appear among the collapsed
    # buckets (n == N_HOT); template-similar "unique" docs legitimately
    # produce further >CAP buckets — every report must exceed the cap
    assert any(r["n"] == N_HOT for r in s_skipped)
    assert all(r["n"] > CAP for r in s_skipped)

    # --- connected components over the LSH pair graph ------------------
    comp = dedup.connected_components(
        pairs.select("a", "b"), docs.select("doc_id"), id_col="doc_id"
    ).cache()
    n_comps = comp.select("comp").distinct().count()
    # hot group -> 1 component, each clique -> 1, uniques singletons
    assert n_comps == N_DOCS - (N_HOT - 1) - N_GROUPS * (GROUP_SZ - 1)
    # the hot star resolves to the min-id representative
    assert comp.filter((F.col("id") < N_HOT) & (F.col("comp") != 0)).count() == 0

    elapsed = time.monotonic() - t0
    for df in (pairs, sims, spairs, comp):
        df.unpersist()
    assert elapsed < BUDGET_SEC, (
        f"dedup scale rehearsal took {elapsed:.1f}s (> {BUDGET_SEC}s) — the "
        "star-collapse path may have stopped engaging (quadratic blowup)"
    )
