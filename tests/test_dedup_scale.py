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
# Regression alarm, not a benchmark: the star-collapse engagement is
# PROVEN by the exact pair-count asserts below; the wall bound only has
# to catch the orders-of-magnitude quadratic path (uncapped hot bucket =
# ~50M pairs, >> 1h at local[8]). Re-measured round 5: the quiet wall on
# this round's (slower) VM at the conftest local[8] is ~185 s — the
# round-4 figure of ~60 s no longer holds, and co-tenant bursts add up
# to 2.5x on top (identical runs measured 51 s vs 226 s at local[32]).
# 480 s keeps ~2.5x burst headroom while staying an order of magnitude
# under the quadratic blowup it exists to catch.
BUDGET_SEC = 480.0


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


def test_contamination_scale_rehearsal(spark):
    """Contamination at size: a 20k-doc synthetic train corpus vs a
    50-doc benchmark (25 planted spans copied from train docs, 25 clean)
    — planted spans are all found, clean docs produce no pairs, and the
    wall stays bounded (the broadcast n-gram join is linear in the train
    corpus; an accidental all-pairs or train-side shuffle would blow
    this budget)."""
    import time

    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import text as tx

    # deterministic synthetic corpus, generated IN Spark (no driver loop):
    # doc i = 30 words w<(i*k+j) % 9973> — word ids vary per doc
    n_train = 20_000
    train = (
        spark.range(n_train)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(29)),
                    lambda j: F.concat(F.lit("w"), ((F.col("id") * 31 + j) % 9973).cast("string")),
                ),
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    # bench: 25 planted = words 5..20 of train docs 100,300,...; 25 clean
    planted = (
        train.filter((F.col("doc_id") % 200 == 100) & (F.col("doc_id") < 5000))
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat_ws(" ", F.slice(F.split("text", " "), 5, 16)).alias("text"),
        )
    )
    clean = (
        spark.range(25)
        .select(
            (F.col("id") + 2_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(15)),
                    lambda j: F.concat(F.lit("z"), (F.col("id") * 17 + j).cast("string")),
                ),
            ).alias("text"),
        )
    )
    bench = planted.unionByName(clean)
    t0 = time.time()
    out = tx.contamination_pairs(train, bench, n=8).collect()
    wall = time.time() - t0
    pairs = {(r["train_id"], r["bench_id"]) for r in out}
    # every planted span must be found against its source doc
    expected = {(d, d + 1_000_000) for d in range(100, 5000, 200)}
    assert expected <= pairs, expected - pairs
    # clean bench docs share no 8-grams with anything
    assert not any(b >= 2_000_000 for _t, b in pairs)
    # full-overlap fraction for the planted source pairs
    by_pair = {(r["train_id"], r["bench_id"]): r for r in out}
    for key in expected:
        assert by_pair[key]["overlap_frac"] == 1.0
    assert wall < 120, wall  # generous; measured far lower on an idle box
