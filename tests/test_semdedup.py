"""SemDeDup (operators/dedup.py::semdedup) — cluster-then-prune semantic
dedup per Abbas et al. 2023. The hyperplane backend is oracle-gated
(`semdedup` in the driver gate); these tests pin the kmeans backend, the
paper's low-centroid-sim keep rule, the transitive grouping, and the
no-silent-truncation cap path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tilers_tools_spark.operators import dedup


def _df(spark, vecs, ids=None):
    ids = ids if ids is not None else list(range(len(vecs)))
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]}),
        "vec_id long, embedding array<double>",
    )


def test_kmeans_backend_planted_dups(spark):
    """Two tight planted groups + isolated points: every planted group
    collapses to one kept representative; isolated points all survive."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    # group A: ids 100..103 are jittered copies of one vector
    a = rng.standard_normal(16)
    dup_a = [a + rng.standard_normal(16) * 1e-4 for _ in range(4)]
    # group B: ids 200..202
    b = rng.standard_normal(16)
    dup_b = [b + rng.standard_normal(16) * 1e-4 for _ in range(3)]
    vecs = list(base) + dup_a + dup_b
    ids = list(range(40)) + [100, 101, 102, 103] + [200, 201, 202]
    out = dedup.semdedup(
        _df(spark, vecs, ids), eps=0.999, assign="kmeans", n_clusters=8, seed=7
    ).toPandas().set_index("vec_id")
    ga = {out.loc[i, "group"] for i in (100, 101, 102, 103)}
    gb = {out.loc[i, "group"] for i in (200, 201, 202)}
    assert len(ga) == 1 and len(gb) == 1 and ga != gb
    assert out.loc[[100, 101, 102, 103], "keep"].sum() == 1
    assert out.loc[[200, 201, 202], "keep"].sum() == 1
    # random 16-dim vectors never reach cosine 0.999: all singletons kept
    singles = out.loc[[i for i in range(40)]]
    assert singles["keep"].all()
    assert (singles["group"] == singles.index).all()
    # every member of a group sits in ONE cluster by construction
    assert out.loc[[100, 101, 102, 103], "cluster"].nunique() == 1


def test_paper_keep_rule_low_centroid_sim(spark):
    """keep='low_centroid_sim' keeps the duplicate-group member with the
    LOWEST cosine to its centroid. One cluster (n_clusters=1 makes the
    centroid the normalized mean), a 3-member duplicate group where
    member 2 is deliberately the boundary example."""
    base = np.array([1.0, 0.0, 0.0, 0.0])
    # all three are mutual dups at eps=0.99; v2 is angled furthest away
    v0 = base
    v1 = base + np.array([0.0, 0.01, 0.0, 0.0])
    v2 = base + np.array([0.0, 0.12, 0.0, 0.0])
    far = np.array([0.0, 0.0, 1.0, 0.0])  # pulls the centroid, not a dup
    out = dedup.semdedup(
        _df(spark, [v0, v1, v2, far]), eps=0.99, assign="kmeans",
        n_clusters=1, keep="low_centroid_sim", seed=1,
    ).toPandas().set_index("vec_id")
    assert {out.loc[i, "group"] for i in (0, 1, 2)} == {0}
    kept = [i for i in (0, 1, 2) if out.loc[i, "keep"]]
    assert kept == [2]  # furthest-from-centroid member survives
    assert out.loc[3, "keep"]
    sims = out.loc[[0, 1, 2], "centroid_sim"]
    assert sims.idxmin() == 2 and sims.notna().all()


def test_min_id_rule_and_hyperplane_backend(spark):
    planes = [[((i * 131 + j * 17) % 7) - 3 for j in range(8)] for i in range(3)]
    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 8))
    dups = [base[0] + 1e-5, base[0] - 1e-5]
    out = dedup.semdedup(
        _df(spark, list(base) + dups, list(range(20)) + [50, 51]),
        eps=0.999, assign="hyperplane", planes=planes, keep="min_id",
    ).toPandas().set_index("vec_id")
    assert out.loc[0, "keep"] and out.loc[0, "group"] == 0
    # jittered twins share vector 0's bucket and group; min id (0) kept
    assert out.loc[50, "group"] == 0 and not out.loc[50, "keep"]
    assert out.loc[51, "group"] == 0 and not out.loc[51, "keep"]
    assert out["centroid_sim"].isna().all()  # no centroid in this backend
    with pytest.raises(ValueError, match="low_centroid_sim"):
        dedup.semdedup(_df(spark, list(base)), assign="hyperplane",
                       planes=planes, keep="low_centroid_sim")
    with pytest.raises(ValueError, match="assign"):
        dedup.semdedup(_df(spark, list(base)), assign="dbscan")
    with pytest.raises(ValueError, match="keep"):
        dedup.semdedup(_df(spark, list(base)), keep="random")


def test_cap_keeps_all_and_reports(spark):
    """Clusters over max_cluster are NOT silently pruned: every member
    kept as its own group, and semdedup_skipped_clusters names them."""
    vecs = [np.array([1.0, 0.0]) + i * 1e-6 for i in range(12)]
    out_df = dedup.semdedup(
        _df(spark, vecs), eps=0.9, assign="kmeans", n_clusters=1, max_cluster=5, seed=2
    )
    out = out_df.toPandas()
    assert out["keep"].all()
    assert (out["group"] == out["vec_id"]).all()
    skipped = dedup.semdedup_skipped_clusters(out_df, max_cluster=5).toPandas()
    assert len(skipped) == 1 and skipped.iloc[0]["n_members"] == 12
    # under the cap the same input collapses to one survivor
    out2 = dedup.semdedup(
        _df(spark, vecs), eps=0.9, assign="kmeans", n_clusters=1, max_cluster=100, seed=2
    ).toPandas()
    assert out2["keep"].sum() == 1


def test_transitive_grouping_chain(spark):
    """A chain a~b~c where cos(a,c) < eps still forms ONE group (the
    eps-graph closure, not a clique requirement)."""
    # unit vectors at angles 0, 5.5 and 11 degrees: adjacent pairs above
    # cos(5.5 deg) ~ 0.9954, the far pair below cos(11 deg) ~ 0.9816
    def at(deg):
        r = np.deg2rad(deg)
        return np.array([np.cos(r), np.sin(r), 0.0])

    out = dedup.semdedup(
        _df(spark, [at(0), at(5.5), at(11)]), eps=0.995, assign="kmeans",
        n_clusters=1, keep="min_id", seed=5,
    ).toPandas().set_index("vec_id")
    assert set(out["group"]) == {0}
    assert out["keep"].sum() == 1 and out.loc[0, "keep"]


def test_empty_corpus_raises(spark):
    empty = _df(spark, []).filter("vec_id > 0")
    with pytest.raises(ValueError, match="empty"):
        dedup.semdedup(empty, assign="kmeans")
    with pytest.raises(ValueError, match="empty"):
        dedup.semdedup(empty, assign="hyperplane")
