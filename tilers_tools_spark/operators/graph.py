"""Distributed graph shortest paths — the pgRouting / GraphFrames SSSP
role for road-network and cell-adjacency analysis.

K-round Bellman-Ford relaxation over a (a, b, w) edge DataFrame with
non-negative INTEGER weights: after round k every node holds the exact
minimum-cost distance over paths of at most k edges from the nearest
source. The round count is a caller-visible part of the contract
(choose rounds >= the graph's hop diameter for exact SSSP; with fewer
rounds the result is the well-defined K-hop-restricted distance), which
makes the operator mirrorable by a relational oracle as K chained
min-aggregation stages — no convergence heuristics, no floats, no
nondeterminism.

Scale shape: each round is ONE shuffle — dist (node, dist — two BIGINT
columns, never wider) joins the edge set on the node key, unions the
previous frontier, and re-aggregates with map-side partial MIN. The
edge set is read once and reused; dist is localCheckpoint-ed per round
so round k costs a narrow join + groupBy instead of replaying k rounds
of lineage (same discipline as operators/dedup.py::
connected_components; swap to checkpoint() on a real cluster for
fault-tolerant lineage cuts). 100 TB of edges shards by the join key;
the frontier stays proportional to the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    a_col: str = "a",
    b_col: str = "b",
    w_col: str = "w",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Multi-source shortest paths: (node, dist) with dist = the exact
    minimum total weight over paths of <= `rounds` edges from ANY source
    node (the "distance to nearest depot" shape; pass one source row for
    classic SSSP). Nodes unreached within `rounds` hops are ABSENT.
    Undirected graphs (default) relax each edge both ways; weights must
    be non-negative integers (validated per partition, fail-loud).
    """
    if not 1 <= rounds <= 200:
        raise ValueError("rounds must be in [1, 200]")
    e = edges.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
        F.col(w_col).cast("long").alias("w"),
    )
    if directed is False:
        e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
    # fail-loud weight validation folded into the reused edge frame
    e = e.withColumn(
        "w",
        F.when(F.col("w") >= 0, F.col("w")).otherwise(
            F.raise_error(F.format_string("negative edge weight %s", F.col("w")))
        ),
    ).localCheckpoint()
    dist = (
        sources.select(F.col(node_col).cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    # r06: COMPOSE a few relaxation rounds per materialization — the wall
    # of a K-round loop at gate scale is K sequential driver-synchronous
    # jobs, not bytes. Relaxation rounds compose associatively (round k's
    # aggregated frontier is exactly the input of round k+1), so chaining
    # 3 join+min stages lazily inside one job yields the identical
    # 24-relaxation result with a third of the job launches. Plain EAGER
    # localCheckpoint per chunk (not dedup._mat's checkpoint+persist+count):
    # here each chunk's plan references the previous checkpoint once per
    # composed round, so the inherited size estimate grows LINEARLY in
    # digits per chunk (digits(d) += 3*digits(e)) — unlike connected
    # components, whose per-round SELF-joins SQUARE the estimate (the
    # BigInteger blowup _mat exists to break). The persist layer would
    # only add a second storage write per chunk here.
    done = 0
    while done < rounds:
        for _ in range(min(3, rounds - done)):
            # unique per-round aliases: composed rounds re-join the same
            # edge frame, so object-style column refs (dist[..], e[..])
            # would trip Spark's ambiguous-self-join detection
            dn, gn = f"_d{done}", f"_g{done}"
            relaxed = dist.alias(dn).join(
                e.alias(gn), F.col(f"{dn}.node") == F.col(f"{gn}.a")
            ).select(
                F.col(f"{gn}.b").alias("node"),
                (F.col(f"{dn}.dist") + F.col(f"{gn}.w")).alias("dist"),
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            done += 1
        dist = dist.localCheckpoint()
    return dist
