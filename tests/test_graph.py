"""shortest_paths: engine vs a synchronous K-hop Bellman-Ford scalar
reference on random graphs (directed + undirected + multi-source), a
hand-worked KAT pinning the hop-limited semantics, unreachable-absent,
negative-weight fail-loud, and rounds validation."""

import random

import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.operators import graph


def _ref(edges, sources, rounds, directed):
    adj = list(edges) + ([] if directed else [(b, a, w) for a, b, w in edges])
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nd = dict(dist)
        for a, b, w in adj:
            if a in dist and dist[a] + w < nd.get(b, 1 << 60):
                nd[b] = dist[a] + w
        dist = nd
    return dist


def _run(spark, edges, sources, rounds, directed):
    e = spark.createDataFrame(edges, "a long, b long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    out = graph.shortest_paths(e, s, rounds=rounds, directed=directed)
    return {r["node"]: r["dist"] for r in out.collect()}


def test_hand_kat_hop_limited(spark):
    edges = [(1, 2, 4), (2, 3, 1), (1, 3, 10), (3, 4, 2)]
    # exact SSSP (rounds >= hop diameter): 1->0, 2->4, 3->5, 4->7
    assert _run(spark, edges, [1], 5, True) == {1: 0, 2: 4, 3: 5, 4: 7}
    # one round: only 1-hop paths; node 4 unreached -> ABSENT
    assert _run(spark, edges, [1], 1, True) == {1: 0, 2: 4, 3: 10}
    # two rounds: 3 improves via 2, 4 appears via the 10-cost 3
    assert _run(spark, edges, [1], 2, True) == {1: 0, 2: 4, 3: 5, 4: 12}


def test_vs_reference_random_graphs(spark):
    rng = random.Random(59)
    for directed in (True, False):
        for trial in range(3):
            n = 40
            edges = [
                (rng.randrange(n), rng.randrange(n), rng.randrange(0, 9))
                for _ in range(120)
            ]
            edges = [(a, b, w) for a, b, w in edges if a != b]
            sources = rng.sample(range(n), 2 if trial else 1)
            for rounds in (1, 3, 8):
                got = _run(spark, edges, sources, rounds, directed)
                assert got == _ref(edges, sources, rounds, directed), (
                    directed, trial, rounds)


def test_undirected_relaxes_both_ways(spark):
    edges = [(1, 2, 3)]
    assert _run(spark, edges, [2], 2, False) == {1: 3, 2: 0}
    assert _run(spark, edges, [2], 2, True) == {2: 0}


def test_unreachable_absent_and_duplicate_sources(spark):
    edges = [(1, 2, 1), (3, 4, 1)]
    got = _run(spark, edges, [1, 1], 5, True)  # duplicate source rows
    assert got == {1: 0, 2: 1}


def test_negative_weight_fails_loudly(spark):
    e = spark.createDataFrame([(1, 2, -1)], "a long, b long, w long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(Exception, match="negative edge weight"):
        graph.shortest_paths(e, s, rounds=2).collect()


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        graph.shortest_paths(None, None, rounds=0)
    with pytest.raises(ValueError):
        graph.shortest_paths(None, None, rounds=201)
