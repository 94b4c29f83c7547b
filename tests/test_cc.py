"""Connected components vs a pure-Python union-find oracle on the F4
fixture graph and on random graphs (SURVEY.md §5.2-3c)."""

import random

import pytest
from pyspark.sql import functions as F

from kgpipe.fixtures import gen_sameas_graph
from kgpipe.operators.cc import canonical_map_for_nodes, connected_components


def _oracle(nodes, edges):
    parent = {u: u for u in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {u: find(u) for u in nodes}


def test_cc_fixture_graph(spark):
    edges, golden = gen_sameas_graph()
    edf = spark.createDataFrame(edges, ["src", "dst"])
    nodes = spark.createDataFrame([(u,) for u in golden], ["uri"])
    got = {
        r.uri: r.canon_id
        for r in canonical_map_for_nodes(nodes, edf, max_iter=25).collect()
    }
    assert got == golden


@pytest.mark.parametrize("n,m,seed", [(50, 30, 1), (200, 400, 2), (80, 79, 3)])
def test_cc_random_graphs(spark, n, m, seed):
    rng = random.Random(seed)
    nodes = [f"n{k:04d}" for k in range(n)]
    edges = [
        (nodes[rng.randrange(n)], nodes[rng.randrange(n)]) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    golden = _oracle(nodes, edges)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    ndf = spark.createDataFrame([(u,) for u in nodes], ["uri"])
    got = {r.uri: r.canon_id for r in canonical_map_for_nodes(ndf, edf).collect()}
    assert got == golden


def test_cc_path_graph_converges_fast(spark):
    """A 64-node path needs O(log n) star rounds, not O(n) — this is
    why large/small-star instead of naive label propagation."""
    nodes = [f"p{k:03d}" for k in range(64)]
    edges = list(zip(nodes, nodes[1:]))
    edf = spark.createDataFrame(edges, ["src", "dst"])
    # force the distributed star rounds (the adaptive small-graph
    # shortcut would otherwise solve this on the driver)
    cmap = connected_components(edf, max_iter=10, small_graph_max_edges=0)
    rows = cmap.collect()
    assert {r.canon_id for r in rows} == {"p000"}
    assert {r.uri for r in rows} == set(nodes)


def test_cc_empty_edges(spark):
    edf = spark.createDataFrame([], "src string, dst string")
    ndf = spark.createDataFrame([("a",), ("b",)], ["uri"])
    got = {r.uri: r.canon_id for r in canonical_map_for_nodes(ndf, edf).collect()}
    assert got == {"a": "a", "b": "b"}


def test_cc_small_graph_shortcut_equals_distributed(spark):
    """Adaptive strategy selection must be invisible in results: the
    driver union-find (small edge sets) and the distributed star
    rounds produce the identical canonical map, including multi-way
    merges, chains, and isolated roots."""
    import random

    rng = random.Random(99)
    nodes = [f"http://ex.org/n/{k:03d}" for k in range(200)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    fast = {
        (r.uri, r.canon_id)
        for r in connected_components(edf).collect()
    }
    dist = {
        (r.uri, r.canon_id)
        for r in connected_components(edf, small_graph_max_edges=0).collect()
    }
    assert fast == dist and fast
