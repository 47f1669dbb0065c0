"""connected_components (operators.graph) vs a driver-side union-find."""

from __future__ import annotations

import random

from gee_datapipeline_spark.operators.graph import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node of each component
    comp = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_components(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }


def test_components_two_node_and_chain(spark):
    """The small-star self-link subtlety: a lone pair must survive, and
    a path graph (worst case for label propagation) must converge."""
    pairs = [(7, 3)] + [(i, i + 1) for i in range(10, 20)]
    got = _spark_components(spark, pairs)
    assert got[7] == 3 and got[3] == 3
    assert all(got[i] == 10 for i in range(10, 21))


def test_components_random_vs_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _union_find(pairs)
    got = _spark_components(spark, pairs)
    assert got == expect


def test_components_duplicate_and_reversed_edges(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (5, 4)]
    got = _spark_components(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
