"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

from retail_data_pipeline_and_forecasting_system_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min member
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def test_components_match_union_find_on_random_graph(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(200), rng.randrange(200)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    want = _uf_components(edges)
    assert got == want


def test_chain_collapses_to_one_cluster(spark):
    # a chain 1-2, 2-3, 3-4: greedy drop-doc_b keeps {1}, but the
    # principled answer is one cluster with canonical 1
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert {r["cluster_id"] for r in rows.values()} == {1}
    assert rows[1]["is_canonical"] and not rows[4]["is_canonical"]


def test_real_neardup_pairs_cluster(spark):
    from retail_data_pipeline_and_forecasting_system_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = jaccard_pairs(docs, k=3, threshold=0.35)
    clusters = dup_clusters(pairs).collect()
    if not clusters:  # tiny SF may have no pairs
        return
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["is_canonical"] for m in members) == 1
        assert min(m["doc_id"] for m in members) == cid


def _brute_triangles(edges):
    """Count triangles per node by brute force over the edge set."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cnt = defaultdict(int)
    nodes = sorted(adj)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return dict(cnt)


def test_triangle_counts_match_bruteforce_on_random_graph(spark):
    from retail_data_pipeline_and_forecasting_system_spark.operators.graph import (
        triangle_counts,
    )

    rng = random.Random(11)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(200)
            )
            if a != b
        }
    )
    pairs = spark.createDataFrame(edges, ["pa", "pb"])
    got = {
        r["node"]: r["tri_cnt"] for r in triangle_counts(pairs).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_counts_empty_and_triangle_free(spark):
    from retail_data_pipeline_and_forecasting_system_spark.operators.graph import (
        triangle_counts,
    )

    # a path graph has zero triangles -> empty result
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["pa", "pb"])
    assert triangle_counts(pairs).count() == 0
