"""dedup_clusters (iterative min-label propagation) must match a
brute-force union-find over the same near-dup pair set."""


def test_clusters_match_union_find(spark):
    from firebase_realtime_database_backup_spark.operators.dedup import (
        dedup_clusters,
        dedup_minhash_lsh,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf).collect()]
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {x: find(x) for x in parent}
    # canonicalize: representative = min of component
    comp: dict = {}
    for x, r in expected.items():
        comp.setdefault(find(r), []).append(x)
    want = {x: min(members) for root, members in comp.items() for x in members}
    assert got == want
    assert len(got) > 0


def test_pagerank_matches_numpy_replay(spark):
    """graph_pagerank must equal a numpy replay of the same fixed-point
    loop on the collected edge list, and preserve sum(rank) == n."""
    import numpy as np

    from firebase_realtime_database_backup_spark.operators.relational import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        events_item_cooccurrence,
        graph_pagerank,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [
        (r.item_a, r.item_b)
        for r in events_item_cooccurrence(spark, sf).collect()
    ]
    assert pairs, "co-occurrence graph is empty at sf0.01"
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = 1.0
        adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    rank = np.ones(n)
    for _ in range(PAGERANK_ITERS):
        rank = (1 - PAGERANK_DAMPING) + PAGERANK_DAMPING * (adj.T @ (rank / deg))
    got = {r.item: r.rank for r in graph_pagerank(spark, sf).collect()}
    assert set(got) == set(nodes)
    assert abs(sum(got.values()) - n) < 1e-3
    for node in nodes:
        assert abs(got[node] - rank[idx[node]]) < 1e-5, node
