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
