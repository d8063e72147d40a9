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


def test_pagerank_matches_exact_integer_replay(spark):
    """graph_pagerank is fixed-point (bigint rank in 1e-12 units, exact
    integer scatter/damping), so a pure-Python arbitrary-precision
    replay of the same loop must match rank_fp EXACTLY — no float
    tolerance anywhere.  Also pins the float display column to the
    micro-rank derivation and checks sum(rank_fp) sits within the
    truncation envelope of n*SCALE (each division discards < deg + 100
    rank-units per node per iteration)."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        events_item_cooccurrence,
        graph_pagerank,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [
        (r.item_a, r.item_b)
        for r in events_item_cooccurrence(spark, sf).collect()
    ]
    assert pairs, "co-occurrence graph is empty at sf0.01"
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    rank = {v: PAGERANK_SCALE for v in nbrs}
    for _ in range(PAGERANK_ITERS):
        in_sum = {v: 0 for v in nbrs}
        for v, ns in nbrs.items():
            contrib = rank[v] // len(ns)
            for u in ns:
                in_sum[u] += contrib
        rank = {
            v: (15 * PAGERANK_SCALE + 85 * in_sum[v]) // 100 for v in nbrs
        }
    rows = graph_pagerank(spark, sf).collect()
    got = {r.item: r.rank_fp for r in rows}
    assert got == rank
    for r in rows:
        assert r.rank == (r.rank_fp // 10**6) / 1e6
    n = len(nbrs)
    total = sum(got.values())
    max_deg_loss = sum(len(ns) + 100 for ns in nbrs.values())
    assert 0 <= n * PAGERANK_SCALE - total <= PAGERANK_ITERS * max_deg_loss


import pytest


def test_pagerank_regimes_agree(spark, monkeypatch):
    """Round 9's single-task kernel and the canonical distributed loop
    must produce bit-identical rows: force the distributed branch by
    shrinking the edge cap to 0 and compare against the default (fast)
    path on the same corpus."""
    from firebase_realtime_database_backup_spark.operators import relational

    sf = "/root/testdata/sf0.01"
    fast = relational.graph_pagerank(spark, sf).collect()
    monkeypatch.setattr(relational, "PAGERANK_LOCAL_EDGE_CAP", 0)
    dist = relational.graph_pagerank(spark, sf).collect()
    assert fast == dist
    assert len(fast) > 0


@pytest.mark.parametrize("form", ["fixed", "scaled"])
def test_semantic_kmeans_matches_numpy_replay(spark, form):
    """dedup_semantic_kmeans (+_scaled) is rows-only (parallel float
    means aren't bit-portable), so its full algorithm is replayed here
    in numpy float64: same deterministic init (K smallest vec_ids; the
    scaled form derives K from N), same fixed Lloyd's iterations, same
    lower-cid / lower-vec_id tie-breaks.  Assignments must agree
    wherever the best-vs-second-best margin exceeds float tolerance (in
    practice: everywhere), and dup flags must agree wherever the cosine
    clears the threshold by more than float tolerance."""
    import math

    import numpy as np

    from firebase_realtime_database_backup_spark.operators.dedup import (
        SEMDEDUP_CELL_TARGET,
        SEMDEDUP_ITERS,
        SEMDEDUP_K,
        SEMDEDUP_TAU,
        dedup_semantic_kmeans,
        dedup_semantic_kmeans_scaled,
    )

    sf = "/root/testdata/sf0.01"
    fn = dedup_semantic_kmeans if form == "fixed" else dedup_semantic_kmeans_scaled
    got = {r.vec_id: (r.cluster, r.is_dup) for r in fn(spark, sf).collect()}

    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
            f"read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
        )
        .fetchall()
    )
    ids = [r[0] for r in rows]
    E = np.array([r[1] for r in rows], dtype=np.float64)
    assert len(got) == len(ids)

    K = (
        SEMDEDUP_K
        if form == "fixed"
        else max(SEMDEDUP_K, math.ceil(len(ids) / SEMDEDUP_CELL_TARGET))
    )
    cid_ids = ids[:K]                     # K smallest vec_ids (sorted)
    C = E[:K].copy()
    for _ in range(SEMDEDUP_ITERS):
        d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)        # argmin ties → lowest index ==
        margins = np.partition(d2, 1, axis=1)  # lowest cid (cids sorted)
        assert (margins[:, 1] - margins[:, 0] > 1e-9).all(), (
            "degenerate tie in replay; margin guard can't attest"
        )
        C = np.array(
            [
                E[assign == k].mean(axis=0) if (assign == k).any() else C[k]
                for k in range(K)
            ]
        )
    d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    margins = np.partition(d2, 1, axis=1)
    assert (margins[:, 1] - margins[:, 0] > 1e-9).all()

    for i, v in enumerate(ids):
        assert got[v][0] == cid_ids[assign[i]], f"cluster mismatch for {v}"

    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ En.T
    for j, v in enumerate(ids):
        dup = False
        for i in range(j):
            if assign[i] == assign[j] and cos[i, j] >= SEMDEDUP_TAU + 1e-9:
                dup = True
        boundary = any(
            assign[i] == assign[j] and abs(cos[i, j] - SEMDEDUP_TAU) <= 1e-9
            for i in range(j)
        )
        if not boundary:
            assert got[v][1] == dup, f"dup flag mismatch for {v}"


def test_semantic_kmeans_hier_matches_numpy_replay(spark):
    """The hierarchical (two-level) SemDeDup twin is rows-only like the
    other two forms; replay BOTH levels in numpy float64: coarse
    Lloyd's with K1 = max(4, ceil(sqrt(K))) (margin-guarded — the
    engine computes coarse means via distributed avg), then per coarse
    cell the exact local fine k-means the executor kernel runs
    (deterministic init = K2 smallest vec_ids in the cell, same
    iteration count and tie-breaks), fine cluster ids
    coarse*2^20+fine_idx, and the within-fine-cell lower-id dup rule."""
    import math

    import numpy as np

    from firebase_realtime_database_backup_spark.operators.dedup import (
        SEMDEDUP_CELL_TARGET,
        SEMDEDUP_COARSE_MIN,
        SEMDEDUP_FINE_STRIDE,
        SEMDEDUP_ITERS,
        SEMDEDUP_K,
        SEMDEDUP_TAU,
        dedup_semantic_kmeans_hier,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        r.vec_id: (r.cluster, r.is_dup)
        for r in dedup_semantic_kmeans_hier(spark, sf).collect()
    }

    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
            f"read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
        )
        .fetchall()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.array([r[1] for r in rows], dtype=np.float64)
    assert len(got) == len(ids)

    k_fine = max(SEMDEDUP_K, math.ceil(len(ids) / SEMDEDUP_CELL_TARGET))
    k1 = max(SEMDEDUP_COARSE_MIN, math.ceil(math.sqrt(k_fine)))
    cid_ids = ids[:k1]
    C = E[:k1].copy()
    for _ in range(SEMDEDUP_ITERS):
        d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        margins = np.partition(d2, 1, axis=1)
        assert (margins[:, 1] - margins[:, 0] > 1e-9).all()
        C = np.array(
            [
                E[assign == k].mean(axis=0) if (assign == k).any() else C[k]
                for k in range(k1)
            ]
        )
    d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    coarse = d2.argmin(axis=1)
    margins = np.partition(d2, 1, axis=1)
    assert (margins[:, 1] - margins[:, 0] > 1e-9).all()

    for c in range(k1):
        mask = coarse == c
        if not mask.any():
            continue
        cell_ids = ids[mask]  # already sorted ascending (ids sorted)
        X = E[mask]
        m = len(cell_ids)
        k2 = max(1, math.ceil(m / SEMDEDUP_CELL_TARGET))
        Cf = X[:k2].copy()
        for _ in range(SEMDEDUP_ITERS):
            fd2 = ((X[:, None, :] - Cf[None, :, :]) ** 2).sum(axis=2)
            a = fd2.argmin(axis=1)
            if k2 > 1:
                fm = np.partition(fd2, 1, axis=1)
                assert (fm[:, 1] - fm[:, 0] > 1e-9).all()
            Cf = np.array(
                [
                    X[a == j].mean(axis=0) if (a == j).any() else Cf[j]
                    for j in range(k2)
                ]
            )
        fd2 = ((X[:, None, :] - Cf[None, :, :]) ** 2).sum(axis=2)
        a = fd2.argmin(axis=1)
        if k2 > 1:
            fm = np.partition(fd2, 1, axis=1)
            assert (fm[:, 1] - fm[:, 0] > 1e-9).all()

        expect_cluster = int(cid_ids[c]) * SEMDEDUP_FINE_STRIDE + a
        for i, v in enumerate(cell_ids):
            assert got[v][0] == expect_cluster[i], f"cluster mismatch for {v}"

        En = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = En @ En.T
        for jj in range(m):
            dup, boundary = False, False
            for ii in range(jj):
                if a[ii] != a[jj]:
                    continue
                if cos[ii, jj] >= SEMDEDUP_TAU + 1e-9:
                    dup = True
                if abs(cos[ii, jj] - SEMDEDUP_TAU) <= 1e-9:
                    boundary = True
            if not boundary:
                assert got[cell_ids[jj]][1] == dup, (
                    f"dup flag mismatch for {cell_ids[jj]}"
                )


def test_semantic_kmeans_empty_cell_and_empty_corpus(spark, tmp_path):
    """Regression for two degenerate inputs the twins must agree on:

    1. A k-means cell that EMPTIES mid-iteration (two identical vectors
       among the K smallest ids tie every point to the lower cid): the
       declarative form must keep the stale centroid — not silently
       shrink K — exactly like the scaled twin and the numpy replay.
       Integer-coordinate vectors make every float path exact, so the
       two forms must agree row-for-row.
    2. An empty embeddings table: both forms return an empty result
       instead of crashing driver-side."""
    import numpy as np
    import pandas as pd

    from firebase_realtime_database_backup_spark.operators.dedup import (
        SEMDEDUP_K,
        dedup_semantic_kmeans,
        dedup_semantic_kmeans_scaled,
    )

    import os

    d = str(tmp_path / "emptycell")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(7)
    vecs = [
        rng.randint(-8, 9, size=16).astype(float)
        for _ in range(SEMDEDUP_K + 12)
    ]
    vecs[1] = vecs[0].copy()  # tie among the K smallest ids → cell 1 empties
    pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": [0] * len(vecs),
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"))

    fixed = {
        r.vec_id: (r.cluster, r.is_dup)
        for r in dedup_semantic_kmeans(spark, d).collect()
    }
    scaled = {
        r.vec_id: (r.cluster, r.is_dup)
        for r in dedup_semantic_kmeans_scaled(spark, d).collect()
    }
    assert fixed == scaled
    assert len(fixed) == len(vecs)

    e = str(tmp_path / "empty")
    os.makedirs(e, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        os.path.join(e, "embeddings.parquet"),
    )
    assert dedup_semantic_kmeans_scaled(spark, e).count() == 0
    assert dedup_semantic_kmeans(spark, e).count() == 0
