"""The numpy-vectorized fake decoder must equal the reference scalar
fake byte-for-byte (same cyclic tiling, same mean)."""

import pandas as pd

from firebase_realtime_database_backup_spark.operators.multimodal import (
    _fake_decode_batch,
    fake_decode_fixed_raster,
)


def test_vectorized_decode_matches_scalar_fake():
    payloads = [b"", b"a", b"hello world", bytes(range(200)), b"\x00\xff" * 40]
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    out = pd.concat(_fake_decode_batch(iter([pdf])))
    for i, b in enumerate(payloads):
        want = fake_decode_fixed_raster(b)
        got = list(out.loc[out.doc_id == i, "raster"].iloc[0])
        assert got == want, (i, b)
        assert out.loc[out.doc_id == i, "raster_mean_x100"].iloc[0] == int(
            sum(want) * 100 // len(want)
        )


def test_phash_cluster_matches_union_find(spark):
    """multimodal_phash_cluster must equal a brute-force union-find
    over the attested multimodal_phash_hamming pair list, and its
    keep flag must mark exactly the cluster-min member."""
    from firebase_realtime_database_backup_spark.operators.multimodal import (
        multimodal_phash_cluster,
        multimodal_phash_hamming,
    )

    sf = "/root/testdata/sf0.01"
    pairs = [
        (r.doc_a, r.doc_b)
        for r in multimodal_phash_hamming(spark, sf).collect()
    ]
    assert pairs, "no hamming pairs at sf0.01"
    rows = multimodal_phash_cluster(spark, sf).collect()
    got = {r.doc_id: r.cluster_id for r in rows}

    parent: dict = {}

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
    comp: dict = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comp.values() for x in members}
    assert got == want
    sizes = {min(m): len(m) for m in comp.values()}
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.keep == (r.doc_id == r.cluster_id)
