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
