"""Adversarial edge-corpus gate: every registered query must survive —
and every oracle-backed query must still hash-match DuckDB — on a
corpus of degenerate rows the standard testdata never exercises:

- empty / whitespace-only / single-token / all-repeated-token documents
- non-ASCII text (the multimodal ASCII boundary must fold it, not break)
- events with NULL value, NULL props, and non-numeric JSON item ids
- an all-zero embedding vector (cosine denominators go to zero)

This is the gate that caught (round 2): ANSI DIVIDE_BY_ZERO in every
cosine operator on zero-norm vectors, ANSI CAST failures on dirty JSON
ids, and empty-payload documents silently dropped or nulled by the
multimodal oracles' lateral joins.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from firebase_realtime_database_backup_spark import verify


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("edge_corpus"))
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(f"COPY ({sql}) TO '{os.path.join(d, name)}' (FORMAT PARQUET)")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        copy(f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 40",
             f"{t}.parquet")

    copy(
        f"""
        (SELECT * FROM read_parquet('{src}/documents.parquet') LIMIT 40)
        UNION ALL
        SELECT * FROM (VALUES
          (9001, '', 'en', 'src0', 0),
          (9002, 'x', 'en', 'src1', 1),
          (9003, '   ', 'de', 'src2', 3),
          (9004, 'a a a a a a a a a a a a', 'es', 'src3', 23),
          (9005, 'café 中文 emoji', 'zh', 'src4', 13)
        ) t(doc_id, text, lang, source, n_chars)
        UNION ALL
        -- pack_sequences boundary: a doc with EXACTLY PACK_CAPACITY
        -- (256) tokens, so the next doc in its source starts exactly on
        -- a sequence boundary, and one with 257 straddling it
        SELECT 9006, repeat('w ', 255) || 'w', 'en', 'src7', 511
        UNION ALL
        SELECT 9007, repeat('w ', 256) || 'w', 'en', 'src7', 513
        UNION ALL
        SELECT 9008, 'tail after boundary', 'en', 'src7', 19
        UNION ALL
        -- inverted-index postings cap with non-ASCII terms: 'naïve'
        -- appears in 17 docs (> the 16-posting cap) and 'm€ta' in 6
        -- (> the df_count >= 5 floor), so the cap + ordering path runs
        -- on multi-byte terms
        SELECT 9100 + r, CASE WHEN r < 6 THEN 'naïve m€ta filler' || r
                              ELSE 'naïve filler' || r END,
               'fr', 'src8', 20
        FROM range(17) t(r)
        """,
        "documents.parquet",
    )
    copy(
        f"""
        (SELECT * FROM read_parquet('{src}/events.parquet') LIMIT 40)
        UNION ALL
        SELECT * FROM (VALUES
          (900001, TIMESTAMP '2024-06-01 00:00:00', 7777, 'click',
           CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)),
          (900002, TIMESTAMP '2024-06-01 00:00:01', 7777, 'view', 0.0, '{{}}'),
          (900003, TIMESTAMP '2024-06-01 00:00:02', 7778, 'purchase', -1.5,
           '{{"k": "notanum"}}')
        ) t(event_id, ts, user_id, event_type, value, props)
        """,
        "events.parquet",
    )
    copy(
        f"""
        (SELECT * FROM read_parquet('{src}/embeddings.parquet') LIMIT 40)
        UNION ALL
        SELECT 9001,
               CAST(list_transform(range(64), x -> CAST(0.0 AS FLOAT))
                    AS FLOAT[]),
               0
        """,
        "embeddings.parquet",
    )
    con.close()
    return d


def test_all_queries_survive_edge_corpus(spark, edge_dir):
    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    con = verify.duckdb_connection(edge_dir)
    failures = []
    for name, fn in queries.items():
        try:
            if name in oracles:
                r = verify.compare_query(
                    spark, con, name, fn, oracles[name], edge_dir
                )
                if not r.ok:
                    failures.append((name, r.details[:1]))
            else:
                fn(spark, edge_dir).count()  # rows-only: must execute
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures.append((name, str(exc).splitlines()[:1]))
    assert not failures, failures
