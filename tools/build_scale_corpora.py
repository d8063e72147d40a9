#!/usr/bin/env python
"""Rebuild the .scale20 / .scale100 / .scale100docs measurement corpora.

The BASELINE.md scale tables (20x / 100x ratios per operator) are measured
against replica-built corpora derived from /root/testdata/sf0.1.  Those
directories are disposable (deleted between rounds); this script is the
reproducible recipe:

- documents: R replicas, doc_id shifted by 10^4 per replica (doc_id % 10
  preserved, so every hash-sampling op keeps its rates); replica r > 0
  suffixes every token with `_r` — DISJOINT vocabulary per replica, so
  near-dup relations don't explode quadratically across replicas while
  within-replica dup structure is preserved exactly; n_chars recomputed.
- embeddings: R replicas, vec_id shifted by 10^4; replica r in 1..63
  rolls the vector by r dimensions and replicas >= 64 REVERSE then roll
  by r % 64 (both transforms norm-preserving, so unit-norm invariants
  and cosine structure survive) — 128 distinct transforms, so no two
  replicas are bit-exact copies (the original roll-only recipe made
  replica 64+k a duplicate of replica k, injecting 36 exact-dup replica
  pairs into the 100x corpus; fixed round 4, see BASELINE.md note).
  Replica 0 is untouched, which keeps the fixed ANN query set
  (vec_id < 5) bit-identical at every scale — recall numbers stay
  comparable across corpus sizes.
- events: R replicas, event_id shifted by 10^8 and user_id by 10^6
  (constant per-user event density — sessionize/funnel state per key
  stays fixed while key count scales).
- lineitem / orders: facts scale (orderkeys shifted by 10^8), dimensions
  stay 1x — the star-schema scaling a real warehouse sees.

Single-file outputs on purpose (DuckDB COPY): this is also the worst-case
input layout — one input split — which is what exposed the need for
catalog.spread() on CPU-bound map-only operators.  Build time ~10 s for
20x, ~40 s for 100x on this box.

Usage:
  python tools/build_scale_corpora.py --replicas 20  --out .scale20
  python tools/build_scale_corpora.py --replicas 100 --out .scale100
  python tools/build_scale_corpora.py --replicas 100 --out .scale100docs \
      --tables documents,embeddings
"""

from __future__ import annotations

import argparse
import os
import time

DOC_SQL = """
COPY (
  SELECT CAST(doc_id + 10000 * r AS BIGINT) AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                                    t -> t || '_' || r), ' ')
         END AS text,
         lang, source,
         CAST(CASE WHEN r = 0 THEN n_chars
              ELSE LENGTH(array_to_string(
                     list_transform(string_split(text, ' '),
                                    t -> t || '_' || r), ' '))
         END AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet'),
       (SELECT UNNEST(RANGE(0, {R})) AS r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""

EMB_SQL = """
COPY (
  SELECT CAST(vec_id + 10000 * r AS BIGINT) AS vec_id,
         CASE WHEN r = 0 THEN embedding
              WHEN r < 64 THEN
                CAST(list_concat(embedding[(r % 64) + 1:64],
                                 embedding[1:(r % 64)]) AS FLOAT[])
              ELSE
                CAST(list_concat(list_reverse(embedding)[(r % 64) + 1:64],
                                 list_reverse(embedding)[1:(r % 64)])
                     AS FLOAT[])
         END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'),
       (SELECT UNNEST(RANGE(0, {R})) AS r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""

EVENTS_SQL = """
COPY (
  SELECT CAST(event_id + 100000000 * r AS BIGINT) AS event_id, ts,
         CAST(user_id + 1000000 * r AS BIGINT) AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet'),
       (SELECT UNNEST(RANGE(0, {R})) AS r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
"""

LINEITEM_SQL = """
COPY (
  SELECT * REPLACE (CAST(l_orderkey + 100000000 * r AS BIGINT) AS l_orderkey)
  FROM read_parquet('{src}/lineitem.parquet'),
       (SELECT UNNEST(RANGE(0, {R})) AS r)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
"""

ORDERS_SQL = """
COPY (
  SELECT * REPLACE (CAST(o_orderkey + 100000000 * r AS BIGINT) AS o_orderkey)
  FROM read_parquet('{src}/orders.parquet'),
       (SELECT UNNEST(RANGE(0, {R})) AS r)
) TO '{out}/orders.parquet' (FORMAT PARQUET)
"""

TABLE_SQL = {
    "documents": DOC_SQL,
    "embeddings": EMB_SQL,
    "events": EVENTS_SQL,
    "lineitem": LINEITEM_SQL,
    "orders": ORDERS_SQL,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, required=True)
    ap.add_argument(
        "--tables",
        default="documents,embeddings,events,lineitem,orders",
        help="comma list; dims (nation/region/...) never scale",
    )
    args = ap.parse_args()

    import duckdb

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for table in args.tables.split(","):
        table = table.strip()
        sql = TABLE_SQL[table].format(src=args.src, out=args.out, R=args.replicas)
        t0 = time.time()
        con.execute(sql)
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows in {time.time() - t0:.1f}s")
    # Dimensions stay 1x — copied verbatim so the scale dir is a
    # COMPLETE corpus (register_views and the SQL-entry queries need
    # every catalog table present).
    for dim in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(args.out, f"{dim}.parquet")
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{args.src}/{dim}.parquet'))"
                f" TO '{dst}' (FORMAT PARQUET)"
            )
            print(f"{dim}: copied 1x")


if __name__ == "__main__":
    main()
