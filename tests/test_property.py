"""Property-based roundtrip tests (hypothesis): for ANY JSON tree, the
export pipeline (AIMD paginated scan under an adversarially small
payload budget) and the import pipeline (AIMD merge-PATCH writeback with
injected failures) are exact inverses — the reference's implicit
invariant (SURVEY.md §5.2), here machine-searched instead of hand-picked.

No SparkSession needed: the extractor/writeback cores are driver-side
components; their Spark materialization is covered by
tests/test_extractor.py and tests/test_sinks.py.
"""

import json

from hypothesis import given, settings, strategies as st

from firebase_realtime_database_backup_spark.sinks.writeback import (
    WritebackStats,
    _write_path,
)
from firebase_realtime_database_backup_spark.sources.firebase import (
    FakeFirebase,
    FirebaseExtractor,
)

# Firebase-legal keys: no / . $ # [ ] or control chars; nonempty.
_KEYS = st.text(
    alphabet="abcxyzα中-_0159",
    min_size=1,
    max_size=6,
)
_LEAVES = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(alphabet="ab çπ{}\"'\\\n", max_size=12),
    st.booleans(),
)
# Non-empty dicts only: Firebase does not store empty maps, so an empty
# dict is not representable and can't roundtrip by definition.
_TREES = st.recursive(
    _LEAVES,
    lambda children: st.dictionaries(_KEYS, children, min_size=1, max_size=4),
    max_leaves=25,
).filter(lambda t: isinstance(t, dict))


def _extracted_dict(tree: dict, **fake_kw) -> dict:
    """Run the extractor and reassemble its row stream into a dict."""
    ex = FirebaseExtractor(FakeFirebase(tree, **fake_kw), max_ipp=4)
    out: dict = {}
    for path, key, value_json, _depth in ex.iter_rows("/"):
        node = out
        for seg in path.strip("/").split("/"):
            if seg:
                node = node.setdefault(seg, {})
        node[key] = json.loads(value_json)
    return out


@settings(max_examples=60, deadline=None)
@given(tree=_TREES)
def test_extract_is_lossless(tree):
    assert _extracted_dict(tree) == tree


@settings(max_examples=40, deadline=None)
@given(tree=_TREES)
def test_extract_under_tiny_payload_budget(tree):
    """A 200-byte payload cap forces halvings and go-deeper descents on
    any nontrivial tree; the row stream must still be exact."""
    assert _extracted_dict(tree, max_payload_bytes=200) == tree


@settings(max_examples=40, deadline=None)
@given(tree=_TREES, data=st.data())
def test_writeback_roundtrip_with_failures(tree, data):
    """export → import into an empty store == identity, even when the
    store rejects batches over a random size (forcing AIMD halving and
    recursive split-on-failure)."""
    rows = _extracted_dict(tree)  # what export produced
    fail_over = data.draw(st.one_of(st.none(), st.integers(1, 3)))
    # byte cap must exceed the largest single-leaf PATCH: ensure_ascii
    # escaping inflates a 12-char unicode/backslash leaf to ~75 JSON
    # bytes plus an escaped 6-char key (~38) and braces — ~125 worst
    # case.  Below that, an unsplittable scalar correctly raises (the
    # reference would spin forever at ipp=1; we fail fast instead).
    fail_bytes = data.draw(st.one_of(st.none(), st.integers(150, 400)))
    target = FakeFirebase(
        {}, fail_updates_over=fail_over, fail_update_bytes=fail_bytes
    )
    stats = WritebackStats()
    _write_path(target, "/", rows, stats)
    assert target.tree == tree
    assert stats.keys_written >= len(rows)


def test_chunking_reconstructs_documents(spark):
    """Lossless-chunking invariant on the real corpus: re-joining each
    document's chunk_texts in chunk order must reproduce the original
    text exactly, and n_tokens must sum to the document's token count."""
    import pyspark.sql.functions as F

    from firebase_realtime_database_backup_spark.catalog import read_table
    from firebase_realtime_database_backup_spark.operators.text import (
        text_chunk_fixed,
    )

    sf = "/root/testdata/sf0.01"
    chunks = text_chunk_fixed(spark, sf)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_id")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt"),
            F.sum("n_tokens").alias("n_tokens_total"),
        )
    )
    docs = read_table(spark, sf, "documents").select(
        "doc_id",
        F.col("text"),
        F.size(F.split("text", " ")).alias("n_tokens_true"),
    )
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.filter(
        (F.col("rebuilt") != F.col("text"))
        | (F.col("n_tokens_total") != F.col("n_tokens_true"))
    )
    assert joined.count() == docs.count()
    assert bad.count() == 0, bad.limit(3).collect()


def test_sliding_distinct_interval_merge_boundaries(spark, tmp_path):
    """events_sliding_distinct's interval-merge rewrite must equal the
    brute-force contribute-to-each-visible-day count on a corpus built
    to hit every island boundary: activity gaps of exactly W-1 (merge),
    W (merge — still within visibility), and W+1 (split) days,
    single-day users, same-day duplicates, and users whose intervals
    abut the domain edges."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from firebase_realtime_database_backup_spark.operators.relational import (
        events_sliding_distinct,
    )

    W = 7
    base = dt.datetime(2024, 3, 1)
    users_days = {
        1: [0, 6],            # gap W-1 → one interval
        2: [0, 7],            # gap W   → islands split at day>prev+6,
                              # but visibility windows still overlap
        3: [0, 8],            # gap W+1 → disjoint visibility
        4: [0],               # single day
        5: [0, 0, 0],         # same-day duplicates
        6: [20, 21, 22],      # dense run at domain edge
        7: [3, 10, 17, 24],   # repeated exact-W gaps
    }
    rows = [
        (uid * 1000 + i, base + dt.timedelta(days=d, hours=1), uid, "click",
         1.0, "{}")
        for uid, days in users_days.items()
        for i, d in enumerate(days)
    ]
    d = str(tmp_path / "sliding_edge")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )

    got = {
        r.report_day: r.n_active_7d
        for r in events_sliding_distinct(spark, d).collect()
    }

    brute: dict = {}
    for uid, days in users_days.items():
        visible = set()
        for day in days:
            for o in range(W):
                visible.add(day + o)
        for v in visible:
            brute.setdefault(v, set()).add(uid)
    want = {
        (base + dt.timedelta(days=v)).date(): len(us)
        for v, us in brute.items()
    }
    assert got == want


def test_attribution_same_millisecond_is_not_attributed(spark, tmp_path):
    """events_attribution_linear defines 'strictly after' on the
    millisecond grain on BOTH engines: a purchase in the same ms as a
    click must not capture it, one 1 ms later must, and the 7-day
    window cut is inclusive at exactly +7d."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from firebase_realtime_database_backup_spark.operators.relational import (
        events_attribution_linear,
    )

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    ms = dt.timedelta(milliseconds=1)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: purchase in the SAME ms as the click → unattributed
        (10, t0, 1, "click"),
        (11, t0 + dt.timedelta(microseconds=400), 1, "purchase"),
        # user 2: purchase 1 ms later → attributed
        (20, t0, 2, "click"),
        (21, t0 + ms, 2, "purchase"),
        # user 3: purchase exactly +7d → inclusive boundary, attributed
        (30, t0, 3, "click"),
        (31, t0 + 7 * day, 3, "purchase"),
        # user 4: purchase beyond 7d → unattributed
        (40, t0, 4, "click"),
        (41, t0 + 7 * day + ms, 4, "purchase"),
        # user 5: two clicks share one purchase → credit 0.5 each
        (50, t0, 5, "click"),
        (51, t0 + ms, 5, "click"),
        (52, t0 + 2 * ms, 5, "purchase"),
    ]
    d = str(tmp_path / "attr_edge")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = {
        r.click_id: (r.purchase_id, r.credit)
        for r in events_attribution_linear(spark, d).collect()
    }
    assert got == {
        20: (21, 1.0),
        30: (31, 1.0),
        50: (52, 0.5),
        51: (52, 0.5),
    }


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=50
    ),
    buckets=st.sampled_from([100, 10000]),
)
@settings(max_examples=60, deadline=None)
def test_knuth_hash_overflow_safe_and_backward_compatible(ids, buckets):
    """The shared sampling hash (functions/hashing.py) must (a) equal
    the historical naive form bit-for-bit for every id below 2^31 —
    that equivalence is what made swapping it into six driver-passed
    queries a no-op — and (b) stay within BIGINT for ANY 64-bit id,
    where the naive form overflows (the silent Spark-wraps /
    DuckDB-raises divergence this helper exists to kill).  Verified
    against DuckDB evaluating the helper's own SQL fragment, so the
    Python model, the Spark expression, and the oracle fragment are
    pinned to one definition."""
    import duckdb

    from firebase_realtime_database_backup_spark.functions.hashing import (
        KNUTH,
        M31,
        knuth_bucket_sql,
    )

    con = duckdb.connect()
    for i in ids:
        safe = ((i % M31) * KNUTH) % M31 % buckets
        # (a) backward compatibility below 2^31
        if i < M31:
            assert safe == (i * KNUTH) % M31 % buckets
        # (b) the SQL fragment computes the same value WITHOUT overflow
        got = con.execute(
            f"SELECT {knuth_bucket_sql(str(i), buckets)}"
        ).fetchone()[0]
        assert got == safe, (i, got, safe)
        # intermediate bound: the pre-reduced multiplicand never exceeds
        # BIGINT (the naive form does for i >= ~3.5e9)
        assert (i % M31) * KNUTH < 2**63


def test_string_bucket_cross_engine_parity(spark):
    """string_bucket (the name-grain sampling predicate behind
    dedup_editdist_sampled) must be bit-identical between Spark and
    DuckDB on adversarial strings: empty, 1-char, long, shared-prefix
    serial ids, non-ASCII, embedded newline."""
    import duckdb

    from pyspark.sql import functions as F

    from firebase_realtime_database_backup_spark.functions.hashing import (
        string_bucket,
        string_bucket_sql,
    )

    names = [
        "",
        "a",
        "Customer#000000001",
        "Customer#000000002",
        "Customer#001499999",
        "Zürich straße",
        "x" * 40,
        "name\nwith newline",
        "  trailing  ",
        # Astral-plane (>U+FFFF) tails: Spark's UTF8String and DuckDB
        # both index by CODE POINT, but that equivalence was unverified
        # until ADVICE r7 asked for it — a divergence here would make
        # the sampled-editdist oracle and Spark plan silently sample
        # DIFFERENT name sets on emoji-bearing corpora.
        "Customer \U0001F600",
        "\U0001F680\U0001F600",
        "mixed \U0001D11E clef G",
        "\U0001F600" * 9,
    ]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = {
        r.s: r.b
        for r in df.select(
            "s", string_bucket(F.col("s"), 4).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for n in names:
        ob = con.execute(
            f"SELECT {string_bucket_sql('s', 4)} FROM (SELECT ? AS s)", [n]
        ).fetchone()[0]
        assert got[n] == ob, (n, got[n], ob)
    # and the sample is non-degenerate on a serial corpus
    serial = spark.createDataFrame(
        [(f"Customer#{i:09d}",) for i in range(4096)], "s string"
    )
    frac = (
        serial.filter(string_bucket(F.col("s"), 4) == 0).count() / 4096
    )
    assert 0.15 < frac < 0.35, frac


@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=60), min_size=1, max_size=24),
        min_size=2,
        max_size=12,
    ),
    freqs=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=1, max_value=9),
    ),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lemma_is_lossless(sets, freqs):
    """The pruning theorem dedup_jaccard_prefix rests on, pinned in
    pure Python against random set families and an ARBITRARY (even
    adversarial) token-frequency table: for ANY total order of tokens
    by (freq, token), every pair with J(A,B) >= t shares at least one
    token inside both docs' (|d| - ceil(t*|d|) + 1)-prefixes AND
    passes the integer size filter t*max <= min.  If this ever fails,
    the operator's candidate join has lost a true pair — the property
    the sf oracles can only spot-check is checked here across the
    space."""
    t_num, t_den = 3, 5  # PREFIX_T_NUM / PREFIX_T_DEN

    def prefix(s):
        ordered = sorted(s, key=lambda x: (freqs.get(x, 0), x))
        p = len(s) - (t_num * len(s) + t_den - 1) // t_den + 1
        return set(ordered[:p])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            if inter == 0:
                continue
            jac = inter / (len(a) + len(b) - inter)
            if jac * t_den < t_num:  # J < t exactly (integer cross-mult)
                continue
            # size filter must admit the pair
            assert t_num * max(len(a), len(b)) <= t_den * min(
                len(a), len(b)
            ), (len(a), len(b), jac)
            # and the prefixes must collide
            assert prefix(a) & prefix(b), (sorted(a), sorted(b), jac, freqs)


@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=60), min_size=1, max_size=24),
        min_size=2,
        max_size=12,
    ),
    freqs=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=1, max_value=9),
    ),
)
@settings(max_examples=300, deadline=None)
def test_containment_prefix_lemma_is_lossless(sets, freqs):
    """dedup_containment_prefix's asymmetric pruning lemma: for any
    pair with C(A,B) = |A∩B|/min >= t, the SMALLER set's
    (|B| - ceil(t*|B|) + 1)-prefix under any (freq, token) order
    intersects the LARGER set's FULL token set (for equal sizes,
    either side's probe works — the operator probes both)."""
    t_num, t_den = 4, 5  # CONT_T_NUM / CONT_T_DEN

    def prefix(s):
        ordered = sorted(s, key=lambda x: (freqs.get(x, 0), x))
        p = len(s) - (t_num * len(s) + t_den - 1) // t_den + 1
        return set(ordered[:p])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if len(a) < len(b):
                a, b = b, a  # b is the (or a) smaller set
            inter = len(a & b)
            if inter * t_den < t_num * len(b):  # C < t, integer-exact
                continue
            assert prefix(b) & a, (sorted(a), sorted(b), freqs)


def test_weighted_reservoir_prefers_heavy_docs(spark, tmp_path):
    """sample_weighted_reservoir's A-ES property pinned on an extreme
    two-class corpus: 900 docs of weight 10 vs 100 docs of weight
    1000 in one source (heavy class holds ~92% of the total weight)
    — the k=50 sample must be dominated by heavy docs, and any
    rank-prefix must be the corresponding smaller sample (the
    exponential-key permutation property)."""
    import __spark_entry__ as e

    rows = [
        (i, "x", "en", "s0", 10 if i < 900 else 1000) for i in range(1000)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    corpus = str(tmp_path / "wres")
    df.coalesce(1).write.parquet(corpus + "/documents.parquet")
    samp = (
        e.queries()["sample_weighted_reservoir"](spark, corpus)
        .orderBy("sample_rank")
        .collect()
    )
    assert len(samp) == 50
    heavy = sum(1 for r in samp if r.weight == 1000.0)
    assert heavy >= 35, heavy
    # permutation-prefix property: rank <= 10 IS the k=10 sample
    prefix = [r.doc_id for r in samp if r.sample_rank <= 10]
    assert len(prefix) == 10 and prefix == [r.doc_id for r in samp[:10]]
