"""Property-based checks for the round-5 exact aggregates: hypothesis
generates adversarial small inputs (negative/huge ids, ties, constant
groups, single rows) and the Spark operators must match brute-force
Python references bit-for-bit (or to the operator's documented
rounding).  The oracle gate proves Spark == DuckDB on the fixed test
corpora; these prove the SHARED semantics are the intended ones on
inputs neither corpus contains.

Example counts are deliberately small: each example is a full
parquet-write + Spark-job round trip.
"""

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _write_lineitem(spark, tmpdir, rows, schema):
    d = os.path.join(tmpdir, "corpus")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    return d


_PROP_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_00),  # cents
            st.integers(min_value=1, max_value=50),  # integer weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_matches_bruteforce(spark, tmp_path_factory, rows):
    from firebase_realtime_database_backup_spark.operators.relational import (
        agg_weighted_median,
    )

    d = _write_lineitem(
        spark,
        str(tmp_path_factory.mktemp("wm")),
        [(c / 100.0, float(w)) for c, w in rows],
        "l_extendedprice double, l_quantity double",
    )
    got = agg_weighted_median(spark, d).collect()[0]
    # brute force: smallest value whose cumulative weight reaches half
    agg: dict = {}
    for c, w in rows:
        agg[c] = agg.get(c, 0) + w
    total = sum(agg.values())
    cum = 0
    for c in sorted(agg):
        cum += agg[c]
        if cum * 2 >= total:
            want = c
            break
    assert got.total_weight == total
    assert got.wmedian_cents == want, (rows, got)


@_PROP_SETTINGS
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=40,
    )
)
def test_bitmap_distinct_matches_set(spark, tmp_path_factory, ids):
    """Exact distinct via 32-bit word bitmaps — incl. negative ids and
    ids far past 2^53 (the double-division cliff the floor-div word
    rule exists to avoid)."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        agg_bitmap_distinct,
    )

    d = os.path.join(str(tmp_path_factory.mktemp("bm")), "corpus")
    spark.createDataFrame(
        [("N", i) for i in ids], "l_returnflag string, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    got = agg_bitmap_distinct(spark, d).collect()[0]
    assert got.n_distinct_supp == len(set(ids)), ids
    assert got.n_words == len({i // 32 for i in ids})


@_PROP_SETTINGS
@given(
    st.lists(
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=30,
    )
)
def test_skew_kurtosis_matches_reference(spark, tmp_path_factory, qs):
    """DECIMAL-moment skewness/kurtosis vs a float reference — incl.
    constant groups, where the zero-variance guard must yield NULL."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        agg_skew_kurtosis_exact,
    )

    d = _write_lineitem(
        spark,
        str(tmp_path_factory.mktemp("sk")),
        [(float(q), "N") for q in qs],
        "l_quantity double, l_returnflag string",
    )
    got = agg_skew_kurtosis_exact(spark, d).collect()[0]
    n = len(qs)
    mean = sum(qs) / n
    m2 = sum((q - mean) ** 2 for q in qs) / n
    assert got.n_samples == n
    assert abs(got.mean_qty - round(mean, 6)) < 1e-9
    if m2 == 0:
        assert got.skewness is None and got.kurtosis_excess is None
    else:
        m3 = sum((q - mean) ** 3 for q in qs) / n
        m4 = sum((q - mean) ** 4 for q in qs) / n
        assert math.isclose(
            got.skewness, m3 / m2**1.5, rel_tol=1e-4, abs_tol=1e-5
        ), qs
        assert math.isclose(
            got.kurtosis_excess, m4 / m2**2 - 3, rel_tol=1e-4, abs_tol=1e-5
        ), qs


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=100, max_value=99_999),  # cents
            st.booleans(),  # True -> population 'R', False -> 'A'
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda rows: any(f for _, f in rows) and any(not f for _, f in rows))
)
def test_ks_statistic_matches_bruteforce(spark, tmp_path_factory, rows):
    from firebase_realtime_database_backup_spark.operators.relational import (
        quality_ks_test,
    )

    d = _write_lineitem(
        spark,
        str(tmp_path_factory.mktemp("ks")),
        [(c / 100.0, "R" if f else "A") for c, f in rows],
        "l_extendedprice double, l_returnflag string",
    )
    got = quality_ks_test(spark, d).collect()[0]
    r = sorted(c for c, f in rows if f)
    a = sorted(c for c, f in rows if not f)
    values = sorted({c for c, _ in rows})
    d_want = max(
        abs(
            sum(1 for x in r if x <= v) / len(r)
            - sum(1 for x in a if x <= v) / len(a)
        )
        for v in values
    )
    assert got.n_r == len(r) and got.n_a == len(a)
    assert math.isclose(got.d_stat, d_want, rel_tol=1e-12, abs_tol=1e-12), rows
