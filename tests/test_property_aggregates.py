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


def _write_events(spark, tmpdir, rows, schema):
    d = os.path.join(tmpdir, "corpus")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    return d


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=-100_000, max_value=100_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_max_drawdown_matches_peak_trough_scan(spark, tmp_path_factory, rows):
    """window_max_drawdown vs a pure-Python peak-trough scan — incl.
    negative days, all-negative series (peak = first day), and
    single-day series (drawdown 0)."""
    import datetime

    from firebase_realtime_database_backup_spark.operators.relational import (
        window_max_drawdown,
    )

    base = datetime.datetime(2024, 1, 1)
    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("dd")),
        [
            ("T", base + datetime.timedelta(days=off, hours=1), c / 100.0)
            for off, c in rows
        ],
        "event_type string, ts timestamp, value double",
    )
    got = window_max_drawdown(spark, d).collect()[0]
    daily: dict = {}
    for off, c in rows:
        daily[off] = daily.get(off, 0) + c
    cum = peak = None
    max_peak = max_dd = None
    for day in sorted(daily):
        cum = daily[day] if cum is None else cum + daily[day]
        peak = cum if peak is None else max(peak, cum)
        max_peak = peak if max_peak is None else max(max_peak, peak)
        dd = peak - cum
        max_dd = dd if max_dd is None else max(max_dd, dd)
    assert got.peak_cents == max_peak, rows
    assert got.max_drawdown_cents == max_dd, rows
    assert got.max_drawdown == max_dd / 100.0


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # day offset
            st.integers(min_value=-50_000, max_value=50_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_matches_list_fold(spark, tmp_path_factory, rows):
    """events_changepoint_cusum vs a pure-Python integer fold — the
    n-scaled deviations, integer running CUSUM, integer-median MAD and
    the 3-sigma flag must all match exactly (median of an even count
    is the one exact halving, replicated via statistics.median)."""
    import datetime
    import statistics

    from firebase_realtime_database_backup_spark.operators.relational import (
        events_changepoint_cusum,
    )

    base = datetime.datetime(2024, 3, 1)
    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("cs")),
        [
            ("T", base + datetime.timedelta(days=off, hours=2), c / 100.0)
            for off, c in rows
        ],
        "event_type string, ts timestamp, value double",
    )
    got = {
        r.day: (r.cusum_n, r.mad_n, r.flagged)
        for r in events_changepoint_cusum(spark, d).collect()
    }
    daily: dict = {}
    for off, c in rows:
        daily[off] = daily.get(off, 0) + c
    n = len(daily)
    total = sum(daily.values())
    devs = {day: n * cents - total for day, cents in daily.items()}
    mad = statistics.median(sorted(abs(v) for v in devs.values()))
    cusum = 0
    for day in sorted(daily):
        cusum += devs[day]
        want_day = (base + datetime.timedelta(days=day)).date()
        g_cusum, g_mad, g_flag = got[want_day]
        assert g_cusum == cusum, rows
        assert g_mad == mad, rows
        assert g_flag == (abs(cusum) > 3 * mad), rows
    assert len(got) == n


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user_id
            st.integers(min_value=0, max_value=5),  # event type index
        ),
        min_size=1,
        max_size=50,
    )
)
def test_entropy_matches_whole_bit_reference(spark, tmp_path_factory, rows):
    """agg_entropy_by_group vs a pure-Python whole-bit entropy fold:
    term = k * bit_length(n // k) - k per type, summed — exercises
    single-type users (entropy 0) and heavily-tied distributions."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        agg_entropy_by_group,
    )

    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("en")),
        [(u, f"t{t}") for u, t in rows],
        "user_id long, event_type string",
    )
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy_bits_num,
                    r.behavior_entropy_bits)
        for r in agg_entropy_by_group(spark, d).collect()
    }
    per_user: dict = {}
    for u, t in rows:
        per_user.setdefault(u, {}).setdefault(t, 0)
        per_user[u][t] += 1
    for u, counts in per_user.items():
        n = sum(counts.values())
        num = sum(k * ((n // k).bit_length() - 1) for k in counts.values())
        assert got[u] == (n, len(counts), num, num / n), (u, rows)
    assert set(got) == set(per_user)
