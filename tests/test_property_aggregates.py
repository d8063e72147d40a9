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


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # custkey
            st.integers(min_value=0, max_value=80),  # day offset in 1996
        ),
        min_size=1,
        max_size=30,
    )
)
def test_interval_merge_matches_sweep(spark, tmp_path_factory, rows):
    """window_interval_merge vs a pure-Python sorted sweep — incl.
    duplicate start days, fully-nested intervals, and exact-touch
    boundaries (d0 == previous max d1 must MERGE; d0 == max d1 + 1
    must start a new island)."""
    import datetime

    from firebase_realtime_database_backup_spark.operators.relational import (
        window_interval_merge,
    )

    base = datetime.datetime(1996, 1, 1)
    d = os.path.join(str(tmp_path_factory.mktemp("im")), "corpus")
    spark.createDataFrame(
        [
            (cust, i, base + datetime.timedelta(days=off), "1-URGENT")
            for i, (cust, off) in enumerate(rows)
        ],
        "o_custkey long, o_orderkey long, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    got = {
        r.o_custkey: (r.n_orders, r.n_islands, r.covered_days,
                      r.max_island_days)
        for r in window_interval_merge(spark, d).collect()
    }
    per_cust: dict = {}
    for cust, off in rows:
        per_cust.setdefault(cust, []).append((off, off + 7))
    for cust, ivs in per_cust.items():
        islands = []
        for d0, d1 in sorted(ivs):
            if islands and d0 <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], d1)
            else:
                islands.append([d0, d1])
        spans = [hi - lo + 1 for lo, hi in islands]
        assert got[cust] == (
            len(ivs), len(islands), sum(spans), max(spans)
        ), (cust, rows)
    assert set(got) == set(per_cust)


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),  # cents
            st.integers(min_value=1, max_value=20),  # multiplicity
        ),
        min_size=1,
        max_size=25,
    )
)
def test_equidepth_histogram_matches_bruteforce(spark, tmp_path_factory, rows):
    """agg_histogram_equidepth vs a pure-Python cumulative fold — incl.
    a single distinct value (one bucket swallows all 8 cuts) and heavy
    ties straddling cut points."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        EQUIDEPTH_BUCKETS,
        agg_histogram_equidepth,
    )

    flat = [c for c, m in rows for _ in range(m)]
    d = _write_lineitem(
        spark,
        str(tmp_path_factory.mktemp("ed")),
        [(c / 100.0,) for c in flat],
        "l_extendedprice double",
    )
    got = {
        r.bucket: (r.lo_cents, r.hi_cents, r.n_rows, r.n_values)
        for r in agg_histogram_equidepth(spark, d).collect()
    }
    counts: dict = {}
    for c in flat:
        counts[c] = counts.get(c, 0) + 1
    tot = len(flat)
    want: dict = {}
    cw = 0
    for c in sorted(counts):
        cw += counts[c]
        b = (cw * EQUIDEPTH_BUCKETS + tot - 1) // tot
        lo, hi, n, nv = want.get(b, (c, c, 0, 0))
        want[b] = (min(lo, c), max(hi, c), n + counts[c], nv + 1)
    assert got == want, rows


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),  # day offset
            st.integers(min_value=1, max_value=6),  # events that day
        ),
        min_size=2,
        max_size=15,
    )
)
def test_theilsen_matches_pairwise_median(spark, tmp_path_factory, days):
    """events_trend_slope_theilsen vs a pure-Python pairwise-slope
    median — the lower-median rank selection over the sorted slope
    multiset, incl. tied slopes and 2-day series (1 pair)."""
    import datetime

    from firebase_realtime_database_backup_spark.operators.relational import (
        events_trend_slope_theilsen,
    )

    daily: dict = {}
    for off, k in days:
        daily[off] = daily.get(off, 0) + k
    if len(daily) < 2:
        return  # no pair -> empty result, covered by the edge gate
    base = datetime.datetime(2024, 1, 1)
    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("ts")),
        [
            ("T", base + datetime.timedelta(days=off, hours=3))
            for off, k in daily.items()
            for _ in range(k)
        ],
        "event_type string, ts timestamp",
    )
    got = events_trend_slope_theilsen(spark, d).collect()[0]
    pts = sorted(daily.items())
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for x2, y2 in pts[i + 1:]
    )
    want = slopes[(len(slopes) + 1) // 2 - 1]
    assert got.n_days == len(pts)
    assert got.n_pairs == len(slopes)
    assert got.theilsen_slope == want, days


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user_id
            st.integers(min_value=0, max_value=15),  # day offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_survival_table_matches_life_fold(spark, tmp_path_factory, rows):
    """events_survival_table vs a pure-Python life-table fold — incl.
    single-event users (lifetime 0), everyone-censored corpora (all
    users last seen on the horizon day), and ties between ended and
    censored lifetimes."""
    import datetime

    from firebase_realtime_database_backup_spark.operators.relational import (
        events_survival_table,
    )

    base = datetime.datetime(2024, 1, 1)
    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("sv")),
        [
            (u, base + datetime.timedelta(days=off, hours=5))
            for u, off in rows
        ],
        "user_id long, ts timestamp",
    )
    got = {
        r.age_days: (r.n_at_risk, r.n_ended, r.n_censored, r.hazard)
        for r in events_survival_table(spark, d).collect()
    }
    span: dict = {}
    for u, off in rows:
        f, l = span.get(u, (off, off))
        span[u] = (min(f, off), max(l, off))
    horizon = max(l for _, l in span.values())
    by_life: dict = {}
    for f, l in span.values():
        life = l - f
        ended, cens = by_life.get(life, (0, 0))
        if l == horizon:
            by_life[life] = (ended, cens + 1)
        else:
            by_life[life] = (ended + 1, cens)
    at_risk = 0
    want: dict = {}
    for life in sorted(by_life, reverse=True):
        ended, cens = by_life[life]
        at_risk += ended + cens
        want[life] = (at_risk, ended, cens, ended / at_risk)
    assert got == want, rows


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # lang index
            st.integers(min_value=0, max_value=3),  # source index
        ),
        min_size=1,
        max_size=40,
    )
)
def test_chi2_independence_matches_contingency_fold(
    spark, tmp_path_factory, rows
):
    """quality_chi2_independence vs a pure-Python contingency fold —
    incl. single-cell corpora (every deviation 0) and structurally-zero
    cells, whose r*c/n contribution the grid must still emit."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        quality_chi2_independence,
    )

    d = os.path.join(str(tmp_path_factory.mktemp("ci")), "corpus")
    spark.createDataFrame(
        [(f"l{a}", f"s{b}") for a, b in rows], "lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        (r.lang, r.source): (r.n_obs, r.expected_num, r.chi2_contribution)
        for r in quality_chi2_independence(spark, d).collect()
    }
    obs: dict = {}
    for a, b in rows:
        obs[(f"l{a}", f"s{b}")] = obs.get((f"l{a}", f"s{b}"), 0) + 1
    langs = {k[0] for k in obs}
    sources = {k[1] for k in obs}
    n = len(rows)
    want: dict = {}
    for lang in langs:
        r = sum(v for k, v in obs.items() if k[0] == lang)
        for source in sources:
            c = sum(v for k, v in obs.items() if k[1] == source)
            o = obs.get((lang, source), 0)
            dev = n * o - r * c
            want[(lang, source)] = (o, r * c, (dev * dev) / (r * c * n))
    assert got == want, rows


@_PROP_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=70),  # day offset
            st.integers(min_value=1, max_value=9),  # events that day
        ),
        min_size=1,
        max_size=15,
    )
)
def test_rolling_regression_matches_moment_fold(
    spark, tmp_path_factory, days
):
    """window_rolling_regression vs a pure-Python integer-moment fold
    over the exact 28-day RANGE frame — incl. gappy calendars where a
    ROWS frame would silently stretch across months."""
    import datetime

    from firebase_realtime_database_backup_spark.operators.relational import (
        ROLLREG_WINDOW_DAYS,
        window_rolling_regression,
    )

    daily: dict = {}
    for off, k in days:
        daily[off] = daily.get(off, 0) + k
    base = datetime.datetime(2024, 1, 1)
    d = _write_events(
        spark,
        str(tmp_path_factory.mktemp("rr")),
        [
            ("T", base + datetime.timedelta(days=off, hours=4))
            for off, k in daily.items()
            for _ in range(k)
        ],
        "event_type string, ts timestamp",
    )
    got = {
        r.day_idx: (r.n_obs, r.slope)
        for r in window_rolling_regression(spark, d).collect()
    }
    want: dict = {}
    pts = sorted(daily.items())
    for x, _ in pts:
        win = [
            (xi, yi)
            for xi, yi in pts
            if x - (ROLLREG_WINDOW_DAYS - 1) <= xi <= x
        ]
        n = len(win)
        sx = sum(xi for xi, _ in win)
        sy = sum(yi for _, yi in win)
        sxx = sum(xi * xi for xi, _ in win)
        sxy = sum(xi * yi for xi, yi in win)
        den = n * sxx - sx * sx
        if den > 0:
            want[x] = (n, (n * sxy - sx * sy) / den)
    assert got == want, days
