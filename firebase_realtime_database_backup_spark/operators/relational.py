"""Relational operator surface: scans, filters, joins, aggregations,
windows, sorts, set ops.

The reference implements none of these (SURVEY.md §2.B) — its only set
operation is the degenerate key anti-join `array_diff_key`
(src/RestoreProcessor.php:99), mapped here to a real `left_anti` join.
Everything in this module is pure Catalyst: declarative DataFrame plans
that get predicate pushdown, column pruning, join selection, partial
aggregation, and whole-stage codegen for free.

Scale notes (100 TB):
- Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; both sides
  arrive hash-partitioned, AQE handles skew splitting.
- `region`/`nation` are broadcast unconditionally (fixed cardinality at
  any SF).  `part`/`supplier`/`customer` scale with SF; they are joined
  shuffle-side unless explicitly hinted for a known-small deployment.
- Aggregations rely on Spark's automatic partial (map-side) aggregation;
  high-cardinality group keys (custkey) go straight to hash-agg with
  spill; no driver-side collection anywhere.
- All floats rounded at the output edge only (oracle hash stability),
  never inside the aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.catalog import read_table, spread
from firebase_realtime_database_backup_spark.memo import memo_key, register_cache
from firebase_realtime_database_backup_spark.functions.hashing import (
    knuth_bucket,
    knuth_bucket_sql,
    knuth_hash,
    knuth_hash_sql,
)
from firebase_realtime_database_backup_spark.operators.text import (
    QUALITY_SQL,
    quality_expr,
)
from firebase_realtime_database_backup_spark.registry import Registry

REG = Registry()


def oround(expr: str, n: int = 2) -> str:
    """DuckDB-side ROUND that replicates Spark's double-rounding bit-for-bit.

    Spark rounds doubles via the *shortest decimal representation*
    (java BigDecimal.valueOf(d) == new BigDecimal(Double.toString(d)),
    then setScale(n, HALF_UP)); DuckDB's ROUND(double, n) works on the
    binary value via float multiply, so e.g. the double nearest to
    101423.835 (binary ...834999999990687) rounds to .84 in Spark
    (shortest repr is "101423.835") but .83 in raw-binary terms.

    DuckDB's CAST(double AS VARCHAR) happens to produce exactly the Java
    shortest repr, and its DECIMAL ROUND is HALF_UP — so
    VARCHAR → DECIMAL → ROUND reproduces Spark exactly (verified on
    .xx5-boundary and 17-digit cases).
    """
    return f"ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,{n + 16})), {n})::DOUBLE"


# ---------------------------------------------------------------------------
# Flagship: scan + filter + 4 equi-joins (2 broadcast) + hash agg + sort
# ---------------------------------------------------------------------------

@REG.query(
    "flagship_revenue",
    oracle=f"""
    SELECT r_name, l_returnflag,
           {oround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY r_name, l_returnflag
    ORDER BY revenue DESC
    """,
)
def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region x returnflag (SURVEY.md §7.1).

    Plan shape to verify with .explain("formatted"): parquet scans with
    PushedFilters on l_shipdate + ReadSchema pruned to used columns;
    lineitem⋈orders and ⋈customer as shuffle joins; nation/region as
    BroadcastHashJoin; partial+final HashAggregate; TakeOrdered for the
    final sort.

    Scale note: pre-aggregating lineitem by (l_orderkey, l_returnflag)
    below the join shrinks the join payload ~4x and reuses the same
    shuffle key; measured at 20x local data it does NOT pay (2.7s vs
    3.0s warm — local shuffles are memory-bandwidth-bound), but on a
    network-shuffling cluster it's the first rewrite to try.
    """
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"))
    )


#: Bucket count for the co-located fact⋈fact layout.  On a cluster this
#: is sized to data volume (e.g. 4096 buckets for 100 TB of lineitem);
#: locally 16 keeps files sane at every test SF.
FLAGSHIP_BUCKETS = 16


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str):
    """Idempotently materialize lineitem/orders bucketed+sorted by
    orderkey into the session warehouse, one table pair per sf_dir.

    This is the LAYOUT half of the bucketed-join answer to the measured
    12.6× sort-merge-join dominance at 100× facts (BASELINE.md): both
    fact tables are pre-shuffled ONCE into the same bucket scheme, and
    every subsequent orderkey join reads co-located buckets with no
    Exchange and no per-query sort — the amortization a daily 100 TB
    pipeline lives on.  Returns (lineitem_df, orders_df) backed by the
    bucketed tables."""
    import os
    import shutil

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    li_name, od_name = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"

    def build(name: str, table: str, key: str) -> None:
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), name.lower())
        if spark.catalog.tableExists(name):
            # the inverse orphan: catalog remembers the table but the
            # location is gone/empty (another process rebuilding the
            # same warehouse swept it) — drop and rebuild
            if os.path.isdir(loc) and any(
                f.startswith("part-") for f in os.listdir(loc)
            ):
                return
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        # an orphaned location can linger from a previous session (the
        # in-memory catalog forgets the table, the warehouse dir does
        # not); bucket metadata lives in the catalog, so the directory
        # alone is untrusted — clear it and rebuild
        if os.path.exists(loc):
            shutil.rmtree(loc)
        (
            read_table(spark, sf_dir, table)
            .write.bucketBy(FLAGSHIP_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    build(li_name, "lineitem", "l_orderkey")
    build(od_name, "orders", "o_orderkey")
    return spark.table(li_name), spark.table(od_name)


@REG.query(
    "flagship_revenue_bucketed",
    oracle="""
    SELECT r_name, l_returnflag,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                     AS VARCHAR) AS DECIMAL(38,22))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY r_name, l_returnflag
    ORDER BY revenue DESC
    """,
)
def flagship_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flagship_revenue over the bucketed-layout fact tables:
    lineitem⋈orders runs Exchange-free on the co-located buckets
    (asserted in tests/test_plans.py).  The orderkey shuffle — the
    12.6×-at-100× bottleneck in the plain flagship (BASELINE.md scale
    experiment #3) — is paid once at layout time in
    ensure_bucketed_facts, not per query.

    Revenue accumulates in DECIMAL, not double: the bucket layout
    changes partial-aggregation order, and double summation is not
    associative — the plain twin's last rounded digit flips under the
    new order.  Per-row products stay IEEE (bit-identical on both
    engines), each converts through its shortest decimal repr (Spark's
    double→decimal cast; VARCHAR→DECIMAL in DuckDB, the oround trick),
    and decimal addition is exact and order-independent — so the result
    is layout-invariant, which a 100 TB pipeline needs anyway (rerun
    with different partitioning must not change reported revenue)."""
    lineitem_b, orders_b = ensure_bucketed_facts(spark, sf_dir)
    lineitem = lineitem_b.filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    rev_term = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,22)"
    )
    return (
        lineitem.join(orders_b, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "l_returnflag")
        .agg(
            F.round(F.sum(rev_term), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------

@REG.query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oround("SUM(l_quantity)")}                                       AS sum_qty,
           {oround("SUM(l_extendedprice)")}                                  AS sum_base_price,
           {oround("SUM(l_extendedprice * (1 - l_discount))")}               AS sum_disc_price,
           {oround("SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
           {oround("AVG(l_quantity)")}                                       AS avg_qty,
           {oround("AVG(l_extendedprice)")}                                  AS avg_price,
           {oround("AVG(l_discount)", 4)}                                    AS avg_disc,
           COUNT(*)                                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style full-scan aggregate — the map-side-combine stress
    test: 8 aggregates over 2 low-cardinality keys means partial
    aggregation collapses each input partition to a handful of rows
    before the (tiny) shuffle."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@REG.query(
    "filter_pushdown_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      AND l_quantity BETWEEN 10 AND 20
      AND l_returnflag = 'R'
    """,
)
def filter_pushdown_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-range + predicate filter with projection — the Spark analog of
    the reference's server-side page query {orderBy:"$key", startAt,
    limitToFirst} (src/BackupProcessor.php:162-169), which was its only
    pushdown.  All three predicates reach the parquet scan
    (PushedFilters) and ReadSchema carries exactly 7 columns.

    net_price is left unrounded: identical IEEE-754 op order in Spark
    and DuckDB yields bit-identical doubles, strictly safer for the
    hash compare than engine-specific rounding."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@REG.query(
    "join_inner_equi",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           COUNT(*) AS n_orders,
           {oround("SUM(o_totalprice)")} AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi inner join; both sides shuffle-partition on the key
    (sort-merge or shuffled-hash per AQE's runtime choice)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@REG.query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           {oround("COALESCE(SUM(o_totalprice), 0.0)")} AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (n_orders = 0)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@REG.query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@REG.query(
    "join_full_outer",
    oracle="""
    WITH cust_per_nation AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp_per_nation AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM cust_per_nation c FULL OUTER JOIN supp_per_nation s
      ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nations having only
    customers or only suppliers survive with zero-filled counts).
    Pre-aggregating before the outer join keeps the shuffled sides tiny —
    at 100 TB this is the difference between joining billions of rows and
    joining 25."""
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return c.join(s, "nationkey", "full").select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@REG.query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers having at least one big order.  Existence
    check without duplication — no fan-out, right side reduced to
    distinct keys by the semi-join operator itself."""
    customer = read_table(spark, sf_dir, "customer")
    big = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@REG.query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders at all — the Spark form of the
    reference's only set operation, `array_diff_key($data, $splitData)`
    removing already-written keys (src/RestoreProcessor.php:99)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@REG.query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {oround("SUM(l_quantity)")} AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: fact table never shuffles; the
    filtered dim ships to every executor.  The broadcast() hint is load-
    bearing at scale — without it a 100 TB lineitem would shuffle on
    l_partkey.  (part grows with SF; the p_size filter keeps the
    broadcast side bounded, and AQE would demote the hint if it did
    not.)"""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@REG.query(
    "join_range_residual",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_late_ship
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def join_range_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with a range residual predicate (shipped >90 days after
    order).  The equi key drives partitioning; the range condition is
    evaluated as a cheap post-join filter inside the same stage."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_ship"))
    )


@REG.query(
    "join_theta_bnl",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_cheaper_parts
    FROM supplier JOIN part ON p_retailprice < s_acctbal
    GROUP BY s_suppkey
    """,
)
def join_theta_bnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join → broadcast nested loop.  Only valid
    when one side is broadcast-small; at scale prefer banded rewrites
    (bucketize the range into equi keys) — see similarity.py for that
    pattern applied to LSH."""
    supplier = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    return (
        supplier.join(F.broadcast(part), F.col("p_retailprice") < F.col("s_acctbal"))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper_parts"))
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@REG.query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active_customers,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (Spark expands to a two-phase plan)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@REG.query("agg_approx_count_distinct")  # no oracle: HLL sketches differ across engines
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counts: one pass, fixed memory, no distinct-expansion
    shuffle.  Rows-only check (DuckDB's approx sketch differs)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@REG.query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {oround("SUM(c_acctbal)")} AS total_balance,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region → nation → grand total."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@REG.query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {oround("AVG(o_totalprice)")} AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two low-cardinality dimensions."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@REG.query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS drnk,
             NTILE(4)     OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer
    ) WHERE rn <= 10
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile; top-10 per segment.
    row_number and ntile use a unique sort key (tie-break on c_custkey)
    so results are deterministic; rank/dense_rank depend only on the
    value being ranked, so ties are safe."""
    customer = read_table(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    w_value = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return (
        customer.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_value).alias("rnk"),
            F.dense_rank().over(w_value).alias("drnk"),
            F.ntile(4).over(w_unique).alias("quartile"),
        )
        .filter(F.col("rn") <= 10)
    )


@REG.query(
    "window_lag_lead",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {oround("o_totalprice")} AS price,
           {oround("COALESCE(LAG(o_totalprice) OVER w, 0.0)")}  AS prev_price,
           {oround("COALESCE(LEAD(o_totalprice) OVER w, 0.0)")} AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (unique sort key:
    orderdate then orderkey)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias("next_price"),
    )


@REG.query(
    "window_running_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {oround('''SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_spend,
           {oround('''AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')} AS moving_avg_3
    FROM orders
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: running cumulative sum + 3-row moving
    average.  ROWS (not RANGE) over a unique key keeps the frame
    deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 2).alias("moving_avg_3"),
    )


# ---------------------------------------------------------------------------
# Sort / top-k / set ops
# ---------------------------------------------------------------------------

@REG.query(
    "sort_topk",
    oracle=f"""
    SELECT o_orderkey, {oround("o_totalprice")} AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, no global sort shuffle.  Unique tie-break
    (o_orderkey) makes the cut deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@REG.query(
    "set_union_all",
    oracle="""
    SELECT party_key, party_name, party_role FROM (
      SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS party_role
      FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS party_role
      FROM supplier WHERE s_acctbal > 5000
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two conformed projections (bag semantics)."""
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.lit("customer").alias("party_role"),
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.lit("supplier").alias("party_role"),
    )
    return c.unionByName(s)


@REG.query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing in both finished and open orders (set
    semantics — intersect dedups)."""
    orders = read_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


@REG.query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: all customers minus big spenders."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    all_c = customer.select(F.col("c_custkey").alias("custkey"))
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(big)


# ---------------------------------------------------------------------------
# Grouping sets / percentiles / distribution windows / as-of join
# ---------------------------------------------------------------------------

@REG.query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {oround("SUM(o_totalprice)")} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (the general form rollup/cube specialize):
    (status, priority), (status), and grand total in ONE pass — Spark
    plans a single Expand + hash aggregate, not three scans + union."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@REG.query(
    "agg_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {oround("QUANTILE_CONT(l_quantity, 0.25)")} AS q25,
           {oround("QUANTILE_CONT(l_quantity, 0.50)")} AS q50,
           {oround("QUANTILE_CONT(l_quantity, 0.75)")} AS q75,
           {oround("MEDIAN(l_extendedprice)")} AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (linear interpolation —
    identical definition in Spark `percentile` and DuckDB QUANTILE_CONT).
    The approximate scale path is percentile_approx (t-digest sketch,
    mergeable map-side); sketches differ across engines so the exact
    form is the oracle-checked one."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 2).alias("q25"),
        F.round(F.percentile("l_quantity", 0.50), 2).alias("q50"),
        F.round(F.percentile("l_quantity", 0.75), 2).alias("q75"),
        F.round(F.median("l_extendedprice"), 2).alias("median_price"),
    )


@REG.query(
    "window_percent_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal), 6)    AS cume,
           ROUND(CAST(c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment)
                 AS DOUBLE)
                 / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
             AS zscore
    FROM customer
    """,
)
def window_percent_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: percent_rank / cume_dist / per-partition
    z-score.  Value-deterministic (no unique-key tiebreak needed: ties
    share pct_rank and cume by definition)."""
    customer = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    wp = Window.partitionBy("c_mktsegment")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(
            (F.col("c_acctbal") - F.avg("c_acctbal").over(wp)).cast("double")
            / F.stddev_samp("c_acctbal").over(wp),
            4,
        ).alias("zscore"),
    )


@REG.query(
    "join_asof",
    oracle="""
    WITH ords AS (
      SELECT o_custkey, o_orderdate,
             MAX_BY(o_orderkey, o_orderkey)   AS o_orderkey,
             MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CAST(EPOCH_MS(e.ts) AS BIGINT) AS ts_ms,
           o.o_orderkey AS last_orderkey,
           CAST(EPOCH_MS(o.o_orderdate) AS BIGINT) AS last_orderdate_ms,
           o.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN ords o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order at or
    before the event time.  Spark lacks a native ASOF JOIN; the naive
    rewrite (range join + argmax) explodes into O(events x orders) per
    key.  Scalable composition instead: UNION both sides tagged, one
    shuffle on the key, then last(..., ignorenulls) over an ordered
    window carries the latest order forward into each event row —
    O((events + orders) log) with no pair blowup, the classic
    merge-as-of expressed in Catalyst primitives.

    Orders are pre-deduped to one per (custkey, date) via max_by so the
    as-of match is deterministic under same-date ties."""
    events = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    ords = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast("struct<okey:bigint,odate:timestamp,oprice:double>").alias("o"),
    )
    right = ords.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("odate"),
            F.col("o_totalprice").alias("oprice"),
        ).alias("o"),
    )
    # Order rows sort before event rows at the same instant -> "at or
    # before" inclusive semantics.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "last_o", F.last("o", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.unix_millis("ts").alias("ts_ms"),
            F.col("last_o.okey").alias("last_orderkey"),
            F.unix_millis("last_o.odate").alias("last_orderdate_ms"),
            F.col("last_o.oprice").alias("last_totalprice"),
        )
    )


#: Max staleness for the tolerance-bounded as-of join (milliseconds): a
#: click older than a day does not explain a purchase.  Millisecond
#: integers because EPOCH_MS/unix_millis is the proven-portable pair
#: (join_asof precedent) — DuckDB EPOCH() is a fractional DOUBLE while
#: Spark's timestamp->long cast truncates, and that disagreement can
#: flip a row exactly at the staleness boundary.
ASOF_TOLERANCE_MS = 86400 * 1000


@REG.query(
    "join_asof_tolerance",
    oracle=f"""
    WITH matched AS (
      SELECT p.event_id, p.user_id, p.ts,
             c.event_id AS click_id, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (
        SELECT user_id, ts, MAX_BY(event_id, event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      ) c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT event_id, user_id, CAST(EPOCH_MS(ts) AS BIGINT) AS ts_ms,
           CASE WHEN click_ts IS NOT NULL
                 AND EPOCH_MS(ts) - EPOCH_MS(click_ts) <= {ASOF_TOLERANCE_MS}
                THEN click_id END AS recent_click_id,
           CASE WHEN click_ts IS NOT NULL
                 AND EPOCH_MS(ts) - EPOCH_MS(click_ts) <= {ASOF_TOLERANCE_MS}
                THEN CAST(EPOCH_MS(ts) - EPOCH_MS(click_ts) AS BIGINT)
                END AS click_age_ms
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof(tolerance=)
    semantics): each purchase gets the same user's most recent click at
    or before it — but only if that click is under a day old, else the
    match reads as NULL.  The 'latest record, but not stale' lookup
    every feature pipeline needs: without the bound, a week-old click
    leaks into 'what drove this purchase' features (at sf0.01 the
    unbounded form matches 1838 of 1981 purchases; the 24 h bound keeps
    683 and nulls 1155 stale ones — the bound is doing real work).

    Same single-shuffle tagged-union carry-forward as join_asof — the
    tolerance is a POST-window null-out, so the plan cost is identical
    to the unbounded form: no extra join, no range blowup, the
    staleness test is one integer comparison per purchase row.
    Epoch-second arithmetic on both engines keeps the cutoff
    bit-exact.  Clicks are pre-deduped to one per (user, ts) via
    max_by so same-instant ties are deterministic."""
    events = read_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_id", "event_id").alias("click_id"))
    )
    left = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_purchase"),
        "event_id",
        "ts",
        F.lit(None).cast("struct<cid:bigint,cts:timestamp>").alias("c"),
    )
    right = clicks.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("click_id").alias("cid"), F.col("ts").alias("cts")
        ).alias("c"),
    )
    # Click rows sort before purchase rows at the same instant -> "at
    # or before" inclusive semantics, matching the oracle's p.ts >= c.ts.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "last_c", F.last("c", ignorenulls=True).over(w)
    )
    age = F.unix_millis("ts") - F.unix_millis(F.col("last_c.cts"))
    fresh = F.col("last_c.cts").isNotNull() & (age <= ASOF_TOLERANCE_MS)
    return (
        merged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.unix_millis("ts").alias("ts_ms"),
            F.when(fresh, F.col("last_c.cid")).alias("recent_click_id"),
            F.when(fresh, age).alias("click_age_ms"),
        )
    )


@REG.query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {oround("SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END)")} AS qty_F,
           {oround("SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END)")} AS qty_O,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): status values become columns.  The pivot value
    list is EXPLICIT — omitting it makes Spark run a distinct scan first
    and caps at spark.sql.pivotMaxValues; fixed lists keep the plan a
    single pass.  Compiles to exactly the conditional aggregation the
    oracle spells out."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    piv = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_n").alias("n_F"),
        F.col("O_n").alias("n_O"),
    )


@REG.query(
    "sql_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    AND c_acctbal > 5000
    """,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point + correlated EXISTS: Catalyst decorrelates the
    subquery into a left-semi join (verify: no per-row subquery
    execution in the plan).  Registered views make the whole test
    catalog addressable from spark.sql."""
    from firebase_realtime_database_backup_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND c_acctbal > 5000
        """
    )


SALT_BUCKETS = 8


@REG.query(
    "join_salted_skew",
    oracle=f"""
    SELECT e.user_id, c.c_mktsegment,
           COUNT(*) AS n_events,
           {oround("SUM(e.value)")} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for skewed keys: events concentrate millions of rows
    on few user_ids, so a plain hash join sends each hot key to ONE
    task.  Salting fans each key across SALT_BUCKETS tasks: the big side
    gets salt = event_id % B, the small side is exploded B ways, and the
    join key becomes (key, salt).  Result identical to the plain join
    (oracle is the unsalted SQL); the aggregation then reduces over the
    salt fan-out.  AQE's skewJoin handles moderate skew automatically —
    explicit salting is the deterministic tool for extreme single-key
    skew (the reference's go-deeper hot-node case at relational scale,
    src/BackupProcessor.php:173-179)."""
    events = read_table(spark, sf_dir, "events")
    customer = read_table(spark, sf_dir, "customer")
    salted_e = events.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    salted_c = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("salt"),
    )
    return (
        salted_e.join(
            salted_c,
            (F.col("user_id") == F.col("c_custkey")) & (salted_e["salt"] == salted_c["salt"]),
        )
        .groupBy("user_id", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@REG.query(
    "events_funnel",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           t_view IS NOT NULL AS saw_view,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view)
             AS clicked_after_view,
           (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
            AND t_purchase IS NOT NULL AND t_purchase > t_click)
             AS purchased_after_click
    FROM stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase) per user:
    conditional-min stage timestamps in ONE aggregation pass, then pure
    column predicates — no self-joins, no window, one shuffle on
    user_id.  The standard product-analytics query at any scale."""
    events = read_table(spark, sf_dir, "events")
    stage = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    saw_view = F.col("t_view").isNotNull()
    clicked = saw_view & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    return stage.select(
        "user_id",
        saw_view.alias("saw_view"),
        clicked.alias("clicked_after_view"),
        purchased.alias("purchased_after_click"),
    )


@REG.query(
    "events_funnel_windowed",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click, MIN(t1.t_view) AS t_view
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > t1.t_view AND e.ts <= t1.t_view + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.t_click AND e.ts <= t2.t_click + INTERVAL 72 HOUR
      GROUP BY e.user_id
    )
    SELECT t1.user_id, t1.t_view, t2.t_click, t3.t_purchase,
           CASE WHEN t2.user_id IS NULL THEN 1
                WHEN t3.user_id IS NULL THEN 2
                ELSE 3 END AS reached_stage
    FROM t1
    LEFT JOIN t2 USING (user_id)
    LEFT JOIN t3 USING (user_id)
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed chained funnel: click within 24 h OF THE FIRST
    VIEW, then purchase within 72 h OF THAT CLICK — each stage's clock
    starts at the matched previous stage, which is what "conversion
    window" means in every funnel product and what the simple
    events_funnel (unbounded conditional-MIN) cannot express.
    Semantics pinned precisely: first-view-anchored greedy chain (the
    industry default) — a later view that would open a different
    conversion path is intentionally not explored.

    Plan: three conditional-MIN aggregations chained by user_id
    equi-joins — no self-join on the raw stream, no window, no
    per-user event sorting.  All three shuffles hash on the same key,
    so on a cluster the chain runs in co-partitioned stages; per-user
    state is one timestamp per stage regardless of event volume
    (whale-user-proof, unlike collect-and-fold funnel kernels).
    Timestamp comparisons only — no epoch arithmetic to diverge."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 72 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_click").isNull(), 1)
            .when(F.col("t_purchase").isNull(), 2)
            .otherwise(3)
            .cast("int")
            .alias("reached_stage"),
        )
    )


@REG.query(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (grouped by l_linestatus — the synthetic lineitem
    has no l_shipmode): fact⋈fact join + conditional priority counts.
    The shipdate range filter is pushed to the lineitem scan, so only
    one year of the fact table is ever joined."""
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@REG.query(
    "tpch_q14_promo",
    oracle=f"""
    SELECT {oround(
        "100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ SUM(l_extendedprice * (1 - l_discount))", 4)} AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1=1
    """,
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month.  `part`
    scales with SF so it joins shuffle-side by default; the one-month
    lineitem filter makes the probe side small."""
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@REG.query(
    "events_resample_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT user_id,
             TIME_BUCKET(INTERVAL 1 HOUR, MIN(ts)) AS t0,
             TIME_BUCKET(INTERVAL 1 HOUR, MAX(ts)) AS t1
      FROM events WHERE user_id < 10 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, UNNEST(GENERATE_SERIES(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ),
    actual AS (
      SELECT user_id, TIME_BUCKET(INTERVAL 1 HOUR, ts) AS bucket,
             COUNT(*) AS n, {oround("SUM(value)")} AS v
      FROM events WHERE user_id < 10 GROUP BY 1, 2
    )
    SELECT g.user_id, CAST(EPOCH_MS(g.bucket) AS BIGINT) AS bucket_ms,
           COALESCE(a.n, 0) AS n_events,
           COALESCE(a.v, 0.0) AS total_value
    FROM grid g LEFT JOIN actual a
      ON a.user_id = g.user_id AND a.bucket = g.bucket
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: hourly buckets per user,
    emitting an explicit ZERO row for silent hours (the difference
    between a groupBy — which can't see absent data — and a resample).
    The dense grid comes from sequence()+explode over each user's
    [first, last] hour; grid size is users x hours, independent of event
    count, so the fill join stays cheap at any event volume."""
    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hour = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).cast("timestamp")
    bucketed = events.select("user_id", hour.alias("bucket"), "value")
    bounds = bucketed.groupBy("user_id").agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("bucket"),
    )
    actual = bucketed.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    return (
        grid.join(actual, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.unix_millis("bucket").alias("bucket_ms"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("v", F.lit(0.0)).alias("total_value"),
        )
    )


@REG.query(
    "sample_deterministic",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, lang,
             {knuth_bucket_sql('doc_id', 100)} AS h
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN h < 10 THEN 'test'
                WHEN h < 30 THEN 'valid'
                ELSE 'train' END AS split
    FROM tagged
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sampling / train-valid-test split: a Knuth
    multiplicative hash of the stable id decides the split — identical
    on every engine, every run, every cluster size (df.sample() is
    seed-AND-partitioning dependent, so it cannot be an oracle-checked
    contract).  Map-only; the split column then drives partitioned
    writes or filters."""
    docs = read_table(spark, sf_dir, "documents")
    h = knuth_bucket(F.col("doc_id"), 100)
    return docs.select(
        "doc_id",
        "lang",
        F.when(h < 10, "test").when(h < 30, "valid").otherwise("train").alias(
            "split"
        ),
    )


BIN_WIDTH = 100  # equals the interval span, so each interval spans <=2 bins


@REG.query(
    "join_range_binned",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_parts_in_band
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal - 50 AND s_acctbal + 50
    GROUP BY s_suppkey
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join made scalable by BINNING: each supplier's
    [bal-50, bal+50] band explodes to the <=2 width-100 bins it
    touches, parts map to their single bin, and the join becomes an
    EQUI join on bin id + a residual band filter.  Replaces the
    broadcast-nested-loop O(|S|x|P|) pair space with hash partitioning
    on bins — the same move a time-interval/IP-range join uses at
    100 TB.  Bin width is the tuning knob: ~interval span keeps the
    per-interval fan-out at 2 while bounding per-bin candidates."""
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        (F.col("s_acctbal") - 50).alias("lo"),
        (F.col("s_acctbal") + 50).alias("hi"),
    )
    s_binned = supplier.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BIN_WIDTH), F.floor(F.col("hi") / BIN_WIDTH)
            )
        ),
    )
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.floor(F.col("p_retailprice") / BIN_WIDTH).alias("bin"),
    )
    return (
        s_binned.join(part, "bin")
        .filter(F.col("p_retailprice").between(F.col("lo"), F.col("hi")))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_in_band"))
    )


@REG.query(
    "window_nth_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price_so_far,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values over a running frame: first / current /
    2nd order price per customer history prefix.  Unique (date, key)
    ordering keeps every value deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price_so_far"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@REG.query("agg_percentile_approx")  # rows-only: sketch internals differ per engine
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's mergeable quantile sketch —
    the scale path for percentiles over 100 TB (bounded memory,
    map-side mergeable, accuracy knob).  Sketch internals aren't
    SQL-reproducible → rows-only; agg_percentiles is the exact
    oracle-checked twin.  Output is three scalar quantile columns (not
    an array) so the driver's pandas canonicalizer can sort the rows."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000)
    return lineitem.groupBy("l_returnflag").agg(
        F.element_at(q, 1).alias("approx_q25"),
        F.element_at(q, 2).alias("approx_q50"),
        F.element_at(q, 3).alias("approx_q75"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
    )


@REG.query(
    "window_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey, d,
           COUNT(*) OVER w AS n_trailing_30d,
           {oround("SUM(o_totalprice) OVER w")} AS spend_trailing_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(EPOCH(o_orderdate) / 86400 AS BIGINT) AS d
      FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames elsewhere): per
    customer, order count and spend over the trailing 30 DAYS — peers
    at the same day aggregate together and gaps in the date axis are
    respected, which a ROWS frame cannot express.  Order key is epoch
    days (RANGE needs a numeric axis in both engines)."""
    orders = read_table(spark, sf_dir, "orders")
    days = (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", days.alias("d"), "o_totalprice"
    ).select(
        "o_custkey",
        "o_orderkey",
        "d",
        F.count(F.lit(1)).over(w).alias("n_trailing_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_trailing_30d"),
    )


@REG.query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set difference (EXCEPT ALL): multiplicities
    subtract instead of collapsing — a customer with 3 'F' orders and
    1 'O' order keeps 2 rows.  The multiset complement of
    set_except's distinct semantics."""
    orders = read_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.exceptAll(o)


@REG.query(
    "sql_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries through spark.sql: the scalar average
    compiles to a broadcast one-row aggregate, the IN to a left-semi
    join — both decorrelated by Catalyst, no per-row re-execution."""
    from firebase_realtime_database_backup_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 200000)
        """
    )


@REG.query("agg_hll_sketch")  # rows-only: sketch bytes are engine-specific
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch aggregation (Spark 3.5+ Datasketches): build
    per-group sketches, union them, estimate.  The REUSABLE form of
    approx_count_distinct — sketches persist as bytes and merge across
    days/partitions without rescanning history.  Rows-only (sketch
    serialization is engine-specific); approx_count_distinct's exact
    twin agg_count_distinct is oracle-checked."""
    orders = read_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return per_status.select(
        "o_orderstatus",
        "n_orders",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_customers"),
    )


@REG.query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with set semantics (distinct): union + dropDuplicates —
    Spark plans the dedup as one hash aggregate over the unioned
    stream, not a union-then-sort."""
    orders = read_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    return f.unionByName(big).distinct()


@REG.query(
    "tpch_q3_topk_revenue",
    oracle=f"""
    SELECT o_orderkey,
           CAST(EPOCH_MS(o_orderdate) AS BIGINT) AS orderdate_ms,
           {oround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter -> 3-way join -> per-order revenue
    -> global top-10.  Both date filters and the segment predicate push
    to their scans, so the join sees one segment of customers and only
    late-shipping lines; the top-10 is a TakeOrderedAndProject (per-
    partition heaps + driver merge), never a global sort of all groups.
    Tie-break on o_orderkey keeps the cut deterministic."""
    customer = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
        .orderBy(F.desc("_rev"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            F.round("_rev", 2).alias("revenue"),
        )
    )


Q18_MIN_QTY = 250  # per-order quantity threshold (max at sf0.01 is 458)


@REG.query(
    "tpch_q18_big_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(EPOCH_MS(o_orderdate) AS BIGINT) AS orderdate_ms,
           o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > {Q18_MIN_QTY}
    """,
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): join + group + HAVING on
    an aggregate.  The quantity sum partial-aggregates map-side before
    the o_orderkey shuffle, and the HAVING filter runs post-agg on the
    (much smaller) group stream — never on raw lines.  l_quantity is
    integral, so the double sum is exact and the threshold cut is
    engine-independent."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
    )


SESSION_GAP_MS = 6 * 3600 * 1000  # 6 h idle gap closes a session


@REG.query(
    "events_sessionize",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR EPOCH_MS(ts) - EPOCH_MS(LAG(ts) OVER w)
                       > {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_seq
      FROM seq
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           CAST(EPOCH_MS(MIN(ts)) AS BIGINT) AS start_ms,
           CAST(EPOCH_MS(MAX(ts)) AS BIGINT) AS end_ms,
           CAST(EPOCH_MS(MAX(ts)) - EPOCH_MS(MIN(ts)) AS BIGINT) AS duration_ms
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >6 h of
    per-user inactivity.  The canonical composition — lag to detect
    gaps, running sum of gap flags to number sessions, then a session-
    level rollup — costs exactly ONE shuffle on user_id: both windows
    and the final groupBy reuse the same partitioning, so Catalyst
    plans a single Exchange.  The streaming twin is
    stream_window_session (F.session_window); this is the batch/backfill
    form that also yields stable session ids."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    prev_ms = F.lag(ms).over(w)
    is_new = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1
    ).otherwise(0)
    sess = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_millis("ts")).alias("start_ms"),
        F.max(F.unix_millis("ts")).alias("end_ms"),
        (F.max(F.unix_millis("ts")) - F.min(F.unix_millis("ts"))).alias("duration_ms"),
    )


@REG.query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelated to
    a LEFT SEMI join, then a tiny group-count.  The semi join needs only
    lineitem's join key — column pruning cuts the probe side to one
    int64 column, and the returnflag predicate pushes into that scan.
    The 5-group final agg is all map-side partials; the only shuffle
    moving real data is the o_orderkey semi join.  (The reference's Q4
    uses commit/receipt dates the test schema lacks; the returnflag
    predicate keeps the identical EXISTS + agg shape.)"""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@REG.query(
    "tpch_q5_local_volume",
    oracle=f"""
    SELECT n_name,
           {oround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 5-way join where the
    supplier join carries TWO conjuncts (l_suppkey = s_suppkey AND
    c_nationkey = s_nationkey) — the "local" constraint rides the same
    equi join, no extra shuffle or post-filter pass.  nation broadcasts;
    the year filter pushes to the orders scan and, through the join,
    prunes most of lineitem.  Final agg is 25 groups — pure map-side."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@REG.query(
    "tpch_q10_returned_topk",
    oracle=f"""
    SELECT c_custkey, c_name,
           {oround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue,
           c_acctbal
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter + returnflag
    filters push to their scans, customer-grain revenue agg, global
    top-20 as TakeOrderedAndProject (per-partition heaps, driver merge
    of 20xP rows — never a full sort).  Ordering on the UNROUNDED sum
    with a c_custkey tie-break keeps the cut deterministic; rounding
    happens only at the output edge."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
        .orderBy(F.desc("_rev"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("_rev", 2).alias("revenue"),
            "c_acctbal",
        )
    )


WEEK_MS = 7 * 86400 * 1000


@REG.query(
    "events_cohort_retention",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN(EPOCH_MS(ts) // {WEEK_MS}) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, EPOCH_MS(ts) // {WEEK_MS} AS week
      FROM events
    )
    SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
           CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen epoch-week,
    counted per (cohort, week-offset) cell.  The classic growth-
    analytics triangle, and a shuffle-reuse study: first_seen and the
    per-user-week DISTINCT both partial-aggregate on user_id, the join
    runs on that same key (no third repartition), and only the final
    tiny (cohort, offset) rollup re-shuffles.  Week ids use exact
    integer division of epoch millis (`div`) — engine-independent, no
    timezone/week-start semantics to disagree on."""
    events = read_table(spark, sf_dir, "events")
    week = F.expr(f"unix_millis(ts) div {WEEK_MS}")
    first_seen = (
        events.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    activity = events.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week"),
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@REG.query(
    "agg_unpivot",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag,
               {oround("SUM(l_quantity)")} AS sum_qty,
               {oround("SUM(l_extendedprice)")} AS sum_price,
               {oround("SUM(l_discount)")} AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt — the inverse of agg_pivot: wide measure columns
    become (metric, value) rows.  Spark's native unpivot plans a single
    Expand operator (each input row emitted k times, one per measure)
    in the same stage as the aggregate — NOT a k-way self-union, which
    would re-read the aggregate k times.  The oracle states the
    semantics as the equivalent UNION ALL over a shared CTE."""
    wide = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@REG.query(
    "sink_merge_upsert",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, 'delete' AS op,
               CAST(NULL AS VARCHAR) AS new_priority
        FROM orders WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT o_orderkey, 'update', '1-URGENT'
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'insert', '5-LOW'
        FROM orders WHERE o_orderkey % 10 = 2
    )
    SELECT t.o_orderkey,
           COALESCE(c.new_priority, t.o_orderpriority) AS o_orderpriority
    FROM orders t LEFT JOIN changes c USING (o_orderkey)
    WHERE c.op IS NULL OR c.op = 'update'
    UNION ALL
    SELECT o_orderkey, new_priority
    FROM changes WHERE op = 'insert'
    """,
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (upsert/delete/insert) into a snapshot — the table-
    maintenance primitive under every incremental 100 TB pipeline
    (Delta/Iceberg MERGE INTO, rewritten as plain DataFrame algebra):
    one LEFT join of the target to the (small) change set applies
    updates and filters deletes, a union appends inserts.  The change
    set is derived deterministically from orders itself so the oracle
    is self-contained.  At scale the change side is broadcast (CDC
    batches are tiny vs the table) — the target is never shuffled; with
    a partitioned target the join prunes to touched partitions only."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    deletes = orders.filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("new_priority"),
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.lit("update").alias("op"),
        F.lit("1-URGENT").alias("new_priority"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 10 == 2).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit("insert").alias("op"),
        F.lit("5-LOW").alias("new_priority"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    merged = (
        orders.join(F.broadcast(changes), "o_orderkey", "left")
        .filter(F.col("op").isNull() | (F.col("op") == "update"))
        .select(
            "o_orderkey",
            F.coalesce("new_priority", "o_orderpriority").alias("o_orderpriority"),
        )
    )
    return merged.unionByName(
        changes.filter(F.col("op") == "insert").select(
            "o_orderkey", F.col("new_priority").alias("o_orderpriority")
        )
    )


@REG.query(
    "sink_snapshot_diff",
    oracle="""
    WITH old_v AS (
      SELECT o_orderkey,
             MD5(CONCAT_WS('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                           o_orderpriority)) AS old_fp
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new_v AS (
      SELECT o_orderkey,
             MD5(CONCAT_WS('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                           CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
                                ELSE o_orderpriority END)) AS new_fp
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.old_fp IS NULL THEN 'added'
                WHEN n.new_fp IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.old_fp, n.new_fp
    FROM old_v o FULL OUTER JOIN new_v n USING (o_orderkey)
    WHERE o.old_fp IS NULL OR n.new_fp IS NULL OR o.old_fp <> n.new_fp
    """,
)
def sink_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the table-compare primitive lakehouses ship
    (Delta CDF reconstruction, Iceberg changelog scan, data-reconciled
    migrations): given two versions of a table, emit exactly the rows
    that were added, removed, or changed, identified by a row
    fingerprint.  Both versions derive deterministically from orders
    (old drops keys %97==0, new drops %89==0 and rewrites priority on
    %7==0) so the oracle is self-contained.  Fingerprints hash only
    integer/string columns rendered identically on both engines —
    float columns would need a cents-grain cast first (the oround
    discipline).

    Plan: ONE full-outer sort-merge join co-partitioned on the key,
    with the fingerprint computed map-side under the scan and the
    'unchanged' bulk (the overwhelming majority at 100 TB) filtered
    before anything else sees it.  Both sides shuffle once on the join
    key; on a bucketed/partitioned table both Exchanges disappear and
    the diff is a zip of co-located partitions.  The output is the CDC
    change set sink_merge_upsert applies — the two ops compose into
    snapshot-replicate.

    Round-8 measured rejection (kept for the record): a tagged-union +
    one-exchange hash-aggregation diff (pivot the two sides back with
    conditional max — legal because keys are unique per side) looks
    cheaper on paper (one Exchange, no sorts) but measured 6.1-11.0 s
    warm vs 4.0 s for this join at the 100x orders decade: with every
    key unique there is nothing for partial aggregation to reduce, so
    the hash aggregate buffers the full key space per partition while
    the sort-merge join streams it.  OPTIMIZATION_r08.md has the
    numbers."""
    orders = spread(read_table(spark, sf_dir, "orders"))
    k = F.col("o_orderkey")

    def fp(prio):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                prio,
            )
        )

    old_v = orders.filter(k % 97 != 0).select(
        "o_orderkey", fp(F.col("o_orderpriority")).alias("old_fp")
    )
    new_v = orders.filter(k % 89 != 0).select(
        "o_orderkey",
        fp(
            F.when(k % 7 == 0, F.lit("1-URGENT")).otherwise(
                F.col("o_orderpriority")
            )
        ).alias("new_fp"),
    )
    return (
        old_v.join(new_v, "o_orderkey", "full_outer")
        .filter(
            F.col("old_fp").isNull()
            | F.col("new_fp").isNull()
            | (F.col("old_fp") != F.col("new_fp"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("old_fp").isNull(), "added")
            .when(F.col("new_fp").isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            "old_fp",
            "new_fp",
        )
    )


@REG.query(
    "scd2_validity_windows",
    oracle="""
    SELECT user_id, event_type,
           CAST(EPOCH_MS(ts) AS BIGINT) AS valid_from_ms,
           CAST(EPOCH_MS(LEAD(ts) OVER w) AS BIGINT) AS valid_to_ms,
           value AS attr_value,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM events
    WHERE user_id < 200
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def scd2_validity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: each change event opens a validity
    interval closed by the NEXT change of the same (entity, attribute)
    — lead() over an entity-partitioned window; the open interval is
    the current row.  One shuffle on the entity key, arbitrarily many
    attributes ride the same window.  The warehouse pattern for
    dimension history at 100 TB (ties to events_sessionize's lag
    mirror).  event_id tiebreaks equal timestamps so the interval
    chain is deterministic."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    # unix_millis, never (ts.cast('double') * 1000): the double product
    # can round one ms low on ms-aligned timestamps in other epoch
    # ranges — EPOCH_MS/unix_millis is the proven-portable pair
    return ev.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        F.col("value").alias("attr_value"),
        nxt.isNull().alias("is_current"),
    )


@REG.query(
    "join_scd2_pointintime",
    oracle="""
    WITH dim AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE user_id < 200 AND event_type = 'view'
    ),
    facts AS (
      SELECT user_id, ts, event_id FROM events
      WHERE user_id < 200 AND event_type = 'purchase'
    ),
    matched AS (
      SELECT f.user_id, f.event_id AS purchase_id,
             CAST(EPOCH_MS(f.ts) AS BIGINT) AS purchase_ms,
             d.value AS version_value,
             CAST(EPOCH_MS(d.ts) AS BIGINT) AS valid_from_ms,
             ROW_NUMBER() OVER (
               PARTITION BY f.event_id
               ORDER BY d.ts DESC NULLS LAST, d.event_id DESC
             ) AS rn
      FROM facts f
      LEFT JOIN dim d ON d.user_id = f.user_id AND d.ts <= f.ts
    )
    SELECT user_id, purchase_id, purchase_ms, version_value, valid_from_ms
    FROM matched WHERE rn = 1
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: each fact row (purchase) picks up the
    dimension version (that user's latest 'view' attribute) valid AT
    the fact's timestamp — the temporal dimension join every warehouse
    runs against its Type-2 history, and the consumer of the intervals
    scd2_validity_windows builds.  Equal timestamps resolve dim-first
    (valid_from is inclusive), event_id breaks change ties, and facts
    before any version keep a NULL version (left semantics).

    Execution is the join_asof discipline, NOT the oracle's range
    join: dim changes and facts union into one stream tagged so dim
    sorts first at equal ts, ONE shuffle on the entity key, and
    last(value, ignorenulls) over the entity-ordered window carries
    the current version forward onto every fact row.  Cost is one
    sort-shuffle of changes+facts regardless of how many facts share a
    version — where the naive range join pays |facts| x |versions|
    per entity.  At 100 TB the same tagged union bucket-sorts by
    entity; whale entities split with the asof family's range-binned
    variant."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    dim = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        F.col("value").alias("version_value"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast(dim.schema["version_value"].dataType).alias(
            "version_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the WHOLE version row as one struct: a version whose value
    # is legitimately NULL must still win (last(value, ignorenulls)
    # would skip it and pair a stale value with the newer valid_from)
    version = F.when(
        F.col("tag") == 0,
        F.struct(F.col("ts").alias("vts"), F.col("version_value").alias("vv")),
    )
    tagged = dim.unionByName(facts).select(
        "user_id",
        "ts",
        "tag",
        "event_id",
        F.last(version, ignorenulls=True).over(w).alias("ver"),
    )
    return tagged.filter(F.col("tag") == 1).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("ver.vv").alias("version_value"),
        F.unix_millis("ver.vts").alias("valid_from_ms"),
    )


@REG.query(
    "quality_audit_constraints",
    oracle="""
    SELECT 'orders_null_key' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_total',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_dup_key',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    FROM lineitem
    """,
)
def quality_audit_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (expectations): one row per constraint with
    its violation count — null keys, domain ranges, key uniqueness, and
    referential integrity (orphan foreign keys via anti join).  The
    pre-ingest gate a 100 TB pipeline runs before publishing a
    snapshot.  Per-table rules collapse into ONE aggregate pass per
    table (conditional counts share the scan); the referential rule is
    a broadcast-able anti join.  All counts are integer-exact."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    big = F.lit(None).cast("bigint")

    o_rules = orders.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("orders_null_key"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "orders_nonpositive_total"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orders_dup_key"),
    )
    l_rules = lineitem.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("lineitem_discount_range")
    )
    orphans = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("lineitem_orphan_orderkey").alias("rule"),
            F.col("n").cast("bigint").alias("n_violations"),
        )
    )
    wide = o_rules.crossJoin(F.broadcast(l_rules))
    tall = wide.unpivot(
        ids=[], values=None, variableColumnName="rule",
        valueColumnName="n_violations",
    ).select("rule", F.col("n_violations").cast("bigint").alias("n_violations"))
    return tall.unionByName(orphans)


#: Per-user item cap before the pair self-join — the knob that bounds
#: events_item_cooccurrence at scale (pairs grow as cap^2, not events^2).
COOC_USER_CAP = 64


@REG.query(
    "events_item_cooccurrence",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT user_id,
             TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NOT NULL
    ),
    capped AS (
      SELECT user_id, item FROM (
        SELECT user_id, item,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rk
        FROM items
      ) WHERE rk <= {COOC_USER_CAP}
    )
    SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_users
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= 2
    """,
)
def events_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence counts (the "users who touched A also
    touched B" recommender / co-click matrix) from the events stream,
    with the item id parsed out of the JSON props payload.

    The scale hazard in any co-occurrence job is the per-user self-join:
    pairs grow quadratically in basket size, so one bot user with 10^5
    items would emit 10^10 rows.  The standard control is applied here —
    baskets are capped to COOC_USER_CAP items per user (row_number over
    the user partition) BEFORE the self-join, making the blowup bounded
    by cap^2 per user regardless of skew.  The self-join shuffles both
    sides on user_id once (same key → one exchange per side), and the
    final (item_a, item_b) count is partial-aggregated map-side.

    Served from ensure_item_edges: the edge build (the dominant stage —
    42 s cold at 100×) is paid once per (session, corpus) and shared by
    every graph consumer (PageRank, triangles, degree distribution)."""
    return ensure_item_edges(spark, sf_dir)


#: session-scoped item co-occurrence edge lists, keyed by
#: (applicationId, sf_dir) — same amortization discipline as
#: ensure_bucketed_facts / ensure_bpe_table / the shared band index.
_ITEM_EDGES_CACHE: dict = register_cache({})


def ensure_item_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the capped item co-occurrence edge list ONCE per (session,
    corpus), cache it, and hand the same DataFrame to every consumer.

    The co-click graph is shared substructure: events_item_cooccurrence
    returns it verbatim and graph_pagerank / graph_triangle_count /
    graph_degree_distribution all start from it.  Before this memo each
    consumer re-planned the whole capped per-user self-join from cold —
    42 s at 100× PER CONSUMER, and PageRank (the bench's slowest query)
    paid it before iterating.  Keyed by applicationId (not id(spark)):
    a recycled object address after a session restart must not
    resurrect DataFrames bound to the dead session.

    Columns: (item_a, item_b, n_users) with item_a < item_b and
    n_users >= 2 — the canonical undirected form; direction-needing
    consumers symmetrize map-side (explode of a 2-struct array)."""
    key = memo_key(spark, sf_dir)
    cached = _ITEM_EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    out = _item_cooccurrence_plan(spark, sf_dir).cache()
    _ITEM_EDGES_CACHE[key] = out
    return out


#: session-scoped (sym_edges, out_deg, nodes) triple for the directed
#: view of the co-click graph, derived from ensure_item_edges.
_SYM_EDGES_CACHE: dict = register_cache({})


def _ensure_sym_edges(spark: SparkSession, sf_dir: str):
    """Symmetrized (src, dst) edges + out-degrees + node set, cached
    once per (session, corpus) on top of ensure_item_edges.

    Symmetrize by exploding each pair into both directions MAP-SIDE (a
    union of pairs with its own mirror computes the co-occurrence
    self-join twice when the cache materializes — measured ~2x the cold
    build cost of the dominant stage).  The degree side is |items| rows
    — catalog-sized, orders of magnitude under the edge list — so
    out_deg KEEPS an explicit broadcast hint where PageRank joins it.
    The rank/contrib relations carry NO hints since round 8 (97d8d0a):
    forcing them broadcast was a driver-OOM cliff at catalog scale and
    the idle re-sweep measured AQE's own choices equal-or-better, so
    each iteration lets AQE pick the strategy for the dst-key gather.
    Memoized so repeated PageRank runs in a session don't pin a fresh
    cached symmetrization each call."""
    key = memo_key(spark, sf_dir)
    cached = _SYM_EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = ensure_item_edges(spark, sf_dir).select("item_a", "item_b")
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
                    ),
                    F.struct(
                        F.col("item_b").alias("src"), F.col("item_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .cache()
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    # every node appears as src (edges are symmetric), so the degree
    # table's key set IS the node set — no second distinct pass
    nodes = out_deg.select(F.col("src").alias("item")).cache()
    triple = (edges, out_deg, nodes)
    _SYM_EDGES_CACHE[key] = triple
    return triple


def _item_cooccurrence_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    items = ev.select(
        "user_id",
        # try_cast: a malformed item id is dropped by the NotNull
        # filter instead of aborting the job under ANSI
        F.get_json_object("props", "$.k").try_cast("bigint").alias("item"),
    ).filter(F.col("item").isNotNull())
    # Round-8 measured rejection (kept for the record): replacing the
    # capped self-join below with a map-side basket expansion
    # (collect_list per user after the window cap, then a nested
    # transform/slice emitting the item_a < item_b pairs in-row)
    # removes the b-side re-derivation and the broadcast build — but
    # measured 18.9 s vs 9.5 s for this join at the 100x events decade
    # (warm page cache, same session shape): per-row construction of
    # up-to-cap^2 struct arrays costs more than the hash join it
    # replaces.  The distinct ALSO stays a separate (user, item)-keyed
    # exchange on purpose — its partial aggregation dedups map-side,
    # so a bot user with 10^6 copies of one item ships one row per map
    # partition.  OPTIMIZATION_r08.md has the numbers.
    w = Window.partitionBy("user_id").orderBy("item")
    capped = (
        items.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= COOC_USER_CAP)
        .drop("rk")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= 2)
    )


@REG.query(
    "events_activity_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    deciled AS (
      SELECT user_id, n_events,
             NTILE(10) OVER (ORDER BY n_events DESC, user_id) AS decile
      FROM per_user
    ),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM per_user)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_events) AS DOUBLE) / n_total AS share
    FROM deciled, tot
    GROUP BY decile, n_total
    """,
)
def events_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (Pareto accounting): rank users by event
    volume, cut into deciles, and report each decile's share of total
    events — the "do 10% of users generate 90% of traffic?" question
    that decides skew handling (salting thresholds, per-user caps like
    COOC_USER_CAP) and abuse review.

    Scale shape: the raw stream collapses to the per-user grain in one
    keyed partial-agg shuffle; NTILE then runs over USERS, not events
    (the RFM aggregate-then-rank discipline), and the decile report is
    10 rows.  For user counts where even the reduced grain makes a
    global NTILE window painful, the documented swap is
    approx-percentile volume bounds + map-side decile assignment —
    exactly events_rfm_scaled's move.  The share division is a single
    exact-integer-over-integer IEEE op, bit-identical across engines."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.desc("n_events"), F.col("user_id"))
    deciled = per_user.withColumn("decile", F.ntile(10).over(w))
    tot = per_user.agg(F.sum("n_events").cast("bigint").alias("n_total"))
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_total")).alias(
                "share"
            ),
        )
    )


@REG.query(
    "events_adoption_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS day
      FROM events GROUP BY user_id, event_type
    ),
    daily_new AS (
      SELECT event_type, day, COUNT(*) AS new_users
      FROM first_seen GROUP BY event_type, day
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily_new
    """,
)
def events_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature adoption curves: per (event_type, day), how many users
    performed that action for the FIRST time, and the running total of
    users who have ever done so — the growth-accounting complement of
    stream_daily_active (per-day actives, no history) and of
    events_cohort_retention (which tracks return visits, not feature
    uptake).

    Scale shape: first-seen is one (user, type)-keyed MIN aggregate
    over the raw stream (the only full shuffle), daily_new reduces it
    to the (type, day) grain, and the running sum is a window over
    |types| x |days| rows — partitioned by event_type, and cheap by
    construction because its input is the reduced daily relation,
    never the events (the events_moving_median argument).  At 100 TB
    the first-seen relation is what a pipeline persists and merges
    incrementally per day; the curve rebuild stays |types|·|days|-cheap
    forever."""
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id", "event_type").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily_new = first_seen.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


TRENDING_WINDOW_DAYS = 7
TRENDING_TOPK = 5


@REG.query(
    "events_trending_topk",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS item,
             COUNT(*) AS c
      FROM events
      WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NOT NULL
      GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM daily),
    w AS (
      SELECT d.day, x.item, CAST(SUM(x.c) AS BIGINT) AS w7
      FROM days d
      JOIN daily x ON x.day BETWEEN d.day - {TRENDING_WINDOW_DAYS - 1}
                               AND d.day
      GROUP BY d.day, x.item
    )
    SELECT day, item, w7, CAST(rk AS INT) AS rk FROM (
      SELECT day, item, w7,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY w7 DESC, item) AS rk
      FROM w
    ) WHERE rk <= {TRENDING_TOPK}
    """,
)
def events_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending leaderboard: for every observed day, the top-5 items by
    TRAILING-7-day event count — the "what's hot now" rollup every
    activity product serves, and a different composition than the
    existing window ops: a sliding aggregate whose OUTPUT is a per-day
    ranking, not a per-row smoothing.

    Scale shape (the events_sliding_distinct move): the oracle defines
    it as days x daily-counts range join, but executing that directly
    costs |days| x |daily| pairs.  Instead each (day, item, cnt) row
    CONTRIBUTES forward to the 7 leaderboard days it can influence —
    a bounded 7-row explode on the already-reduced daily grain — and
    one (day, item) re-aggregation materializes every trailing sum in
    O(7 * daily rows), independent of the window length's day span.
    The contribute-days that fall past the last observed day are
    dropped by a broadcast semi join against the distinct-days
    relation.  The final rank runs per day over at most |items| rows —
    leaderboard grain, thousands of times smaller than the event
    stream."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.get_json_object("props", "$.k").try_cast("bigint").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .groupBy("day", "item")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(TRENDING_WINDOW_DAYS - 1))
        ).alias("off"),
        "day",
        "item",
        "c",
    ).select(F.expr("date_add(day, off)").alias("day"), "item", "c")
    w7 = (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day", "item")
        .agg(F.sum("c").cast("bigint").alias("w7"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("w7"), F.col("item"))
    return (
        w7.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TRENDING_TOPK)
        .select("day", "item", "w7", "rk")
    )


@REG.query(
    "quality_winsorize",
    oracle=f"""
    WITH bounds AS (
      SELECT l_returnflag,
             QUANTILE_CONT(l_quantity, 0.05) AS lo,
             QUANTILE_CONT(l_quantity, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN l_quantity > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           {oround("SUM(GREATEST(lo, LEAST(hi, l_quantity)))")} AS sum_winsorized
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (percentile outlier clipping): clamp each value to
    its group's exact [p05, p95] band and report clip counts + the
    clipped sum — the standard numeric-feature cleanup before training.

    Two-pass shape: pass 1 computes per-group exact percentiles (output
    is group-grain, tiny), which broadcast-join back onto the fact for
    a map-side clamp + re-aggregate — the fact table shuffles once for
    each grouped agg and never for the bounds join.  At 100 TB swap
    percentile → percentile_approx (mergeable t-digest, map-side
    partial) and nothing else changes; the exact form is used here
    because sketches aren't engine-portable for the oracle."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    bounds = lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.05).alias("lo"),
        F.percentile("l_quantity", 0.95).alias("hi"),
    )
    clipped = lineitem.join(F.broadcast(bounds), "l_returnflag")
    win = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("l_quantity")))
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity") < F.col("lo")).cast("bigint")).alias(
            "n_clipped_low"
        ),
        F.sum((F.col("l_quantity") > F.col("hi")).cast("bigint")).alias(
            "n_clipped_high"
        ),
        F.round(F.sum(win), 2).alias("sum_winsorized"),
    )


@REG.query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS prob
    FROM trans
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the statistic under
    next-action prediction, funnel diagnosis, and bot detection.

    ONE user_id shuffle does all the sequencing (lag window); the
    transition count then aggregates on a key space that is |types|²
    — tiny regardless of corpus size — so the second exchange moves
    kilobytes at any SF.  The normalizing window runs on that tiny
    aggregate, not the raw events.  Tie-break on event_id makes the
    sequence deterministic under equal timestamps in both engines."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm)).alias("prob"),
    )


@REG.query(
    "events_rfm_segments",
    prod_twin="events_rfm_scaled",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(EPOCH_MS(MAX(ts)) AS BIGINT) AS last_seen_ms,
             COUNT(*) AS frequency,
             {oround("SUM(value)")}
               AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, last_seen_ms, frequency, monetary,
           NTILE(4) OVER (ORDER BY last_seen_ms DESC, user_id) AS r_quartile,
           NTILE(4) OVER (ORDER BY frequency DESC, user_id)    AS f_quartile,
           NTILE(4) OVER (ORDER BY monetary DESC, user_id)     AS m_quartile,
           CONCAT(NTILE(4) OVER (ORDER BY last_seen_ms DESC, user_id),
                  NTILE(4) OVER (ORDER BY frequency DESC, user_id),
                  NTILE(4) OVER (ORDER BY monetary DESC, user_id)) AS segment
    FROM per_user
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic user-value stratification, and the canonical "aggregate then
    re-rank the aggregate" two-phase shape.

    Phase 1 is the only full-data shuffle (user_id partial agg); the
    NTILE windows run over the per-user aggregate, which is |users|
    rows — at 100 TB of events with 10^8 users that is still a single
    executor's worth per quartile pass, and the three windows share one
    global sort via AQE.  For a truly huge user dimension the quartile
    boundaries would come from approx_percentile + a broadcast range
    join instead; NTILE keeps the oracle exact here.  user_id tie-break
    makes every quartile assignment engine-deterministic."""
    events = read_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.unix_millis(F.max("ts")).alias("last_seen_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    wr = Window.orderBy(F.col("last_seen_ms").desc(), F.col("user_id"))
    wf = Window.orderBy(F.col("frequency").desc(), F.col("user_id"))
    wm = Window.orderBy(F.col("monetary").desc(), F.col("user_id"))
    r, f_, m = F.ntile(4).over(wr), F.ntile(4).over(wf), F.ntile(4).over(wm)
    return per_user.select(
        "user_id",
        "last_seen_ms",
        "frequency",
        "monetary",
        r.alias("r_quartile"),
        f_.alias("f_quartile"),
        m.alias("m_quartile"),
        F.concat(
            r.cast("string"), f_.cast("string"), m.cast("string")
        ).alias("segment"),
    )


@REG.query(
    "agg_histogram_equiwidth",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 AS bucket_lo,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice (5000-wide buckets):
    the profiling primitive behind data-distribution dashboards and
    skew diagnosis.  Bucket id is pure column math so the whole
    histogram is one partial-agg shuffle over ~tens of bucket keys —
    the reduce side is constant-size no matter the SF.  min/max per
    bucket ride the same aggregate for free (floats compare exactly,
    no rounding needed)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0)
    return (
        lineitem.groupBy(
            bucket.alias("bucket"),
            (bucket * 5000.0).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@REG.query(
    "sample_stratified_topk",
    oracle=f"""
    WITH ranked AS (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY {knuth_hash_sql('event_id')},
                        event_id
             ) AS rk
      FROM events
    )
    SELECT event_id, user_id, event_type, value
    FROM ranked WHERE rk <= 100
    """,
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-size sample: exactly 100 rows per event_type,
    chosen by Knuth-multiplicative hash order — a deterministic,
    engine/cluster-invariant stand-in for per-stratum reservoir
    sampling (same contract as rand()-based sampleBy but reproducible,
    so train/eval samples survive re-runs and engine swaps).

    One shuffle on the stratum key; row_number keeps only rank <= k so
    no stratum ever materializes unbounded state.  At 100 TB with a
    low-cardinality stratum column, the hash-order rank is the skew
    concern — the production variant pre-filters with an approximate
    per-stratum hash-threshold (keep h < k/N_stratum * 2^31 with a
    safety factor, one broadcast of per-stratum counts) so the window
    sees ~k rows per stratum instead of all of them; the window form
    here keeps the oracle exact."""
    events = read_table(spark, sf_dir, "events")
    h = knuth_hash(F.col("event_id"))
    # Two-phase rank: a stratum column with 5 values caps a single
    # global-window pass at 5-way parallelism (measured 15x at 20x
    # data).  Phase 1 pre-ranks within (stratum, salt-of-32) — full
    # cluster parallelism — and keeps per-salt rank <= k, a guaranteed
    # superset of the global top-k (any global top-k row has < k rows
    # before it in its own salt subset).  Phase 2 ranks the <= 32*k
    # survivors per stratum.  Deterministic: the salt is a hash of the
    # row id, not spark_partition_id, so results are engine/cluster
    # invariant and the oracle (single global window) is unchanged.
    salt = F.pmod(F.xxhash64("event_id"), F.lit(32))
    w_pre = Window.partitionBy("event_type", salt).orderBy(h, "event_id")
    w = Window.partitionBy("event_type").orderBy(h, "event_id")
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .withColumn("pre_rk", F.row_number().over(w_pre))
        .filter(F.col("pre_rk") <= 100)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
        .drop("pre_rk", "rk")
    )


#: Per-source sample size for the weighted reservoir.
WEIGHTED_SAMPLE_K = 50


@REG.query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS weight,
             {oround(
                 "-LN(CAST((doc_id % 2147483648) * 2654435761 "
                 "% 2147483648 + 1 AS DOUBLE) / 2147483649.0) "
                 "/ CAST(n_chars AS DOUBLE)",
                 6,
             )} AS skey
      FROM documents
      WHERE n_chars > 0 AND doc_id IS NOT NULL
    )
    SELECT source, doc_id, weight, skey,
           CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY skey, doc_id
             ) AS rk
      FROM keyed
    )
    WHERE rk <= {WEIGHTED_SAMPLE_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement, k per source — the
    Efraimidis-Spirakis exponential-key scheme (A-ES): every doc draws
    key = -ln(u)/w (an Exponential(w) variate) and the k SMALLEST keys
    per source are the sample, which selects without replacement with
    inclusion probability proportional to weight.  The property the
    uniform samplers (sample_deterministic / stratified / temperature)
    cannot give: length- or quality-weighted token budgets ("sample
    docs proportional to n_chars") while staying a true
    without-replacement sample.  Bonus the exponential keys buy for
    free: ordering by key is a weighted PERMUTATION, so ANY prefix of
    the ranked output is itself a correct weighted sample — shrinking
    a 50-doc sample to 10 needs no recomputation, just sample_rank <=
    10.

    Deterministic and engine-invariant: u comes from the Knuth
    multiplicative hash of doc_id mapped to (0, 1] — the doc_id is
    reduced mod 2^31 BEFORE the multiply so the product stays in
    int64 for any doc_id (the mix_budget_apportion overflow
    discipline: DuckDB raises on int64 overflow, Spark wraps
    silently).  The one libm call (-ln(u)/w) rounds to 6 decimals on
    both engines (the tfidf precedent), ties broken by doc_id, so
    selection is bit-reproducible cross-engine.

    Plan: map-only key computation, then the sample_stratified_topk
    two-phase rank — phase 1 ranks within (source, salt-of-32) at
    full cluster parallelism and keeps rank <= k (a guaranteed
    superset of the global per-source top-k), phase 2 ranks the
    <= 32k survivors; no stratum ever sorts its full history in one
    task."""
    docs = read_table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") > 0) & F.col("doc_id").isNotNull()
    )
    h = (F.col("doc_id") % F.lit(2147483648)) * F.lit(
        2654435761
    ) % F.lit(2147483648)
    u = (h + F.lit(1)).cast("double") / F.lit(2147483649.0)
    skey = F.round(
        -F.log(u) / F.col("n_chars").cast("double"), 6
    )
    keyed = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("double").alias("weight"),
        skey.alias("skey"),
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(32))
    w_pre = Window.partitionBy("source", salt).orderBy("skey", "doc_id")
    w = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("pre_rk", F.row_number().over(w_pre))
        .filter(F.col("pre_rk") <= WEIGHTED_SAMPLE_K)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WEIGHTED_SAMPLE_K)
        .select(
            "source",
            "doc_id",
            "weight",
            "skey",
            F.col("rk").cast("bigint").alias("sample_rank"),
        )
    )


@REG.query(
    "quality_corpus_datasheet",
    oracle=f"""
    WITH feats AS (
      SELECT source, lang, n_chars, MD5(text) AS h,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(FLOOR(({QUALITY_SQL}) * 1000000) AS BIGINT) AS qmicro
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           MEDIAN(n_chars) AS med_chars,
           CAST(SUM(qmicro) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_quality,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM feats
    GROUP BY source
    """,
)
def quality_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet — the one-page "data card" a dataset
    release ships: document and token volume, language spread, median
    document length, mean quality score, and the exact-duplicate rate,
    one row per source.  This is the report that decides which crawls
    enter the mix before any expensive near-dup pass runs.

    Exactness: the mean quality is an exact integer mean — each doc's
    quality (the text_quality_score formula, identical doubles both
    engines) is FLOORed to integer micro-units, so the per-source SUM
    is order-independent and the mean is two exact divisions in fixed
    order; medians average two identical ints; the dup rate counts
    DISTINCT MD5 (same digest function both engines).

    Plan: one map pass computes the per-doc features, then ONE
    partial-agged shuffle at source grain.  The two exact
    count-distincts (lang, hash) expand the aggregate like the exact
    column profile; quality_column_profile_scaled documents the
    approx_count_distinct swap when source cardinality times hash
    cardinality stresses the Expand."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    quality = quality_expr(toks)
    feats = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.floor(quality * 1000000).cast("bigint").alias("qmicro"),
    )
    n = F.count(F.lit(1))
    return feats.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.median("n_chars").alias("med_chars"),
        (F.sum("qmicro").cast("double") / n / F.lit(1000000.0)).alias(
            "mean_quality"
        ),
        (n - F.count_distinct("h")).alias("n_exact_dups"),
        ((n - F.count_distinct("h")).cast("double") / n).alias("dup_rate"),
    )


@REG.query(
    "quality_column_profile",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_non_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(l_tax),
           COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax)
    FROM lineitem
    """,
    prod_twin="quality_column_profile_scaled",
)
def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling (null count, distinct count, range)
    for the numeric lineitem measures — the first thing any ingest
    pipeline computes on a new dataset.

    All four columns profile in ONE scan and one aggregation: the
    per-column stats are parallel agg expressions, then a stack()
    unpivot reshapes to one row per column — versus the naive
    UNION-of-four-scans the oracle spells out (DuckDB reads the
    parquet four times there; Spark reads it once here).  count
    distinct over multiple columns in one pass uses Spark's Expand
    under the hood — at 100 TB swap to approx_count_distinct per
    column and the plan collapses to plain partial aggs."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    wide = lineitem.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column_name, n_rows, n_non_null, n_distinct, min_val, max_val)"
        )
    )


@REG.query("quality_column_profile_scaled")  # rows-only: HLL++ estimates are engine-specific
def quality_column_profile_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION twin of quality_column_profile: the four exact
    count-distincts are the teaching form's 100 TB cliff — multi-column
    exact distinct plans an Expand (every input row replicated once per
    counted column, 4x the shuffle here) and keeps full distinct sets
    in the aggregation state.  The profile's consumer (does this column
    look like an enum? an id? a measure?) needs cardinality CLASS, not
    an exact count, so the scaled form swaps in approx_count_distinct
    (HyperLogLog++, default rsd 5%): the plan collapses to plain
    partial aggs — no Expand (asserted in tests/test_plans.py), state
    is a fixed-size sketch per column, shuffle is one 1-row partial per
    partition regardless of cardinality.  Estimates are pinned within
    10% of the exact counts in the same test.  Rows-only registration:
    HLL++ estimates are engine-specific by nature."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    wide = lineitem.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column_name, n_rows, n_non_null, n_distinct_approx, "
            "min_val, max_val)"
        )
    )


@REG.query(
    "events_audience_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both AS BIGINT) AS n_both,
           CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: pairwise Jaccard similarity of the user
    sets behind every pair of event types — the measurement behind "do
    purchasers also file errors", feature-bundling decisions, and
    channel-cannibalization analyses.  Exact integer set sizes; the
    one float division is the Jaccard ratio itself.

    Plan: events reduce once to the DISTINCT (type, user) relation;
    the pair intersection is a self-join on user_id whose per-user
    fan-out is bounded by the TYPE universe (|types|^2 rows max per
    user — structurally capped, unlike item co-occurrence where a cap
    must be imposed), and set sizes join back as a |types|-row
    broadcast.  At 100 TB with a large type universe the per-user
    explosion cap (events_item_cooccurrence's COOC_USER_CAP) and the
    HLL sketch form (agg_hll_union_rollup) are the documented swaps."""
    ev = read_table(spark, sf_dir, "events")
    # Per-user type set in ONE user-keyed exchange: collect_set's
    # partial aggregation dedups map-side, so the shuffle carries at
    # most |types| entries per user per map partition — strictly fewer
    # bytes than the old DISTINCT's (type, user) rows.  The basket is
    # bounded by the type universe, so no cap is needed.
    baskets = (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("ts"))
    )
    # Pairs AND per-type size markers emitted map-side from the same
    # basket (guide §2.3/§2.4 — the old form paid the self-join's
    # second sort + broadcast build + probe, plus a separate exchange
    # for the size aggregation): each type x contributes a (x, NULL)
    # marker counting the user toward |audience(x)|, and each sorted
    # strict-suffix pair (x, y) counts the intersection.  One pair-
    # keyed exchange aggregates both; AQE reuses it for the two tiny
    # broadcast-side branches below.
    #
    # NULL-user semantics (ADVICE r8): the oracle's DISTINCT relation
    # keeps (type, NULL) rows — they count toward audience sizes — but
    # its self-join on a.user_id = b.user_id can never match NULL, so
    # the merged NULL basket Spark's groupBy builds must emit size
    # markers ONLY, never intersection pairs.  The pair slice's length
    # collapses to 0 for the NULL basket (slice keeps the struct array
    # type, unlike an untyped empty-array CASE branch).
    emitted = F.explode(
        F.expr(
            "flatten(transform(ts, (x, i) -> concat("
            "array(struct(x AS type_a, CAST(NULL AS STRING) AS type_b)), "
            "transform(slice(ts, i + 2, "
            "IF(user_id IS NULL, 0, size(ts) - i - 1)), "
            "y -> struct(x AS type_a, y AS type_b)))))"
        )
    ).alias("p")
    counts = (
        baskets.select(emitted)
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count(F.lit(1)).alias("n"))
        # |types|^2 rows, referenced three times (intersection + both
        # broadcast size sides) — materialize once
        .localCheckpoint(eager=True)
    )
    inter = counts.filter(F.col("type_b").isNotNull()).select(
        "type_a", "type_b", F.col("n").alias("n_both")
    )
    sizes = counts.filter(F.col("type_b").isNull()).select(
        F.col("type_a").alias("event_type"), "n"
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("event_type", "type_a")),
            "type_a",
        )
        .withColumnRenamed("n", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("event_type", "type_b")),
            "type_b",
        )
        .withColumnRenamed("n", "n_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


@REG.query(
    "events_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT d.event_type,
           COUNT(*) AS n_days,
           CAST(SUM(ABS(d.n - l7.n)) AS BIGINT) AS sae_7d,
           CAST(SUM(ABS(d.n - l1.n)) AS BIGINT) AS sae_1d,
           CAST(SUM(ABS(d.n - l7.n)) AS DOUBLE) / COUNT(*) AS mae_7d,
           CAST(SUM(ABS(d.n - l1.n)) AS DOUBLE) / COUNT(*) AS mae_1d
    FROM daily d
    JOIN daily l7 ON l7.event_type = d.event_type
                 AND l7.day = d.day - 7
    JOIN daily l1 ON l1.event_type = d.event_type
                 AND l1.day = d.day - 1
    GROUP BY d.event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — before anyone ships a traffic
    forecast, this is the baseline it must beat: predict each day's
    per-type event count with (a) the count 7 days earlier and (b) the
    count 1 day earlier, and report the mean absolute error of both
    over every day where both references exist (same day set, so the
    comparison is fair).  mae_7d << mae_1d is the measurable signature
    of weekly seasonality (the events_seasonality_profile grain put to
    work); integer counts make the SAE sums exact and the MAE a single
    division.

    Plan: events reduce ONCE to the (type, day) grain — everything
    after runs on ~types x days rows.  The two lag references are
    equi-joins on (type, day-k) arithmetic, not LAG windows: calendar
    gaps must exclude a day from the backtest, while LAG(n, k) would
    silently compare against the k-th previous OBSERVED day — a wrong
    number precisely when traffic dropped out, the case a forecast
    audit exists to catch."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    d = daily.alias("d")
    l7 = daily.alias("l7")
    l1 = daily.alias("l1")
    joined = d.join(
        l7,
        (F.col("l7.event_type") == F.col("d.event_type"))
        & (F.col("l7.day") == F.date_sub(F.col("d.day"), 7)),
    ).join(
        l1,
        (F.col("l1.event_type") == F.col("d.event_type"))
        & (F.col("l1.day") == F.date_sub(F.col("d.day"), 1)),
    )
    sae7 = F.sum(F.abs(F.col("d.n") - F.col("l7.n")))
    sae1 = F.sum(F.abs(F.col("d.n") - F.col("l1.n")))
    return joined.groupBy(F.col("d.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_days"),
        sae7.alias("sae_7d"),
        sae1.alias("sae_1d"),
        (sae7.cast("double") / F.count(F.lit(1))).alias("mae_7d"),
        (sae1.cast("double") / F.count(F.lit(1))).alias("mae_1d"),
    )


@REG.query(
    "events_anomaly_mad",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {oround("SUM(value)")}
               AS day_total
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (
      SELECT event_type, MEDIAN(day_total) AS med
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.day_total, m.med,
             ABS(d.day_total - m.med) AS abs_dev
      FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, MEDIAN(abs_dev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.day_total, d.med, a.mad
    FROM dev d JOIN mad a USING (event_type)
    WHERE ABS(d.day_total - d.med) > 3 * a.mad
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on daily per-type revenue: flag days
    whose total deviates from the median by more than 3 median-absolute-
    deviations.  MAD instead of stddev because outliers are exactly what
    we're hunting — they'd inflate a stddev threshold and mask
    themselves.

    The raw-events shuffle happens once (daily partial agg); both
    medians and the flagging then run on the (event_type, day) grain —
    a few thousand rows per year regardless of SF, so the two
    median aggs and broadcast joins back are noise.  All arithmetic is
    +/-/abs on already-rounded doubles, bit-identical across engines;
    MEDIAN over even counts averages two doubles, same IEEE op both
    sides."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_total"))
    med = daily.groupBy("event_type").agg(F.median("day_total").alias("med"))
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("day_total") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("abs_dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("day_total") - F.col("med")) > 3 * F.col("mad"))
        .select("event_type", "day", "day_total", "med", "mad")
    )


@REG.query(
    "agg_median_twolevel",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    )
    SELECT COUNT(*) AS n_rows,
           MEDIAN(c) AS median_cents,
           MEDIAN(c) / 100.0 AS median_price
    FROM cents
    """,
)
def agg_median_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-grain median without a global sort — the two-level
    selection pattern (mix_token_budget_select's move, applied to order
    statistics): (1) one partial-agged pass reduces 60M prices to a
    ~1000-row value-bucket histogram; (2) the running count over THAT
    relation locates which bucket holds each middle position; (3) only
    the boundary bucket's rows (~1/1000th of the corpus) are sorted,
    and the k-th element is read off by row_number.  The oracle is
    DuckDB's MEDIAN; Spark never materializes a global ORDER BY.

    Exactness: prices quantize to integer CENTS (exact for 2-dp money,
    where raw double pennies are not binary-representable), both middle
    elements are exact integers, and the even-count interpolation is
    one exact halving of a < 2^53 integer sum — bit-identical to
    DuckDB's a/2 + b/2 interpolation on the same rationals.

    At 100 TB this is THE way to exact percentiles on a fact table:
    histogram passes are map-side combinable, the bucket relation is
    broadcast-sized, and the only sort touches one bucket (recurse the
    same split inside a hot bucket).  approx_percentile trades this
    exactness for one pass; quality gates that CUT on the boundary
    (winsorize, adaptive length filters) often can't afford the
    approximation — this op is their primitive."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    bsize = 10000  # $100-wide buckets -> ~1k buckets over the price range
    bcnt = (
        li.groupBy((F.col("c") / bsize).cast("bigint").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    prev_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    all_w = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    marked = bcnt.select(
        "b",
        "cnt",
        F.coalesce(F.sum("cnt").over(prev_w), F.lit(0))
        .cast("bigint")
        .alias("prev"),
        F.sum("cnt").over(all_w).cast("bigint").alias("n"),
    )
    # the two middle positions (equal when n is odd)
    ks = marked.select(
        "b",
        "cnt",
        "prev",
        "n",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr("(n + 1) div 2"), F.expr("(n + 2) div 2")
                )
            )
        ).alias("k"),
    ).filter((F.col("prev") < F.col("k")) & (F.col("k") <= F.col("prev") + F.col("cnt")))
    picked = (
        li.withColumn("b", (F.col("c") / bsize).cast("bigint"))
        .join(F.broadcast(ks), "b")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy("c")
            ),
        )
        .filter(F.col("rn") == F.col("k") - F.col("prev"))
    )
    # COALESCE the count: on an empty table `picked` has zero rows, so
    # MAX(n) is NULL while the oracle's COUNT(*) is 0 (medians stay
    # NULL on both engines).
    return picked.agg(
        F.coalesce(F.max("n"), F.lit(0).cast("bigint")).alias("n_rows"),
        F.avg("c").alias("median_cents"),
        (F.avg("c") / 100.0).alias("median_price"),
    )


@REG.query(
    "agg_countmin_sketch",
    oracle="""
    WITH terms AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY term) AS tid
      FROM (SELECT DISTINCT term FROM terms WHERE term <> '')
    ),
    occs AS (
      SELECT v.tid FROM terms t JOIN vocab v USING (term)
    ),
    rows_ AS (SELECT UNNEST(RANGE(0, 4)) AS hash_row)
    SELECT hash_row,
           ((2*hash_row + 3) * CAST(tid AS BIGINT) + (5*hash_row + 7))
             % 10007 % 64 AS col,
           COUNT(*) AS counter
    FROM occs, rows_
    GROUP BY 1, 2
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build over the corpus term stream: a 4×64
    counter matrix where every term occurrence increments one cell per
    hash row — the mergeable fixed-size frequency summary that answers
    "roughly how often does term X appear?" in O(1) regardless of
    corpus size (estimate = min over the 4 cells, biased high only).

    The sketch aggregation is the scale story: 4 affine hashes are
    column math, so the shuffle reduces to 256 cells with map-side
    partial aggregation — sketch size is INDEPENDENT of both corpus
    and vocabulary size, which is why it beats exact top-terms at
    100 TB.  The vocabulary dictionary (term → dense tid) keeps hashes
    engine-portable; production would xxhash64 raw terms and skip the
    dictionary entirely."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    terms = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    # Dense lexicographic term ids via the bucketed two-phase rank
    # (text.shingle_vocab) — a plain row_number over all terms would be
    # a single-partition window, the exact serial cliff SURVEY.md's
    # lessons list warns about; the bucketed form's only serial window
    # is the <=257-row per-bucket offset table.
    from firebase_realtime_database_backup_spark.operators.text import shingle_vocab

    # Collapse the occurrence stream to (term, n) FIRST — one corpus
    # shuffle with map-side combine — then build the sketch from the
    # vocabulary-sized counts with weighted increments (SUM(n) per cell
    # == COUNT(*) over raw occurrences).  The 4-way hash-row explode and
    # the vocab join now touch |vocab| rows, not |corpus| rows, and the
    # vocab derives from term_counts so both branches share ONE
    # corpus-grain exchange (ReusedExchange in the plan): measured ~2x
    # on the sf0.1 bench vs the occurrence-grain form.
    term_counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = shingle_vocab(
        term_counts.select(F.col("term").alias("shingle"))
    ).select(F.col("shingle").alias("term"), F.col("sid").cast("long").alias("tid"))
    weighted = term_counts.join(F.broadcast(vocab), "term").select("tid", "n")
    return (
        weighted.select(
            "tid",
            "n",
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(4)])).alias(
                "hash_row"
            ),
        )
        .groupBy(
            "hash_row",
            (
                ((2 * F.col("hash_row") + 3) * F.col("tid")
                 + (5 * F.col("hash_row") + 7))
                % 10007 % 64
            ).alias("col"),
        )
        .agg(F.sum("n").alias("counter"))
    )


@REG.query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {oround("SUM(l_extendedprice * (1 - l_discount))")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via bloom filter: build a bloom over the
    selective side's join keys (orders with o_totalprice > 400k, ~2% of
    orders), broadcast it, and drop non-matching lineitem rows BEFORE
    the join shuffle — the runtime-filter pattern that turns a
    shuffle-everything join into a shuffle-2% join at 100 TB (Spark's
    spark.sql.optimizer.runtime.bloomFilter.enabled injects the same
    shape automatically where its heuristics allow; spelled explicitly
    here so the reduction is guaranteed and plan-visible).

    The bloom is a 2^16-bit bitmap packed as map<word_idx, int64>:
    built with ONE groupBy(word).bit_or aggregation folded into a
    single-row map, broadcast, and probed with three O(1) bit tests per
    row (element_at + mask) — pure JVM column ops, no UDF, probe cost
    independent of build-side cardinality (vs an IN-list / array_contains
    whose probe is O(|keys|)).  Three affine rehashes of one xxhash64
    give k=3 independent positions.

    Correctness gate: a bloom admits false positives but never false
    negatives, and the equi join discards the false positives — the
    final result is EXACTLY the plain join, which is the oracle."""
    M_BITS = 1 << 16  # 65536 bits = 1024 words — broadcast size ~16 KB
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )

    def positions(key):
        # Fold the 64-bit hash to 30 bits before the affine rehash so
        # h * a stays within int64 under ANSI overflow checking.
        h = F.pmod(F.xxhash64(key), F.lit(1 << 30))
        return [
            F.pmod(h * F.lit(a) + F.lit(b), F.lit(M_BITS))
            for a, b in ((2654435761, 1), (40503, 2654435769), (2246822519, 3))
        ]

    pos = orders.select(
        F.explode(F.array(*positions(F.col("o_orderkey")))).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(p % 64 AS INT))")).alias("bits")
    )
    # Densify the sparse (word, bits) rows into ONE array<long> of 1024
    # words: element_at on an ARRAY is O(1) indexing, while element_at
    # on a MAP is a linear scan of all entries — with the map form the
    # 3 probes per row cost 3*1024 comparisons each and the whole
    # operator went superlinear at 20x data (28 s vs 0.7 s; ~40x).
    n_words = M_BITS // 64
    bloom = words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("bfm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(bfm, i), 0L)) AS bf"
        )
    )

    probed = lineitem.join(F.broadcast(bloom)).withColumns(
        {f"p{i}": p for i, p in enumerate(positions(F.col("l_orderkey")))}
    )
    hits = [
        F.expr(
            f"(element_at(bf, CAST(p{i} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(p{i} % 64 AS INT))) != 0"
        )
        for i in range(3)
    ]
    pre = probed.filter(hits[0] & hits[1] & hits[2]).drop(
        "bf", "p0", "p1", "p2"
    )
    return (
        pre.join(orders, pre.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


#: Shared item-graph edge list (the events_item_cooccurrence output
#: shape) as a DuckDB CTE body — graph oracles compose it.
_ITEM_EDGES_SQL = f"""
      SELECT a.item AS src, b.item AS dst
      FROM (
        SELECT user_id, item FROM (
          SELECT user_id, item,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY item) AS rk
          FROM (
            SELECT DISTINCT user_id,
                   TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                     AS item
            FROM events
            WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                  IS NOT NULL
          )
        ) WHERE rk <= {COOC_USER_CAP}
      ) a JOIN (
        SELECT user_id, item FROM (
          SELECT user_id, item,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY item) AS rk
          FROM (
            SELECT DISTINCT user_id,
                   TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                     AS item
            FROM events
            WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                  IS NOT NULL
          )
        ) WHERE rk <= {COOC_USER_CAP}
      ) b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
"""


#: PageRank iteration count — fixed (not convergence-tested) so runtime
#: is predictable and the parity tests can replay the exact loop.
PAGERANK_ITERS = 8
PAGERANK_DAMPING = 0.85
#: Fixed-point scale: ranks are bigints in units of 1e-12 — integer
#: arithmetic is order-independent, so the DuckDB oracle's unrolled
#: CTE chain is bit-identical to the Spark loop (float sums are not).
PAGERANK_SCALE = 10**12


def _pagerank_oracle(iters: int) -> str:
    """The graph_pagerank loop unrolled into stacked CTEs (the
    text_bpe_merges trick): r0 seeds every node at PAGERANK_SCALE, and
    each rK is one scatter (rank // deg per edge) + gather (HUGEINT
    SUM) + damping step ((15e12 + 85*in_sum) // 100) over r{K-1} —
    exact integer arithmetic end to end, so engine parity is
    structural."""
    parts = [
        f"WITH e AS ({_ITEM_EDGES_SQL}),",
        # symmetrize: canonical pairs are distinct with src < dst, so
        # UNION ALL of the mirror introduces no duplicate edges
        "se AS (SELECT src, dst FROM e"
        " UNION ALL SELECT dst AS src, src AS dst FROM e),",
        "deg AS (SELECT src, COUNT(*) AS deg FROM se GROUP BY src),",
        f"r0 AS (SELECT src AS item,"
        f" CAST({PAGERANK_SCALE} AS HUGEINT) AS rank FROM deg),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS ("
            f" SELECT n.src AS item,"
            f" ({15 * PAGERANK_SCALE} + 85 * COALESCE(s.in_sum, 0)) // 100"
            f" AS rank"
            f" FROM deg n LEFT JOIN ("
            f"   SELECT se.dst, SUM(r.rank // d.deg) AS in_sum"
            f"   FROM se JOIN r{k - 1} r ON r.item = se.src"
            f"   JOIN deg d ON d.src = se.src"
            f"   GROUP BY se.dst"
            f" ) s ON s.dst = n.src),"
        )
    final = (
        f"SELECT item, CAST(rank AS BIGINT) AS rank_fp,"
        f" CAST(rank // {PAGERANK_SCALE // 10**6} AS BIGINT) / 1000000.0"
        f" AS rank FROM r{iters}"
    )
    return "\n".join(parts).rstrip(",") + "\n" + final


#: Same two-regime gate as dedup.MLC_LOCAL_EDGE_CAP (the round-8
#: single-task union-find fast path): a symmetric edge list this size
#: is a few MB of ints — one task's memory — while the distributed
#: fixpoint pays PAGERANK_ITERS x (per-iteration AQE stage jobs) of
#: pure scheduling regardless of graph size.  Round-9 measurement: the
#: sf0.1 co-click graph is ~20k edges, yet the driver-looped form
#: floors at ~5 s = ~20 jobs x ~0.25 s of local[32] scheduling
#: (VERDICT r8 item 1); the single-task kernel does the identical 8
#: integer iterations in milliseconds.
PAGERANK_LOCAL_EDGE_CAP = 1_000_000


def _local_pagerank(edges: DataFrame) -> DataFrame:
    """Single-task exact fixed-point PageRank over a bounded symmetric
    edge list — the SAME integer arithmetic as the distributed loop
    (scatter rank // deg, gather int sum, damping
    (15e12 + 85*in_sum) // 100), vectorized in int64 numpy.

    Exactness, not approximation: every intermediate is bounded inside
    int64 under the edge cap — total rank mass is <= n*SCALE <= 1e18
    for n <= 1e6 nodes, so rank, contrib, and in_sum all fit — and the
    one product that would overflow (85 * in_sum, up to 8.5e19) is
    decomposed exactly: with in_sum = 100q + r,
    (15e12 + 85*in_sum) // 100 == 15e10 + 85q + (85r) // 100
    because 15e12 and 8500q are both multiples of 100.  Output is
    identical to the distributed fixpoint's by construction (asserted
    against the arbitrary-precision replay in test_dedup_clusters and
    the unrolled-CTE DuckDB oracle)."""

    def pr(pdf):
        import numpy as np
        import pandas as pd

        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        # symmetric edges: the src column covers every node
        items, inv_src = np.unique(src, return_inverse=True)
        inv_dst = np.searchsorted(items, dst)
        deg = np.bincount(inv_src, minlength=len(items)).astype(np.int64)
        rank = np.full(len(items), PAGERANK_SCALE, dtype=np.int64)
        for _ in range(PAGERANK_ITERS):
            contrib = rank // deg
            in_sum = np.zeros(len(items), dtype=np.int64)
            np.add.at(in_sum, inv_dst, contrib[inv_src])
            q, r = np.divmod(in_sum, 100)
            rank = (15 * (PAGERANK_SCALE // 100)) + 85 * q + (85 * r) // 100
        return pd.DataFrame({"item": items, "rank": rank})

    return (
        edges.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(pr, "item bigint, rank bigint")
    )


@REG.query("graph_pagerank", oracle=_pagerank_oracle(PAGERANK_ITERS))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the item co-click graph (edges = items co-clicked
    by >= 2 users, from events_item_cooccurrence): which items are
    central in the browse graph — the other classic iterative-algorithm
    shape next to dedup_clusters' label propagation.

    TWO-REGIME plan (round 9, the min_label_components discipline):
    when the symmetric edge list fits one task
    (<= PAGERANK_LOCAL_EDGE_CAP) the fixed 8-iteration loop runs as a
    SINGLE-TASK int64 kernel (_local_pagerank) — the whole fixpoint is
    one job instead of ~20 AQE stage jobs of driver-loop scheduling,
    which dominated the bench row (~5 s for a ~20k-edge graph).  The
    canonical distributed iteration below remains the large-graph path:
    contribution-scatter (edge join on src) + gather (groupBy dst sum)
    — two shuffles on the same item key, so the exchange partitioning
    is reused; localCheckpoint every 4 iterations truncates lineage
    exactly as in dedup_clusters.  Both regimes compute the identical
    integer fixed point (replay-asserted in test_dedup_clusters, both
    regimes forced in test_pagerank_regimes_agree).

    FIXED-POINT semantics (round 6): ranks are integers in units of
    1e-12 (PAGERANK_SCALE); scatter is exact integer rank // deg,
    damping is (15e12 + 85*in_sum) // 100.  Integer sums commute
    exactly, so the result is independent of shuffle/aggregation order
    — which makes the DuckDB oracle (the loop unrolled into stacked
    CTEs, the text_bpe_merges trick) hash-exact instead of the old
    float form's "parity within 1e-5, rows-only".  The truncation
    drops < deg + 100 rank-units (1e-10) per node per iteration —
    display output is the micro-rank (1e-6 grain), far above the
    truncation floor.  An exact integer replay is asserted in
    tests/test_dedup_clusters.py.  sum(rank) == n*SCALE now holds only
    to truncation (each div discards remainders)."""
    edges, out_deg, nodes = _ensure_sym_edges(spark, sf_dir)
    # the count gates the regime AND materializes the edge cache the
    # loop would have built (the min_label_components idiom)
    if edges.count() <= PAGERANK_LOCAL_EDGE_CAP:
        ranks = _local_pagerank(edges)
        rank_fp = F.col("rank").cast("bigint")
        rank_micro = F.expr(
            f"CAST(CAST(rank AS BIGINT) DIV {PAGERANK_SCALE // 10**6}"
            f" AS BIGINT)"
        )
        return ranks.select(
            "item",
            rank_fp.alias("rank_fp"),
            (rank_micro / F.lit(1000000.0)).alias("rank"),
        ).orderBy(F.col("rank_fp").desc(), "item")
    # nodes/edges caches materialize during the initial eager checkpoint;
    # sum(rank) == |nodes| stays a loop invariant (asserted in tests).
    # Checkpoint every 4 iterations, not every one: each eager
    # checkpoint is a full job, and 4 un-materialized iterations of
    # join lineage stay well inside optimizer limits — round-6 sweep
    # 7.6 s (every iter) vs 4.5 s (every 4) vs 5.6 s (never); the
    # round-8 re-sweep confirms cadence 1-4 equivalent within noise
    # and 8/never worse (BASELINE.md round 8), identical results.
    #
    # Round 8: the rank/contrib join hints are GONE — the forced
    # broadcast re-shipped the item-catalog-sized rank relation every
    # iteration, and the re-sweep measured the hint-free form fastest
    # (4.97 vs 6.1 s registered); at 100 TB the rank table is
    # |items|-sized, so AQE picks broadcast while it fits and falls
    # back to a co-partitioned shuffle join (both sides keyed by item
    # across iterations) when it doesn't — the hint made that cliff a
    # driver OOM instead.  out_deg keeps its hint (every sweep variant
    # carried it; it is the stable small side of the scatter).
    dec = "decimal(38,0)"
    ranks = nodes.withColumn(
        "rank", F.lit(PAGERANK_SCALE).cast(dec)
    ).localCheckpoint(eager=True)
    for i in range(PAGERANK_ITERS):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["item"])
            .join(F.broadcast(out_deg), "src")
            .select(
                "dst",
                # exact integer rank // deg: subtract the remainder so
                # the decimal division is lossless (same fixed-point
                # truncation as the oracle's HUGEINT //)
                (
                    (F.col("rank") - F.col("rank") % F.col("deg"))
                    / F.col("deg")
                )
                .cast(dec)
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        x = F.lit(15 * PAGERANK_SCALE).cast(dec) + F.lit(85) * F.coalesce(
            F.col("in_sum"), F.lit(0).cast(dec)
        )
        ranks = nodes.join(
            contribs, nodes["item"] == contribs["dst"], "left"
        ).select(
            "item",
            ((x - x % 100) / 100).cast(dec).alias("rank"),
        )
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    rank_fp = F.col("rank").cast("bigint")
    rank_micro = F.expr(
        f"CAST(CAST(rank AS BIGINT) DIV {PAGERANK_SCALE // 10**6} AS BIGINT)"
    )
    return ranks.select(
        "item",
        rank_fp.alias("rank_fp"),
        (rank_micro / F.lit(1000000.0)).alias("rank"),
    ).orderBy(F.col("rank_fp").desc(), "item")


@REG.query(
    "graph_triangle_count",
    oracle=f"""
    WITH e AS ({_ITEM_EDGES_SQL}),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (ds.d < dd.d) OR (ds.d = dd.d AND e.src < e.dst)
                  THEN e.src ELSE e.dst END AS u,
             CASE WHEN (ds.d < dd.d) OR (ds.d = dd.d AND e.src < e.dst)
                  THEN e.dst ELSE e.src END AS v,
             CASE WHEN (ds.d < dd.d) OR (ds.d = dd.d AND e.src < e.dst)
                  THEN dd.d ELSE ds.d END AS v_d
      FROM e JOIN deg ds ON e.src = ds.node
             JOIN deg dd ON e.dst = dd.node
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM oriented e1
      JOIN oriented e2 ON e1.u = e2.u
        AND ((e1.v_d < e2.v_d) OR (e1.v_d = e2.v_d AND e1.v < e2.v))
      JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) FROM deg)
               AS n_wedges,
             (SELECT t FROM tri) AS n_triangles
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST(3 * n_triangles AS DOUBLE) / n_wedges
             AS global_clustering
    FROM stats
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the item
    co-occurrence graph, via DEGREE-ORIENTED wedge join — the standard
    distributed triangle algorithm (Cohen's MapReduce form; Suri &
    Vassilvitskii's "last reducer" fix).

    Why orientation is the whole story at 100 TB: counting wedges from
    raw undirected edges joins the full adjacency on the shared node,
    and the hottest node (degree h) emits h^2 intermediate rows — a
    social-scale graph has h ~ 10^7, which is a 10^14-row wedge
    relation from ONE node.  Orienting every edge from its
    (degree, id)-smaller endpoint to the larger makes every node's
    out-degree O(sqrt(m)), so the same wedge join is bounded by
    m·sqrt(m) TOTAL regardless of skew — the orientation is to graphs
    what salting is to joins.  Each triangle is then counted exactly
    once (at its lowest-(degree, id) corner).

    Plan: degrees are one agg over the edge endpoints; the wedge join
    shuffles oriented edges once on the source; the closing-edge probe
    is an equi-join on (v, w).  The ratio 3T/W (each triangle closes 3
    of the W wedges) is the one float division, computed once."""
    pairs = events_item_cooccurrence(spark, sf_dir).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    deg = (
        pairs.select(F.col("src").alias("node"))
        .unionByName(pairs.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .cache()  # reused by the orientation joins AND the wedge stats
    )
    e = (
        pairs.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("d", "src_d")
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed(
                "d", "dst_d"
            ),
            "dst",
        )
    )
    fwd = (F.col("src_d") < F.col("dst_d")) | (
        (F.col("src_d") == F.col("dst_d")) & (F.col("src") < F.col("dst"))
    )
    # Materialize the oriented edge list ONCE: it is referenced three
    # times below (e1/e2/e3) and Spark shares no subplans, so without
    # this the degree join above it ran three times (the round-7 plan
    # held 249 Exchange nodes / 56 scans).  m rows of 3 ints — cheap to
    # hold; lineage truncation also keeps the wedge join's plan small.
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("dst_d")).otherwise(F.col("src_d")).alias("v_d"),
    ).localCheckpoint(eager=True)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    wedge_lt = (F.col("e1.v_d") < F.col("e2.v_d")) | (
        (F.col("e1.v_d") == F.col("e2.v_d")) & (F.col("e1.v") < F.col("e2.v"))
    )
    tri = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & wedge_lt)
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).alias("n_wedges"),
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedges.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").alias("n_triangles"),
            F.try_divide((3 * F.col("t")).cast("double"), F.col("n_wedges")).alias(
                "global_clustering"
            ),
        )
    )


@REG.query(
    "join_asof_forward",
    oracle="""
    WITH ords AS (
      SELECT o_custkey, o_orderdate,
             MIN_BY(o_orderkey, o_orderkey)   AS o_orderkey,
             MIN_BY(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CAST(EPOCH_MS(e.ts) AS BIGINT) AS ts_ms,
           o.o_orderkey AS next_orderkey,
           CAST(EPOCH_MS(o.o_orderdate) AS BIGINT) AS next_orderdate_ms,
           o.o_totalprice AS next_totalprice
    FROM events e
    ASOF LEFT JOIN ords o
      ON e.user_id = o.o_custkey AND e.ts < o.o_orderdate
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each event, the user's FIRST order
    strictly after the event time — the attribution/label-generation
    twin of join_asof ("did a purchase follow this click?"), and the
    leakage-safe way to build future-outcome labels for training data
    (strict inequality: an order at the exact event instant is not
    "future").

    Same single-shuffle tagged-union shape as join_asof, mirrored:
    first(ignorenulls) over (currentRow, unboundedFollowing) carries the
    next order backward into each event row.  Order rows sort BEFORE
    event rows at the same instant, so a same-instant order is behind
    the event in the frame and correctly excluded.  Orders pre-deduped
    to one per (custkey, date) via min_by for deterministic ties."""
    events = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    ords = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.min_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
        F.min_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None)
        .cast("struct<okey:bigint,odate:timestamp,oprice:double>")
        .alias("o"),
    )
    right = ords.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("odate"),
            F.col("o_totalprice").alias("oprice"),
        ).alias("o"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = left.unionByName(right).withColumn(
        "next_o", F.first("o", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("next_o.okey").alias("next_orderkey"),
        F.unix_millis("next_o.odate").alias("next_orderdate_ms"),
        F.col("next_o.oprice").alias("next_totalprice"),
    )


@REG.query(
    "events_moving_median",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             {oround("SUM(value)")}
               AS day_total
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, day_total,
           MEDIAN(day_total) OVER (
             ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS med7
    FROM daily
    """,
)
def events_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving MEDIAN of daily revenue — the robust
    smoother for dashboards where one flash-sale day would drag a
    moving mean (the windowed cousin of events_anomaly_mad's global
    median).

    The raw-events shuffle is the daily partial agg; the median window
    then runs over ~365 rows/year regardless of SF, on a value-based
    RANGE frame over the epoch-day axis so calendar gaps shrink the
    window (a ROWS frame would silently span them).  Exact median in a
    moving frame is O(frame log frame) per row — fine on the aggregate
    grain; at raw grain you'd precompute the daily rollup exactly like
    this."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_total")
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, Window.currentRow)
    )
    # median() rejects window frames in Spark; percentile(x, 0.5) is
    # the identical continuous-interpolation median and frames fine.
    return daily.select(
        "day",
        "day_total",
        F.percentile("day_total", 0.5).over(w).alias("med7"),
    )


@REG.query(
    "quality_skew_report",
    oracle="""
    WITH key_counts AS (
      SELECT o_custkey AS join_key, COUNT(*) AS n_rows
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM key_counts)
    SELECT k.join_key, k.n_rows, t.n_keys AS n_distinct_keys,
           CAST(k.n_rows AS DOUBLE) / t.total AS share,
           CAST(k.n_rows AS DOUBLE) * t.n_keys / t.total AS skew_factor
    FROM key_counts k, tot t
    ORDER BY k.n_rows DESC, k.join_key
    LIMIT 20
    """,
)
def quality_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the 20 heaviest o_custkey values with
    their row share and skew factor (rows / mean-rows-per-key) — the
    diagnostic every 100 TB join should run BEFORE shuffling, because
    one key holding 5% of rows means one task holds 5% of the shuffle
    (the exact hot-key condition the reference's go-deeper descent
    detects remotely, src/BackupProcessor.php:173-179, and what AQE
    skew-join or join_salted_skew then mitigates).

    One key-count shuffle; the totals are a 1-row aggregate of the
    count table cross-joined back (scalar-subquery shape), and the
    top-20 is TakeOrdered — nothing here scales with raw row count
    beyond the first partial agg."""
    orders = read_table(spark, sf_dir, "orders")
    key_counts = orders.groupBy(F.col("o_custkey").alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = key_counts.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        key_counts.crossJoin(F.broadcast(tot))
        .select(
            "join_key",
            "n_rows",
            F.col("n_keys").alias("n_distinct_keys"),
            (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
            (
                F.col("n_rows").cast("double") * F.col("n_keys") / F.col("total")
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), "join_key")
        .limit(20)
    )


@REG.query(
    "events_rfm_scaled",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(EPOCH_MS(MAX(ts)) AS BIGINT) AS last_seen_ms,
             COUNT(*) AS frequency,
             {oround("SUM(value)")}
               AS monetary
      FROM events GROUP BY user_id
    ),
    bounds AS (
      SELECT QUANTILE_CONT(last_seen_ms, 0.25) AS r1,
             QUANTILE_CONT(last_seen_ms, 0.50) AS r2,
             QUANTILE_CONT(last_seen_ms, 0.75) AS r3,
             QUANTILE_CONT(frequency, 0.25) AS f1,
             QUANTILE_CONT(frequency, 0.50) AS f2,
             QUANTILE_CONT(frequency, 0.75) AS f3,
             QUANTILE_CONT(monetary, 0.25) AS m1,
             QUANTILE_CONT(monetary, 0.50) AS m2,
             QUANTILE_CONT(monetary, 0.75) AS m3
      FROM per_user
    )
    SELECT user_id, last_seen_ms, frequency, monetary,
           4 - ((last_seen_ms > r1)::INT + (last_seen_ms > r2)::INT
                + (last_seen_ms > r3)::INT) AS r_quartile,
           4 - ((frequency > f1)::INT + (frequency > f2)::INT
                + (frequency > f3)::INT) AS f_quartile,
           4 - ((monetary > m1)::INT + (monetary > m2)::INT
                + (monetary > m3)::INT) AS m_quartile
    FROM per_user, bounds
    """,
)
def events_rfm_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation, production form: quartile BOUNDS via one
    percentile aggregate, broadcast back, quartile ASSIGNMENT as three
    map-side comparisons — no global sort at any point.  The NTILE
    variant (events_rfm_segments) is exact-equal-count but its three
    single-partition windows measured 21× at 100× users; this form's
    only post-aggregate cost is a 1-row broadcast, so it scales with
    the user-metric aggregate alone.  Quantile-boundary buckets differ
    from NTILE only in tie handling (ties share a bucket here, NTILE
    splits them by the tiebreaker), which is usually what segmentation
    wants anyway.

    Bound comparisons are engine-stable: at g ∈ {.25,.5,.75} the
    interpolated bound either equals a data value exactly (both engines
    compute (1-g)a+gb with exact-at-endpoints arithmetic) or lies
    strictly between two data values — either way `v > bound` cannot
    flip between engines."""
    events = read_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.unix_millis(F.max("ts")).alias("last_seen_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    bounds = per_user.agg(
        *[
            F.percentile(c, q).alias(f"{a}{i}")
            for c, a in (
                ("last_seen_ms", "r"),
                ("frequency", "f"),
                ("monetary", "m"),
            )
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def quart(col, a):
        return (
            4
            - (
                (F.col(col) > F.col(f"{a}1")).cast("int")
                + (F.col(col) > F.col(f"{a}2")).cast("int")
                + (F.col(col) > F.col(f"{a}3")).cast("int")
            )
        ).alias(f"{a}_quartile")

    return per_user.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "last_seen_ms",
        "frequency",
        "monetary",
        quart("last_seen_ms", "r"),
        quart("frequency", "f"),
        quart("monetary", "m"),
    )


@REG.query(
    "window_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grouped AS (
      SELECT user_id, day,
             CAST(EPOCH(day) / 86400 AS BIGINT)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
             COUNT(*) AS streak_days
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id, streak_start, streak_end, streak_days
    FROM streaks
    WHERE streak_days >= 3
    """,
)
def window_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user (the
    classic epoch-day-minus-row-number trick — consecutive days share a
    constant difference, so the difference IS the island id), reporting
    streaks of 3+ days.  The engagement-streak metric every product
    dashboard wants, and the canonical SQL pattern missing between
    sessionize (time-gap islands) and SCD2 (validity islands).

    One user_id shuffle covers the distinct, the window, and the island
    aggregate — all three key on user_id, so AQE reuses the exchange.
    Nothing scales with raw events beyond the first distinct's partial
    agg."""
    events = read_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    grouped = days.withColumn(
        "grp",
        (F.unix_date("day").cast("bigint") - rn),
    )
    return (
        grouped.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 3)
        .drop("grp")
    )


@REG.query(
    "quality_drift_chi2",
    oracle="""
    WITH old_h AS (
      SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
    ),
    new_h AS (
      SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM old_h) AS n_old,
             (SELECT SUM(n) FROM new_h) AS n_new
    )
    SELECT COALESCE(o.bucket, w.bucket) AS bucket,
           COALESCE(o.n, 0) AS n_old, COALESCE(w.n, 0) AS n_new,
           CAST(COALESCE(o.n, 0) AS DOUBLE) / t.n_old AS p_old,
           CAST(COALESCE(w.n, 0) AS DOUBLE) / t.n_new AS p_new,
           (CAST(COALESCE(w.n, 0) AS DOUBLE) / t.n_new
            - CAST(COALESCE(o.n, 0) AS DOUBLE) / t.n_old)
           * (CAST(COALESCE(w.n, 0) AS DOUBLE) / t.n_new
              - CAST(COALESCE(o.n, 0) AS DOUBLE) / t.n_old)
           / ((CAST(COALESCE(o.n, 0) AS DOUBLE) / t.n_old + 0.0001))
             AS chi2_term
    FROM old_h o FULL OUTER JOIN new_h w ON o.bucket = w.bucket, tot t
    """,
)
def quality_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two data slices (orders before
    vs since 1996 as the old/new corpus stand-in): per-bucket rates and
    a chi-square-style drift term — the per-feature drift monitor that
    gates retraining pipelines.  Chi-square arithmetic instead of
    PSI/KL because (p-q)²/(p+ε) is pure +,×,÷ — bit-identical across
    engines, where ln() is not.

    Both histograms reduce to bucket grain inside one scan each (the
    two slices share a scan in Spark via conditional aggregation ... or
    two pushdown-filtered scans, as here, so each side's filter reaches
    parquet); the full-outer join and rate math run on dozens of
    bucket rows.  Drift score = SUM(chi2_term) downstream."""
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
    cut = "1996-01-01"
    old_h = (
        orders.filter(F.col("o_orderdate") < cut)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    new_h = (
        orders.filter(F.col("o_orderdate") >= cut)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    tot = old_h.agg(F.sum("n_old").alias("t_old")).crossJoin(
        new_h.agg(F.sum("n_new").alias("t_new"))
    )
    joined = (
        old_h.join(new_h, "bucket", "full_outer")
        .na.fill({"n_old": 0, "n_new": 0})
        .crossJoin(F.broadcast(tot))
    )
    p_old = F.col("n_old").cast("double") / F.col("t_old")
    p_new = F.col("n_new").cast("double") / F.col("t_new")
    return joined.select(
        "bucket",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        ((p_new - p_old) * (p_new - p_old) / (p_old + 0.0001)).alias("chi2_term"),
    )


@REG.query(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_linestatus
    """,
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: SHUFFLE_HASH forces a ShuffledHashJoin
    in place of the sort-merge default (plan-asserted in test_plans.py).
    The right call when one side fits a per-task hash table after
    partitioning but is too big to broadcast: it skips BOTH sort passes
    a sort-merge join pays, a measurable win on a 100 TB fact joined to
    a mid-sized filtered table.  The hint is advisory and semantics-free
    — the oracle is the plain join."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        lineitem.join(
            orders.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_linenumber").alias("sum_linenumber"),
        )
    )


@REG.query(
    "agg_string_agg",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_nations,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect_list is
    order-NONDETERMINISTIC under parallel aggregation, so the engine
    sorts the collected array before joining — the only way an
    order-sensitive text aggregate is reproducible on a cluster (same
    rule as the oracle's explicit ORDER BY inside STRING_AGG)."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations_csv"
            ),
        )
    )


HEAVY_HITTER_K = 200  # report items with frequency > n_total / K


@REG.query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH occ AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM occ GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM freq)
    SELECT tok, cnt, n_total,
           CAST(cnt AS DOUBLE) / n_total AS frac
    FROM freq, tot
    WHERE cnt * {HEAVY_HITTER_K} > n_total
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: every token whose corpus frequency exceeds
    n/K — the frequent-items query that pairs with agg_countmin_sketch
    (the sketch ESTIMATES any item's count; this one EMITS the items
    over the phi=1/K support threshold, the classic Misra-Gries
    guarantee computed exactly).

    Plan: one explode-in-scan, one token groupBy with map-side partial
    aggregation (the only shuffle carries one row per distinct token,
    not per occurrence), and the 1-row corpus total broadcast into the
    filter.  Output size is bounded by construction: at most K items
    can exceed n/K, so the result is ≤ K rows no matter the corpus
    size — this shape is 100 TB-safe end-to-end.  The threshold
    comparison is pure integers (cnt * K > n_total); only the reported
    fraction is a double, one division on ≤ K rows.  The corpus total
    is derived from the reduced frequency table (Σcnt ≡ token count),
    so the corpus is exploded exactly once."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    occ = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    freq = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n_total"))
    return (
        freq.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * HEAVY_HITTER_K > F.col("n_total"))
        .select(
            "tok",
            "cnt",
            "n_total",
            (F.col("cnt").cast("double") / F.col("n_total")).alias("frac"),
        )
    )


ZORDER_BITS = 8


def _zvalue(a, b):
    """Bit-interleave two ZORDER_BITS-wide non-negative int columns
    (a gets the odd bits, b the even) into one Morton/Z code — pure
    integer column arithmetic, map-side only."""
    z = F.lit(0).cast("bigint")
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(b.cast("bigint"), i).bitwiseAND(1), 2 * i)
        )
    return z


_ZBIN_MAX = (1 << ZORDER_BITS) - 1


@REG.query(
    "layout_zorder",
    # the interleave is an INLINE generated bit-sum (not UNNEST+GROUP BY:
    # a GROUP BY would silently merge the corpus's intentional duplicate
    # rows and drop them from the oracle count)
    oracle=f"""
    WITH mm AS (
      SELECT MIN(l_partkey) AS pmn, GREATEST(MAX(l_partkey) - MIN(l_partkey), 1) AS pspan,
             MIN(l_suppkey) AS smn, GREATEST(MAX(l_suppkey) - MIN(l_suppkey), 1) AS sspan
      FROM lineitem
    ),
    binned AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             ((l_partkey - pmn) * {_ZBIN_MAX}) // pspan AS pbin,
             ((l_suppkey - smn) * {_ZBIN_MAX}) // sspan AS sbin
      FROM lineitem, mm
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({" + ".join(
               f"((pbin // {1 << i}) % 2) * {1 << (2 * i + 1)}"
               f" + ((sbin // {1 << i}) % 2) * {1 << (2 * i)}"
               for i in range(ZORDER_BITS)
           )} AS BIGINT) AS zval
    FROM binned
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey): scale
    each key to a common {ZORDER_BITS}-bit domain by its global min/max
    (unequal domains are the classic Morton failure — raw interleave
    lets the wider key's high bits dominate and the narrow key keeps no
    locality), then bit-interleave so that range-partitioning + sorting
    on the single zval column co-locates rows that are close in BOTH
    dimensions — the multi-column data-layout move (Delta/Iceberg
    OPTIMIZE ZORDER) that lets min/max footer pruning serve predicates
    on either key from one physical ordering.  At 100 TB this is the
    write-side layout pass for a corpus queried by more than one
    selective column; the write-and-prune effect itself is pinned in
    tests/test_plans.py::test_zorder_layout_footer_locality.

    Plan: the min/max bounds are ONE 1-row aggregate broadcast into the
    scan (the scalar-subquery probe shape); binning + interleave are
    per-row integer arithmetic, codegen'd, shuffle-free; the one
    Exchange is the explicit repartitionByRange on zval — exactly the
    shuffle a layout rewrite exists to pay, sampling-based so a skewed
    key space still yields balanced files.  Integer-exact end-to-end
    (scale-then-floor-divide), so the oracle reproduces every bit."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    mm = lineitem.agg(
        F.min("l_partkey").alias("pmn"),
        F.greatest(
            F.max("l_partkey") - F.min("l_partkey"), F.lit(1)
        ).alias("pspan"),
        F.min("l_suppkey").alias("smn"),
        F.greatest(
            F.max("l_suppkey") - F.min("l_suppkey"), F.lit(1)
        ).alias("sspan"),
    )
    # integer `div`, not double-divide + floor(): key - min >= 0, so
    # Spark's truncating div == DuckDB's flooring // by construction,
    # and no double rounding can cross an integer boundary at any key
    # span (the latent divergence flagged in round-2 ADVICE)
    pbin = F.expr(f"((l_partkey - pmn) * {_ZBIN_MAX}) div pspan")
    sbin = F.expr(f"((l_suppkey - smn) * {_ZBIN_MAX}) div sspan")
    with_z = lineitem.crossJoin(F.broadcast(mm)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        _zvalue(pbin, sbin).alias("zval"),
    )
    return with_z.repartitionByRange(32, "zval").sortWithinPartitions("zval")


@REG.query(
    "events_top_sequences",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grams AS (
      SELECT e1, e2, e3, COUNT(*) AS cnt FROM seq
      WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, cnt, CAST(rk AS INT) AS rk FROM (
      SELECT e1, e2, e3, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, e1, e2, e3) AS rk
      FROM grams
    ) WHERE rk <= 10
    """,
)
def events_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining lite: the 10 most frequent event-type
    TRIGRAMS across all per-user event streams — the n-gram view of user
    behavior that funnels (fixed target sequence) and Markov transitions
    (single step) both miss.

    Plan: the trigram build is two LEADs over one per-user window (one
    user_id exchange, no self-joins — the naive approach is a double
    self-join on adjacency); the count reduces to |types|³ rows at most,
    and the final top-10 is a TakeOrdered over those few rows, not a
    global sort.  At 100 TB the user_id window parallelizes per user
    with bounded state (2 events of lookahead)."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    grams = seq.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("cnt"))
    wr = Window.orderBy(F.desc("cnt"), "e1", "e2", "e3")
    return (
        grams.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 10)
        .select("e1", "e2", "e3", "cnt", "rk")
    )


#: Benford expected first-digit probabilities, precomputed once in
#: Python so BOTH engines compare against the identical double literals
#: (log10 in two libms can differ in the last ulp).
_BENFORD_P = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


@REG.query(
    "quality_benford",
    oracle=f"""
    WITH digits AS (
      SELECT ABS(CAST(ROUND(value * 100) AS BIGINT)) AS cents FROM events
    ),
    firsts AS (
      SELECT cents // CAST(POWER(10, LENGTH(CAST(cents AS VARCHAR)) - 1) AS BIGINT)
               AS d
      FROM digits WHERE cents > 0
    ),
    hist AS (SELECT d, COUNT(*) AS n FROM firsts GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM hist)
    SELECT d, n, CAST(n AS DOUBLE) / n_total AS frac,
           CAST(CASE d {" ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())}
           END AS DOUBLE) AS expected,
           ABS(CAST(n AS DOUBLE) / n_total -
               CAST(CASE d {" ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())}
               END AS DOUBLE)) AS abs_dev
    FROM hist, tot
    """,
)
def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit over the monetary `value` column: observed
    first-significant-digit distribution vs the log10(1+1/d) expectation
    — the classic fraud / synthetic-data / unit-mixing detector (a
    column whose digits are uniform instead of Benford-ish was generated
    or truncated, not measured).

    Exactness across engines: the first digit is extracted with INTEGER
    arithmetic (cents → leading digit via string length, no float
    log10 whose ulp could flip a boundary value), and the expected
    probabilities are Python-precomputed literals pasted into both
    sides, so the only floats are one division and one subtraction in
    identical order.  Plan: map-side digit extract, 9-row histogram
    shuffle, 1-row total probe — scans any corpus once."""
    events = read_table(spark, sf_dir, "events")
    # first SIGNIFICANT digit is sign-free; abs also dodges the one
    # divergence between the engines (DuckDB integer // truncates
    # toward zero, Spark floor() floors — they disagree only below 0)
    cents = F.abs(F.round(F.col("value") * 100).cast("bigint"))
    # 0 is not a significant digit: a value rounding to 0 cents has no
    # leading digit to audit, so drop it (both engines) instead of
    # emitting a meaningless d=0 row with NULL expected (round-2 ADVICE)
    firsts = events.filter(cents > 0).select(
        F.floor(
            cents / F.pow(F.lit(10), F.length(cents.cast("string")) - 1)
        ).cast("bigint").alias("d")
    )
    # total derived from the 9-row histogram (Σn ≡ row count) — one
    # events scan, not two
    hist = firsts.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("n_total"))
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in _BENFORD_P.items() for x in (d, p)]
        ),
        F.col("d").cast("int"),
    )
    frac = F.col("n").cast("double") / F.col("n_total")
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "d", "n", frac.alias("frac"), expected.alias("expected"),
            F.abs(frac - expected).alias("abs_dev"),
        )
    )


@REG.query(
    "agg_mode_per_group",
    oracle="""
    SELECT user_id, e AS mode_event_type, cnt FROM (
      SELECT user_id, event_type AS e, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type
    ) WHERE rk = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value, deterministic lexicographic
    tie-break): each user's dominant event type.  Spark has no MODE()
    aggregate over groups with a defined tie rule, so the engine
    composes it: count per (group, value) with map-side partial agg,
    then a per-group row_number window on the REDUCED counts — the
    window input is |groups|×|values| rows, never the raw events, which
    is what keeps the pattern viable on a 100 TB event log."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "cnt")
    )


@REG.query(
    "events_sliding_distinct",
    oracle="""
    WITH contrib AS (
      SELECT DATE_ADD(CAST(ts AS DATE), CAST(o AS INT)) AS report_day, user_id
      FROM events, UNNEST(RANGE(0, 7)) AS r(o)
    )
    SELECT report_day, COUNT(DISTINCT user_id) AS n_active_7d
    FROM contrib GROUP BY report_day
    """,
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT active users per day — the sliding
    count-distinct that windows can't express (COUNT(DISTINCT) is not
    frame-able) and self-joins express at O(days × events) cost.

    Algorithm: per-user INTERVAL MERGE + delta sweep, O(events) and —
    unlike the contribute-to-each-visible-day explode the oracle uses
    as ground truth — independent of the window length W:

    1. distinct (user, day) — one shuffle, the only event-grain pass;
    2. per-user gaps-and-islands: activity days ≤ W-1 apart merge into
       one presence interval [start, end+W-1] (same island move as
       window_streaks);
    3. each interval becomes two deltas (+1 at start, −1 at end+W),
       reduced to the DAY grain — thousands of rows at any corpus size;
    4. the answer is the running prefix-sum of deltas over the day
       domain — a window over |days| rows, not |events|.

    The explode form measured 70× at 100× events (70M contribution
    rows, 47 s); this form measures 10.3 s on the same 100× corpus
    (4.8× over its own sf0.1 cost — sublinear), and a 30-day window
    would cost it nothing extra where the explode form scales by W.
    The approximate twin at extreme per-day cardinality swaps step 1's
    exact distinct for HLL sketch merge."""
    events = read_table(spark, sf_dir, "events")
    win = 7
    dd = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w_u = Window.partitionBy("user_id").orderBy("day")
    new_island = (
        F.col("prev").isNull()
        | (F.col("day") > F.date_add(F.col("prev"), win - 1))
    ).cast("int")
    islands = (
        dd.withColumn("prev", F.lag("day").over(w_u))
        .withColumn(
            "island",
            F.sum(new_island).over(
                w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "island")
        .agg(F.min("day").alias("start"), F.max("day").alias("end"))
    )
    deltas = (
        islands.select(F.col("start").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            islands.select(
                F.date_add("end", win).alias("day"), F.lit(-1).alias("d")
            )
        )
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    bounds = deltas.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    domain = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("report_day")
    )
    w_days = Window.orderBy("report_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        domain.join(
            deltas.withColumnRenamed("day", "report_day"), "report_day", "left"
        )
        .select(
            "report_day",
            F.sum(F.coalesce("delta", F.lit(0)))
            .over(w_days)
            .cast("bigint")
            .alias("n_active_7d"),
        )
        .filter(F.col("n_active_7d") > 0)
    )


@REG.query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    contrib AS (
      SELECT DATE_ADD(CAST(ts AS DATE), CAST(o AS INT)) AS day, user_id
      FROM events, UNNEST(RANGE(0, 7)) AS r(o)
    ),
    wau AS (
      SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio product teams
    track (1/7 = everyone visits once a week; 1.0 = everyone active
    daily).  Composes the two activity relations the engine already
    computes exactly: per-day distinct actives (one two-phase distinct
    shuffle) and the trailing-7-day distinct from
    events_sliding_distinct's O(events) interval-merge + delta sweep —
    the oracle uses the contribute-forward explode as ground truth for
    the WAU leg, so this query also re-proves the sweep against it.
    Reported only on days that HAVE activity (stickiness is undefined
    on gap days); the ratio is one double division of two exact
    integers."""
    events = read_table(spark, sf_dir, "events")
    dau = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = events_sliding_distinct(spark, sf_dir).select(
        F.col("report_day").alias("day"), F.col("n_active_7d").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@REG.query(
    "join_asof_nearest",
    oracle="""
    WITH ords AS (
      SELECT o_custkey, o_orderdate,
             MIN_BY(o_orderkey, o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    b AS (
      SELECT e.event_id, e.user_id, e.ts,
             o.o_orderkey AS bk, o.o_orderdate AS bd
      FROM events e
      ASOF LEFT JOIN ords o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ),
    f AS (
      SELECT e.event_id, o.o_orderkey AS fk, o.o_orderdate AS fd
      FROM events e
      ASOF LEFT JOIN ords o
        ON e.user_id = o.o_custkey AND e.ts < o.o_orderdate
    )
    SELECT b.event_id, b.user_id,
           CAST(EPOCH_MS(b.ts) AS BIGINT) AS ts_ms,
           CASE WHEN fd IS NULL THEN bk
                WHEN bd IS NULL THEN fk
                WHEN CAST(EPOCH_MS(b.ts) AS BIGINT) - CAST(EPOCH_MS(bd) AS BIGINT)
                     <= CAST(EPOCH_MS(fd) AS BIGINT) - CAST(EPOCH_MS(b.ts) AS BIGINT)
                THEN bk ELSE fk END AS nearest_orderkey,
           CASE WHEN fd IS NULL AND bd IS NULL THEN NULL
                WHEN fd IS NULL THEN 'back'
                WHEN bd IS NULL THEN 'fwd'
                WHEN CAST(EPOCH_MS(b.ts) AS BIGINT) - CAST(EPOCH_MS(bd) AS BIGINT)
                     <= CAST(EPOCH_MS(fd) AS BIGINT) - CAST(EPOCH_MS(b.ts) AS BIGINT)
                THEN 'back' ELSE 'fwd' END AS direction
    FROM b JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: for each event, the user's order CLOSEST in
    time, looking both directions (ties to the past — the backward
    match is the one that can't leak).  Completes the as-of family:
    join_asof (last at-or-before), join_asof_forward (first strictly
    after), and this sensor-fusion/alignment form.

    ONE tagged-union shuffle computes both candidates: the same sorted
    per-key window yields last(ignorenulls) over the preceding frame
    (backward, inclusive — order rows sort before event rows at the
    same instant) AND first(ignorenulls) over the following frame
    (forward, strict — same-instant orders are behind the event row).
    Catalyst reuses one Exchange+Sort for both frames, so the nearest
    variant costs the same single shuffle as either one-sided form —
    never the O(events×orders) range-join blowup."""
    events = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    ords = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.min_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
    )
    o_t = "struct<okey:bigint,odate:timestamp>"
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None).cast(o_t).alias("o"),
    )
    right = ords.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("odate"),
        ).alias("o"),
    )
    base = Window.partitionBy("k").orderBy("t", "is_event")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(1, Window.unboundedFollowing)
    merged = (
        left.unionByName(right)
        .select(
            "event_id",
            "k",
            "ts",
            "is_event",
            F.last("o", ignorenulls=True).over(w_back).alias("b"),
            F.first("o", ignorenulls=True).over(w_fwd).alias("f"),
        )
        .filter(F.col("is_event") == 1)
    )
    ts_ms = F.unix_millis("ts")
    back_d = ts_ms - F.unix_millis(F.col("b.odate"))
    fwd_d = F.unix_millis(F.col("f.odate")) - ts_ms
    take_back = F.col("f").isNull() | (
        F.col("b").isNotNull() & (back_d <= fwd_d)
    )
    return merged.select(
        "event_id",
        F.col("k").alias("user_id"),
        ts_ms.alias("ts_ms"),
        F.when(take_back, F.col("b.okey"))
        .otherwise(F.col("f.okey"))
        .alias("nearest_orderkey"),
        F.when(F.col("b").isNull() & F.col("f").isNull(), F.lit(None).cast("string"))
        .when(take_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@REG.query(
    "quality_referential_integrity",
    oracle="""
    SELECT fk_name, n_child_rows, n_null_keys, n_orphans FROM (
      SELECT 'lineitem.l_orderkey->orders' AS fk_name,
             COUNT(*) AS n_child_rows,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_keys,
             CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             COUNT(*),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             COUNT(*),
             CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN c_nationkey IS NOT NULL AND n_nationkey IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    )
    """,
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the FK graph: per foreign key,
    how many child rows exist, how many carry a NULL key, and how many
    are ORPHANS (non-null key with no parent) — the pre-pipeline gate
    that catches a truncated dimension load before a 100 TB fact join
    silently drops (inner) or null-inflates (left) those rows.

    Plan: each FK check is one left join + 1-row aggregate.  The parent
    side ships only its KEY column (column pruning reaches the scan),
    and dimension-sized parents broadcast — the fact table is never
    shuffled for those; output is |fk| rows.  Orphans are counted via
    the null-extended parent key rather than an anti join so one pass
    yields all three counters."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")

    def check(name, child, ckey, parent, pkey, broadcast_parent):
        p = parent.select(pkey).distinct()
        if broadcast_parent:
            p = F.broadcast(p)
        joined = child.select(ckey).join(
            p, F.col(ckey) == F.col(pkey), "left"
        )
        return joined.agg(
            F.lit(name).alias("fk_name"),
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(F.col(ckey).isNull().cast("bigint")).alias("n_null_keys"),
            F.sum(
                (F.col(ckey).isNotNull() & F.col(pkey).isNull()).cast("bigint")
            ).alias("n_orphans"),
        )
    return (
        check("lineitem.l_orderkey->orders", lineitem, "l_orderkey",
              orders, "o_orderkey", broadcast_parent=False)
        .unionByName(
            check("orders.o_custkey->customer", orders, "o_custkey",
                  customer, "c_custkey", broadcast_parent=True)
        )
        .unionByName(
            check("customer.c_nationkey->nation", customer, "c_nationkey",
                  nation, "n_nationkey", broadcast_parent=True)
        )
    )


ATTR_WINDOW_MS = 7 * 86400000  # attribution lookback: purchase within 7d


@REG.query(
    "events_attribution_linear",
    # ground-truth oracle: per click, the earliest purchase strictly
    # after it (same user, within the window), then linear credit split
    # — a correlated pair join is fine as ORACLE (it is the definition);
    # the engine never materializes the pair space
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id,
             CAST(EPOCH_MS(ts) AS BIGINT) AS c_ms
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(EPOCH_MS(ts) AS BIGINT) AS p_ms
      FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT click_id, user_id, purchase_id FROM (
        SELECT c.click_id, c.user_id, p.purchase_id,
               ROW_NUMBER() OVER (PARTITION BY c.click_id
                                  ORDER BY p.p_ms, p.purchase_id) AS rk
        FROM clicks c JOIN purchases p
          ON c.user_id = p.user_id
         AND p.p_ms > c.c_ms
         AND p.p_ms <= c.c_ms + {ATTR_WINDOW_MS}
      ) WHERE rk = 1
    )
    SELECT click_id, user_id, purchase_id,
           1.0 / (COUNT(*) OVER (PARTITION BY purchase_id)) AS credit
    FROM attributed
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each click is attributed to the
    user's NEXT purchase (strictly after it, within a 7-day window),
    and every click attributed to the same purchase shares its credit
    equally — the marketing-analytics workload that naively explodes
    into a clicks×purchases range join.

    Engine shape: the forward as-of tagged union again (ONE per-user
    shuffle — purchases sort before clicks at the same instant, so the
    following-frame first() is strictly-after by construction, the
    same trick as join_asof_forward), then the window cut is an
    integer-millisecond filter and the credit split is one groupBy on
    the purchase id.  O((clicks+purchases) log) with no pair blowup;
    the oracle IS the pair-join definition, which a 100 TB engine must
    never execute."""
    attributed = attributed_clicks(spark, sf_dir).drop("c_ms")
    n_per_purchase = Window.partitionBy("purchase_id")
    return attributed.select(
        "click_id",
        "user_id",
        "purchase_id",
        (F.lit(1.0) / F.count(F.lit(1)).over(n_per_purchase)).alias("credit"),
    )


def attributed_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(click_id, user_id, purchase_id, c_ms): each click attributed to
    the user's next purchase within the window — the shared tagged-union
    forward-asof relation both attribution models (linear, position)
    credit differently.  See events_attribution_linear for the shape
    rationale."""
    events = read_table(spark, sf_dir, "events")
    p_t = "struct<pid:bigint,pms:bigint>"
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("is_click"),
        F.lit(None).cast(p_t).alias("p"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(0).alias("is_click"),
        F.struct(
            F.col("event_id").alias("pid"),
            F.unix_millis("ts").alias("pms"),
        ).alias("p"),
    )
    # order on the MILLISECOND grain (not raw microsecond timestamps):
    # "strictly after" is defined in ms on both sides, so a purchase in
    # the same ms as a click sorts before it and is correctly excluded
    w = (
        Window.partitionBy("k")
        .orderBy(F.unix_millis("t"), F.col("is_click"), F.col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    attributed = (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "k",
            "is_click",
            F.unix_millis("t").alias("c_ms"),
            F.first("p", ignorenulls=True).over(w).alias("np"),
        )
        .filter(
            (F.col("is_click") == 1)
            & F.col("np").isNotNull()
            & (F.col("np.pms") <= F.col("c_ms") + ATTR_WINDOW_MS)
        )
        .select(
            F.col("event_id").alias("click_id"),
            F.col("k").alias("user_id"),
            F.col("np.pid").alias("purchase_id"),
            "c_ms",
        )
    )
    return attributed


#: Position-based attribution weights in basis points: 40/20/40
#: (first / middle-split / last), the U-shaped model.
ATTR_POS_EDGE_BP = 4000
ATTR_POS_MID_BP = 2000


@REG.query(
    "events_attribution_position",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id,
             CAST(EPOCH_MS(ts) AS BIGINT) AS c_ms
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(EPOCH_MS(ts) AS BIGINT) AS p_ms
      FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT click_id, user_id, purchase_id, c_ms FROM (
        SELECT c.click_id, c.user_id, p.purchase_id, c.c_ms,
               ROW_NUMBER() OVER (PARTITION BY c.click_id
                                  ORDER BY p.p_ms, p.purchase_id) AS rk
        FROM clicks c JOIN purchases p
          ON c.user_id = p.user_id
         AND p.p_ms > c.c_ms
         AND p.p_ms <= c.c_ms + {ATTR_WINDOW_MS}
      ) WHERE rk = 1
    ),
    ranked AS (
      SELECT click_id, user_id, purchase_id,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY c_ms, click_id) AS pos,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n
      FROM attributed
    )
    SELECT click_id, user_id, purchase_id,
           CASE WHEN n = 1 THEN 'only' WHEN pos = 1 THEN 'first'
                WHEN pos = n THEN 'last' ELSE 'middle' END AS position,
           CAST(CASE WHEN n = 1 THEN 10000
                     WHEN n = 2 THEN 5000
                     WHEN pos = 1 THEN {ATTR_POS_EDGE_BP}
                          + ({ATTR_POS_MID_BP}
                             - (n - 2) * ({ATTR_POS_MID_BP} // (n - 2)))
                     WHEN pos = n THEN {ATTR_POS_EDGE_BP}
                     ELSE {ATTR_POS_MID_BP} // (n - 2) END AS BIGINT)
             AS credit_bp
    FROM ranked
    """,
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: the first and
    last click before a purchase get 40% each, the middle clicks split
    the remaining 20% — the model marketing stacks default to when
    linear over-credits long low-intent click trails.  Credits are
    INTEGER BASIS POINTS with the integer-division remainder assigned
    to the first touch, so every purchase's credits sum to exactly
    10000 — the books balance bit-for-bit on both engines, where a
    float 0.2/(n-2) split leaks ulps per purchase (the
    events_cohort_ltv cents discipline applied to credit).

    Rides the SAME one-shuffle tagged-union forward-asof relation as
    events_attribution_linear (attributed_clicks — shared substructure,
    not a second pair join); position rank and touch count share one
    purchase_id window partition, so credit assignment adds a single
    reduced-grain exchange.  The oracle repeats the pair-join
    DEFINITION, which the engine never executes."""
    ranked_w = Window.partitionBy("purchase_id").orderBy("c_ms", "click_id")
    count_w = Window.partitionBy("purchase_id")
    n = F.col("n")
    pos = F.col("pos")
    mid_each = F.expr(f"{ATTR_POS_MID_BP} div (n - 2)")
    credit = (
        F.when(n == 1, 10000)
        .when(n == 2, 5000)
        .when(
            pos == 1,
            F.lit(ATTR_POS_EDGE_BP)
            + (F.lit(ATTR_POS_MID_BP) - (n - 2) * mid_each),
        )
        .when(pos == n, ATTR_POS_EDGE_BP)
        .otherwise(mid_each)
    )
    return (
        attributed_clicks(spark, sf_dir)
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            F.row_number().over(ranked_w).alias("pos"),
            F.count(F.lit(1)).over(count_w).alias("n"),
        )
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            F.when(n == 1, "only")
            .when(pos == 1, "first")
            .when(pos == n, "last")
            .otherwise("middle")
            .alias("position"),
            credit.cast("bigint").alias("credit_bp"),
        )
    )


@REG.query(
    "agg_regression_exact",
    # final rounding goes through oround (Spark shortest-repr HALF_UP),
    # not DuckDB's binary ROUND — see oround's docstring
    oracle=f"""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(l_quantity * l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(l_extendedprice * l_extendedprice AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(CAST(l_quantity * l_extendedprice AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n AS n_samples,
           {oround("(n*sxy - sx*sy) / SQRT((n*sxx - sx*sx) * (n*syy - sy*sy))", 6)}
             AS corr_qty_price,
           {oround("(n*sxy - sx*sy) / (n*sxx - sx*sx)", 6)} AS slope,
           {oround("(sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n", 6)}
             AS intercept
    FROM sums
    """,
)
def agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates with REPRODUCIBLE floats: per-group
    Pearson correlation and least-squares slope/intercept of
    (quantity → price), computed from exact DECIMAL moment sums
    instead of Spark's corr()/regr_slope() streaming aggregates —
    whose double accumulation is partitioning-order-dependent and
    therefore non-deterministic run-to-run on a cluster.

    Every product here is exact in double (bounded integers × 2-dp
    prices stay under 2^53), each converts through its shortest
    decimal repr to DECIMAL (the flagship_revenue_bucketed move), and
    decimal addition is exact and order-independent — so the moment
    sums are bit-identical on ANY partitioning and on both engines.
    The closed-form corr/slope/intercept is then one fixed-order
    double expression per group row, rounded at the compare boundary
    (the text_tfidf precedent).  One shuffle, map-side partial decimal
    sums, |groups| result rows."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,10)"
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast(dec))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast(dec))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = n * F.col("sxy") - sx * sy
    varx_n = n * F.col("sxx") - sx * sx
    vary_n = n * F.col("syy") - sy * sy
    slope = cov_n / varx_n
    return sums.select(
        "l_returnflag",
        n.alias("n_samples"),
        F.round(cov_n / F.sqrt(varx_n * vary_n), 6).alias("corr_qty_price"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@REG.query("agg_hll_union_rollup")  # rows-only: sketch bytes are engine-specific
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE half of the sketch story agg_hll_sketch starts: build
    one HLL sketch per (day, event_type) — the granularity a daily
    pipeline persists — then roll the daily sketch BYTES up to the
    month with hll_union_agg, never touching day-grain events again.
    This is exactly how a 100 TB metrics store serves "monthly uniques"
    without rescanning history: daily sketches are a few KB each, the
    rollup is |days|·|types| rows in, |months|·|types| rows out, and
    unioning sketches is associative so any rollup tree works.

    The companion exact check: the estimate must be sane vs the exact
    month-grain count (asserted in tests/test_plans.py since sketch
    bytes aren't SQL-portable)."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("month", "ts").alias("month"),
        F.col("ts").cast("date").alias("day"),
        "event_type",
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("month", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_daily_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("approx_monthly_users"),
        )
    )


def _ewma_step(acc, x):
    """One EWMA fold step (alpha=0.25), seeded with the first value.

    Written once and reused for both struct fields so the Spark-side
    expression is literally the oracle's ``0.25*x + 0.75*acc`` lambda —
    same IEEE operation order, so the fold is bit-exact across engines.
    """
    return (
        F.when(acc["acc"].isNull(), x["day_total"])
        .otherwise(
            F.lit(0.25) * x["day_total"] + F.lit(0.75) * acc["acc"]
        )
    )


@REG.query(
    "events_ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {oround("SUM(value)")} AS day_total
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    series AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(day_total ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           unnest(days) AS day,
           unnest(vals) AS day_total,
           unnest(list_transform(generate_series(1, len(vals)),
                  i -> list_reduce(vals[1:i],
                       (acc, x) -> 0.25e0 * x + 0.75e0 * acc))) AS ewma
    FROM series
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily EWMA (alpha=0.25, seeded at the first day)
    — the exponential smoother behind every "trend vs today" panel,
    emitted for EVERY day, not just the last.

    EWMA is a left fold (each day's value depends on the previous
    smoothed value), which SQL windows cannot express exactly without
    a recursive CTE; the portable form is the cosine discipline applied
    to recursion: collect each type's (day, total) series sorted, run
    ``F.aggregate`` with a (acc, emitted[]) struct accumulator — the
    SAME left fold ``0.25*x + 0.75*acc`` DuckDB's list_reduce performs
    — and explode the emitted array back to (type, day) grain.  Fixed
    fold order == bit-exact floats on both engines, so even this
    inherently sequential statistic is oracle-hashable.

    Scale shape: the only events-grain shuffle is the daily partial
    agg (map-side combine); the fold runs per event_type over the
    reduced types x days grain — a few hundred doubles per group —
    so cost is O(events) scan + O(types x days) fold at ANY corpus
    size.  A per-user EWMA at 10^9 users partitions the same way
    (user becomes the group key; the series stays bounded by the
    calendar, and applyInPandas takes over if a vector form is
    needed)."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_total"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "day_total"))).alias("s")
    )
    fold = F.aggregate(
        F.col("s"),
        F.struct(
            F.lit(None).cast("double").alias("acc"),
            F.lit(None).cast("array<double>").alias("outs"),
        ),
        lambda acc, x: F.struct(
            _ewma_step(acc, x).alias("acc"),
            F.concat(
                F.coalesce(acc["outs"], F.array().cast("array<double>")),
                F.array(_ewma_step(acc, x)),
            ).alias("outs"),
        ),
        lambda acc: acc["outs"],
    )
    return (
        series.withColumn("ewmas", fold)
        .select("event_type", F.explode(F.arrays_zip("s", "ewmas")).alias("z"))
        .select(
            "event_type",
            F.col("z.s.day").alias("day"),
            F.col("z.s.day_total").alias("day_total"),
            F.col("z.ewmas").alias("ewma"),
        )
    )


#: (applicationId, abs sf_dir) -> (fragmented_dir, compacted_dir) for
#: layout_compact_small_files (ingest-fixture memo discipline).
_COMPACT_FIXTURES: dict = {}

#: Compaction target, in ROWS per output file.  Real compactors target
#: bytes (128-1024 MB); rows make the file count oracle-predictable
#: (ceil(N / target)) while exercising the identical plan.
COMPACT_TARGET_ROWS = 256

#: Fragmentation width of the fixture: one file per doc_id % 64 bucket.
COMPACT_FRAG_BUCKETS = 64


@REG.query(
    "layout_compact_small_files",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT doc_id % {COMPACT_FRAG_BUCKETS}) AS BIGINT)
             AS n_files_before,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CEIL(COUNT(*) / {COMPACT_TARGET_ROWS}.0) AS BIGINT)
             AS n_files_after,
           CAST(SUM(doc_id) AS BIGINT) AS docid_sum
    FROM documents
    """,
)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (OPTIMIZE / bin-packing rewrite): coalesce
    a pathologically fragmented table — one file per doc_id%64 bucket,
    the fixture twin of a streaming sink's per-trigger dribble — into
    ceil(N / target) right-sized files, and prove it from the files
    themselves: every count in the audit row comes from reading
    ``_metadata.file_path`` back off disk, not from the write plan.

    The small-files problem is THE silent lake killer at 100 TB: a
    million 100 KB files cost a scheduler task each, a footer fetch
    each (NameNode/S3 LIST pressure), and defeat row-group pruning.
    Compaction is the maintenance pass every table format schedules
    (Delta OPTIMIZE, Iceberg rewrite_data_files); this operator is its
    engine core: read fragmented -> repartition(ceil(N/target)) ->
    rewrite -> audit.  Round-robin repartition (no keys) is the right
    exchange for pure bin-packing — even output sizes, no skew by
    construction, no sort cost; a clustering compactor would swap in
    repartitionByRange + sortWithinPartitions (the layout_zorder path)
    to ALSO buy pruning locality in the same rewrite.

    Oracle-exactness: the fixture writes partitionBy(bucket) after
    repartition(64, bucket), so each bucket lands wholly in one task =
    exactly one file per distinct bucket value (n_files_before =
    COUNT(DISTINCT doc_id%64), SQL-predictable); the compacted count is
    exactly the repartition width (round-robin leaves no partition
    empty at N >> files).  Rows-per-file targets keep the arithmetic
    engine-portable; production compacts to BYTES via the scan
    statistics the same plan already collects."""
    import os

    memo_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    dirs = _COMPACT_FIXTURES.get(memo_key)
    if dirs is None:
        import hashlib

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        if docs.isEmpty():
            # Empty corpus: nothing to fragment or compact.  Writing
            # would still produce max(1, ceil(0/target)) = 1 empty part
            # file (and a row-less parquet dir whose read-back can fail
            # schema inference), diverging from the oracle's
            # CEIL(0/256.0) = 0.  Emit the audit row directly: all
            # counts 0, docid_sum NULL (SUM over zero rows).
            return spark.createDataFrame(
                [(0, 0, 0, None)],
                "n_files_before bigint, n_rows bigint, "
                "n_files_after bigint, docid_sum bigint",
            )
        # Session-keyed scratch tag like ensure_bpe_table: hashing only
        # the corpus path would resolve two concurrent sessions to the
        # SAME directory, so one session's overwrite could tear the
        # other's memoized read-back.
        tag = hashlib.sha1("\x00".join(memo_key).encode()).hexdigest()[:12]
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.pardir,
            ".scratch",
            f"compact_{os.path.basename(os.path.normpath(sf_dir))}_{tag}",
        )
        frag_dir = os.path.join(root, "fragmented")
        comp_dir = os.path.join(root, "compacted")
        frag = docs.withColumn(
            "b", (F.col("doc_id") % COMPACT_FRAG_BUCKETS).cast("int")
        )
        # repartition on b THEN partitionBy(b): each bucket is wholly
        # inside one task, so exactly one file per bucket value
        frag.repartition(COMPACT_FRAG_BUCKETS, "b").write.mode(
            "overwrite"
        ).partitionBy("b").parquet(frag_dir)

        n = spark.read.parquet(frag_dir).count()
        n_out = max(1, -(-n // COMPACT_TARGET_ROWS))  # ceil
        spark.read.parquet(frag_dir).drop("b").repartition(n_out).write.mode(
            "overwrite"
        ).parquet(comp_dir)
        dirs = (frag_dir, comp_dir)
        _COMPACT_FIXTURES[memo_key] = dirs

    frag_dir, comp_dir = dirs
    before = (
        spark.read.parquet(frag_dir)
        .select(F.col("_metadata.file_path").alias("fp"))
        .agg(F.count_distinct("fp").alias("n_files_before"))
    )
    after = (
        spark.read.parquet(comp_dir)
        .select("doc_id", F.col("_metadata.file_path").alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("fp").alias("n_files_after"),
            F.sum("doc_id").alias("docid_sum"),
        )
    )
    return before.crossJoin(after).select(
        "n_files_before", "n_rows", "n_files_after", "docid_sum"
    )


#: Interval-overlap join: bin width in days, chosen EQUAL to the
#: interval span so every interval lands in at most 2 bins (<=2x row
#: amplification), the standard sizing for binned range joins.
OVERLAP_BIN_DAYS = 7
_OVERLAP_EPOCH = "1992-01-01"  # any fixed day before the data's range


@REG.query(
    "join_interval_overlap",
    oracle="""
    WITH r AS (
      SELECT o_orderkey AS r_key,
             CAST(o_orderdate AS DATE) AS r_start,
             CAST(o_orderdate AS DATE) + 7 AS r_end
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    ), s AS (
      SELECT o_orderkey AS s_key,
             CAST(o_orderdate AS DATE) AS s_start,
             CAST(o_orderdate AS DATE) + 7 AS s_end
      FROM orders
      WHERE o_orderpriority = '2-HIGH'
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    )
    SELECT r_key AS orderkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM r JOIN s ON r_start <= s_end AND s_start <= r_end
    GROUP BY r_key
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval OVERLAP join via time binning — the range-
    join optimization every lakehouse engine ships (Delta's binned
    range join, the genomics/temporal-SQL overlap pattern), here as
    pure DataFrame ops: for each 1996 urgent order's 7-day window,
    how many HIGH-priority order windows overlap it.

    join_range_binned handles POINT-in-band; this is the harder
    interval-vs-interval case.  Plan: each interval explodes into the
    day-bins it touches (bin width == interval span, so <=2 bins per
    interval — bounded amplification, no skew from long intervals);
    the join is a plain bin equi-join with the overlap predicate
    applied map-side.  The classic double-count hazard (a pair sharing
    2 bins would match twice) is eliminated with the FIRST-SHARED-BIN
    predicate — bin == floor(greatest(r_start, s_start) / W) — a pure
    map-side filter, NOT a distinct (a distinct here would be a second
    full shuffle of the pair relation, the expensive wrong fix).  At
    100 TB the bin is the shuffle key: burst days (hot bins) split
    under AQE skew-join like any hot key, and when one side is small
    the bin layer drops away entirely in favor of a broadcast +
    predicate.  The oracle is the quadratic form of the same join —
    DuckDB plans an IEJoin, Spark never materializes the quadratic."""
    W = OVERLAP_BIN_DAYS
    orders = read_table(spark, sf_dir, "orders")

    def intervals(priority: str, prefix: str) -> DataFrame:
        d = orders.filter(
            (F.col("o_orderpriority") == priority)
            & F.to_date("o_orderdate").between("1996-01-01", "1996-12-31")
        ).select(
            F.col("o_orderkey").alias(f"{prefix}_key"),
            F.datediff(F.to_date("o_orderdate"), F.lit(_OVERLAP_EPOCH))
            .alias(f"{prefix}_d0"),
        )
        return d.withColumn(f"{prefix}_d1", F.col(f"{prefix}_d0") + 7)

    r = intervals("1-URGENT", "r").withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("r_d0") / W), F.floor(F.col("r_d1") / W)
            )
        ),
    )
    s = intervals("2-HIGH", "s").withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s_d0") / W), F.floor(F.col("s_d1") / W)
            )
        ),
    )
    pairs = r.join(s, "bin").filter(
        (F.col("r_d0") <= F.col("s_d1"))
        & (F.col("s_d0") <= F.col("r_d1"))
        # first-shared-bin: count each overlapping pair exactly once
        & (F.col("bin") == F.floor(F.greatest("r_d0", "s_d0") / W))
    )
    return pairs.groupBy(F.col("r_key").alias("orderkey")).agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


@REG.query(
    "window_open_intervals",
    oracle="""
    WITH iv AS (
      SELECT CAST(o_orderdate AS DATE) AS d0,
             CAST(o_orderdate AS DATE) + 7 AS d1
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    ),
    deltas AS (
      SELECT d0 AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT d1 + 1 AS day, -1 AS delta FROM iv
    ),
    daily AS (SELECT day, SUM(delta) AS net FROM deltas GROUP BY day)
    SELECT day, CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS n_open
    FROM daily
    """,
)
def window_open_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: how many 1996 urgent-order
    windows are OPEN on each day the count changes — the classic
    "concurrent sessions / open tickets / peak load" timeline, and the
    stabbing-count complement of join_interval_overlap (that one asks
    which intervals overlap EACH OTHER; this one asks how many cover
    each point).

    The naive form joins every interval to every day it covers (rows x
    span) then counts per day; the sweep needs only the ENDPOINTS:
    each interval contributes (+1 at start, -1 past end), the deltas
    aggregate to the day grain map-side, and one running sum over that
    reduced grain replays the timeline.  The unpartitioned window is
    DELIBERATE and safe: it runs on the post-aggregation day grain
    (≤366 rows/year here; a few thousand at any horizon), the
    aggregate-then-recurse shape shared with events_ewma_daily — the
    raw interval relation never sees a window.  At 100 TB the endpoint
    explode is 2 rows per interval regardless of span length (a
    year-long interval costs the same as a day), which is exactly why
    sweeps beat per-day explodes for long-lived intervals."""
    iv = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.to_date("o_orderdate").between("1996-01-01", "1996-12-31")
        )
        .select(F.to_date("o_orderdate").alias("d0"))
        .withColumn("d1", F.date_add("d0", 7))
    )
    deltas = iv.select(
        F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", F.sum("net").over(w).cast("bigint").alias("n_open")
    )


@REG.query(
    "events_seasonality_profile",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(DAYOFWEEK(ts) + 1 AS BIGINT) AS dow,
             CAST(HOUR(ts) AS BIGINT) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, dow, hour,
           CAST(n AS BIGINT) AS n_events,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type) AS share
    FROM g
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: event volume by (type, day-of-week,
    hour-of-day) with each cell's share of its type's total — the
    baseline that turns anomaly detection (events_anomaly_mad, the
    drift chi²) from "today differs from yesterday" into "today differs
    from what Mondays at 9am normally look like", and the evidence for
    load-shaping decisions (when to schedule compaction, what a
    streaming job's peak state looks like).

    Pure count arithmetic — integer cells, one exact integer-ratio
    division for the share — so both engines agree bit-for-bit (the
    float-SUM-order trap that makes naive AVG(value) profiles
    cross-engine-unstable is structurally absent).  Plan: one map-side
    partial-agg shuffle to the (type, dow, hour) grain (≤ 840 rows),
    then the share window runs on that reduced grain — the
    aggregate-then-recurse shape again.  Calendar gotcha pinned by the
    oracle: Spark dayofweek is 1=Sunday..7 while DuckDB DAYOFWEEK is
    0=Sunday..6 — the oracle adds 1 so both emit the Spark convention."""
    from pyspark.sql import Window

    g = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.dayofweek("ts").cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    return g.select(
        "event_type",
        "dow",
        "hour",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("share"),
    )


@REG.query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_supp,
           CAST(COUNT(DISTINCT l_suppkey // 32) AS BIGINT) AS n_words
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT count-distinct at scale via two-level bitmap aggregation —
    the roaring-bitmap trick expressed in pure relational algebra: ids
    fold into 32-bit words (word = id div 32, bit = id mod 32), stage 1
    ORs the bit masks per (group, word), stage 2 sums popcounts per
    group.  The answer is exactly COUNT(DISTINCT id), with NO Expand
    (the exact-distinct planner move that replicates every input row
    per distinct column) and NO sketch error.

    Why it matters at 100 TB: exact distinct over a high-cardinality
    key normally forces a (group, id)-grain dedup shuffle whose width
    is the DATA size; the bitmap form's stage-1 grain is
    (group, id/32) — already 32× smaller — and both stages are
    map-side combinable (BIT_OR and SUM are associative), so the
    shuffle carries one long per 32-id block per group per partition.
    The same shape extends to distinct-merge across days: persist the
    per-word masks and OR them — the exact analogue of agg_hll_sketch's
    mergeable bytes, without the 2% error.

    Exactness: pure integer bit arithmetic both sides; the oracle
    states the SPEC (true COUNT DISTINCT) rather than mirroring the
    bitmap — the stronger check: any lost or double-set bit breaks the
    hash.  n_words audits the bitmap's footprint (occupied words)."""
    li = read_table(spark, sf_dir, "lineitem")
    words = (
        li.select(
            "l_returnflag",
            # integer FLOOR division, never (x / 32).cast: the double
            # route loses low bits past 2^53 and truncates toward zero
            # for negative ids (colliding word 0 with word -1, i.e. the
            # oracle's `// 32`); subtracting pmod first makes the value
            # exactly divisible, so integer div == floor for any int64
            F.expr(
                "(l_suppkey - pmod(l_suppkey, 32)) div 32"
            ).alias("word"),
            F.expr(
                "shiftleft(1L, cast(pmod(l_suppkey, 32) as int))"
            ).alias("mask"),
        )
        .groupBy("l_returnflag", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.groupBy("l_returnflag").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_supp"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )


@REG.query(
    "agg_weighted_median",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    byval AS (SELECT c, CAST(SUM(w) AS BIGINT) AS w FROM vals GROUP BY c),
    cum AS (
      SELECT c, w,
             CAST(SUM(w) OVER (ORDER BY c) AS BIGINT) AS cw,
             CAST(SUM(w) OVER () AS BIGINT) AS tot
      FROM byval
    )
    SELECT CAST(MAX(tot) AS BIGINT) AS total_weight,
           CAST(MIN(c) AS BIGINT) AS wmedian_cents,
           CAST(MIN(c) AS DOUBLE) / 100.0 AS wmedian_price
    FROM cum WHERE cw * 2 >= tot
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — the order statistic engines don't ship: the
    smallest value whose cumulative weight reaches half the total
    (here: the price at which half of all shipped QUANTITY sits at or
    below — 'the median unit sold', not 'the median line item').
    Inventory/revenue questions are weight-grain, not row-grain, and
    approx_percentile has no weighted form, so this is a real gap.

    Plan: one map-side-combinable shuffle collapses the fact table to
    the (value → total weight) grain; the cumulative scan then runs
    over DISTINCT VALUES only (price cents here — bounded by the price
    domain, not the row count).  That relation is small enough to
    window directly; at extreme value-domains the two-level bucket
    split of agg_median_twolevel composes on top unchanged (bucket by
    value range, locate the boundary bucket by cumulative weight, scan
    only it).  Exactness: integer cents × integer quantities, integer
    cumulative sums, one final /100 — bit-identical everywhere."""
    li = read_table(spark, sf_dir, "lineitem")
    byval = (
        li.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("c"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("c")
        .agg(F.sum("w").alias("w"))
    )
    cum = byval.select(
        "c",
        F.sum("w").over(Window.orderBy("c")).cast("bigint").alias("cw"),
        F.sum("w").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("tot"),
    )
    return cum.filter(F.col("cw") * 2 >= F.col("tot")).agg(
        F.max("tot").alias("total_weight"),
        F.min("c").alias("wmedian_cents"),
        (F.min("c").cast("double") / 100.0).alias("wmedian_price"),
    )


@REG.query(
    "agg_skew_kurtosis_exact",
    oracle=f"""
    WITH sums AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(l_quantity * l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(CAST(l_quantity * l_quantity * l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS VARCHAR) AS DECIMAL(38,10))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    cm AS (
      SELECT l_returnflag, n,
             n * s2 - s1 * s1 AS m2n,
             n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3n,
             n * n * n * s4 - 4 * n * n * s1 * s3
               + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS m4n,
             s1 / n AS mean_qty
      FROM sums
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_samples,
           {oround("mean_qty", 6)} AS mean_qty,
           CASE WHEN m2n > 0 THEN
             {oround("m3n / (m2n * SQRT(m2n))", 6)} END AS skewness,
           CASE WHEN m2n > 0 THEN
             {oround("m4n / (m2n * m2n) - 3", 6)} END AS kurtosis_excess
    FROM cm
    """,
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics with REPRODUCIBLE floats: per-group
    population skewness and excess kurtosis from exact DECIMAL power
    sums — the agg_regression_exact discipline extended to 3rd/4th
    moments.  Spark's skewness()/kurtosis() stream doubles in
    partition order and give answers that differ run-to-run on a
    cluster; quality gates that CUT on a skewness threshold (drift
    monitors, outlier-tail detectors) need the same number every run.

    Exactness: bounded integers (quantities) keep every power < 2^53
    exact in double; each converts through its shortest decimal repr
    to DECIMAL, decimal sums are exact and order-independent, and the
    closed forms — g1 = n³m3/(n²m2)^1.5 · n^... reduced to
    m3n/(m2n·√m2n) and g2 = m4n/m2n² − 3, all in the ×n-scaled
    integer central moments m2n = n·s2 − s1² etc. — are fixed-order
    double expressions identical on both engines (√ via SQRT, never
    POWER(x,1.5): sqrt is IEEE-correctly-rounded, pow is libm-
    dependent).  Degenerate groups (zero variance) yield NULL via the
    same guard both sides.  One shuffle, map-side partial decimal
    sums, |groups| rows."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,10)"
    q = F.col("l_quantity")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast(dec)).cast("double").alias("s1"),
        F.sum((q * q).cast(dec)).cast("double").alias("s2"),
        F.sum((q * q * q).cast(dec)).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast(dec)).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m2n = n * s2 - s1 * s1
    m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    m4n = (
        n * n * n * s4
        - 4 * n * n * s1 * s3
        + 6 * n * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    )
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_samples"),
        F.round(s1 / n, 6).alias("mean_qty"),
        F.when(m2n > 0, F.round(m3n / (m2n * F.sqrt(m2n)), 6)).alias(
            "skewness"
        ),
        F.when(m2n > 0, F.round(m4n / (m2n * m2n) - 3, 6)).alias(
            "kurtosis_excess"
        ),
    )


@REG.query(
    "events_funnel_conversion_time",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    lags AS (
      SELECT 'view_to_click' AS step,
             CAST(EPOCH_MS(t_click) - EPOCH_MS(t_view) AS BIGINT) AS lag_ms
      FROM stage WHERE t_click > t_view
      UNION ALL
      SELECT 'click_to_purchase' AS step,
             CAST(EPOCH_MS(t_purchase) - EPOCH_MS(t_click) AS BIGINT)
      FROM stage WHERE t_click > t_view AND t_purchase > t_click
    )
    SELECT step,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           QUANTILE_CONT(lag_ms, 0.5) AS median_lag_ms,
           QUANTILE_CONT(lag_ms, 0.9) AS p90_lag_ms,
           CAST(MAX(lag_ms) AS BIGINT) AS max_lag_ms
    FROM lags GROUP BY step
    """,
)
def events_funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution per funnel step — events_funnel
    says who converted; this says how long each hop took (median/p90/
    max lag from first view to first later click, and from that click
    to first later purchase), the number a growth team actually tunes
    against and the SLA input for re-engagement triggers.

    Plan: the same ONE conditional-min aggregation pass as
    events_funnel (stage timestamps per user, one user_id shuffle —
    never a per-step self-join), then two filtered projections union
    into a 2-group percentile aggregate over |converted users| rows.
    Exactness: lags are integer epoch-milliseconds (unix_millis /
    EPOCH_MS, the proven-portable pair); linear-interpolated
    percentiles over integers follow the agg_percentiles discipline
    (Spark percentile == DuckDB QUANTILE_CONT bit-for-bit on integer
    inputs); step-gating comparisons are NULL-strict in both engines
    (a missing stage drops the row, never fabricates a lag)."""
    events = read_table(spark, sf_dir, "events")
    stage = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    vc = stage.filter(F.col("t_click") > F.col("t_view")).select(
        F.lit("view_to_click").alias("step"),
        (F.unix_millis("t_click") - F.unix_millis("t_view")).alias("lag_ms"),
    )
    cp = stage.filter(
        (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click"))
    ).select(
        F.lit("click_to_purchase").alias("step"),
        (F.unix_millis("t_purchase") - F.unix_millis("t_click")).alias(
            "lag_ms"
        ),
    )
    return vc.unionByName(cp).groupBy("step").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("lag_ms", 0.5).alias("median_lag_ms"),
        F.percentile("lag_ms", 0.9).alias("p90_lag_ms"),
        F.max("lag_ms").alias("max_lag_ms"),
    )


@REG.query(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.cents,
             t.n_days * d.cents - t.total_cents AS dev_n
      FROM daily d JOIN tot t USING (event_type)
    ),
    cum AS (
      SELECT event_type, day, cents, dev_n,
             CAST(SUM(dev_n) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS cusum_n,
             MEDIAN(ABS(dev_n)) OVER (PARTITION BY event_type) AS mad_n
      FROM dev
    )
    SELECT event_type, day,
           CAST(cents AS DOUBLE) / 100.0 AS day_total,
           cusum_n, mad_n,
           ABS(cusum_n) > 3 * mad_n AS flagged
    FROM cum
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily per-type revenue: the
    cumulative sum of deviations from the series mean drifts away from
    zero when the underlying level SHIFTS (a price change, a tracking
    bug, a launch) — the classic control-chart statistic that catches
    sustained regime changes the per-day MAD anomaly gate
    (events_anomaly_mad) ignores, because no single day is extreme.
    Days where |CUSUM| exceeds 3 robust deviations are flagged; the
    maximum-|CUSUM| day estimates the changepoint location.

    Exactness: everything stays INTEGER until the display columns —
    daily totals quantize to cents, the mean is never divided out
    (deviation is scaled by n: dev_n = n·cents − total, exact), the
    running CUSUM is an integer window sum, and the robust scale is a
    MEDIAN of integers (one exact halving at worst).  The flag
    compares integers against 3×median — bit-identical engines.

    Plan: one raw-events shuffle to the (type, day) grain; everything
    after runs on ~365 rows/type/year — window partitions are
    type-keyed (never global), the mean rides the same reduced grain,
    and at 100 TB the daily grain IS the statistic (the raw stream
    never re-shuffles)."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.round(F.sum("value") * 100).cast("bigint").alias("cents")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("total_cents"),
    )
    dev = daily.join(F.broadcast(tot), "event_type").withColumn(
        "dev_n", F.col("n_days") * F.col("cents") - F.col("total_cents")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = dev.select(
        "event_type",
        "day",
        "cents",
        "dev_n",
        F.sum("dev_n").over(w_run).cast("bigint").alias("cusum_n"),
        F.median(F.abs(F.col("dev_n"))).over(w_all).alias("mad_n"),
    )
    return cum.select(
        "event_type",
        "day",
        (F.col("cents").cast("double") / 100.0).alias("day_total"),
        "cusum_n",
        "mad_n",
        (F.abs(F.col("cusum_n")) > 3 * F.col("mad_n")).alias("flagged"),
    )


@REG.query(
    "graph_degree_distribution",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT user_id,
             TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NOT NULL
    ),
    capped AS (
      SELECT user_id, item FROM (
        SELECT user_id, item,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rk
        FROM items
      ) WHERE rk <= {COOC_USER_CAP}
    ),
    edges AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_users
      FROM capped a JOIN capped b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    degrees AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT item_a AS item FROM edges
        UNION ALL SELECT item_b FROM edges
      ) GROUP BY item
    )
    SELECT degree,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM degrees) AS share
    FROM degrees GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the item co-occurrence graph — the
    first-look structural audit for ANY graph workload (PageRank,
    triangles, components): a heavy right tail says hub items will
    skew every per-vertex shuffle (salt them), a mass at degree 1
    says the graph is mostly trivial pairs and the component pass is
    overkill.  Run this BEFORE graph_pagerank to size its iterations
    and checkpoint cadence.

    Plan: the edge list comes from the same capped per-user self-join
    as events_item_cooccurrence (bounded cap² pair emission — never an
    uncapped basket blowup); degrees are one union + count at the item
    grain; the histogram is a second tiny aggregation at the degree
    grain with the total broadcast back for shares.  Everything after
    the edge join runs on |items| rows, then |distinct degrees| rows —
    the two-level collapse every distribution query here uses."""
    edges = events_item_cooccurrence(spark, sf_dir)
    # cache the item-grain relation: hist and the total both consume it,
    # and without the cache each consumer re-plans the whole capped
    # co-occurrence self-join above it (the dominant cost — 59 s cold
    # at 100×) instead of paying it once.  |items| rows — tiny.
    degrees = (
        edges.select(F.col("item_a").alias("item"))
        .unionByName(edges.select(F.col("item_b").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("degree"))
        .cache()
    )
    hist = degrees.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    # total items = sum over the histogram — derived from hist, so the
    # broadcast probe never touches the edge subtree at all
    total = hist.agg(F.sum("n_items").cast("bigint").alias("n_total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "degree",
        "n_items",
        (F.col("n_items").cast("double") / F.col("n_total")).alias("share"),
    )


@REG.query(
    "quality_ks_test",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
             l_returnflag = 'R' AS is_r
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ),
    byval AS (
      SELECT c,
             CAST(COUNT(*) FILTER (WHERE is_r) AS BIGINT) AS n_r,
             CAST(COUNT(*) FILTER (WHERE NOT is_r) AS BIGINT) AS n_a
      FROM vals GROUP BY c
    ),
    cum AS (
      SELECT CAST(SUM(n_r) OVER (ORDER BY c) AS BIGINT) AS cum_r,
             CAST(SUM(n_a) OVER (ORDER BY c) AS BIGINT) AS cum_a,
             CAST(SUM(n_r) OVER () AS BIGINT) AS tot_r,
             CAST(SUM(n_a) OVER () AS BIGINT) AS tot_a
      FROM byval
    )
    SELECT CAST(MAX(tot_r) AS BIGINT) AS n_r,
           CAST(MAX(tot_a) AS BIGINT) AS n_a,
           MAX(ABS(CAST(cum_r AS DOUBLE) / tot_r
                   - CAST(cum_a AS DOUBLE) / tot_a)) AS d_stat,
           MAX(ABS(CAST(cum_r AS DOUBLE) / tot_r
                   - CAST(cum_a AS DOUBLE) / tot_a))
             > 1.358 * SQRT(CAST(MAX(tot_r) + MAX(tot_a) AS DOUBLE)
                            / (CAST(MAX(tot_r) AS DOUBLE) * MAX(tot_a)))
             AS rejected_05
    FROM cum
    """,
)
def quality_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test — the NUMERIC analogue
    of quality_drift_chi2: D = max |CDF₁ − CDF₂| between the returned
    ('R') and accepted ('A') price populations, with the α=0.05
    rejection verdict (c(α)=1.358).  Chi-square needs binning and goes
    blind to shape changes within a bin; KS compares the full empirical
    distributions — the right gate for 'did this batch's price/length/
    score distribution shift?' in data-quality monitoring.

    Exactness: the per-value CDF gap is two divisions of exact integer
    cumulative counts — the identical fixed-order IEEE expression on
    both engines, so the MAX picks the same row and the same double
    everywhere (no float ACCUMULATES across rows; each row's diff is a
    pure function of its exact integers).  Deliberately NOT the
    cross-multiplied |cum₁·n₂ − cum₂·n₁| integer form: that product
    silently overflows int64 once each population passes ~3e9 rows —
    Spark wraps, DuckDB raises — exactly the 100 TB cliff class
    functions/hashing.py documents.  The double form is overflow-free
    at any scale.

    Plan: the fact table collapses map-side to the distinct-value
    grain (the agg_weighted_median shape) with both populations
    counted in ONE pass (conditional counts, no second scan); the
    cumulative windows run over distinct cents only.  At extreme value
    domains the two-level bucket split composes unchanged."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    byval = (
        li.select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
            (F.col("l_returnflag") == "R").alias("is_r"),
        )
        .groupBy("c")
        .agg(
            F.count(F.when(F.col("is_r"), 1)).alias("n_r"),
            F.count(F.when(~F.col("is_r"), 1)).alias("n_a"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = byval.select(
        F.sum("n_r").over(Window.orderBy("c")).cast("bigint").alias("cum_r"),
        F.sum("n_a").over(Window.orderBy("c")).cast("bigint").alias("cum_a"),
        F.sum("n_r").over(w_all).cast("bigint").alias("tot_r"),
        F.sum("n_a").over(w_all).cast("bigint").alias("tot_a"),
    )
    gap = F.abs(
        F.col("cum_r").cast("double") / F.col("tot_r")
        - F.col("cum_a").cast("double") / F.col("tot_a")
    )
    n_r, n_a = F.max("tot_r"), F.max("tot_a")
    d_stat = F.max(gap)
    return cum.agg(
        n_r.alias("n_r"),
        n_a.alias("n_a"),
        d_stat.alias("d_stat"),
        (
            d_stat
            > 1.358
            * F.sqrt(
                (n_r + n_a).cast("double") / (n_r.cast("double") * n_a)
            )
        ).alias("rejected_05"),
    )


#: Bot gate: a user whose busiest minute holds at least this many
#: events is flagged (real pipelines calibrate this per surface).
BOT_RATE_MAX_PER_MIN = 3


@REG.query(
    "events_bot_rate_gate",
    oracle=f"""
    WITH permin AS (
      SELECT user_id, DATE_TRUNC('minute', ts) AS minute,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, DATE_TRUNC('minute', ts)
    )
    SELECT user_id,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_active_minutes,
           CAST(MAX(n) AS BIGINT) AS max_per_minute,
           MAX(n) >= {BOT_RATE_MAX_PER_MIN} AS is_bot
    FROM permin GROUP BY user_id
    """,
)
def events_bot_rate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot / scraper detection by burst rate: per user, the busiest
    minute's event count — a human cannot click N times a minute for
    long, so max-rate is the cheapest high-precision bot signal, and
    bot REMOVAL is a standard pre-training filter for behavioral data
    (one bot user poisons funnel, retention, AND co-occurrence stats;
    events_item_cooccurrence's basket cap bounds the damage, this gate
    removes the cause).

    Plan: two stacked aggregations, both map-side combinable — raw
    events reduce to the (user, minute) grain in the ONE data-sized
    shuffle, then to the user grain.  No windows, no self-joins; at
    100 TB this is the same cost class as events_funnel.  date_trunc
    to the minute matches DuckDB DATE_TRUNC exactly (both truncate,
    integer semantics — the proven scalar_date_funcs pair)."""
    events = read_table(spark, sf_dir, "events")
    permin = events.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("n"))
    return permin.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_minutes"),
        F.max("n").alias("max_per_minute"),
        (F.max("n") >= BOT_RATE_MAX_PER_MIN).alias("is_bot"),
    )


_ORDER_GAPS_ORACLE = """
    WITH gaps AS (
      SELECT o_custkey,
             CAST(DATEDIFF('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
           MEDIAN(gap_days) AS median_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """


@REG.query(
    "window_order_gaps",
    oracle=_ORDER_GAPS_ORACLE,
    prod_twin="window_order_gaps_twolevel",
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency per customer: day gaps between a
    customer's consecutive orders (lag over the customer partition,
    orderkey tie-break) reduced to min/median/max — the input to
    churn models ('customer is N× past their median gap → at risk')
    and to events_resample_gapfill-style replenishment forecasts.

    Plan: one shuffle on o_custkey serves BOTH the lag window and the
    final per-customer aggregate (same key, no second exchange); per-
    customer state is bounded by order count, so the window grain is
    safe at any scale.  Exactness: integer day arithmetic; MEDIAN over
    integers interpolates one exact halving at worst (the
    events_changepoint_cusum discipline)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).cast("bigint").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_orders"),
        F.min("gap_days").alias("min_gap_days"),
        F.median("gap_days").alias("median_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@REG.query("window_order_gaps_twolevel", oracle=_ORDER_GAPS_ORACLE)
def window_order_gaps_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_order_gaps' whale-key production form — same oracle,
    bit-identical output, with the UNBOUNDED per-customer aggregation
    state removed: F.median buffers every gap of a key in the
    aggregate's memory (an in-memory array that a retail-whale /
    bot-account key grows without limit — the one term that OOMs
    rather than degrades), so the median is read off the (customer,
    gap_days, count) HISTOGRAM instead — the agg_median_twolevel
    discipline.  Day gaps live in a small integer domain, and the
    histogram groupBy runs on data the lag window has ALREADY
    partitioned by customer, so the map-side partial aggregation
    collapses each task's rows to its own customers' histogram rows —
    the exchange after it carries the global histogram grain
    (≤ customers × calendar days), never the corpus.  min/max/median
    all read off the cumulative histogram: v_lo at rank (n+1) div 2,
    v_hi at rank n div 2 + 1, median = (v_lo + v_hi) / 2 exactly
    (integer halving is exact in doubles, both engines).

    The lag window itself keeps the per-customer sort: that term is a
    disk-backed EXTERNAL sort (degrades to a straggler, never OOM),
    and the measured alternative is worse — a (customer, month)
    bucketed-lag decomposition that bounds the sort too was built and
    measured at 2.6x the cost on the balanced 150M-order corpus
    (BASELINE.md round 7): its boundary join and its histogram both
    run on (customer, month)-partitioned data, so every task sees
    every customer and the partial aggregation degenerates to nearly
    corpus-sized state.  Decomposition that fights the partitioning
    loses to the spillable sort it replaces."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).cast("bigint").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    hist = gaps.groupBy("o_custkey", "gap_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    # ONE linear pipeline over the histogram: the cumulative count and
    # the per-customer total both come from windows sharing the SAME
    # (histogram-sized) sort — a groupBy-totals + join formulation
    # would give `hist` two consumers, and Spark shares no subplans,
    # so the corpus-sized window above would execute twice (measured:
    # 347 s vs 33 s on the 150M-order corpus).
    wcum = Window.partitionBy("o_custkey").orderBy("gap_days")
    wall = Window.partitionBy("o_custkey").orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stats = hist.select(
        "o_custkey",
        "gap_days",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    # median ranks: lo = (n + 1) div 2, hi = n div 2 + 1 (1-indexed)
    lo_rank = F.expr("(n + 1) div 2")
    hi_rank = F.expr("n div 2 + 1")
    picked = stats.groupBy("o_custkey").agg(
        (F.max("n") + 1).cast("bigint").alias("n_orders"),
        F.min("gap_days").cast("bigint").alias("min_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.min(F.when(F.col("cum") >= lo_rank, F.col("gap_days"))).alias(
            "v_lo"
        ),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("gap_days"))).alias(
            "v_hi"
        ),
    )
    return picked.select(
        "o_custkey",
        "n_orders",
        "min_gap_days",
        ((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("median_gap_days"),
        "max_gap_days",
    )


@REG.query(
    "quality_outlier_iqr",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    fences AS (
      SELECT l_returnflag,
             QUANTILE_CONT(c, 0.25) AS q1,
             QUANTILE_CONT(c, 0.75) AS q3
      FROM cents GROUP BY l_returnflag
    )
    SELECT c.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(f.q1) AS q1_cents,
           MAX(f.q3) AS q3_cents,
           CAST(COUNT(*) FILTER (
             WHERE c.c < f.q1 - 1.5 * (f.q3 - f.q1)
                OR c.c > f.q3 + 1.5 * (f.q3 - f.q1)) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) FILTER (
             WHERE c.c < f.q1 - 1.5 * (f.q3 - f.q1)
                OR c.c > f.q3 + 1.5 * (f.q3 - f.q1)) AS DOUBLE)
             / COUNT(*) AS outlier_rate
    FROM cents c JOIN fences f USING (l_returnflag)
    GROUP BY c.l_returnflag
    """,
)
def quality_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per group: count rows outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] of their group's price distribution —
    the robust outlier RATE that complements quality_winsorize (which
    CLIPS at percentile fences) and events_anomaly_mad (time-series
    grain): a group whose outlier_rate jumps between ingest batches
    has a tail problem upstream.

    Plan: exact q1/q3 per group in one percentile aggregation, fences
    broadcast back onto the scan, conditional counts in a second
    map-side-combinable pass — two scans, zero windows.  Exactness:
    integer cents against interpolated-percentile fences (the
    agg_percentiles discipline); the fence arithmetic is one
    fixed-order double expression written identically both sides."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    # both quantiles from ONE percentile accumulator (array form) —
    # halves the per-group sorted state vs two separate aggregates
    fences = (
        cents.groupBy("l_returnflag")
        .agg(F.percentile("c", F.array(F.lit(0.25), F.lit(0.75))).alias("qs"))
        .select(
            "l_returnflag",
            F.element_at("qs", 1).alias("q1"),
            F.element_at("qs", 2).alias("q3"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("c") < F.col("q1") - 1.5 * iqr) | (
        F.col("c") > F.col("q3") + 1.5 * iqr
    )
    out = F.count(F.when(is_out, 1)).cast("bigint")
    return (
        cents.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("q1").alias("q1_cents"),
            F.max("q3").alias("q3_cents"),
            out.alias("n_outliers"),
            (out.cast("double") / F.count(F.lit(1))).alias("outlier_rate"),
        )
    )


@REG.query(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_day,
             CAST(DATEDIFF('day', f.cohort_day, CAST(e.ts AS DATE))
                  AS BIGINT) AS age_days,
             e.user_id, e.value
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    daily AS (
      SELECT cohort_day, age_days,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS revenue_cents,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
      FROM rev GROUP BY cohort_day, age_days
    )
    SELECT cohort_day, age_days, revenue_cents, n_buyers,
           CAST(SUM(revenue_cents) OVER (
             PARTITION BY cohort_day ORDER BY age_days) AS BIGINT)
             AS cum_revenue_cents
    FROM daily
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curves: purchase revenue by (signup
    cohort, days since signup) with the running cumulative — the
    revenue-grain companion to events_cohort_retention (which counts
    ACTIVE users): marketing breaks even where the cum-LTV curve
    crosses acquisition cost, and cohorts whose curves flatten earlier
    than their predecessors are the churn signal.

    Plan: one user-grain MIN pass pins each user's cohort day, one
    user_id equi-join tags purchases (both sides hash the same key —
    co-partitioned on a cluster), one (cohort, age) reduction, and the
    cumulative window runs per cohort over ≤ |days| rows.  Exactness:
    integer day arithmetic; daily revenue quantizes to cents BEFORE
    the running sum, so the cumulative is an exact integer fold (the
    events_changepoint_cusum discipline)."""
    events = read_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("bigint")
            .alias("age_days"),
            "user_id",
            "value",
        )
    )
    daily = rev.groupBy("cohort_day", "age_days").agg(
        F.round(F.sum("value") * 100).cast("bigint").alias("revenue_cents"),
        F.count_distinct("user_id").alias("n_buyers"),
    )
    w = Window.partitionBy("cohort_day").orderBy("age_days")
    return daily.select(
        "cohort_day",
        "age_days",
        "revenue_cents",
        "n_buyers",
        F.sum("revenue_cents").over(w).cast("bigint").alias(
            "cum_revenue_cents"
        ),
    )


@REG.query(
    "sql_exists_not_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_custkey = c.c_custkey
              AND l.l_returnflag = 'R'
          )
    """,
)
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one query — 'customers with an
    urgent order who never returned anything' — the subquery shapes
    the SQL entry point must decorrelate into a LeftSemi and a
    LeftAnti join respectively (sql_correlated_subquery covers the
    scalar-agg shape; IN-subqueries cover semi alone; this pins the
    anti side WITH a join inside the correlated subquery, which
    Catalyst must push the correlation predicate through).

    Plan: both subqueries decorrelate to joins on c_custkey — semi
    against filtered orders, anti against the orders⋈lineitem returned
    set (itself reduced before the anti).  No per-row re-execution of
    the subquery anywhere, which is exactly what EXISTS means to an
    optimizer and why this belongs in the regression surface."""
    from firebase_realtime_database_backup_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o JOIN lineitem l
                  ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey = c.c_custkey
                  AND l.l_returnflag = 'R'
              )
        """
    )


@REG.query(
    "quality_null_completeness",
    oracle="""
    SELECT 'event_id' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS DOUBLE)
             / COUNT(*) AS null_rate
    FROM events
    UNION ALL
    SELECT 'ts', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS DOUBLE) / COUNT(*)
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS DOUBLE) / COUNT(*)
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE event_type IS NULL) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE event_type IS NULL) AS DOUBLE)
             / COUNT(*)
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS DOUBLE) / COUNT(*)
    FROM events
    UNION ALL
    SELECT 'props', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS DOUBLE) / COUNT(*)
    FROM events
    """,
)
def quality_null_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness (NULL-rate) profile of every events column — the
    data-contract check that runs on EVERY ingest batch: a feed whose
    props null_rate jumps from 2% to 40% broke upstream, and catching
    it here costs one scan.  Complements quality_column_profile
    (numeric min/max/distinct on lineitem) with the null-accounting
    dimension the datasheet needs.

    Plan: ONE aggregation pass computes all six null counts as
    conditional counts in the same partial agg (the oracle's stacked
    UNION is the spec, not the plan), then a 6-element explode turns
    the single row into the per-column report — one scan, one 1-row
    shuffle, regardless of column count or data size."""
    events = read_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    agg = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
            for c in cols
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"null_{c}").alias("n_null"),
            )
            for c in cols
        ]
    )
    return agg.select(
        F.explode(pairs).alias("e"), F.col("n_rows")
    ).select(
        F.col("e.column_name").alias("column_name"),
        "n_rows",
        F.col("e.n_null").alias("n_null"),
        (F.col("e.n_null").cast("double") / F.col("n_rows")).alias(
            "null_rate"
        ),
    )


@REG.query("agg_approx_quantile_audit")  # rows-only: the approx side is
# engine-specific by construction (Spark's Greenwald-Khanna sketch has
# no DuckDB twin) — the pytest bound in tests/test_plans.py is the gate
def agg_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit behind every 'approx_percentile is the swap at scale'
    claim this engine makes (quality_outlier_iqr, quality_winsorize,
    sim_norm_anomaly, text_adaptive_length_filter all document it):
    per group, the exact p50/p95 next to approx_percentile's answer at
    the default accuracy (10000) and the relative error — so the swap
    ships with a measured error budget instead of a promise.
    Greenwald-Khanna guarantees RANK error ≤ 1/accuracy; the VALUE
    error this reports is what a fence/gate consumer actually feels,
    and tests/test_plans.py pins it under 1% (it is ~0 on these
    distributions).

    Plan: both sides are single-pass aggregations over the same scan —
    the exact percentile carries per-group sorted state (the cost the
    swap removes); approx carries a fixed-size sketch.  Mergeable
    sketch state is the whole point at 100 TB: map-side partials
    merge without holding values."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    # ONE exact accumulator and ONE sketch for both quantiles (array
    # form, the quality_outlier_iqr discipline): the 4-aggregate form
    # kept two copies of the per-group sorted counts map and two
    # independent GK sketches — identical answers (the array form
    # interpolates each p from the same state), half the aggregation
    # state and merge cost.
    out = cents.groupBy("l_returnflag").agg(
        F.percentile("c", F.array(F.lit(0.5), F.lit(0.95))).alias("ex"),
        F.percentile_approx(
            "c", F.array(F.lit(0.5), F.lit(0.95)), 10000
        ).alias("ap"),
    ).select(
        "l_returnflag",
        F.element_at("ex", 1).alias("p50_exact"),
        F.element_at("ap", 1).alias("p50_approx"),
        F.element_at("ex", 2).alias("p95_exact"),
        F.element_at("ap", 2).alias("p95_approx"),
    )
    rel = lambda a, b: F.abs(F.col(a) - F.col(b)) / F.abs(F.col(a))  # noqa: E731
    return out.select(
        "l_returnflag",
        "p50_exact",
        F.col("p50_approx").cast("double").alias("p50_approx"),
        rel("p50_exact", "p50_approx").alias("p50_rel_err"),
        "p95_exact",
        F.col("p95_approx").cast("double").alias("p95_approx"),
        rel("p95_exact", "p95_approx").alias("p95_rel_err"),
    )


@REG.query(
    "window_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    cum AS (
      SELECT event_type, day, cents,
             CAST(SUM(cents) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum_cents
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, cum_cents,
             CAST(MAX(cum_cents) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS peak_cents,
             CAST(MAX(cum_cents) OVER (
               PARTITION BY event_type ORDER BY day) - cum_cents
               AS BIGINT) AS drawdown_cents
      FROM cum
    )
    SELECT event_type,
           CAST(MAX(peak_cents) AS BIGINT) AS peak_cents,
           CAST(MAX(drawdown_cents) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(drawdown_cents) AS DOUBLE) / 100.0 AS max_drawdown
    FROM dd GROUP BY event_type
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum DRAWDOWN of the cumulative daily revenue per event type:
    the largest peak-to-trough drop of the running total — the classic
    running-max window statistic (finance's risk number, equally the
    'worst losing streak' of any cumulative KPI).  Complements
    events_changepoint_cusum: CUSUM finds level SHIFTS, drawdown
    quantifies the worst sustained DECLINE, and both read off the same
    daily-grain relation.

    Exactness: daily totals quantize to integer cents BEFORE any
    window, the running sum and running max are integer window folds,
    and the one double appears at display.  Negative event values make
    drawdowns non-trivial on the test corpus (refund days pull the
    cumulative down).

    Plan: one events shuffle to (type, day); two stacked windows (sum,
    then max of the sum) and the final agg all share the single
    type-keyed exchange over ≤ |days| rows per type."""
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value") * 100).cast("bigint").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    cum = daily.withColumn(
        "cum_cents", F.sum("cents").over(w).cast("bigint")
    )
    dd = cum.withColumn(
        "peak_cents", F.max("cum_cents").over(w).cast("bigint")
    ).withColumn(
        "drawdown_cents",
        (F.col("peak_cents") - F.col("cum_cents")).cast("bigint"),
    )
    return dd.groupBy("event_type").agg(
        F.max("peak_cents").alias("peak_cents"),
        F.max("drawdown_cents").alias("max_drawdown_cents"),
        (F.max("drawdown_cents").cast("double") / 100.0).alias(
            "max_drawdown"
        ),
    )


@REG.query(
    "agg_entropy_by_group",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (
      SELECT user_id, CAST(SUM(k) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM counts GROUP BY user_id
    ),
    terms AS (
      SELECT c.user_id, t.n, t.n_types,
             c.k * (LENGTH(BIN(t.n // c.k)) - 1) AS term
      FROM counts c JOIN tot t USING (user_id)
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(n_types) AS BIGINT) AS n_types,
           CAST(SUM(term) AS BIGINT) AS entropy_bits_num,
           CAST(SUM(term) AS DOUBLE) / MAX(n) AS behavior_entropy_bits
    FROM terms GROUP BY user_id
    """,
)
def agg_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity entropy per user: whole-bit Shannon entropy
    of each user's event-type mix — near-zero means a single-action
    account (a scraper clicking one endpoint, a monitor pinging one
    event), high means organic mixed behavior.  The categorical
    companion to events_bot_rate_gate's rate signal, and the same
    feature a fraud/quality model consumes as 'action diversity'.

    Exactness: the text_char_entropy discipline applied to categories —
    per-term k·(bitlength(n div k)−1) is pure integer arithmetic (no
    libm ln anywhere), summed exactly, one final division.

    Plan: one (user, type) count shuffle (map-side combinable); the
    per-user total and type count ride a user-keyed window over that
    reduced relation (≤ |type universe| rows per user), and the final
    per-user reduce shares the window's exchange — the
    text_char_entropy_scaled shape at the categorical grain."""
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("k")
    )
    w = Window.partitionBy("user_id")
    terms = counts.select(
        "user_id",
        F.sum("k").over(w).cast("bigint").alias("n"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_types"),
        "k",
    ).withColumn(
        "term",
        F.col("k")
        * (
            # Integer division (`div`), NOT floor(double /): the double
            # route loses low bits past 2^53 and can diverge from the
            # oracle's exact `n // k` (same discipline as
            # agg_bitmap_distinct's word derivation).
            F.length(F.bin(F.expr("n div k"))).cast("bigint")
            - 1
        ),
    )
    num = F.sum("term").cast("bigint")
    return terms.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.max("n_types").alias("n_types"),
        num.alias("entropy_bits_num"),
        (num.cast("double") / F.max("n")).alias("behavior_entropy_bits"),
    )


@REG.query(
    "quality_monotonic_id_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_dup_ids,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_id,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_id,
           CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1
                - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_gaps,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS ids_unique
    FROM orders
    """,
)
def quality_monotonic_id_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuity audit: duplicate-id count, id range,
    and the number of GAPS in the key space (range size minus distinct
    count) — the per-batch ingest sanity gate that catches a re-sent
    batch (dup ids), a truncated extract (gap burst), or an upstream
    id-generator reset (min_id collapse) in one scan.  The id-grain
    cousin of quality_referential_integrity (which checks keys AGAINST
    a parent; this checks the key space itself).

    Plan (rewritten round 6 after a 1000× measurement): the original
    COUNT(DISTINCT id) form shuffled the full ID GRAIN — measured
    34.9 s on 150M distinct orderkeys, the audit's only data-sized
    term — so the exact distinct now rides agg_bitmap_distinct's
    word-mask route IN THE SAME PASS: stage 1 reduces to the id/32
    word grain carrying (BIT_OR mask, COUNT, MIN, MAX) — all map-side
    combinable, a 32× grain cut, no Expand — and stage 2 folds the
    words to the one audit row (n_distinct = Σ popcount).  Same oracle
    (the SPEC stays COUNT DISTINCT over raw rows), measured 34.9 →
    ~4 s at 150M ids.  At 100 TB partition-level min/max stats can
    still pre-answer the range half from metadata; the word relation
    is the only shuffled state (persist it and BIT_OR across batches
    for an incremental audit — the agg_bitmap_distinct_merge
    lifecycle)."""
    orders = read_table(spark, sf_dir, "orders")
    words = (
        orders.select(
            # the agg_bitmap_distinct word/bit derivation (see there
            # for the 2^53 / negative-id rationale)
            F.expr(
                "(o_orderkey - pmod(o_orderkey, 32)) div 32"
            ).alias("word"),
            F.expr(
                "shiftleft(1L, cast(pmod(o_orderkey, 32) as int))"
            ).alias("mask"),
            "o_orderkey",
        )
        .groupBy("word")
        .agg(
            F.bit_or("mask").alias("bits"),
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
    )
    # COALESCE the two sums so an EMPTY batch audits as zeros (the
    # oracle's COUNT over no rows), not NULLs — min/max/gaps stay NULL
    # on empty exactly like the oracle's MIN/MAX.
    n_rows = F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint")
    n_distinct = F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).cast(
        "bigint"
    )
    return words.agg(
        n_rows.alias("n_rows"),
        n_distinct.alias("n_distinct"),
        (n_rows - n_distinct).alias("n_dup_ids"),
        F.min("mn").alias("min_id"),
        F.max("mx").alias("max_id"),
        (F.max("mx") - F.min("mn") + 1 - n_distinct).alias("n_gaps"),
        (n_rows == n_distinct).alias("ids_unique"),
    )


# ---------------------------------------------------------------------------
# Round 6 additions
# ---------------------------------------------------------------------------


@REG.query(
    "window_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS d0,
             CAST(o_orderdate AS DATE) - DATE '1992-01-01' + 7 AS d1
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    ),
    flagged AS (
      SELECT o_custkey, o_orderkey, d0, d1,
             CASE WHEN d0 <= MAX(d1) OVER (
                    PARTITION BY o_custkey ORDER BY d0, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT o_custkey, d0, d1,
             SUM(new_island) OVER (
                PARTITION BY o_custkey ORDER BY d0, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged
    ),
    per_island AS (
      SELECT o_custkey, island_id,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             MAX(d1) - MIN(d0) + 1 AS island_days
      FROM islands GROUP BY o_custkey, island_id
    )
    SELECT o_custkey,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_days) AS BIGINT) AS covered_days,
           CAST(MAX(island_days) AS BIGINT) AS max_island_days
    FROM per_island GROUP BY o_custkey
    """,
)
def window_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval union: merge each customer's
    overlapping 7-day urgent-order windows (1996) into maximal disjoint
    ISLANDS and report per customer how many islands, how many covered
    days, and the longest streak — the third member of the interval
    family (join_interval_overlap asks which intervals overlap EACH
    OTHER, window_open_intervals how many cover each POINT; this asks
    what the union looks like).  The same shape computes machine-uptime
    coverage, subscription-tenure islands, and contiguous-session
    merging.

    Plan: ONE exchange — both windows (the preceding-rows running MAX
    that flags island starts, and the running SUM that numbers them)
    share the (o_custkey | d0, o_orderkey) partition+sort, and the two
    follow-up aggregations reduce on prefixes of the same key, so
    Catalyst plans a single hash-partitioning followed by in-partition
    work.  Per-customer state is the customer's own interval count —
    no global window, no pair join (the naive island finder self-joins
    intervals per customer: quadratic in the whale customer's orders;
    the running-max flag is linear).  Exactness: day indices, island
    ids, and span lengths are all integers; the MAX-over-empty-frame
    NULL on each customer's first interval maps to "new island" in
    both engines.  At 100 TB the only scale knob is interval count per
    key — the window state is O(1) per row, the shape whales cannot
    break."""
    iv = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.to_date("o_orderdate").between("1996-01-01", "1996-12-31")
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), F.lit(_OVERLAP_EPOCH))
            .alias("d0"),
        )
        .withColumn("d1", F.col("d0") + 7)
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("d0", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("d0", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = iv.withColumn(
        "new_island",
        F.when(F.col("d0") <= F.max("d1").over(w_prev), 0).otherwise(1),
    ).withColumn("island_id", F.sum("new_island").over(w_run))
    per_island = islands.groupBy("o_custkey", "island_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.max("d1") - F.min("d0") + 1).alias("island_days"),
    )
    return per_island.groupBy("o_custkey").agg(
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("island_days").cast("bigint").alias("covered_days"),
        F.max("island_days").cast("bigint").alias("max_island_days"),
    )


#: Equi-depth histogram bucket count (fixed spec constant, shared by the
#: Spark plan and the oracle).
EQUIDEPTH_BUCKETS = 8


@REG.query(
    "agg_histogram_equidepth",
    oracle=f"""
    WITH byval AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY c
    ),
    cum AS (
      SELECT c, cnt,
             CAST(SUM(cnt) OVER (ORDER BY c) AS BIGINT) AS cw,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tot
      FROM byval
    )
    SELECT CAST((cw * {EQUIDEPTH_BUCKETS} + tot - 1) // tot AS BIGINT)
             AS bucket,
           CAST(MIN(c) AS BIGINT) AS lo_cents,
           CAST(MAX(c) AS BIGINT) AS hi_cents,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_values
    FROM cum GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth (equal-frequency) histogram of lineitem prices —
    the complement of agg_histogram_equiwidth (fixed-width bins, counts
    vary) and the primitive behind quantile-bucketed features, optimizer
    column statistics, and balanced range-partitioning boundaries: each
    of the K buckets holds ~N/K rows and the boundaries land wherever
    the data is dense.

    The agg_median_twolevel / agg_weighted_median discipline
    generalized to ALL K cuts at once: the fact table collapses
    map-side to the (price-cents -> count) grain (~25k distinct values
    regardless of row count), and a distinct value's bucket is pure
    integer arithmetic on its cumulative count — ceil(cw*K/tot), i.e.
    `(cw*K + tot - 1) div tot`, NOT float division (cw*K stays exact
    where double would lose low bits past 2^53).  The cumulative
    window is DELIBERATELY unpartitioned but runs on the reduced
    distinct-value grain only (the plan-linted two-level pattern);
    ties are wholly assigned to one bucket, so a heavy value can
    swallow a cut point — equi-depth over discrete data is
    approximate-by-spec in exactly that way, and n_rows per bucket
    reports the imbalance honestly.  At extreme value domains the
    agg_median_twolevel bucket split composes in front unchanged."""
    li = read_table(spark, sf_dir, "lineitem")
    byval = li.groupBy(
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("c")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = byval.select(
        "c",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cw"),
        F.sum("cnt").over(w_all).cast("bigint").alias("tot"),
    )
    k = EQUIDEPTH_BUCKETS
    return (
        cum.withColumn("bucket", F.expr(f"(cw * {k} + tot - 1) div tot"))
        .groupBy("bucket")
        .agg(
            F.min("c").alias("lo_cents"),
            F.max("c").alias("hi_cents"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
        )
    )


#: Rolling-regression window length in days (range frame, calendar-gap
#: aware) — 4 weeks, the trend horizon the EWMA/seasonality family uses.
ROLLREG_WINDOW_DAYS = 28
_EVENTS_EPOCH = "2024-01-01"  # fixed day at/before the events calendar


@REG.query(
    "window_rolling_regression",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '{_EVENTS_EPOCH}' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, x
    ),
    mom AS (
      SELECT event_type, x,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   RANGE BETWEEN {ROLLREG_WINDOW_DAYS - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_type, x AS day_idx, n AS n_obs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
    FROM mom WHERE n * sxx - sx * sx > 0
    """,
)
def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day OLS trend slope of daily event volume per type —
    the windowed regression every monitoring stack draws ("is this
    metric trending up over the last 4 weeks?"), computed EXACTLY with
    zero extra passes: the five OLS moments (n, Σx, Σy, Σx², Σxy) are
    plain integer SUMs over ONE shared range frame, and the slope is a
    single division of exact integers — run-reproducible where a
    float-accumulating regression UDAF is not (the agg_regression_exact
    discipline made rolling).

    The frame is RANGE (calendar days), not ROWS, so gaps in the daily
    series shorten the window honestly instead of silently stretching
    it over months of missing days.  Plan: events partial-aggregate
    map-side to the (type, day) grain — the ONLY data-sized shuffle —
    and all five moments ride one window over that reduced relation
    (<=374 rows per type here; bounded by the calendar at any corpus
    size, the events_ewma_daily shape).  Integer headroom: day indices
    are epoch-relative (<=10^4), so n*sxx <= 28^2*10^8 ~ 8e10 and the
    slope numerator stays far under 2^53 until daily counts pass ~1e9;
    past that, cast the two products to DECIMAL(38,0) — same plan (the
    agg_skew_kurtosis_exact swap)."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EVENTS_EPOCH))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-(ROLLREG_WINDOW_DAYS - 1), 0)
    )
    mom = daily.select(
        "event_type",
        "x",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.filter(den > 0).select(
        "event_type",
        F.col("x").alias("day_idx"),
        F.col("n").alias("n_obs"),
        (num.cast("double") / den.cast("double")).alias("slope"),
    )


@REG.query(
    "events_trend_slope_theilsen",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '{_EVENTS_EPOCH}' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, x
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM slopes
    ),
    days AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    )
    SELECT r.event_type, d.n_days,
           CAST(r.n_pairs AS BIGINT) AS n_pairs,
           r.slope AS theilsen_slope
    FROM ranked r JOIN days d ON r.event_type = d.event_type
    WHERE r.rn = (r.n_pairs + 1) // 2
    """,
)
def events_trend_slope_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event type: the (lower) MEDIAN
    of all pairwise day-to-day slopes of the daily-count series — the
    estimator that shrugs off the outlier days (a crawler burst, an
    outage zero) that pull the OLS slope (window_rolling_regression)
    arbitrarily far, with a 29% breakdown point instead of 0%.

    The pairwise relation looks quadratic but lives at the DAY grain:
    events reduce map-side to (type, day, count) first (the only
    data-sized shuffle), so the self-join produces |days|²/2 pairs per
    type — ~70k for a year, INDEPENDENT of event volume; at
    multi-year horizons the standard subsample (random day pairs) or
    per-month segmentation composes in front.  Exactness: each slope
    is one division of exact integers (bit-identical cross-engine);
    the median is selected by RANK over the sorted slope multiset, so
    the reported VALUE is deterministic even where ties make row
    identity arbitrary — no percentile interpolation, no float
    averaging.  The slope window partitions by type (no global
    sort)."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(_EVENTS_EPOCH))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a = daily.select(
        "event_type", F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    slopes = a.join(b, "event_type").filter(F.col("xa") < F.col("xb")).select(
        "event_type",
        (
            (F.col("yb") - F.col("ya")).cast("double")
            / (F.col("xb") - F.col("xa")).cast("double")
        ).alias("slope"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("slope")
    w_all = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    ).filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
    days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return ranked.join(F.broadcast(days), "event_type").select(
        "event_type",
        "n_days",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("slope").alias("theilsen_slope"),
    )


#: Train/val/test split: 10 hash buckets, 8/1/1.
SPLIT_BUCKETS = 10
SPLIT_TRAIN_LT = 8  # buckets [0,8) -> train, 8 -> val, 9 -> test


@REG.query(
    "quality_split_leakage_audit",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id,
             CASE WHEN {knuth_bucket_sql('user_id', SPLIT_BUCKETS)}
                       < {SPLIT_TRAIN_LT} THEN 'train'
                  WHEN {knuth_bucket_sql('user_id', SPLIT_BUCKETS)}
                       = {SPLIT_TRAIN_LT} THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    ),
    per_split AS (
      SELECT split,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ev GROUP BY split
    ),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leaked_users FROM (
        SELECT user_id FROM ev GROUP BY user_id
        HAVING COUNT(DISTINCT split) > 1
      )
    ),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM per_split)
    SELECT s.split, s.n_users, s.n_events,
           CAST(s.n_events AS DOUBLE) / t.total AS event_share,
           l.leaked_users
    FROM per_split s, leak l, tot t
    """,
)
def quality_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split with a leakage audit — the
    training-pipeline gate that keeps a user's events from straddling
    splits (per-event random splits leak user identity across the
    boundary, inflating eval scores; the fix is hashing the GROUP key).
    The split is the engine's deterministic Knuth hash on user_id
    (8/1/1), so it is reproducible across runs, engines, and corpus
    growth — a user keeps their split forever, the property incremental
    training data requires.

    The audit does NOT trust the construction: leaked_users is computed
    from the data (users observed in >1 split — structurally zero here,
    but the same query catches a hand-patched split table, a re-keyed
    ingest, or a hash-constant drift the moment it breaks).  Plan: one
    (user, split)-grain partial-agg shuffle feeds both the per-split
    user counts and the leakage check; the share division joins two
    broadcast 1-row aggregates.  At 100 TB every stage is map-side
    combinable and the leak relation reduces to zero rows before it
    moves."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            knuth_bucket(F.col("user_id"), SPLIT_BUCKETS) < SPLIT_TRAIN_LT,
            "train",
        )
        .when(
            knuth_bucket(F.col("user_id"), SPLIT_BUCKETS) == SPLIT_TRAIN_LT,
            "val",
        )
        .otherwise("test")
        .alias("split"),
    )
    per_split = ev.groupBy("split").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    leak = (
        ev.groupBy("user_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked_users"))
    )
    total = per_split.agg(
        F.sum("n_events").cast("bigint").alias("total")
    )
    return (
        per_split.crossJoin(F.broadcast(leak))
        .crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_users",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total")).alias(
                "event_share"
            ),
            "leaked_users",
        )
    )


@REG.query(
    "agg_bitmap_distinct_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_supp,
           CAST(COUNT(DISTINCT DATE_TRUNC('month', l_shipdate)) AS BIGINT)
             AS n_months,
           CAST(COUNT(DISTINCT l_suppkey // 32) AS BIGINT) AS n_words
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL exact count-distinct: agg_bitmap_distinct's word
    masks built per (group, MONTH) — the state a real pipeline persists
    per ingest partition — then merged across months with a second
    BIT_OR to recover the EXACT all-time distinct, no rescan of history.
    This is the claim agg_bitmap_distinct's docstring makes ("persist
    the per-word masks and OR them across days"), executed: the same
    mergeable-sketch update/merge/finalize lifecycle as agg_hll_sketch
    and agg_hll_union_rollup, with zero error instead of ~2%.

    Why the oracle is COUNT(DISTINCT) over the raw table: the merge is
    only correct if OR-ing per-month masks loses and invents nothing —
    stating the SPEC rather than mirroring the bitmap means a bit
    dropped (or double-set) at EITHER level breaks the hash.  Plan:
    both levels are map-side-combinable BIT_ORs; the stage-1 shuffle
    carries one long per occupied (group, month, id/32) cell — in
    production that relation IS the stored state, so a new day costs
    one partition's update plus an O(state) merge, never a rescan.
    The n_months column audits the merge actually spanned the
    calendar; n_words audits the merged bitmap footprint."""
    li = read_table(spark, sf_dir, "lineitem")
    monthly = (
        li.select(
            "l_returnflag",
            F.trunc("l_shipdate", "month").alias("m"),
            # same overflow-safe integer word/bit derivation as
            # agg_bitmap_distinct (see there for the 2^53 rationale)
            F.expr("(l_suppkey - pmod(l_suppkey, 32)) div 32").alias("word"),
            F.expr(
                "shiftleft(1L, cast(pmod(l_suppkey, 32) as int))"
            ).alias("mask"),
        )
        .groupBy("l_returnflag", "m", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    merged = monthly.groupBy("l_returnflag", "word").agg(
        F.bit_or("bits").alias("bits")
    )
    counts = merged.groupBy("l_returnflag").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_supp"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
    months = monthly.groupBy("l_returnflag").agg(
        F.count_distinct("m").alias("n_months")
    )
    return counts.join(F.broadcast(months), "l_returnflag").select(
        "l_returnflag", "n_distinct_supp", "n_months", "n_words"
    )


@REG.query(
    "events_survival_table",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS f,
             MAX(CAST(ts AS DATE)) AS l
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(CAST(ts AS DATE)) AS corpus_max FROM events),
    lives AS (
      SELECT CAST(l - f AS BIGINT) AS life,
             CAST(l = corpus_max AS INT) AS censored
      FROM per_user, horizon
    ),
    by_life AS (
      SELECT life,
             CAST(SUM(1 - censored) AS BIGINT) AS n_ended,
             CAST(SUM(censored) AS BIGINT) AS n_censored
      FROM lives GROUP BY life
    )
    SELECT life AS age_days,
           CAST(SUM(n_ended + n_censored) OVER (
                  ORDER BY life DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_at_risk,
           n_ended, n_censored,
           CAST(n_ended AS DOUBLE)
             / SUM(n_ended + n_censored) OVER (
                 ORDER BY life DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS hazard
    FROM by_life
    """,
)
def events_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete survival (churn-hazard) table with right-censoring —
    the actuarial life table behind every retention model: for each
    observed lifetime t (days between a user's first and last event),
    how many users were still AT RISK at age t, how many ENDED there,
    how many are CENSORED (last seen on the corpus horizon — still
    alive as far as the data knows, the distinction naive churn curves
    get wrong), and the exact hazard n_ended/at_risk.  Kaplan-Meier
    survival is the running product of (1 - hazard) over this table —
    left to the consumer because an ordered float product is the one
    step that is NOT cross-engine exact; every column here is integer
    counts plus one division, so the oracle hash is bit-for-bit.

    Plan: one (user) min/max shuffle — the only data-sized exchange —
    then everything runs at the lifetime grain (≤ |calendar| rows): a
    1-row broadcast horizon probe, a reverse cumulative window for the
    at-risk counts, and the hazard division.  At 100 TB the user
    reduce is the cost (map-side combinable min/max); the survival
    arithmetic is metadata-sized at any corpus."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    horizon = ev.agg(F.max("d").alias("corpus_max"))
    lives = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("l", "f").cast("bigint").alias("life"),
        (F.col("l") == F.col("corpus_max")).cast("int").alias("censored"),
    )
    by_life = lives.groupBy("life").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("n_ended"),
        F.sum("censored").cast("bigint").alias("n_censored"),
    )
    # reverse cumulative at-risk over the <=|calendar|-row life grain
    w = Window.orderBy(F.col("life").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = F.sum(F.col("n_ended") + F.col("n_censored")).over(w)
    return by_life.select(
        F.col("life").alias("age_days"),
        at_risk.cast("bigint").alias("n_at_risk"),
        "n_ended",
        "n_censored",
        (F.col("n_ended").cast("double") / at_risk).alias("hazard"),
    )


_PRUNE_FIXTURES: dict = {}

#: Probe day for the partition-pruned read — present at every SF of the
#: synthetic events calendar (January 2024).
PRUNE_PROBE_DAY = "2024-01-15"


@REG.query(
    "layout_partitioned_prune",
    oracle=f"""
    SELECT '{PRUNE_PROBE_DAY}' AS probe_day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
             AS n_files_scanned,
           {oround("SUM(value)")} AS total_value
    FROM events WHERE CAST(ts AS DATE) = DATE '{PRUNE_PROBE_DAY}'
    """,
)
def layout_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned layout + partition-pruned point read — the
    layout decision that turns a full-table scan into a one-directory
    read, proven FROM THE FILES: the fixture writes events partitioned
    by calendar day (repartition on day first, so each day is exactly
    one file — the daily-sink layout), the query filters to one day,
    and n_files_scanned counts DISTINCT ``_metadata.file_path`` off the
    actual read — 1 if the day exists, 0 if not, never the table's full
    file count.  The oracle states the SPEC from the raw table (the
    filtered day count), so a broken pruning that silently scans
    everything still hash-matches only if it also READS only that day's
    file.  PartitionFilters reaching the scan is plan-asserted in
    tests/test_plans.py.

    At 100 TB this is the difference between listing one directory and
    listing a year: partition pruning happens at PLANNING time (the
    non-matching directories are never listed into the plan), which no
    row-group or predicate pushdown can recover once the listing has
    happened.  Day is the right partition key exactly because every
    operational query carries a day predicate; the cardinality rule
    (partitions of ~file-count 1-10k, never per-user) is what keeps the
    listing itself cheap."""
    import hashlib
    import os

    memo_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    out = _PRUNE_FIXTURES.get(memo_key)
    if out is None:
        ev = read_table(spark, sf_dir, "events")
        if ev.isEmpty():
            return spark.createDataFrame(
                [(PRUNE_PROBE_DAY, 0, 0, 0, None)],
                "probe_day string, n_rows bigint, n_users bigint, "
                "n_files_scanned bigint, total_value double",
            )
        # Session-keyed scratch tag like ensure_bpe_table: hashing only
        # the corpus path would resolve two concurrent sessions to the
        # SAME directory, so one session's overwrite could tear the
        # other's memoized read-back.
        tag = hashlib.sha1("\x00".join(memo_key).encode()).hexdigest()[:12]
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.pardir,
            ".scratch",
            f"prune_{os.path.basename(os.path.normpath(sf_dir))}_{tag}",
        )
        day = F.date_format("ts", "yyyy-MM-dd").alias("day")
        # repartition ON day then partitionBy(day): each day's rows sit
        # wholly in one task -> exactly one file per day directory
        ev.select("event_id", "ts", "user_id", "value", day).repartition(
            F.col("day")
        ).write.mode("overwrite").partitionBy("day").parquet(out)
        _PRUNE_FIXTURES[memo_key] = out

    pruned = spark.read.parquet(out).filter(
        F.col("day") == F.lit(PRUNE_PROBE_DAY)
    )
    return (
        pruned.select(
            "user_id", "value", F.col("_metadata.file_path").alias("fp")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct("fp").alias("n_files_scanned"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.lit(PRUNE_PROBE_DAY).alias("probe_day"),
            "n_rows",
            "n_users",
            "n_files_scanned",
            "total_value",
        )
    )


@REG.query(
    "quality_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ),
    rows_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY lang),
    cols_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs
              GROUP BY source),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid0 AS (
      SELECT rows_.lang, cols_.source, rows_.r, cols_.c, tot.n
      FROM rows_ CROSS JOIN cols_ CROSS JOIN tot
    ),
    grid AS (
      SELECT g.lang, g.source, g.r, g.c, g.n, COALESCE(obs.o, 0) AS o
      FROM grid0 g
      LEFT JOIN obs ON obs.lang = g.lang AND obs.source = g.source
    )
    SELECT lang, source, o AS n_obs,
           CAST(r * c AS BIGINT) AS expected_num,
           CAST(r * c AS DOUBLE) / n AS expected,
           CAST((n * o - r * c) * (n * o - r * c) AS DOUBLE)
             / (CAST(r AS DOUBLE) * c * n) AS chi2_contribution
    FROM grid
    """,
)
def quality_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square INDEPENDENCE grid between two categorical columns
    (lang × source): are languages distributed the same way across
    sources, or does some feed skew toward a language?  The governance
    check quality_drift_chi2 can't express (that one compares a column
    against a REFERENCE corpus; this tests two columns of ONE corpus
    against each other) — the contingency-table analysis behind "is
    this metadata field informative / leaking the other".

    Emitted at the CELL grain, including structurally-zero cells (a
    (lang, source) pair that never co-occurs contributes r·c/n, which
    is exactly where dependence shows) — per-cell contributions are
    each ONE division of exact integers ((n·o − r·c)² / (r·c·n), all
    bigint products well under 2^63 here), so every output value is
    bit-identical cross-engine; the final χ² statistic is the SUM of
    the column, left to the consumer because a float sum's order is
    the one non-reproducible step (the events_survival_table / KM
    stance).  Past ~3e9 docs the squared term needs DECIMAL(38,0) —
    same plan.  Plan: one (lang, source) partial-agg shuffle; the
    margins are tiny broadcast relations crossed into the |langs| ×
    |sources| grid (a K-row × K-row broadcast cross — the designed
    shape, never data-sized)."""
    obs = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows_ = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    cols_ = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(obs), ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    dev = F.col("n") * F.col("o") - F.col("r") * F.col("c")
    return grid.select(
        "lang",
        "source",
        F.col("o").alias("n_obs"),
        (F.col("r") * F.col("c")).cast("bigint").alias("expected_num"),
        ((F.col("r") * F.col("c")).cast("double") / F.col("n")).alias(
            "expected"
        ),
        (
            (dev * dev).cast("double")
            / (F.col("r").cast("double") * F.col("c") * F.col("n"))
        ).alias("chi2_contribution"),
    )


@REG.query(
    "quality_candidate_keys",
    oracle="""
    SELECT 'event_id' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_id) = COUNT(*) AS INT) AS is_key
    FROM events
    UNION ALL
    SELECT 'ts', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT ts) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT ts) = COUNT(*) AS INT)
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) = COUNT(*) AS INT)
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE event_type IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) = COUNT(*) AS INT)
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT value) = COUNT(*) AS INT)
    FROM events
    UNION ALL
    SELECT 'props', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT props) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT props) = COUNT(*) AS INT)
    FROM events
    """,
)
def quality_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: which columns could serve as a primary
    key (all values distinct, no NULLs)?  The schema-archaeology pass
    every warehouse migration starts with — and, run per ingest batch,
    the uniqueness contract behind quality_monotonic_id_audit: a feed
    whose event_id stops being a key has started double-delivering.

    Plan: one single-column aggregate PER COLUMN, unioned.  Two routes
    were measured before settling here (BASELINE.md round-6 third
    batch): (a) one aggregate with k COUNT(DISTINCT col_i) plans an
    Expand — k copies of every input row through one shuffle; (b) a
    (column_name, value)-string explode + distinct moves the same k*N
    rows as 20-50-byte strings and cost 46.6 s at 100x.  The per-column
    form wins on a COLUMNAR source because k single-column scans read
    exactly the same bytes as one k-column scan, while each aggregate
    keeps its NATIVE type through whole-stage codegen (no stringify),
    carries its own map-side partial distinct, and shuffles its own
    balanced exchange: 46.6 s -> 5.5 s at 100x.  Each aggregate also
    computes the column's row/null conditional counts in the same pass,
    so the union rows arrive complete — no join.  COUNT(DISTINCT
    double)'s -0.0 = 0.0 / NaN collapse now matches the oracle BY
    CONSTRUCTION (both engines aggregate the native double)."""
    events = read_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    parts = []
    for c in cols:
        parts.append(
            events.select(F.col(c)).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("n_null"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_distinct",
                "n_null",
                (F.col("n_distinct") == F.col("n_rows"))
                .cast("int")
                .alias("is_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@REG.query(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE items AS (
      SELECT DISTINCT user_id,
             TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NOT NULL
    ),
    capped AS (
      SELECT user_id, item FROM (
        SELECT user_id, item,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rk
        FROM items
      ) WHERE rk <= {COOC_USER_CAP}
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM capped a JOIN capped b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    cedges AS (
      SELECT item_a, item_b FROM pairs
      UNION
      SELECT item_b, item_a FROM pairs
    ),
    reach(item, lbl) AS (
      SELECT item_a, item_a FROM cedges
      UNION
      SELECT e.item_b, r.lbl FROM reach r JOIN cedges e ON e.item_a = r.item
    )
    SELECT item, CAST(MIN(lbl) AS BIGINT) AS component_id
    FROM reach GROUP BY item
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-click item graph — the graph
    family's partitioning primitive (community pre-segmentation,
    recommendation block discovery, and the precondition for running
    anything expensive per-component instead of per-graph).

    Rides ensure_item_edges (the session-shared capped co-occurrence
    edge list: zero marginal build cost after any other graph consumer
    has run) and the SAME min-label-propagation loop dedup_clusters
    uses (min_label_components): per iteration one edge join + one
    min-agg, driver loops until no label changes, iterations = graph
    diameter.  That sharing is the point — connected components is one
    algorithm in this engine, not one per input shape.

    Oracle: min-label propagation is a monotone integer fixpoint, so
    the DuckDB twin is a recursive CTE computing transitive closure
    from the same edges (the dedup_clusters trick on a co-click graph
    two orders denser per node — closure rows bounded by n per
    component label, fine at oracle scale, and precisely the blowup
    the distributed loop avoids by carrying ONE label per node)."""
    from firebase_realtime_database_backup_spark.operators.dedup import (
        min_label_components,
    )

    edges = ensure_item_edges(spark, sf_dir).select(
        F.col("item_a").alias("doc_a"), F.col("item_b").alias("doc_b")
    )
    return min_label_components(edges).select(
        F.col("doc_id").alias("item"),
        F.col("cluster_id").alias("component_id"),
    )


@REG.query(
    "events_sample_ratio_mismatch",
    oracle=f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    assigned AS (
      SELECT user_id, {knuth_hash_sql('user_id')} % 2 AS arm FROM users
    ),
    counts AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM assigned GROUP BY arm
    ),
    tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total FROM counts)
    SELECT c.arm, c.n_users, t.n_total,
           t.n_total / 2.0 AS expected,
           (c.n_users - t.n_total / 2.0) * (c.n_users - t.n_total / 2.0)
             / (t.n_total / 2.0) AS chi2_contribution
    FROM counts c, tot t
    """,
)
def events_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) gate: the FIRST check of any A/B
    readout.  Users are assigned to arms by the engine's deterministic
    Knuth hash (the same reproducible split mix_token_budget /
    sample_deterministic use); if the realized arm sizes drift from
    the designed 50/50 beyond chi-square noise, the experiment is
    corrupted (assignment bug, bot filter differential, logging loss)
    and every downstream metric is invalid — the readout must be
    blocked, which is why this is a gate and not a dashboard.

    Plan: distinct users (one user-grain shuffle — at 100 TB the
    assignment hash is computed map-side and the distinct is the only
    data-sized stage), a 2-group count, and a broadcast of the 1-row
    total.  The chi2 contribution is the identical double expression
    in both engines over exact integer counts — bit-reproducible.
    Companion: events_diff_in_means consumes the same assignment."""
    users = read_table(spark, sf_dir, "events").select("user_id").distinct()
    counts = (
        users.select((knuth_hash(F.col("user_id")) % 2).alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    tot = counts.agg(F.sum("n_users").cast("bigint").alias("n_total"))
    exp = F.col("n_total") / F.lit(2.0)
    dev = F.col("n_users") - exp
    return counts.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_users",
        "n_total",
        exp.alias("expected"),
        (dev * dev / exp).alias("chi2_contribution"),
    )


@REG.query(
    "events_diff_in_means",
    oracle=f"""
    WITH assigned AS (
      SELECT event_type,
             {knuth_hash_sql('user_id')} % 2 AS arm,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_t,
             CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_c,
             CAST(SUM(cents) FILTER (WHERE arm = 1) AS BIGINT) AS s_t,
             CAST(SUM(cents) FILTER (WHERE arm = 0) AS BIGINT) AS s_c,
             CAST(SUM(cents * cents) FILTER (WHERE arm = 1) AS BIGINT) AS ss_t,
             CAST(SUM(cents * cents) FILTER (WHERE arm = 0) AS BIGINT) AS ss_c
      FROM assigned GROUP BY event_type
    )
    SELECT event_type, n_t, n_c,
           CAST(s_t AS DOUBLE) / n_t / 100.0 AS mean_t,
           CAST(s_c AS DOUBLE) / n_c / 100.0 AS mean_c,
           CAST(s_t AS DOUBLE) / n_t / 100.0
             - CAST(s_c AS DOUBLE) / n_c / 100.0 AS diff,
           (CAST(s_t AS DOUBLE) / n_t / 100.0
              - CAST(s_c AS DOUBLE) / n_c / 100.0)
           / SQRT(
               ((CAST(ss_t AS DOUBLE)
                   - CAST(s_t AS DOUBLE) * s_t / n_t)
                + (CAST(ss_c AS DOUBLE)
                   - CAST(s_c AS DOUBLE) * s_c / n_c))
               / (n_t + n_c - 2) / 10000.0
               * (1.0 / n_t + 1.0 / n_c)
             ) AS t_stat
    FROM m
    WHERE n_t >= 2 AND n_c >= 2
    """,
)
def events_diff_in_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample (pooled) t-test per event_type between the two
    hash-assigned experiment arms — the A/B readout the SRM gate
    protects.  The full moment pipeline is EXACT integers: value is
    fixed-point quantized to cents BEFORE any sum (the gram-matrix /
    exact-moments discipline: quantize-then-sum makes the reduce
    commutative and bit-reproducible), so n / sum / sum-of-squares per
    (type, arm) are order-free; only the final per-row scalar algebra
    (means, pooled variance, t) runs in doubles, as the IDENTICAL
    expression tree in both engines over identical int64 inputs —
    deterministic to the last bit, no matter the partitioning.

    Plan: one scan, conditional aggregation per event_type (both arms
    in the same partial agg — no join, no pivot exchange), 5-row
    result.  At 100 TB: map-side partials carry six integers per
    (type, arm); nothing else moves.  The int64 sum-of-squares budget
    (cents^2 < 2.5e9 per row) holds to ~3.7e9 rows per type-arm;
    beyond that the internal sums switch to DECIMAL(38,0) — here they
    already do (belt and braces), cast back to bigint on output."""
    # NULL-value rows carry no metric: excluding them in BOTH engines
    # keeps n the moments' denominator (a NULL cents row would count in
    # n but not in the sums).
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (knuth_hash(F.col("user_id")) % 2).alias("arm"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def arm_agg(a: int, col, name: str):
        return (
            F.sum(F.when(F.col("arm") == a, dec(col)))
            .cast("bigint")
            .alias(name)
        )

    m = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_t"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_c"),
        arm_agg(1, F.col("cents"), "s_t"),
        arm_agg(0, F.col("cents"), "s_c"),
        arm_agg(1, F.col("cents") * F.col("cents"), "ss_t"),
        arm_agg(0, F.col("cents") * F.col("cents"), "ss_c"),
    )
    mean_t = F.col("s_t").cast("double") / F.col("n_t") / F.lit(100.0)
    mean_c = F.col("s_c").cast("double") / F.col("n_c") / F.lit(100.0)
    diff = mean_t - mean_c
    ssd_t = F.col("ss_t").cast("double") - (
        F.col("s_t").cast("double") * F.col("s_t") / F.col("n_t")
    )
    ssd_c = F.col("ss_c").cast("double") - (
        F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c")
    )
    pooled = (
        (ssd_t + ssd_c)
        / (F.col("n_t") + F.col("n_c") - F.lit(2))
        / F.lit(10000.0)
    )
    t_stat = diff / F.sqrt(
        pooled * (F.lit(1.0) / F.col("n_t") + F.lit(1.0) / F.col("n_c"))
    )
    return (
        m.filter((F.col("n_t") >= 2) & (F.col("n_c") >= 2))
        .select(
            "event_type",
            "n_t",
            "n_c",
            mean_t.alias("mean_t"),
            mean_c.alias("mean_c"),
            diff.alias("diff"),
            t_stat.alias("t_stat"),
        )
    )


CUPED_PRE_DAYS = 15  # pre-experiment covariate window, min-day anchored


@REG.query(
    "events_cuped_adjustment",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    lim AS (SELECT MIN(d) AS min_d FROM ev),
    u AS (
      SELECT user_id,
             {knuth_hash_sql('user_id')} % 2 AS arm,
             CAST(COALESCE(SUM(cents) FILTER (
               WHERE DATEDIFF('day', min_d, d) < {CUPED_PRE_DAYS}
             ), 0) AS BIGINT) AS x,
             CAST(COALESCE(SUM(cents) FILTER (
               WHERE DATEDIFF('day', min_d, d) >= {CUPED_PRE_DAYS}
             ), 0) AS BIGINT) AS y
      FROM ev, lim GROUP BY user_id
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS BIGINT) AS sxa,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS BIGINT) AS sya,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS BIGINT) AS sxxa,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS BIGINT) AS sxya,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS BIGINT) AS syya
      FROM u GROUP BY arm
    ),
    g AS (
      SELECT CAST(SUM(n_users) AS BIGINT) AS n,
             CAST(SUM(sxa) AS BIGINT) AS sx,
             CAST(SUM(sya) AS BIGINT) AS sy,
             CAST(SUM(sxxa) AS BIGINT) AS sxx,
             CAST(SUM(sxya) AS BIGINT) AS sxy,
             CAST(SUM(syya) AS BIGINT) AS syy
      FROM arms
    )
    SELECT arm, n_users,
           CAST(sya AS DOUBLE) / n_users / 100.0 AS mean_post,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / NULLIF(CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx, 0.0) AS theta,
           CAST(sya AS DOUBLE) / n_users / 100.0
             - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / NULLIF(CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx, 0.0)
               * (CAST(sxa AS DOUBLE) / n_users / 100.0
                    - CAST(sx AS DOUBLE) / n / 100.0) AS mean_adjusted,
           ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
             / NULLIF((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy), 0.0)
             AS var_reduction
    FROM arms, g
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout — the third leg of
    the experimentation kit (SRM gate → diff-in-means → CUPED): each
    user's PRE-experiment value (cents in the min-day-anchored first
    {CUPED_PRE_DAYS} days, the quality_psi_drift window convention)
    becomes the covariate X; the adjusted metric Y − θ(X − X̄) with
    θ = cov(X,Y)/var(X) removes the between-user variance X predicts,
    shrinking the readout's CI by the factor (1 − ρ²) reported as
    var_reduction — the difference between a 2-week and a 2-day
    experiment at the same power.  θ is estimated POOLED across arms
    (the standard form: assignment is independent of X, so pooling is
    unbiased and uses all users).

    Exactness discipline = events_diff_in_means: cents quantization
    before any sum, user-grain x/y as int64, corpus moments as
    DECIMAL(38,0) sums cast back to int64 (order-free, partition-
    invariant), then every reported number is the IDENTICAL double
    expression tree over those integers in both engines.  NULLIF
    guards the degenerate no-pre-variance corpus to NULL identically.

    Plan: one scan + broadcast 1-row min-day probe, one user-grain
    aggregate, then a 6-integer corpus row and a 2-row arm aggregate
    cross-joined back (the two registered 1-row BNL probes).  At
    100 TB nothing data-sized moves after the user-grain aggregate."""
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    lim = ev.agg(F.min("d").alias("min_d"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pre = F.datediff(F.col("d"), F.col("min_d")) < CUPED_PRE_DAYS
    u = (
        ev.crossJoin(F.broadcast(lim))
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(pre, dec(F.col("cents")))), F.lit(0))
            .cast("bigint")
            .alias("x"),
            F.coalesce(F.sum(F.when(~pre, dec(F.col("cents")))), F.lit(0))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            (knuth_hash(F.col("user_id")) % 2).alias("arm"), "x", "y"
        )
    )
    # The pooled moments are the SUM of the per-arm moments, so derive
    # them by re-aggregating the 2-row arm relation instead of reading
    # `u` twice — Spark shares no subplans, and a second consumption
    # of `u` would re-run the scan + user aggregate AND duplicate the
    # min-day probe in the plan.  The arm relation is localCheckpointed
    # (2 rows, the min_label_components discipline) so the final
    # arm x pooled cross-join reads ONE materialization — one corpus
    # scan total, at any decade.
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(dec(F.col("x"))).cast("bigint").alias("sxa"),
        F.sum(dec(F.col("y"))).cast("bigint").alias("sya"),
        F.sum(dec(F.col("x")) * F.col("x")).cast("bigint").alias("sxxa"),
        F.sum(dec(F.col("x")) * F.col("y")).cast("bigint").alias("sxya"),
        F.sum(dec(F.col("y")) * F.col("y")).cast("bigint").alias("syya"),
    ).localCheckpoint(eager=True)
    g = arms.agg(
        F.sum("n_users").cast("bigint").alias("n"),
        F.sum("sxa").cast("bigint").alias("sx"),
        F.sum("sya").cast("bigint").alias("sy"),
        F.sum("sxxa").cast("bigint").alias("sxx"),
        F.sum("sxya").cast("bigint").alias("sxy"),
        F.sum("syya").cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = cov_n / F.nullif(varx_n, F.lit(0.0))
    mean_post = (
        F.col("sya").cast("double") / F.col("n_users") / F.lit(100.0)
    )
    mean_x_arm = (
        F.col("sxa").cast("double") / F.col("n_users") / F.lit(100.0)
    )
    mean_x = F.col("sx").cast("double") / F.col("n") / F.lit(100.0)
    return arms.crossJoin(F.broadcast(g)).select(
        "arm",
        "n_users",
        mean_post.alias("mean_post"),
        theta.alias("theta"),
        (mean_post - theta * (mean_x_arm - mean_x)).alias(
            "mean_adjusted"
        ),
        (cov_n * cov_n / F.nullif(varx_n * vary_n, F.lit(0.0))).alias(
            "var_reduction"
        ),
    )


PSI_BINS = 10
PSI_REF_DAYS = 15  # reference window = first 15 calendar days


@REG.query(
    "quality_psi_drift",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(FLOOR(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    lim AS (SELECT MIN(d) AS min_d FROM ev),
    tagged AS (
      SELECT c, DATEDIFF('day', min_d, d) < {PSI_REF_DAYS} AS is_ref
      FROM ev, lim
    ),
    ref_byval AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tagged WHERE is_ref GROUP BY c
    ),
    cum AS (
      SELECT c, cnt,
             CAST(SUM(cnt) OVER (ORDER BY c) AS BIGINT) AS cw,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tot
      FROM ref_byval
    ),
    bkt AS (
      SELECT (cw * {PSI_BINS} + tot - 1) // tot AS bucket,
             MAX(c) AS hi_cents, CAST(SUM(cnt) AS BIGINT) AS ref_n
      FROM cum GROUP BY bucket
    ),
    cuts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY hi_cents) AS BIGINT) AS bin,
             hi_cents, ref_n
      FROM bkt
    ),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cuts),
    cur_byval AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tagged WHERE NOT is_ref GROUP BY c
    ),
    assign AS (
      SELECT v.c, v.cnt,
             LEAST(1 + COUNT(ct.hi_cents), (SELECT k FROM kk)) AS bin
      FROM cur_byval v LEFT JOIN cuts ct ON ct.hi_cents < v.c
      GROUP BY v.c, v.cnt
    ),
    cur_bins AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cur_n FROM assign GROUP BY bin
    ),
    joined AS (
      SELECT cu.bin, cu.hi_cents, cu.ref_n,
             CAST(COALESCE(cb.cur_n, 0) AS BIGINT) AS cur_n
      FROM cuts cu LEFT JOIN cur_bins cb ON cb.bin = cu.bin
    ),
    tot2 AS (
      SELECT bin, hi_cents, ref_n, cur_n,
             CAST(SUM(ref_n) OVER () AS BIGINT) AS ref_tot,
             CAST(SUM(cur_n) OVER () AS BIGINT) AS cur_tot
      FROM joined
    )
    SELECT bin, hi_cents, ref_n, cur_n,
           CAST(ref_n AS DOUBLE) / ref_tot AS q,
           CAST(cur_n AS DOUBLE) / cur_tot AS p,
           CASE WHEN cur_n = 0 THEN NULL ELSE ROUND(
             (CAST(cur_n AS DOUBLE) / cur_tot
                - CAST(ref_n AS DOUBLE) / ref_tot)
             * LN((CAST(cur_n AS DOUBLE) / cur_tot)
                  / (CAST(ref_n AS DOUBLE) / ref_tot)), 6)
           END AS psi_contribution
    FROM tot2
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index (PSI) drift per decile bin — the
    drift metric production ML monitoring actually reports (banks,
    feature stores), complementing the engine's chi² (categorical) and
    KS (continuous supremum) gates with the binned-contribution view
    that tells you WHERE the distribution moved, not just that it did.

    Reference = the corpus's first PSI_REF_DAYS days; bins = the
    reference's exact equi-depth deciles via the
    agg_histogram_equidepth discipline (fact rows collapse map-side to
    the distinct-cents grain; a value's bucket is pure integer
    arithmetic on the cumulative count, ceil(cw*K/tot) as `div`, never
    float).  Current rows are assigned by a broadcast theta-join of
    the ≤10-row cut table against the DISTINCT-cents relation — the
    corpus never meets the join.  At 100 TB both sides cost one
    map-side collapse + one distinct-grain exchange each.

    The one float: (p - q) * ln(p / q), rounded to 6 decimals in both
    engines (the text_tfidf precedent — libm's ln is not cross-engine
    bit-reproducible; everything upstream of it is exact integers).
    Empty current bins emit NULL contribution (Spark ln(0) is NULL,
    DuckDB -inf: the CASE guard kills the divergence class)."""
    # NULL metric rows are excluded in BOTH engines: a NULL cents
    # group would sit at opposite ends of the cumulative window's sort
    # (Spark NULLS FIRST vs DuckDB NULLS LAST) and shift every decile.
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("c"),
        )
    )
    lim = ev.agg(F.min("d").alias("min_d"))
    tagged = ev.crossJoin(F.broadcast(lim)).select(
        "c",
        (F.datediff(F.col("d"), F.col("min_d")) < PSI_REF_DAYS).alias(
            "is_ref"
        ),
    )
    # Collapse to the (cents, is_ref) grain ONCE and pin it: Spark does
    # not share subplans, so deriving ref/cur/cuts/k from `tagged`
    # directly re-ran the corpus scan + min-day probe FOUR times (six
    # BNL probes in the physical plan).  After this checkpoint every
    # downstream relation reads the ~|distinct cents| rows instead.
    byval = (
        tagged.groupBy("c", "is_ref")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ref_byval = byval.filter("is_ref").select("c", "cnt")
    w_cum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = ref_byval.select(
        "c",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cw"),
        F.sum("cnt").over(w_all).cast("bigint").alias("tot"),
    )
    bkt = (
        cum.groupBy(
            F.expr(f"(cw * {PSI_BINS} + tot - 1) div tot").alias("bucket")
        )
        .agg(
            F.max("c").alias("hi_cents"),
            F.sum("cnt").cast("bigint").alias("ref_n"),
        )
    )
    cuts = bkt.select(
        F.row_number()
        .over(Window.orderBy("hi_cents"))
        .cast("bigint")
        .alias("bin"),
        "hi_cents",
        "ref_n",
    )
    kk = cuts.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    cur_byval = byval.filter(~F.col("is_ref")).select("c", "cnt")
    assign = (
        cur_byval.join(
            F.broadcast(cuts.select(F.col("hi_cents").alias("cut_hi"))),
            F.col("cut_hi") < F.col("c"),
            "left",
        )
        .groupBy("c", "cnt")
        .agg(F.count("cut_hi").alias("nlt"))
        .crossJoin(F.broadcast(kk))
        .select(
            "cnt", F.least(F.col("nlt") + 1, F.col("k")).alias("bin")
        )
    )
    cur_bins = assign.groupBy("bin").agg(
        F.sum("cnt").cast("bigint").alias("cur_n")
    )
    joined = cuts.join(F.broadcast(cur_bins), ["bin"], "left").select(
        "bin",
        "hi_cents",
        "ref_n",
        F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
    )
    w10 = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot2 = joined.select(
        "bin",
        "hi_cents",
        "ref_n",
        "cur_n",
        F.sum("ref_n").over(w10).cast("bigint").alias("ref_tot"),
        F.sum("cur_n").over(w10).cast("bigint").alias("cur_tot"),
    )
    q = F.col("ref_n").cast("double") / F.col("ref_tot")
    p = F.col("cur_n").cast("double") / F.col("cur_tot")
    contrib = F.when(
        F.col("cur_n") == 0, F.lit(None).cast("double")
    ).otherwise(F.round((p - q) * F.log(p / q), 6))
    return tot2.select(
        "bin",
        "hi_cents",
        "ref_n",
        "cur_n",
        q.alias("q"),
        p.alias("p"),
        contrib.alias("psi_contribution"),
    )


MARKOV_PI_SCALE = 1_000_000  # fixed-point units for the stationary mass
MARKOV_PI_ITERS = 20


def _markov_stationary_oracle() -> str:
    """Unrolled fixed-point power iteration (the graph_pagerank trick on
    the |types|^2 transition matrix): q_ij = (n_ij * S) // rowsum_i are
    integer transition probs, states missing from the from-side get an
    integer self-loop (q = S), and each step is the commutative integer
    sum mass'_j = SUM_i (mass_i * q_ij) // S — hash-exact at any
    partitioning.  Overflow budget: mass <= |types|*S = 5e6 units,
    q <= S = 1e6, so each product <= 5e12 << 2^63."""
    s = MARKOV_PI_SCALE
    steps = []
    for k in range(1, MARKOV_PI_ITERS + 1):
        # LEFT JOIN back against the full states relation: a state with
        # outgoing transitions but zero inbound edges (never a to_type,
        # and no self-loop since it IS on the from-side) must persist
        # with mass 0 — the driver-side replay keeps every state, so an
        # inner-join oracle would drop the row and break the hash.
        steps.append(
            f"p{k} AS (SELECT s0.state,"
            f" CAST(COALESCE(m.mass, 0) AS BIGINT) AS mass"
            f" FROM states s0 LEFT JOIN ("
            f"SELECT t.to_type AS state,"
            f" SUM((p.mass * t.q) // {s}) AS mass"
            f" FROM p{k - 1} p JOIN q t ON t.from_type = p.state"
            f" GROUP BY t.to_type) m ON m.state = s0.state)"
        )
    last = f"p{MARKOV_PI_ITERS}"
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    states AS (SELECT DISTINCT event_type AS state FROM events),
    rowsums AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS rowsum
      FROM trans GROUP BY from_type
    ),
    q AS (
      SELECT t.from_type, t.to_type, (t.n * {s}) // r.rowsum AS q
      FROM trans t JOIN rowsums r USING (from_type)
      UNION ALL
      SELECT state, state, CAST({s} AS BIGINT)
      FROM states WHERE state NOT IN (SELECT from_type FROM rowsums)
    ),
    p0 AS (SELECT state, CAST({s} AS BIGINT) AS mass FROM states),
    {", ".join(steps)},
    tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM {last})
    SELECT p.state AS event_type, p.mass AS pi_fixed,
           CAST(p.mass AS DOUBLE) / t.total AS pi
    FROM {last} p, tot t
    """


@REG.query("events_markov_stationary", oracle=_markov_stationary_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain — the
    long-run share of attention each event type absorbs, the summary
    events_markov_transitions' per-row probabilities don't give: where
    does a random surfer of this behavior graph END UP?

    Exactness: the power iteration runs in FIXED-POINT integers (the
    graph_pagerank discipline): integer transition probs q_ij =
    (n_ij*S) div rowsum_i, integer mass scatter (mass_i*q_ij) div S,
    commutative sums — so 20 iterations produce bit-identical masses
    in Spark, Python, and the oracle's 20 unrolled CTEs, and even the
    floor-loss per step (mass leaks ~|types| units/iteration) is
    reproduced exactly.  States never seen on the from-side get an
    integer self-loop (mass conserving, standard absorbing fix).

    Plan: the corpus contributes exactly one user-grain lag shuffle +
    a |types|^2 count (the events_markov_transitions stages); the
    iteration itself runs driver-side over the collected <=25-row
    integer matrix (bounded driver state, the MMR/PQ-codebook
    precedent) — distributing a 5x5 matmul would be parody."""
    s = MARKOV_PI_SCALE
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )  # <= |types|^2 rows — bounded driver state
    states = sorted(
        r.event_type
        for r in events.select("event_type").distinct().collect()
    )
    rowsum: dict = {}
    for r in trans:
        rowsum[r.from_type] = rowsum.get(r.from_type, 0) + r.n
    q: dict = {}
    for r in trans:
        q[(r.from_type, r.to_type)] = (r.n * s) // rowsum[r.from_type]
    for st in states:
        if st not in rowsum:
            q[(st, st)] = s
    mass = {st: s for st in states}
    for _ in range(MARKOV_PI_ITERS):
        nxt = {st: 0 for st in states}
        for (i, j), qv in q.items():
            nxt[j] += (mass[i] * qv) // s
        mass = nxt
    total = sum(mass.values())
    rows = [(st, mass[st], mass[st] / total) for st in states]
    return spark.createDataFrame(
        rows, "event_type string, pi_fixed bigint, pi double"
    )


KCORE_K = 3


@REG.query("graph_kcore")  # rows-only: the peeling FIXPOINT (repeatedly
# delete degree < k, degrees recomputed after every deletion wave) is a
# non-monotone shrinking iteration — unlike min-label propagation it has
# no accumulate-only recursive-CTE form, so the gate is the pure-Python
# peeling replay in tests/test_plans.py plus the driver's rows check.
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core of the co-click graph (k=3): the maximal subgraph in
    which every item still has >= 3 co-click neighbors — the standard
    dense-community extraction that strips tendrils and leaves the
    engagement core (where recommendation models actually have signal).
    Completes the graph family's toolkit: PageRank (importance),
    triangles (clustering), components (reach), core (density).

    Plan: rides ensure_item_edges like every graph consumer.  The
    driver loops the peeling fixpoint — each wave is one degree
    aggregate + two broadcast anti-joins removing low-degree nodes'
    edges, with localCheckpoint pinning each wave's result so the plan
    never re-derives prior waves (the min_label_components shape).
    Iterations = peeling depth (shallow on heavy-tailed graphs); data
    never leaves executors; the edge list is item-catalog-sized, not
    corpus-sized, but NOT driver-collectable at 100 TB (items^2 worst
    case) — which is why this loops over DataFrames and the bounded
    5x5 Markov chain does not."""
    edges = ensure_item_edges(spark, sf_dir).select("item_a", "item_b")
    cur = edges.localCheckpoint(eager=True)
    while True:
        deg = (
            cur.select(F.col("item_a").alias("item"))
            .unionByName(cur.select(F.col("item_b").alias("item")))
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        low = deg.filter(F.col("deg") < KCORE_K).select("item")
        if low.isEmpty():
            break
        cur = (
            cur.join(
                F.broadcast(low.withColumnRenamed("item", "item_a")),
                ["item_a"],
                "left_anti",
            )
            .join(
                F.broadcast(low.withColumnRenamed("item", "item_b")),
                ["item_b"],
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
    return (
        cur.select(F.col("item_a").alias("item"))
        .unionByName(cur.select(F.col("item_b").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )
