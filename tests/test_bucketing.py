"""Bucketed tables: pre-shuffling both sides of a recurring join into
the same bucket layout eliminates the Exchange at query time — THE
co-location move for a 100 TB fact⋈fact join that runs daily.

Writes bucketed copies of orders/customer (sf0.001) into the session
warehouse and asserts the bucketed join plans WITHOUT a shuffle."""

import pytest

from firebase_realtime_database_backup_spark.catalog import read_table

SF = "/root/testdata/sf0.001"
BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    (
        read_table(spark, SF, "orders")
        .write.bucketBy(BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        read_table(spark, SF, "customer")
        .write.bucketBy(BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("customer_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, c.c_name
            FROM orders_b o JOIN customer_b c ON o.o_custkey = c.c_custkey
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join over plain parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_table(spark, SF, "orders")
        c = read_table(spark, SF, "customer")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
