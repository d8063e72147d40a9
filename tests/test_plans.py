"""Physical-plan regression tests: the scale properties the engine
depends on (scan pushdown, column pruning, broadcast joins, top-k
short-circuit, whole-stage codegen) must survive refactors — a query
that still returns correct rows but lost its pushdown is a 100 TB
regression invisible to the value-hash gate."""

import pytest

SF = "/root/testdata/sf0.01"


def _plan(spark, df, mode="formatted"):
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_flagship_pushdown_and_broadcast(spark, queries):
    plan = _plan(spark, queries["flagship_revenue"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    assert plan.count("BroadcastHashJoin") >= 2  # nation/region at minimum
    assert "CartesianProduct" not in plan


def test_scan_prunes_columns(spark, queries):
    plan = _plan(spark, queries["filter_pushdown_range"](spark, SF))
    # ReadSchema of the lineitem scan must not include unused wide columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_shipinstruct" not in read_schema


def test_topk_plans_take_ordered(spark, queries):
    plan = _plan(spark, queries["sort_topk"](spark, SF))
    assert "TakeOrdered" in plan  # not a global sort + limit


def test_broadcast_dims_never_shuffle(spark, queries):
    plan = _plan(spark, queries["join_broadcast_dim"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_theta_join_is_intentional_bnl(spark, queries):
    plan = _plan(spark, queries["join_theta_bnl"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan


def test_agg_uses_whole_stage_codegen(spark, queries):
    plan = _plan(spark, queries["pricing_summary"](spark, SF), mode="codegen")
    assert "WholeStageCodegen" in plan


def test_agg_is_partial_then_final(spark, queries):
    """Map-side combine must precede the shuffle (partial_sum before the
    Exchange) — the difference between shuffling raw lineitem rows and
    shuffling one row per (flag, status) per task."""
    plan = _plan(spark, queries["pricing_summary"](spark, SF), mode="simple")
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange hashpartitioning")


def test_no_unpartitioned_windows_in_bulk_paths(spark, queries):
    """Single-partition windows (Window.orderBy with no partitionBy over
    bulk data) serialize the whole dataset through one task.  The only
    allowed serial window is the <=257-row bucket-offset table inside
    shingle_vocab."""
    for name in ("window_ranking", "window_lag_lead", "window_running_frame",
                 "sim_cosine_topk", "join_asof"):
        plan = _plan(spark, queries[name](spark, SF), mode="simple")
        for line in plan.splitlines():
            if "Window" in line and "partitionBy" not in line:
                # formatted check: every Window operator must list a
                # partition spec; Spark prints windowspecdefinition(...)
                # with partition columns first — absence means global.
                assert "windowspecdefinition()" not in line.replace(" ", "")


def test_partitioned_write_prunes_partitions(spark, tmp_path, queries):
    """Directory-partitioned layout + a partition-key filter must prune
    at PLANNING time (PartitionFilters on the scan, non-matching
    directories never listed into the plan) — the layout decision that
    turns a 100 TB scan into a 1-partition read."""
    from firebase_realtime_database_backup_spark.catalog import read_table

    out = str(tmp_path / "orders_by_status")
    read_table(spark, "/root/testdata/sf0.001", "orders").write.partitionBy(
        "o_orderstatus"
    ).mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = _plan(spark, df)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_orderstatus" in part_filters
    # and the pruned read returns exactly the F rows
    expected = (
        read_table(spark, "/root/testdata/sf0.001", "orders")
        .filter("o_orderstatus = 'F'")
        .count()
    )
    assert df.count() == expected
