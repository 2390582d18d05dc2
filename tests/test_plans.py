"""Plan-shape regression tests: the performance claims in docstrings
(pushdown, pruning, broadcast, window-limit) asserted against the actual
executed plans so a refactor cannot silently lose them."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def _plan(spark, qname: str) -> str:
    return QUERY_REGISTRY[qname].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_filter_reaches_parquet_scan(spark):
    plan = _plan(spark, "q03_filter_project")
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "GreaterThanOrEqual" in pushed
    # column pruning: the scan must read a strict subset of the table
    from aws_datalake_platform_spark.catalog import load_table

    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    n_total = len(load_table(spark, SF_SMOKE, "lineitem").columns)
    n_read = read_schema.count(":")  # struct<a:double,b:date,...> field count
    assert 0 < n_read < n_total, read_schema


def test_small_dimension_join_broadcasts(spark):
    assert "BroadcastHashJoin" in _plan(spark, "q44_broadcast_join")


def test_window_topk_gets_group_limit_pushdown(spark):
    assert "WindowGroupLimit" in _plan(spark, "q10_window_topk")


def test_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}") for i in range(30)], ["id", "date"]
    )
    df.write.partitionBy("date").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("date") == "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "2024-01-02" in pf  # predicate became a partition filter, not a row filter
    assert pruned.count() == 10  # ids with i % 3 == 1
