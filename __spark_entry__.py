"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-
equivalent SQL for the driver's hash-match harness (keys without an
oracle get a rows-only check — used only for genuinely non-SQL ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases both sides)."""
    return {name: spec.sql for name, spec in QUERY_REGISTRY.items() if spec.sql is not None}
