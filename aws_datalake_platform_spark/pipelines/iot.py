"""IoT sensor transform: raw NDJSON -> validated -> pseudonymized ->
quality-scored -> curated Parquet.

Reference parity: transform_iot_sensors (scripts/glue_transform/
transform.py:193-270) — same 9 expectations (:212-222), SHA-256
pseudonymization + PII column drop (:232-235, via native sha2 instead of
the Python UDF), 3-way quality CASE (:238-251), date partition (:253-257),
partitioned snappy sink (:260-265).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import RAW_IOT_SENSORS
from ..functions.core import date_partition, pseudonymize, quality_score
from ..sources.io import read_ndjson, write_curated_parquet
from ..validation import DataValidator

logger = logging.getLogger(__name__)


def validate_iot(raw_df: DataFrame) -> dict[str, Any]:
    """The reference's IoT rule set (transform.py:212-222)."""
    return (
        DataValidator(raw_df, "raw_iot_sensors")
        .expect_column_values_to_not_be_null("sensor_id")
        .expect_column_values_to_not_be_null("city")
        .expect_column_values_to_not_be_null("timestamp")
        .expect_column_values_to_not_be_null("temperature_c")
        .expect_column_values_to_be_between("temperature_c", -50.0, 60.0)
        .expect_column_values_to_be_between("humidity_pct", 0.0, 100.0)
        .expect_column_values_to_be_between("aqi", 0.0, 500.0)
        .expect_column_values_to_be_between("battery_level", 0.0, 100.0)
        .expect_table_row_count_to_be_greater_than(0)
        .validate()
    )


def curate_iot(raw_df: DataFrame) -> DataFrame:
    """Pure transform: pseudonymize + drop PII (U1/P4), quality score (P3),
    date partition (P2). All column expressions — single codegen stage."""
    return (
        raw_df.withColumn("sensor_id_hash", pseudonymize("sensor_id"))
        .drop("sensor_id")
        .withColumn("quality_score", quality_score())
        .withColumn("date", date_partition("timestamp"))
    )


def transform_iot_sensors(
    spark: SparkSession,
    raw_path: str | None = None,
    curated_path: str | None = None,
    raw_df: DataFrame | None = None,
    halt_on_validation_failure: bool = False,
    infer_schema: bool = False,
    metrics=None,
) -> dict[str, Any] | None:
    """End-to-end IoT job (transform.py:193-270 semantics).

    Reads with the catalog's RAW_IOT_SENSORS schema by default (inference
    is a full extra pass at scale); infer_schema=True opts back into the
    reference's infer-on-read (transform.py:203).

    ``metrics`` (an observability.MetricsCollector) wraps the whole job:
    the returned status dict gains a ``job_metrics`` entry with wall
    time, stage I/O totals, and status — the engine-side analogue of the
    reference's per-job CloudWatch metrics (monitoring/main.tf:45-164);
    a raising job yields {"success": False, "job_metrics": {...}} with
    status="failed" instead of propagating."""
    if metrics is not None:
        from ..observability import wrap_pipeline

        return wrap_pipeline(
            metrics,
            "transform_iot_sensors",
            lambda: transform_iot_sensors(
                spark, raw_path, curated_path, raw_df,
                halt_on_validation_failure, infer_schema, metrics=None,
            ),
        )
    if raw_df is None:
        try:
            raw_df = read_ndjson(spark, raw_path, schema=None if infer_schema else RAW_IOT_SENSORS)
        except Exception as e:
            logger.error("Failed to read raw IoT sensor data: %s", e)
            return None
    if raw_df.isEmpty():
        logger.warning("No raw IoT sensor data found")
        return None

    result = validate_iot(raw_df)
    if not result["success"]:
        logger.error("IoT sensor data validation FAILED: %s", result)
        if halt_on_validation_failure:
            raise ValueError(f"iot validation failed: {result}")

    curated = curate_iot(raw_df)
    if curated_path is not None:
        write_curated_parquet(curated, curated_path, ["date"])
    return result
