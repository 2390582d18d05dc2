"""Seeded synthetic data generators, distributed from the start.

Reference parity targets:
- IoT readings (scripts/stream_generate/lambda_function.py:39-61):
  per-city base temp 15 + hash(city)%30 plus N(0,3) noise; humidity
  U(20,95); AQI 70/20/10 mixture over U(0,50)/U(51,100)/U(101,200);
  battery U(15,100); deterministic sensor ids (:33-36).
- Weather hourly records (scripts/batch_ingest/lambda_function.py:50-73):
  one row per hour with enrichment columns, built by flattening
  parallel hourly arrays (arrays_zip + explode in Spark terms).

Differences by design (documented, not accidental):
- The reference seeds `random.seed()` from OS entropy (stream_generate:30)
  and uses Python's per-process `hash()` for the city base — neither is
  reproducible. Here every random draw derives from
  xxhash64(entity-key, seed), so the SAME rows come back for the same
  seed on any cluster size — the "seeded randomness at scale" hard part
  from SURVEY.md §7.
- Generation is a Spark plan over spark.range(n): no driver-side loop,
  so a 10^12-row synthetic table is as expressible as 15 rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import mint_sensor_id

DEFAULT_CITIES = ["New York", "London", "Tokyo", "Sydney", "Mumbai"]


def _u01(key: Column, seed: int, salt: str) -> Column:
    """Deterministic uniform(0,1) from a key column: xxhash64 -> [0,1).
    JVM-side, codegen-friendly, stable across partitionings."""
    h = F.xxhash64(key, F.lit(salt), F.lit(seed))
    # map signed 64-bit to [0,1)
    return (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)


def _gauss(key: Column, seed: int, salt: str, mu: float, sigma: float) -> Column:
    """Box-Muller from two deterministic uniforms."""
    u1 = _u01(key, seed, salt + ":u1")
    u2 = _u01(key, seed, salt + ":u2")
    # guard u1=0 -> clamp into (0,1)
    u1 = F.greatest(u1, F.lit(1e-12))
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2 * math.pi) * u2)
    return F.lit(mu) + F.lit(sigma) * z


def _stable_city_base(city: Column) -> Column:
    """15 + (stable_hash(city) % 30): reference uses Python hash()
    (stream_generate:42) which varies per process; xxhash64 is the
    reproducible stand-in."""
    return 15.0 + F.pmod(F.xxhash64(city), F.lit(30)).cast("double")


def iot_readings(
    spark: SparkSession,
    cities: list[str] | None = None,
    sensors_per_city: int = 3,
    ticks: int = 1,
    seed: int = 42,
    start_ts: str = "2026-01-01 00:00:00",
    tick_seconds: int = 300,
) -> DataFrame:
    """Synthetic IoT readings: cities x sensors_per_city x ticks rows.

    One tick == one EventBridge rate(5 minutes) invocation
    (eventbridge/main.tf:60-77). Schema matches RAW_IOT_SENSORS with the
    reference's ISO-8601 string timestamps.

    Scale: spark.range(ticks) x a broadcast-exploded city/sensor grid —
    the row count is ticks * cities * sensors with no driver materialization;
    repartitioning by range id spreads generation across executors.
    """
    cities = cities or DEFAULT_CITIES
    city_df = spark.createDataFrame([(c,) for c in cities], "city string")
    sensor_df = spark.range(sensors_per_city).select(F.col("id").alias("sensor_idx"))
    ticks_df = spark.range(ticks).select(F.col("id").alias("tick"))

    grid = ticks_df.crossJoin(F.broadcast(city_df)).crossJoin(F.broadcast(sensor_df))
    key = F.concat_ws("|", "city", "sensor_idx", "tick")

    aqi_bucket = _u01(key, seed, "aqi_w")
    aqi = (
        F.when(aqi_bucket < 0.7, _u01(key, seed, "aqi_lo") * 50.0)
        .when(aqi_bucket < 0.9, 51.0 + _u01(key, seed, "aqi_mid") * 49.0)
        .otherwise(101.0 + _u01(key, seed, "aqi_hi") * 99.0)
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts)) + F.col("tick") * tick_seconds
    )
    return grid.select(
        mint_sensor_id("city", "sensor_idx").alias("sensor_id"),
        F.col("city"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx").alias("timestamp"),
        F.round(_stable_city_base(F.col("city")) + _gauss(key, seed, "temp", 0, 3), 1).alias(
            "temperature_c"
        ),
        F.round(20.0 + _u01(key, seed, "hum") * 75.0, 1).alias("humidity_pct"),
        F.round(aqi, 1).alias("aqi"),
        F.round(15.0 + _u01(key, seed, "batt") * 85.0, 1).alias("battery_level"),
    )


def open_meteo_like_response(city: dict, date: str, hours: int = 24, seed: int = 42) -> dict:
    """Deterministic fake of the Open-Meteo hourly payload (the image/HTTP
    boundary is stubbed per round rules; the real adapter lives in
    sources/http.py). Shape matches batch_ingest/lambda_function.py:50-57."""
    import hashlib

    def u(salt: str, i: int) -> float:
        h = hashlib.sha256(f"{seed}|{city['name']}|{salt}|{i}".encode()).digest()
        return int.from_bytes(h[:8], "big") / 2**64

    times = [f"{date}T{h:02d}:00" for h in range(hours)]
    return {
        "hourly": {
            "time": times,
            "temperature_2m": [round(-5 + 40 * u("t", i), 1) for i in range(hours)],
            "relative_humidity_2m": [round(100 * u("h", i), 1) for i in range(hours)],
            "wind_speed_10m": [round(60 * u("w", i), 1) for i in range(hours)],
            # short precip array exercises the index-padding path
            # (batch_ingest:67-70 pads missing hourly values with None)
            "precipitation": [round(5 * u("p", i), 2) for i in range(hours - 2)],
        }
    }


def weather_raw_from_responses(
    spark: SparkSession,
    city_responses: list[tuple[dict, dict]],
    ingestion_id: str,
    ingested_at: str,
) -> DataFrame:
    """Flatten (city, open-meteo-response) pairs into raw_weather rows.

    Spark-first version of transform_response (batch_ingest:50-73): the
    parallel hourly arrays become one struct array via arrays_zip, then
    explode -> one row per hour. Missing tail values in any array become
    NULL exactly like the reference's index-padding.

    Scale: the zip/explode runs distributed; responses land as one row
    per (city, fetch) then fan out, so a million-city crawl is the same
    plan.
    """
    rows = []
    for city, resp in city_responses:
        hourly = resp.get("hourly", {})
        rows.append(
            (
                city["name"],
                float(city["latitude"]),
                float(city["longitude"]),
                hourly.get("time", []),
                [float(x) if x is not None else None for x in hourly.get("temperature_2m", [])],
                [float(x) if x is not None else None for x in hourly.get("relative_humidity_2m", [])],
                [float(x) if x is not None else None for x in hourly.get("wind_speed_10m", [])],
                [float(x) if x is not None else None for x in hourly.get("precipitation", [])],
            )
        )
    nested = spark.createDataFrame(
        rows,
        "city string, latitude double, longitude double, time array<string>, "
        "temperature_2m array<double>, relative_humidity_2m array<double>, "
        "wind_speed_10m array<double>, precipitation array<double>",
    )
    zipped = nested.select(
        "city",
        "latitude",
        "longitude",
        F.explode(
            F.arrays_zip(
                "time", "temperature_2m", "relative_humidity_2m", "wind_speed_10m", "precipitation"
            )
        ).alias("h"),
    )
    return zipped.select(
        F.lit(ingestion_id).alias("ingestion_id"),
        "city",
        "latitude",
        "longitude",
        F.col("h.time").alias("timestamp"),
        F.col("h.temperature_2m").alias("temperature_c"),
        F.col("h.relative_humidity_2m").alias("humidity_pct"),
        F.col("h.wind_speed_10m").alias("windspeed_kmh"),
        F.col("h.precipitation").alias("precipitation_mm"),
        F.lit(ingested_at).alias("ingested_at"),
    )
