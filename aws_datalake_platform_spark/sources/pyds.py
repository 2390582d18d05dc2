"""Custom Python Data Source (Spark 4 DataSource API): the batch
weather-ingest boundary as a first-class readable format.

The reference's batch ingest is a Lambda looping cities over the
Open-Meteo HTTP API (scripts/batch_ingest/lambda_function.py:34-58,
one request per city). Re-expressed Spark-natively: a DataSource whose
reader emits ONE INPUT PARTITION PER CITY, so the per-city fetch runs
ON EXECUTORS in parallel — the ingest scales with the city list and no
driver loop ever materializes rows.

The fetch itself is the deterministic Open-Meteo fake
(sources/synthetic.py:open_meteo_like_response; the network boundary is
stubbed per round rules — swap fetch_fn for the real HTTP adapter in
sources/http.py to go live). Registration:

    spark.dataSource.register(OpenMeteoSimDataSource)
    df = (spark.read.format("openmeteo_sim")
          .option("cities", "london,paris")
          .option("date", "2026-01-01").load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _CityPartition(InputPartition):
    def __init__(self, city: str):
        self.city = city


_SCHEMA = (
    "city string, time string, temperature_2m double, "
    "relative_humidity_2m double, wind_speed_10m double, precipitation double"
)


class OpenMeteoSimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.cities = [c for c in options.get("cities", "london").split(",") if c]
        self.date = options.get("date", "2026-01-01")
        self.hours = int(options.get("hours", "24"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self):
        # one partition per city == one reference Lambda HTTP call;
        # Spark schedules each on an executor core
        return [_CityPartition(c) for c in self.cities]

    def read(self, partition: _CityPartition):
        # imports must live inside read(): it executes on worker processes
        from .synthetic import open_meteo_like_response

        resp = open_meteo_like_response(
            {"name": partition.city}, self.date, hours=self.hours, seed=self.seed
        )
        hourly = resp["hourly"]
        n = len(hourly["time"])

        def at(series: list, i: int):
            # index padding: short arrays yield None (batch_ingest:67-70)
            return series[i] if i < len(series) else None

        for i in range(n):
            yield (
                partition.city,
                hourly["time"][i],
                at(hourly["temperature_2m"], i),
                at(hourly["relative_humidity_2m"], i),
                at(hourly["wind_speed_10m"], i),
                at(hourly["precipitation"], i),
            )


class OpenMeteoSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "openmeteo_sim"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> OpenMeteoSimReader:
        return OpenMeteoSimReader(self.options)


# ── Streaming: the IoT tick stream as a custom streaming format ─────────
# The reference's stream generator is a Lambda fired every 5 minutes
# (eventbridge/main.tf:60-77) pushing one batch of readings to Kinesis.
# Re-expressed: a SimpleDataSourceStreamReader whose offset IS the tick
# counter — each micro-batch emits the readings for the ticks elapsed
# since the last checkpointed offset, and replaying an offset range
# regenerates identical rows (deterministic), giving exactly-once
# end-to-end with any idempotent sink.


def _py_u01(seed: int, *parts) -> float:
    """Python twin of the deterministic-uniform trick: sha256 -> [0,1)."""
    import hashlib

    h = hashlib.sha256("|".join(str(p) for p in (seed, *parts)).encode()).digest()
    return int.from_bytes(h[:8], "big") / 2**64


def _iot_tick_rows(tick: int, cities: list[str], sensors: int, seed: int):
    import hashlib

    for city in cities:
        for idx in range(sensors):
            sid = "sensor-" + hashlib.sha256(
                f"{city.lower().replace(' ', '_')}_{idx:03d}".encode()
            ).hexdigest()[:12]
            key = (city, idx, tick)
            yield (
                tick,
                sid,
                city,
                round(15.0 + 30.0 * _py_u01(seed, *key, "t"), 1),
                round(20.0 + 75.0 * _py_u01(seed, *key, "h"), 1),
                round(15.0 + 85.0 * _py_u01(seed, *key, "b"), 1),
            )


_STREAM_SCHEMA = (
    "tick long, sensor_id string, city string, "
    "temperature_c double, humidity_pct double, battery_level double"
)


class IoTTickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.cities = [c for c in options.get("cities", "london,paris").split(",") if c]
        self.sensors = int(options.get("sensors_per_city", "2"))
        self.seed = int(options.get("seed", "42"))
        self.ticks_per_batch = int(options.get("ticks_per_batch", "1"))
        self.max_ticks = int(options.get("max_ticks", "0"))  # 0 = unbounded

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start: dict):
        end = start["tick"] + self.ticks_per_batch
        if self.max_ticks:
            end = min(end, self.max_ticks)
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s
        # this iterator for replay, and generators are not copyable
        return (self.readBetweenOffsets(start, {"tick": end}), {"tick": end})

    def readBetweenOffsets(self, start: dict, end: dict) -> list:
        # deterministic replay: same offsets -> identical rows (the
        # recovery path Structured Streaming uses after a crash)
        return [
            row
            for tick in range(start["tick"], end["tick"])
            for row in _iot_tick_rows(tick, self.cities, self.sensors, self.seed)
        ]


class IoTTickStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iot_ticks"

    def schema(self) -> str:
        return _STREAM_SCHEMA

    def simpleStreamReader(self, schema) -> IoTTickStreamReader:
        return IoTTickStreamReader(self.options)
