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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
