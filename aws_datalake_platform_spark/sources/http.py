"""HTTP JSON source adapter (reference S1).

The reference's batch Lambda GETs the Open-Meteo forecast API per city
with a 10 s timeout and tolerates per-city failures
(scripts/batch_ingest/lambda_function.py:38-47,105-113). Here the fetch
is a thin driver-side adapter that feeds the distributed flattener in
sources/synthetic.weather_raw_from_responses; tests inject the
deterministic fake payload instead of the network (this container has no
outbound network — the fetch path is exercised only via injection).
"""

from __future__ import annotations

import json
import logging
from typing import Callable
from urllib.error import URLError
from urllib.request import Request, urlopen

logger = logging.getLogger(__name__)

OPEN_METEO_URL = (
    "https://api.open-meteo.com/v1/forecast"
    "?latitude={lat}&longitude={lon}"
    "&hourly=temperature_2m,relative_humidity_2m,wind_speed_10m,precipitation"
    "&forecast_days=1"
    "&timezone=UTC"
)


def fetch_weather(city: dict, timeout: float = 10.0) -> dict | None:
    """GET one city's hourly forecast; None on failure (parity with
    batch_ingest:38-47 including the 10 s timeout and UA header)."""
    url = OPEN_METEO_URL.format(lat=city["latitude"], lon=city["longitude"])
    req = Request(url, headers={"User-Agent": "pyspark-datalake-engine/0.1"})
    try:
        with urlopen(req, timeout=timeout) as response:
            return json.loads(response.read().decode("utf-8"))
    except (URLError, OSError) as e:
        logger.error("Failed to fetch weather for %s: %s", city.get("name"), e)
        return None


def fetch_all(
    cities: list[dict], fetcher: Callable[[dict], dict | None] = fetch_weather
) -> tuple[list[tuple[dict, dict]], int]:
    """Fetch every city, tallying per-city failures like the reference
    handler (batch_ingest:105-113). Returns (successes, error_count)."""
    ok: list[tuple[dict, dict]] = []
    errors = 0
    for city in cities:
        payload = fetcher(city)
        if payload is None:
            errors += 1
        else:
            ok.append((city, payload))
    return ok, errors


class BatchIngestError(RuntimeError):
    """Raised when any city fetch fails, after successes are landed."""


def run_batch_ingest(
    spark,
    cities: list[dict],
    raw_path: str | None = None,
    ingestion_id: str | None = None,
    ingested_at: str | None = None,
    fetcher: Callable[[dict], dict | None] = fetch_weather,
):
    """Batch-ingest entry point with the reference's error policy: fetch
    every city, flatten + land what succeeded, then RAISE if any city
    failed so the scheduler's failure alarm fires
    (batch_ingest:125-127 — partial success still raises). Returns the
    raw DataFrame when everything succeeded."""
    import uuid
    from datetime import datetime, timezone

    from ..functions.core import date_partition
    from .io import write_ndjson
    from .synthetic import weather_raw_from_responses

    responses, errors = fetch_all(cities, fetcher)
    ingestion_id = ingestion_id or uuid.uuid4().hex
    ingested_at = ingested_at or datetime.now(timezone.utc).isoformat()
    raw = None
    if responses:
        raw = weather_raw_from_responses(spark, responses, ingestion_id, ingested_at)
        if raw_path is not None:
            # date=YYYY-MM-DD landing dirs, parity with batch_ingest:76-93
            write_ndjson(raw.withColumn("date", date_partition("timestamp")), raw_path, ["date"])
    if errors:
        raise BatchIngestError(
            f"batch ingest: {errors}/{len(cities)} cities failed "
            f"({len(responses)} landed under ingestion_id={ingestion_id})"
        )
    return raw
