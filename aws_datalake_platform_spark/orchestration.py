"""Orchestration: engine-side counterpart of the reference's EventBridge
schedules (reference: terraform/modules/eventbridge/main.tf:40-102 — the
batch-ingest Lambda on a rate cadence (O1) and the Glue transform on a
cron cadence (O3); O2's stream tick lives in streaming.ingest as the
processingTime trigger).

A deliberately small, dependency-free periodic runner: register jobs
with a cadence, then either drive simulated ticks (tests, external
schedulers calling run_pending) or hand the loop to run_loop. Job
outcomes are the same status dicts the pipelines already return (O5
failure alerting: a failed job surfaces status="failed" and, with
raise_on_error, propagates so the host scheduler's alarm fires — the
analogue of the reference Lambda raising on partial failure,
batch_ingest:125-127).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any, Callable

logger = logging.getLogger(__name__)


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


@dataclass
class ScheduledJob:
    name: str
    fn: Callable[[], Any]
    every: timedelta
    next_run: datetime
    raise_on_error: bool = False
    runs: int = field(default=0)


class Scheduler:
    """Rate/cron-style job runner.

    ``clock`` is injectable so tests drive simulated time; production use
    omits it and gets wall-clock UTC.
    """

    def __init__(self, clock: Callable[[], datetime] | None = None):
        self._clock = clock or _utcnow
        self.jobs: list[ScheduledJob] = []

    def every(
        self,
        interval: timedelta,
        name: str,
        fn: Callable[[], Any],
        raise_on_error: bool = False,
        start_at: datetime | None = None,
    ) -> ScheduledJob:
        """rate(N minutes|hours) schedule — O1's EventBridge rate rule."""
        job = ScheduledJob(
            name=name,
            fn=fn,
            every=interval,
            next_run=start_at or self._clock(),
            raise_on_error=raise_on_error,
        )
        self.jobs.append(job)
        return job

    def daily_at(
        self,
        hour: int,
        minute: int,
        name: str,
        fn: Callable[[], Any],
        raise_on_error: bool = False,
    ) -> ScheduledJob:
        """cron(M H * * ? *) daily schedule — O3's transform cron."""
        now = self._clock()
        first = now.replace(hour=hour, minute=minute, second=0, microsecond=0)
        if first <= now:
            first += timedelta(days=1)
        return self.every(
            timedelta(days=1), name, fn, raise_on_error=raise_on_error, start_at=first
        )

    def run_pending(self, now: datetime | None = None) -> list[dict[str, Any]]:
        """Fire every due job once; returns one status dict per fired job.
        Missed intervals don't backfill (EventBridge semantics: a rule
        fires at most once per evaluation, late fires are just late)."""
        now = now or self._clock()
        results: list[dict[str, Any]] = []
        for job in self.jobs:
            if job.next_run > now:
                continue
            started = now
            try:
                value = job.fn()
                status: dict[str, Any] = {
                    "job": job.name,
                    "status": "success",
                    "started_at": started.isoformat(),
                    "result": value,
                }
            except Exception as e:  # noqa: BLE001 — job isolation boundary
                logger.error("scheduled job %s failed: %s", job.name, e)
                status = {
                    "job": job.name,
                    "status": "failed",
                    "started_at": started.isoformat(),
                    "error": str(e),
                }
                if job.raise_on_error:
                    job.runs += 1
                    job.next_run = now + job.every
                    raise
            job.runs += 1
            job.next_run = now + job.every
            results.append(status)
        return results

    def run_loop(
        self,
        until: datetime | None = None,
        poll_seconds: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        """Blocking driver loop for standalone deployments. Any real
        workflow engine should call run_pending from its own tick
        instead."""
        while until is None or self._clock() < until:
            self.run_pending()
            sleep(poll_seconds)
