"""Live metrics capture — the flight-recorder half of the reference
(Listener.scala:16-23,85-92) without JVM subclassing.

The reference attached sparkMeasure listener subclasses on the
driver's listener bus. From PySpark the equivalent *public, stable*
channel is the Spark monitoring REST API
(``/api/v1/applications/<appId>/stages?details=true``) served by the
driver UI — same SparkListener data, already aggregated per
stage/task, no py4j subclassing (which is fragile across Spark
versions; SURVEY.md §7 risk register).

Unit note (SURVEY.md §4): the REST API reports ``executorCpuTime`` in
NANOSECONDS while sparkMeasure reported milliseconds at stage grain —
we convert to ms here so heuristic parity holds.
"""

from __future__ import annotations

import json
import logging
import urllib.error
import urllib.request
from datetime import datetime
from typing import Any

from pyspark.sql import SparkSession

log = logging.getLogger(__name__)

_REST_DATE_FMTS = ("%Y-%m-%dT%H:%M:%S.%f%Z", "%Y-%m-%dT%H:%M:%S.%fGMT")


def _parse_rest_ts(value: str | None) -> float | None:
    if not value:
        return None
    v = value.replace("GMT", "+0000") if value.endswith("GMT") else value
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z"):
        try:
            return datetime.strptime(v, fmt).timestamp()
        except ValueError:
            continue
    return None


def _get_json(url: str, timeout: float) -> Any:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310 (local driver UI)
        return json.load(resp)


def collect_app_metrics(
    spark: SparkSession, timeout: float = 10.0, since_stage_id: int = -1
) -> tuple[list[dict], list[dict]] | None:
    """Pull completed-stage + task metrics for the current app.

    ``since_stage_id``: only stages with a strictly larger id are
    returned. The REST API exposes the app's *cumulative* stage
    history, while the reference's per-run flight recorders captured
    only their own run — callers pass the last stage id they already
    recorded so each run's slice stays disjoint (stage ids are
    monotonically increasing within an app).

    Returns (stage_rows, task_rows) matching metrics.schema, or None
    when the UI/REST endpoint is unavailable (spark.ui.enabled=false,
    headless CI, …) — callers treat that as "no recording this run",
    the same effective behavior as the reference when its listeners
    were never registered. Unavailability is LOUD (warning log): a
    production run that silently never feeds the tuner would freeze
    the recommendation forever.
    """
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if not base:
        log.warning(
            "metrics not recorded: driver UI disabled (spark.ui.enabled=false). "
            "Enable the UI or the tuner will never see run history."
        )
        return None
    try:
        stages = _get_json(
            f"{base}/api/v1/applications/{app_id}/stages?details=true&status=complete",
            timeout,
        )
    except (urllib.error.URLError, OSError, ValueError, KeyError) as exc:
        log.warning(
            "metrics not recorded: driver REST endpoint %s unavailable (%s). "
            "The tuner will treat this run as unrecorded.", base, exc
        )
        return None

    stage_rows: list[dict] = []
    task_rows: list[dict] = []
    for s in stages:
        stage_id = int(s["stageId"])
        if stage_id <= since_stage_id:
            continue
        sub = _parse_rest_ts(s.get("submissionTime"))
        comp = _parse_rest_ts(s.get("completionTime"))
        duration_ms = int((comp - sub) * 1000) if sub is not None and comp is not None else 0
        stage_rows.append(
            {
                "app_id": app_id,
                "stage_id": stage_id,
                "stage_duration_ms": duration_ms,
                # REST executorCpuTime is ns → ms
                "executor_cpu_time_ms": int(s.get("executorCpuTime", 0)) // 1_000_000,
                "bytes_read": int(s.get("inputBytes", 0)),
                "shuffle_bytes_written": int(s.get("shuffleWriteBytes", 0)),
                "shuffle_bytes_read": int(s.get("shuffleReadBytes", 0)),
            }
        )
        for t in (s.get("tasks") or {}).values():
            task_rows.append(
                {
                    "stage_id": stage_id,
                    "task_id": int(t["taskId"]),
                    "executor_id": str(t.get("executorId", "driver")),
                    "duration_ms": int(t.get("duration", 0)),
                }
            )
    return stage_rows, task_rows


def current_max_stage_id(spark: SparkSession, timeout: float = 10.0) -> int:
    """Highest stage id the current app has submitted so far (any
    status), or -1 when none exist / the REST UI is unavailable.

    This is the per-job recording window the reference got from fresh
    flight-recorder instances (Listener.scala:85-92): callers snapshot
    it immediately before launching the workload and pass it as
    ``since_stage_id`` to ``collect_app_metrics``, so tuner bookkeeping
    stages (store reads, history joins) and unrelated prior session
    activity never pollute the recorded run — without the window, run
    stage lists are not positionally comparable and the J2 max-shuffle
    alignment can compare a bookkeeping stage in one run against the
    workload shuffle in another.
    """
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if not base:
        return -1
    try:
        stages = _get_json(
            f"{base}/api/v1/applications/{app_id}/stages", timeout
        )
    except (urllib.error.URLError, OSError, ValueError, KeyError) as exc:
        log.warning("stage-id snapshot unavailable (%s); falling back to -1", exc)
        return -1
    ids = [int(s["stageId"]) for s in stages if "stageId" in s]
    return max(ids, default=-1)
