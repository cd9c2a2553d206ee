"""Shared Spark status-store REST probes (r12 review consolidation —
bench.py's cpu_sec capture and bench_streaming's flatness gate each
grew a private copy; a fix to one silently missed the other).

The AppStatusStore is populated by an ASYNC listener queue whether or
not the UI server runs (`spark.ui.enabled` only gates the jetty
endpoint these read), so callers that attribute metrics to "the run
that just finished" must drain the bus first — `_settle` — or a busy
box undercounts the newest stages.
"""

from __future__ import annotations

import json
import urllib.request


def _settle(spark, timeout_ms: int = 10_000) -> None:
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(timeout_ms)
    except Exception:
        pass  # private API; degrade to an unsynced read


def last_stage_id(spark) -> int:
    """Newest stage id (any status) — the per-run marker."""
    _settle(spark)
    ui = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{appid}/stages", timeout=10
            )
        )
        return max((s.get("stageId", -1) for s in data), default=-1)
    except Exception:
        return -1


def stage_sum_since(spark, after_stage: int, field: str) -> int | None:
    """Sum a numeric StageData field over completed stages newer than
    the marker. Fields used today: ``executorCpuTime`` (ns),
    ``inputBytes``. None when the REST read fails."""
    _settle(spark)
    ui = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    try:
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{appid}/stages?status=complete",
                timeout=10,
            )
        )
    except Exception:
        return None
    return sum(
        s.get(field, 0) for s in data if s.get("stageId", -1) > after_stage
    )
