"""Process-local runtime-event recorder for the metrics sidecar.

Adaptive/optional code paths (partition-count estimates, fallbacks) must
never fail a job, but silently degrading is not acceptable either
(VERDICT r3 #5: a swallowed estimate exception made a non-adaptive run
invisible). Driver-side code records events here; jobs drain them into
the metrics sidecar table so every degraded run is auditable.

Driver-side only by design — events fire during plan construction (the
estimate runs on the driver), never inside executor tasks.
"""

from __future__ import annotations

import logging
import threading

log = logging.getLogger("registry_address_matcher_spark")

_lock = threading.Lock()
_events: list[dict] = []


def record_event(stage: str, key: str, detail: str = "") -> None:
    """Record one runtime event (and WARN-log it immediately)."""
    with _lock:
        _events.append({"stage": stage, "key": key, "detail": detail})
    log.warning("runtime event [%s] %s%s", stage, key, f": {detail}" if detail else "")


def drain_events() -> list[dict]:
    """Return and clear all recorded events."""
    with _lock:
        out = list(_events)
        _events.clear()
    return out


def drain_events_df(spark, run_id: str):
    """Drain events into metrics-sidecar rows
    (run_id, stage, key, value=1.0, recorded_at); None when no events."""
    from pyspark.sql import functions as F

    events = drain_events()
    if not events:
        return None
    df = spark.createDataFrame(
        [(e["stage"], f"{e['key']}:{e['detail']}" if e["detail"] else e["key"]) for e in events],
        "stage string, key string",
    )
    return df.select(
        F.lit(run_id).alias("run_id"),
        "stage",
        "key",
        F.lit(1.0).alias("value"),
        F.current_timestamp().alias("recorded_at"),
    )
