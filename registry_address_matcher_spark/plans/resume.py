"""Stage checkpoint/resume (north rule): any run can resume from the
last completed blocking/scoring/clustering stage.

A run directory holds one :class:`~..sources.io.SnapshotCatalog` table
per stage plus ``run.json`` recording completion order and row counts.
``run_stage`` is the only entry point: if the stage's table already has a
snapshot recorded as complete, it is loaded (no recompute — the resume
test asserts the builder is never re-invoked); otherwise the builder runs
and its output is snapshotted BEFORE the stage is marked complete, so a
crash between write and mark re-runs the stage (at-least-once, idempotent
because each run writes a fresh snapshot and the pointer swap is atomic).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import SnapshotCatalog


class RunManifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "run.json")

    def read(self) -> dict:
        if not os.path.exists(self.path):
            return {"stages": {}}
        with open(self.path) as f:
            return json.load(f)

    def mark(self, stage: str, snapshot_id: str, rows: int) -> None:
        m = self.read()
        m["stages"][stage] = {"snapshot": snapshot_id, "rows": rows}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.path)

    def completed(self, stage: str) -> dict | None:
        return self.read()["stages"].get(stage)


def run_stage(
    spark: SparkSession,
    run_dir: str,
    stage: str,
    builder: Callable[[], DataFrame],
    force: bool = False,
) -> DataFrame:
    """Compute-or-load one pipeline stage."""
    manifest = RunManifest(run_dir)
    catalog = SnapshotCatalog(spark, run_dir)
    done = manifest.completed(stage)
    if done and not force:
        return catalog.load(stage, done["snapshot"])
    df = builder()
    snap = catalog.append_snapshot(df, stage)
    rows = catalog.load(stage, snap).count()
    manifest.mark(stage, snap, rows)
    return catalog.load(stage, snap)
