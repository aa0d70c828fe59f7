"""Table IO: Iceberg when a catalog is configured, snapshot-manifested
parquet otherwise.

The north rule targets Iceberg tables. This sandbox has no Iceberg
runtime jar and no network, so the catalog layer is honest about what it
does: if the session has an Iceberg catalog configured
(``spark.sql.catalog.<name>`` conf), table identifiers resolve through
it (``df.writeTo(...)``); otherwise tables live as parquet directories
under a base dir with a JSON **manifest** carrying the snapshot log —
append-only snapshot dirs + a current-snapshot pointer, mimicking the
Iceberg semantics the resume path needs (atomic pointer swap, time
travel to a named snapshot). Nothing pretends to be Iceberg; the
manifest format is this repo's own.

Readers for the reference's source zoo (S1-S3): JDBC, CSV, parquet —
one function each, interchangeable behind :func:`read_registry`.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# registry readers (reference S1/S2/S3)
# ---------------------------------------------------------------------------

def read_registry(spark: SparkSession, source: str, **opts) -> DataFrame:
    """One entry point for every registry source.

    source = "parquet:<path>" | "csv:<path>" | "jdbc:<url>" (needs
    ``table`` opt and a JDBC driver jar on the classpath) | "table:<ident>"
    (catalog table, e.g. Iceberg).
    """
    kind, _, rest = source.partition(":")
    if kind == "parquet":
        return spark.read.parquet(rest)
    if kind == "csv":
        return spark.read.option("header", True).csv(rest)
    if kind == "jdbc":
        return spark.read.format("jdbc").option("url", rest).options(**opts).load()
    if kind == "table":
        return spark.read.table(rest)
    raise ValueError(f"unknown source kind: {kind!r}")


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: CSV sink (header on, like the reference's to_csv exports)."""
    df.write.mode(mode).option("header", True).csv(path)


# ---------------------------------------------------------------------------
# snapshot catalog
# ---------------------------------------------------------------------------

class SnapshotCatalog:
    """Parquet-dir tables with an Iceberg-like snapshot manifest.

    Layout::

        <base>/<table>/manifest.json
        <base>/<table>/snap-<id>/part-*.parquet

    manifest.json: {"current": "<id>", "snapshots": [{"id", "ts",
    "count", "parent"}...]}. Writes are new snapshot dirs + a manifest
    rewrite (the pointer swap is the only mutation, written via tmp+rename
    for atomicity on POSIX).
    """

    def __init__(self, spark: SparkSession, base_dir: str, iceberg_catalog: str | None = None):
        self.spark = spark
        self.base = base_dir
        self.iceberg = iceberg_catalog
        if self.iceberg is None:
            # auto-detect a configured Iceberg catalog
            for k, _v in spark.sparkContext.getConf().getAll():
                if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
                    self.iceberg = k.rsplit(".", 1)[1]
                    break

    # -- manifest helpers ---------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"current": None, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, table: str, manifest: dict) -> None:
        p = self._manifest_path(table)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, p)

    # -- public API ---------------------------------------------------------
    def append_snapshot(self, df: DataFrame, table: str) -> str:
        """Write df as a new snapshot, swap the pointer, return snapshot id."""
        if self.iceberg:
            df.writeTo(f"{self.iceberg}.{table}").createOrReplace()
            return "iceberg"
        os.makedirs(self._tdir(table), exist_ok=True)
        snap_id = f"{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self._tdir(table), f"snap-{snap_id}")
        df.write.mode("errorifexists").parquet(path)
        n = self.spark.read.parquet(path).count()
        m = self._read_manifest(table)
        m["snapshots"].append(
            {"id": snap_id, "ts": time.time(), "count": n, "parent": m["current"]}
        )
        m["current"] = snap_id
        self._write_manifest(table, m)
        return snap_id

    def load(self, table: str, snapshot: str | None = None) -> DataFrame:
        """Read the current (or a named) snapshot."""
        if self.iceberg:
            return self.spark.read.table(f"{self.iceberg}.{table}")
        m = self._read_manifest(table)
        snap_id = snapshot or m["current"]
        if snap_id is None:
            raise FileNotFoundError(f"table {table!r} has no snapshots")
        return self.spark.read.parquet(os.path.join(self._tdir(table), f"snap-{snap_id}"))

    def snapshots(self, table: str) -> list[dict]:
        return self._read_manifest(table)["snapshots"]

    def exists(self, table: str) -> bool:
        return self._read_manifest(table)["current"] is not None
