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

    source = "parquet:<path>" | "csv:<path>" | "jsonl:<path>" (newline-
    delimited JSON, the common landing format for document/training-data
    exports; gzip transparent) | "orc:<path>" | "text:<path>" (raw text
    corpus — one row per line, or one row per FILE with its path when
    ``wholetext=True``; the shape a crawl/scrape dump lands in before it
    becomes the ``documents`` table) | "jdbc:<url>" (needs ``table`` opt
    and a JDBC driver jar on the classpath) | "table:<ident>" (catalog
    table, e.g. Iceberg) | "rest:<url>" (Supabase/PostgREST-style
    paginated endpoint; ``fetcher``/``page_size``/``headers`` opts).
    """
    kind, _, rest = source.partition(":")
    if kind == "parquet":
        return spark.read.parquet(rest)
    if kind == "csv":
        return spark.read.option("header", True).csv(rest)
    if kind == "jsonl":
        # schema opt keeps the scan one-pass at scale — without it Spark
        # runs a whole extra inference pass over 100 TB of text
        schema = opts.pop("schema", None)
        reader = spark.read.schema(schema) if schema else spark.read
        return reader.json(rest)
    if kind == "orc":
        return spark.read.orc(rest)
    if kind == "text":
        # wholetext=True: one row per FILE (doc ingestion) — each task
        # reads whole files, so files must individually fit in executor
        # memory; fine for crawl shards, wrong for one giant file. Line
        # mode (default) splits on newlines and parallelizes within a
        # file. doc_id is the file path so downstream dedup/lineage has
        # a stable key without a second inference pass.
        from pyspark.sql import functions as F

        if opts.pop("wholetext", False):
            df = spark.read.text(rest, wholetext=True)
            return df.select(
                F.input_file_name().alias("doc_id"), F.col("value").alias("content")
            )
        return spark.read.text(rest)
    if kind == "jdbc":
        # JDBC urls keep their full "jdbc:vendor:..." form — the kind
        # prefix IS part of the url, unlike the other source kinds
        # (first exercised by the stub-driver smoke test, which caught
        # this path passing a jdbc: -stripped url to the driver manager)
        return spark.read.format("jdbc").option("url", source).options(**opts).load()
    if kind == "table":
        return spark.read.table(rest)
    if kind == "rest":
        return read_rest(spark, rest, **opts)
    raise ValueError(f"unknown source kind: {kind!r}")


def _http_range_fetcher(headers: dict):
    """Default page fetcher: PostgREST/Supabase offset pagination via
    Range headers (the reference pulls its registry with the supabase
    client's .range(offset, offset+limit-1) —
    /root/reference/address_supabase.py:74-131)."""

    def fetch(url: str, offset: int, limit: int) -> list[dict]:
        import urllib.request

        req = urllib.request.Request(
            url,
            headers={
                **headers,
                "Range-Unit": "items",
                "Range": f"{offset}-{offset + limit - 1}",
                "Accept": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read().decode("utf-8"))

    return fetch


def read_rest(
    spark: SparkSession,
    url: str,
    fetcher=None,
    page_size: int = 1000,
    headers: dict | None = None,
    schema=None,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """S2: REST registry source, offset-paginated until a short/empty page.

    Driver-side ingest BY DESIGN: the reference's REST registry is a
    modest dimension table (tens of thousands of rows). A 100 TB corpus
    never arrives over REST — you land exports to object storage and scan
    parquet; this path exists for source parity with the reference.
    ``max_rows`` bounds driver memory: a mis-pointed URL raises instead
    of accumulating the source until the driver OOMs.

    ``fetcher(url, offset, limit) -> list[dict]`` is pluggable so tests
    (and non-PostgREST endpoints) inject their own transport.
    """
    import pandas as pd

    fetcher = fetcher or _http_range_fetcher(headers or {})
    rows: list[dict] = []
    offset = 0
    while True:
        page = fetcher(url, offset, page_size)
        if not page:
            break
        rows.extend(page)
        if len(rows) > max_rows:
            raise ValueError(
                f"REST source {url!r} exceeded max_rows={max_rows} "
                f"({len(rows)} rows so far). The REST reader is a driver-side "
                "dimension-table path; land large tables to object storage "
                "and read parquet, or raise max_rows explicitly."
            )
        if len(page) < page_size:
            break
        offset += page_size
    if not rows:
        if schema is None:
            raise ValueError("REST source returned 0 rows and no schema was given")
        return spark.createDataFrame([], schema=schema)
    df = pd.DataFrame(rows)
    return spark.createDataFrame(df, schema=schema) if schema else spark.createDataFrame(df)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: CSV sink (header on, like the reference's to_csv exports)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table: pre-pay the join/aggregation shuffle at
    write time.

    At 10^12-row scale the dominant recurring cost of registry matching
    is re-shuffling the BUILD side on the blocking key for every probe
    batch (the incremental_match stream hits it once per micro-batch).
    ``bucketBy(N, key)`` hash-partitions rows into N buckets per the
    same modulus Spark's shuffle would use, so any later equi-join or
    groupBy on the bucket columns between tables with matching bucket
    counts plans NO Exchange on the bucketed side — the shuffle happened
    once, at write time (pinned by
    ``tests/test_sources.py::test_bucketed_join_plans_no_shuffle``).
    ``sort_cols`` additionally sorts within buckets, letting sort-merge
    joins skip their sort. Bucketing requires the table catalog
    (``saveAsTable``) — plain ``.parquet(path)`` writes cannot record
    bucket metadata; pass ``path`` to keep the data external to the
    warehouse dir."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only applies via the table
    identifier, never via ``read.parquet`` on the files."""
    return spark.table(table)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink — the landing format most document/training-data
    tooling consumes. Distributed write (one file per partition), no
    driver collect."""
    df.write.mode(mode).json(path)


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
        """Write df as a new snapshot, swap the pointer, return snapshot id.

        Iceberg path APPENDS (each call = one Iceberg snapshot, history
        preserved for time travel/resume); the table is created on first
        use only. The round-1 createOrReplace here silently destroyed the
        snapshot log on every call."""
        if self.iceberg:
            ident = f"{self.iceberg}.{table}"
            if self.spark.catalog.tableExists(ident):
                df.writeTo(ident).append()
            else:
                df.writeTo(ident).create()
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

    def merge_snapshot(
        self,
        updates: DataFrame,
        table: str,
        key_cols: list[str],
        delete_col: str | None = None,
    ) -> str:
        """MERGE (upsert + optional delete) as a copy-on-write snapshot —
        what ``MERGE INTO`` does on an Iceberg table, expressed over the
        manifest catalog: the new snapshot is ``updates`` (rows flagged in
        ``delete_col`` removed) plus every current row whose key is not
        touched. History is preserved — the pre-merge snapshot stays
        loadable by id (time travel), and the pointer swap is atomic.

        The plan is one key-anti-join (broadcast-able whenever the update
        batch is small relative to the table — the normal case for a
        registry delta feed; AQE picks that up from the update side's
        size) plus a union: cost is one rewrite of the table, the honest
        price of copy-on-write. On a real Iceberg catalog use the
        engine's MERGE INTO instead, which rewrites only matched files.

        ``updates`` must be unique and NON-NULL on ``key_cols`` (two
        updates for one key in a batch, or a keyless row, is an upstream
        bug — detected and raised, never resolved silently) and must
        carry exactly the table's columns (plus ``delete_col``).
        """
        from pyspark.sql import functions as F

        if self.iceberg:
            # append_snapshot's Iceberg branch APPENDS — applying this
            # copy-on-write merge through it would stack the merged table
            # on top of the pre-merge rows (silent duplication). Iceberg
            # has a native MERGE that rewrites only matched files; use it.
            raise NotImplementedError(
                "merge_snapshot on an Iceberg catalog: run the engine's "
                f"MERGE INTO {self.iceberg}.{table} instead"
            )
        cur = self.load(table)
        # materialize the batch once: it is read by the key checks, the
        # anti-join, and the snapshot write — re-running a
        # non-deterministic update source between the check and the write
        # could merge a batch that never passed the check
        upd = updates.localCheckpoint()
        null_key = F.lit(False)
        for c in key_cols:
            null_key = null_key | F.col(c).isNull()
        if upd.filter(null_key).limit(1).count() > 0:
            raise ValueError(
                f"merge_snapshot: update rows with NULL in key {key_cols} — a "
                "NULL key never equi-joins, so the row would duplicate instead "
                "of upserting"
            )
        dup = (
            upd.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            k = {c: dup[0][c] for c in key_cols}
            raise ValueError(f"merge_snapshot: duplicate update rows for key {k}")
        upserts = upd
        if delete_col is not None:
            upserts = upd.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        if sorted(upserts.columns) != sorted(cur.columns):
            raise ValueError(
                f"merge_snapshot: update columns {sorted(upserts.columns)} != "
                f"table columns {sorted(cur.columns)}"
            )
        untouched = cur.join(upd.select(*key_cols), key_cols, "left_anti")
        merged = untouched.unionByName(upserts.select(*cur.columns))
        return self.append_snapshot(merged, table)

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
