"""Table catalog abstraction — Iceberg when the runtime jar is present,
transparent Parquet-directory fallback otherwise (SURVEY.md §7 [ENV]: no
iceberg-spark-runtime jar on this box; BASELINE.json:14 mandates Iceberg in
production).

The fallback preserves the two Iceberg semantics the engine relies on:
* atomic append per batch — staged `_tmp-<uuid>` dir renamed into place,
  readers list only committed dirs via the JSON manifest;
* snapshot read — a read lists the manifest first, so a concurrent
  half-written append is invisible.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j returns a silent JavaPackage for unknown attrs, so probe the
        # classloader explicitly
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


class Catalog:
    """Minimal write/read/append facade over Iceberg-or-Parquet."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark)

    # -- fallback manifest helpers ------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def _entries(self, table: str) -> list[dict]:
        """Manifest entries [{dir, tag}]; plain-string commits (v1 format)
        are upgraded on read for backward compatibility."""
        mf = self._manifest(table)
        if not os.path.exists(mf):
            return []
        with open(mf) as f:
            raw = json.load(f)["commits"]
        return [e if isinstance(e, dict) else {"dir": e, "tag": None} for e in raw]

    def _commits(self, table: str) -> list[str]:
        return [e["dir"] for e in self._entries(table)]

    def _write_manifest(self, table: str, entries: list[dict]) -> None:
        mf = self._manifest(table)
        tmp = mf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"commits": entries}, f)
        os.replace(tmp, mf)  # atomic on POSIX

    def _commit(self, table: str, batch_dir: str, tag: dict | None = None):
        entries = self._entries(table)
        entries.append({"dir": batch_dir, "tag": tag})
        self._write_manifest(table, entries)

    # -- public API ----------------------------------------------------
    def append(self, df: DataFrame, table: str, partition_by: tuple[str, ...] = (), tag: dict | None = None) -> None:
        """Atomic batch append. `tag` (fallback path): a small JSON dict
        recorded with the commit — used by plans for crash reconciliation
        (e.g. {"run_id":..., "part_id":...}); Iceberg path would carry it
        as snapshot summary properties."""
        if self.use_iceberg:
            # Iceberg append() requires an existing table (unlike the
            # parquet fallback); probe existence explicitly rather than
            # catching append()'s exception, which would mask real failures
            # (schema drift, commit conflicts) behind a confusing
            # 'table already exists' from create()
            if self.spark.catalog.tableExists(table):
                df.writeTo(table).append()
            else:
                df.writeTo(table).create()
            return
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        batch = f"batch-{uuid.uuid4().hex}"
        staging = os.path.join(tdir, f"_tmp-{batch}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        final = os.path.join(tdir, batch)
        os.replace(staging, final)
        self._commit(table, batch, tag)

    def rollback_where(self, table: str, pred) -> int:
        """Remove committed batches whose tag satisfies `pred(tag) -> bool`
        (tags of None are never matched). Returns the number of batches
        rolled back. Used to reconcile orphan batches — data committed but
        the paired checkpoint row missing after a crash — before re-running
        a part/zoom (plans.tile_pyramid / plans.merged_pyramid).

        Iceberg path: NOT implemented (no Iceberg runtime on this box to
        develop/test against) — warns loudly instead of silently skipping,
        because the crash-window duplicate-prevention invariant then
        depends on the deployment reconciling via snapshot rollback on the
        snapshot-summary tag (or avoiding the window with a single
        multi-table transaction)."""
        if self.use_iceberg:
            import warnings

            warnings.warn(
                "Catalog.rollback_where is not implemented for the Iceberg path: "
                "orphan batches from a crash between data and checkpoint commits "
                "are NOT reconciled here — use Iceberg snapshot rollback on the "
                "snapshot-summary tag before resuming.",
                stacklevel=2,
            )
            return 0
        if not os.path.exists(self._manifest(table)):
            return 0
        entries = self._entries(table)
        keep, drop = [], []
        for e in entries:
            (drop if (e["tag"] is not None and pred(e["tag"])) else keep).append(e)
        if drop:
            self._write_manifest(table, keep)
            for e in drop:
                shutil.rmtree(os.path.join(self._tdir(table), e["dir"]), ignore_errors=True)
        return len(drop)

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(table)
        commits = self._commits(table)
        if not commits:
            raise FileNotFoundError(f"table {table} has no commits")
        from functools import reduce

        from pyspark.sql import DataFrame as _DF

        # each batch dir is its own partition-discovery root (the table dir
        # mixes batch-* dirs, which confuses a single basePath scan)
        dfs = [
            self.spark.read.option("basePath", os.path.join(self._tdir(table), c)).parquet(
                os.path.join(self._tdir(table), c)
            )
            for c in commits
        ]
        return reduce(_DF.unionByName, dfs)

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(table)
        return bool(self._commits(table))

    def drop(self, table: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            return
        shutil.rmtree(self._tdir(table), ignore_errors=True)
